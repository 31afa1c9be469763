package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class MultimodalSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def media = {
    import spark.implicits._
    Multimodal.fromText(
      Seq((1L, "hello world"), (2L, "abc")).toDF("id", "text"),
      "id", "text", kind = "video")
  }

  test("envelopeMeta: byte length and md5 of the payload, no decode") {
    val out = Multimodal.envelopeMeta(media).orderBy("media_id").collect()
    out(0).getAs[Long]("n_bytes") shouldBe 11L // "hello world"
    out(1).getAs[Long]("n_bytes") shouldBe 3L
    out(0).getAs[String]("content_md5") shouldBe
      java.security.MessageDigest.getInstance("MD5")
        .digest("hello world".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
  }

  test("decodeFeatures is deterministic per payload and batch-shaped") {
    import spark.implicits._
    val feats1 = Multimodal.decodeFeatures(media.as[Multimodal.MediaRow])
      .orderBy("media_id").collect()
    val feats2 = Multimodal.decodeFeatures(media.repartition(5).as[Multimodal.MediaRow])
      .orderBy("media_id").collect()
    feats1.map(f => (f.media_id, f.payload_fnv1a, f.width, f.height, f.duration_ms)) shouldBe
      feats2.map(f => (f.media_id, f.payload_fnv1a, f.width, f.height, f.duration_ms))
    all(feats1.map(_.feature.size)) shouldBe 8
    all(feats1.map(_.duration_ms)) should be > 0L // video kind
  }

  // --- real header decode fixtures (no codec libs needed) ---

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    val ihdr = Array(0, 0, 0, 13).map(_.toByte) ++ "IHDR".getBytes ++
      be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0)
    sig ++ ihdr
  }

  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val soi = Array(0xFF, 0xD8).map(_.toByte)
    // APP0 segment ahead of the frame header, as real encoders emit
    val app0 = Array(0xFF, 0xE0, 0x00, 0x10).map(_.toByte) ++
      ("JFIF".getBytes :+ 0.toByte) ++ Array.fill[Byte](9)(0)
    val sof0 = Array(0xFF, 0xC0, 0x00, 0x11, 0x08).map(_.toByte) ++
      be16(h) ++ be16(w) ++ Array.fill[Byte](10)(0)
    soi ++ app0 ++ sof0
  }

  private def gifBytes(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes ++
      Array((w & 0xFF).toByte, ((w >> 8) & 0xFF).toByte,
        (h & 0xFF).toByte, ((h >> 8) & 0xFF).toByte, 0.toByte, 0.toByte)

  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def be16(v: Int): Array[Byte] = Array((v >>> 8).toByte, v.toByte)
  private def le32(v: Int): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
  private def le16(v: Int): Array[Byte] = Array(v.toByte, (v >>> 8).toByte)

  /** Canonical PCM WAV: RIFF header, 16-byte fmt chunk, data chunk. */
  private def wavBytes(sampleRate: Int, byteRate: Int, dataSize: Int): Array[Byte] =
    "RIFF".getBytes ++ le32(36 + dataSize) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++
      le32(sampleRate) ++ le32(byteRate) ++ le16(4) ++ le16(16) ++
      "data".getBytes ++ le32(dataSize) ++ Array.fill[Byte](dataSize)(0)

  /** Minimal ISO-BMFF: ftyp box then moov{mvhd}. */
  private def mp4Bytes(timescale: Int, duration: Long, version: Int): Array[Byte] = {
    val ftyp = be32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(0x200)
    val mvhdPayload =
      if (version == 0)
        Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
          be32(timescale) ++ be32(duration.toInt)
      else
        Array[Byte](1, 0, 0, 0) ++ be32(0) ++ be32(0) ++ be32(0) ++ be32(0) ++
          be32(timescale) ++ be32((duration >>> 32).toInt) ++ be32(duration.toInt)
    val mvhd = be32(8 + mvhdPayload.length) ++ "mvhd".getBytes ++ mvhdPayload
    val moov = be32(8 + mvhd.length) ++ "moov".getBytes ++ mvhd
    ftyp ++ moov
  }

  test("imageDimensions parses real PNG/JPEG/GIF headers") {
    MediaCodec.imageDimensions(pngBytes(1920, 1080)) shouldBe Some((1920, 1080))
    MediaCodec.imageDimensions(jpegBytes(640, 480)) shouldBe Some((640, 480))
    MediaCodec.imageDimensions(gifBytes(320, 200)) shouldBe Some((320, 200))
    MediaCodec.imageDimensions("not an image".getBytes) shouldBe None
    MediaCodec.imageDimensions(Array[Byte](0xFF.toByte, 0xD8.toByte)) shouldBe None
    // truncated JPEG: SOF length field runs past the buffer
    MediaCodec.imageDimensions(jpegBytes(640, 480).take(22)) shouldBe None
  }

  test("wavInfo parses sample rate and duration from RIFF chunks") {
    // 44.1 kHz stereo 16-bit: byteRate 176400; 352800 data bytes = 2 s
    MediaCodec.wavInfo(wavBytes(44100, 176400, 352800)) shouldBe Some((44100, 2000L))
    MediaCodec.wavInfo(wavBytes(16000, 32000, 8000)) shouldBe Some((16000, 250L))
    MediaCodec.wavInfo("RIFFxxxxWAVE".getBytes) shouldBe None // no chunks
    MediaCodec.wavInfo("not audio at all".getBytes) shouldBe None
    // data-chunk size is trusted even when the buffer is truncated
    MediaCodec.wavInfo(wavBytes(44100, 176400, 352800).take(60)) shouldBe
      Some((44100, 2000L))
  }

  test("mp4DurationMs parses mvhd v0 and v1 boxes") {
    MediaCodec.mp4DurationMs(mp4Bytes(1000, 5000L, version = 0)) shouldBe Some(5000L)
    MediaCodec.mp4DurationMs(mp4Bytes(90000, 90000L * 127, version = 1)) shouldBe
      Some(127000L)
    MediaCodec.mp4DurationMs("not a video container".getBytes) shouldBe None
    // moov without an mvhd child
    val ftyp = be32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(0x200)
    val emptyMoov = be32(8) ++ "moov".getBytes
    MediaCodec.mp4DurationMs(ftyp ++ emptyMoov) shouldBe None
    // truncated: mvhd box size runs past the buffer
    MediaCodec.mp4DurationMs(mp4Bytes(1000, 5000L, version = 0).dropRight(4)) shouldBe None
  }

  test("decodeFeatures emits real duration for planted WAV/MP4 payloads") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", wavBytes(44100, 176400, 352800)),
      Multimodal.MediaRow(2L, "video", mp4Bytes(1000, 7500L, version = 0)),
      Multimodal.MediaRow(3L, "audio", "plain text, stub fallback".getBytes))
    val out = Multimodal.decodeFeatures(spark.createDataset(rows))
      .orderBy("media_id").collect()
    out(0).duration_ms shouldBe 2000L
    out(1).duration_ms shouldBe 7500L
    // recognized envelopes report no (fake) visual dimensions
    (out(0).width, out(0).height) shouldBe ((0, 0))
    (out(1).width, out(1).height) shouldBe ((0, 0))
    // unrecognized payload keeps the deterministic stub duration
    out(2).duration_ms should be >= 1000L
    out(2).width should be >= 64
  }

  test("decodeFeatures emits true dimensions for planted image payloads") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", pngBytes(800, 600)),
      Multimodal.MediaRow(2L, "image", jpegBytes(1024, 768)),
      Multimodal.MediaRow(3L, "image", "plain text, stub fallback".getBytes))
    val out = Multimodal.decodeFeatures(spark.createDataset(rows))
      .orderBy("media_id").collect()
    (out(0).width, out(0).height) shouldBe ((800, 600))
    (out(1).width, out(1).height) shouldBe ((1024, 768))
    out(1).duration_ms shouldBe 0L
    // non-image payload falls back to the deterministic stub
    out(2).width should be >= 64
  }

  /** Mono 16-bit PCM WAV around explicit samples. */
  private def pcmWav(samples: Array[Short], sampleRate: Int = 16000): Array[Byte] = {
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = (samples(i) & 0xFF).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    "RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(sampleRate) ++ le32(sampleRate * 2) ++ le16(2) ++ le16(16) ++
      "data".getBytes ++ le32(data.length) ++ data
  }

  /** Uncompressed 24-bpp BMP with the given rows of (B,G,R) triples. */
  private def bmpBytes(w: Int, h: Int, pixels: Array[Array[(Int, Int, Int)]]): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val raster = new Array[Byte](stride * h)
    for (y <- 0 until h; x <- 0 until w) {
      val (bb, gg, rr) = pixels(y)(x)
      raster(y * stride + 3 * x) = bb.toByte
      raster(y * stride + 3 * x + 1) = gg.toByte
      raster(y * stride + 3 * x + 2) = rr.toByte
    }
    "BM".getBytes ++ le32(54 + raster.length) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
      le32(0) ++ le32(raster.length) ++ le32(2835) ++ le32(2835) ++
      le32(0) ++ le32(0) ++ raster
  }

  test("wavPcmStats: real RMS/peak/clip/zero-cross from a synthetic sine wave") {
    // 0.5-full-scale 100 Hz sine at 16 kHz: rms = 0.5/sqrt(2), peak = 0.5
    // (160 samples/cycle hits the crest exactly), no clipping, and a
    // sign change every half-cycle (2*100 per second of transitions)
    val sine = Array.tabulate[Short](16000)(i =>
      math.round(16384.0 * math.sin(2 * math.Pi * 100 * i / 16000.0)).toShort)
    val Some((rms, peak, clip, zcr)) = MediaCodec.wavPcmStats(pcmWav(sine))
    rms shouldBe (0.5 / math.sqrt(2)) +- 0.001
    peak shouldBe 0.5 +- 0.0001
    clip shouldBe 0.0
    zcr shouldBe (200.0 / 15999) +- 0.001
    // full-scale alternating square wave: everything clips, zcr = 1
    val square = Array.tabulate[Short](1000)(i => if (i % 2 == 0) 32767 else -32767)
    val Some((rms2, peak2, clip2, zcr2)) = MediaCodec.wavPcmStats(pcmWav(square))
    rms2 shouldBe (32767.0 / 32768.0) +- 1e-6
    peak2 shouldBe (32767.0 / 32768.0) +- 1e-9
    clip2 shouldBe 1.0
    zcr2 shouldBe 1.0
    // non-PCM-16 and non-WAV payloads refuse rather than fake
    MediaCodec.wavPcmStats("not audio".getBytes) shouldBe None
    MediaCodec.wavPcmStats(wavBytes(44100, 176400, 0)) shouldBe None // no samples
  }

  test("bmpPixelStats: real per-channel means from a gradient BMP") {
    val px = Array(
      Array((10, 20, 30), (40, 50, 60)),
      Array((70, 80, 90), (100, 110, 120)))
    val bmp = bmpBytes(2, 2, px)
    MediaCodec.imageDimensions(bmp) shouldBe Some((2, 2))
    val Some((r, g, b)) = MediaCodec.bmpPixelStats(bmp)
    r shouldBe (75.0 / 255) +- 1e-12 // (30+60+90+120)/4
    g shouldBe (65.0 / 255) +- 1e-12
    b shouldBe (55.0 / 255) +- 1e-12
    // truncated raster / unsupported depth refuse rather than fake
    MediaCodec.bmpPixelStats(bmp.dropRight(1)) shouldBe None
    val bpp8 = bmp.clone(); bpp8(28) = 8
    MediaCodec.bmpPixelStats(bpp8) shouldBe None
  }

  test("pnmPixelStats: real channel means from binary PGM/PPM rasters") {
    // P5 2x2 grayscale, values 10/20/30/40 — mean 25; header carries a
    // comment line, which the parser must skip
    val pgm = "P5\n# c\n2 2\n255\n".getBytes ++ Array[Byte](10, 20, 30, 40)
    MediaCodec.imageDimensions(pgm) shouldBe Some((2, 2))
    val Some((r, g, b)) = MediaCodec.pnmPixelStats(pgm)
    r shouldBe (25.0 / 255) +- 1e-12
    g shouldBe r +- 1e-15; b shouldBe r +- 1e-15 // gray on all channels
    // P6 2x1 RGB: (10,20,30), (40,50,60) — per-channel means 25/35/45
    val ppm = "P6\n2 1\n255\n".getBytes ++
      Array[Byte](10, 20, 30, 40, 50, 60)
    MediaCodec.imageDimensions(ppm) shouldBe Some((2, 1))
    val Some((r2, g2, b2)) = MediaCodec.pnmPixelStats(ppm)
    r2 shouldBe (25.0 / 255) +- 1e-12
    g2 shouldBe (35.0 / 255) +- 1e-12
    b2 shouldBe (45.0 / 255) +- 1e-12
    // 16-bit samples (maxval > 255) are big-endian: 0x0000 and 0xFFFF
    val pgm16 = "P5\n2 1\n65535\n".getBytes ++
      Array[Byte](0, 0, -1, -1)
    val Some((r3, _, _)) = MediaCodec.pnmPixelStats(pgm16)
    r3 shouldBe 0.5 +- 1e-12
    // the generator fixtures agree with their closed-form means
    val Some((gr, _, _)) =
      MediaCodec.pnmPixelStats(MediaCodec.Fixtures.gradientPgm(64, 32))
    gr shouldBe ((0 until 64).map(x => x * 255 / 63).sum / 64.0 / 255) +- 1e-12
    val Some((pr, pg, pb)) =
      MediaCodec.pnmPixelStats(MediaCodec.Fixtures.gradientPpm(16, 16))
    pr shouldBe ((0 until 16).map(x => x * 255 / 15).sum / 16.0 / 255) +- 1e-12
    pg shouldBe pr +- 1e-12 // same ramp on rows
    pb shouldBe (32.0 / 255) +- 1e-12
    // truncated raster / ASCII netpbm / non-netpbm refuse rather than fake
    MediaCodec.pnmPixelStats(ppm.dropRight(1)) shouldBe None
    MediaCodec.pnmPixelStats("P3\n2 1\n255\n10 20 30 40 50 60".getBytes) shouldBe None
    MediaCodec.pnmPixelStats("plain text".getBytes) shouldBe None
  }

  test("pngPixelStats: real channel means through inflate + all 5 filters") {
    // h = 10 rows -> filter rotation y % 5 hits None/Sub/Up/Average/
    // Paeth twice each; means must still be the closed-form ramp values
    val png = MediaCodec.Fixtures.gradientPng(16, 10)
    MediaCodec.imageDimensions(png) shouldBe Some((16, 10))
    val Some((r, g, b)) = MediaCodec.pngPixelStats(png)
    r shouldBe ((0 until 16).map(x => x * 255 / 15).sum / 16.0 / 255) +- 1e-12
    g shouldBe ((0 until 10).map(y => y * 255 / 9).sum / 10.0 / 255) +- 1e-12
    b shouldBe (32.0 / 255) +- 1e-12
    // RGBA: alpha ignored, same means
    val Some((r4, g4, b4)) =
      MediaCodec.pngPixelStats(MediaCodec.Fixtures.gradientPng(16, 10, colorType = 6))
    r4 shouldBe r +- 1e-12; g4 shouldBe g +- 1e-12; b4 shouldBe b +- 1e-12
    // grayscale: gray ramp replicated to all three channels
    val Some((gr, gg, gb)) =
      MediaCodec.pngPixelStats(MediaCodec.Fixtures.gradientPng(64, 8, colorType = 0))
    gr shouldBe ((0 until 64).map(x => x * 255 / 63).sum / 64.0 / 255) +- 1e-12
    gg shouldBe gr +- 1e-15; gb shouldBe gr +- 1e-15
  }

  test("pngPixelStats: palette (type 3) decodes through PLTE lookup, ImageIO-cross-checked") {
    val (w, h) = (19, 11)
    val png = MediaCodec.Fixtures.palettePng(w, h)
    val Some((r, g, b)) = MediaCodec.pngPixelStats(png)
    // independent expectation: count the (x+y)%4 palette distribution
    val palette = Seq((255, 0, 0), (0, 255, 0), (0, 0, 255), (96, 96, 96))
    var er = 0L; var eg = 0L; var eb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val (pr, pg, pb) = palette((x + y) % 4)
      er += pr; eg += pg; eb += pb
    }
    val n = w.toLong * h * 255L
    r shouldBe er.toDouble / n +- 1e-12
    g shouldBe eg.toDouble / n +- 1e-12
    b shouldBe eb.toDouble / n +- 1e-12
    // the JDK's independent PNG codec agrees exactly (palette lookup
    // is lossless integer math on both sides)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val p = img.getRGB(x, y)
      sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
    }
    r shouldBe sr.toDouble / n +- 1e-12
    g shouldBe sg.toDouble / n +- 1e-12
    b shouldBe sb.toDouble / n +- 1e-12
    // an index past the palette refuses rather than misreads: a valid
    // file whose PLTE holds 2 entries while pixels index 0..3
    MediaCodec.pngPixelStats(
      MediaCodec.Fixtures.palettePng(w, h, paletteEntries = 2)) shouldBe None
  }

  test("pngPixelStats: 16-bit, sub-8-bit palette, and Adam7 all decode (ImageIO-generated)") {
    // 16-bit gray via the JDK encoder (TYPE_USHORT_GRAY → depth-16 PNG,
    // adaptive filtering at bpp=2 — filters on wide pixels run against
    // foreign bytes)
    val (w, h) = (23, 13)
    val g16 = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      g16.getRaster.setSample(x, y, 0, (x * 65535 / (w - 1)))
    val bos1 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(g16, "png", bos1) shouldBe true
    val Some((r1, _, _)) = MediaCodec.pngPixelStats(bos1.toByteArray)
    val exp16 = (0 until w).map(x => x * 65535 / (w - 1)).sum.toDouble / w / 65535
    r1 shouldBe exp16 +- 1e-9
    // own 16-bit RGB fixture: means identical to the 8-bit gradient
    val Some((r2, g2, b2)) =
      MediaCodec.pngPixelStats(MediaCodec.Fixtures.gradientPng(16, 10, depth = 16))
    val Some((r8, g8, b8)) =
      MediaCodec.pngPixelStats(MediaCodec.Fixtures.gradientPng(16, 10))
    r2 shouldBe r8 +- 1e-9; g2 shouldBe g8 +- 1e-9; b2 shouldBe b8 +- 1e-9
    // depth-2 palette via TYPE_BYTE_BINARY with a 4-entry color model
    val cm = new java.awt.image.IndexColorModel(2, 4,
      Array(255, 0, 0, 96).map(_.toByte),
      Array(0, 255, 0, 96).map(_.toByte),
      Array(0, 0, 255, 96).map(_.toByte))
    val p2 = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_BINARY, cm)
    for (y <- 0 until h; x <- 0 until w)
      p2.getRaster.setSample(x, y, 0, (x + y) % 4)
    val bos2 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(p2, "png", bos2) shouldBe true
    val Some((pr, pg, pb)) = MediaCodec.pngPixelStats(bos2.toByteArray)
    val palette = Seq((255, 0, 0), (0, 255, 0), (0, 0, 255), (96, 96, 96))
    var er = 0L; var eg = 0L; var eb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val (cr2, cg2, cb2) = palette((x + y) % 4); er += cr2; eg += cg2; eb += cb2
    }
    val n = w.toLong * h * 255L
    pr shouldBe er.toDouble / n +- 1e-12
    pg shouldBe eg.toDouble / n +- 1e-12
    pb shouldBe eb.toDouble / n +- 1e-12
    // Adam7: the JDK writer's progressive mode interlaces; means must
    // equal the non-interlaced encoding of the SAME image
    val rgb = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      rgb.setRGB(x, y, ((x * 255 / (w - 1)) << 16) | ((y * 255 / (h - 1)) << 8) | 32)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    val params = writer.getDefaultWriteParam
    params.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos3 = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos3)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(rgb, null, null), params)
    } finally { ios.close(); writer.dispose() }
    val interlaced = bos3.toByteArray
    interlaced(28) shouldBe 1 // really Adam7
    val bos4 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgb, "png", bos4) shouldBe true
    val Some((ir, ig, ib)) = MediaCodec.pngPixelStats(interlaced)
    val Some((nr, ng, nb)) = MediaCodec.pngPixelStats(bos4.toByteArray)
    ir shouldBe nr +- 1e-12; ig shouldBe ng +- 1e-12; ib shouldBe nb +- 1e-12
  }

  test("pngPixelStats refuses what it cannot decode honestly") {
    val png = MediaCodec.Fixtures.gradientPng(16, 10)
    // truncated IDAT / missing IEND
    MediaCodec.pngPixelStats(png.dropRight(20)) shouldBe None
    // flag bytes flipped WITHOUT a matching raster are malformed: the
    // declared geometry no longer fits the zlib stream
    val deep = png.clone(); deep(24) = 16
    MediaCodec.pngPixelStats(deep) shouldBe None
    val pal = png.clone(); pal(25) = 3 // type 3 with no PLTE chunk
    MediaCodec.pngPixelStats(pal) shouldBe None
    val adam = png.clone(); adam(28) = 1
    MediaCodec.pngPixelStats(adam) shouldBe None
    // forged IHDR claiming a huge canvas over a tiny IDAT: the deflate
    // expansion bound refuses before allocating
    val forged = png.clone()
    forged(16) = 0x7F.toByte; forged(17) = -1; forged(18) = -1; forged(19) = -1
    MediaCodec.pngPixelStats(forged) shouldBe None
    // BOTH dims forged near 2^31: (w*ch+1)*h wraps Long — the
    // overflow-safe guard must refuse instead of crashing/allocating
    val forged2 = forged.clone()
    forged2(20) = 0x7F.toByte; forged2(21) = -1; forged2(22) = -1; forged2(23) = -1
    MediaCodec.pngPixelStats(forged2) shouldBe None
    // not a PNG at all
    MediaCodec.pngPixelStats("plain text".getBytes) shouldBe None
  }

  test("decodeFeatures carries real sample stats for WAV/BMP payloads") {
    import spark.implicits._
    val sine = Array.tabulate[Short](4000)(i =>
      math.round(16384.0 * math.sin(2 * math.Pi * 100 * i / 16000.0)).toShort)
    val px = Array(Array((0, 0, 255), (0, 0, 255))) // two pure-red pixels
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", pcmWav(sine)),
      Multimodal.MediaRow(2L, "image", bmpBytes(2, 1, px)),
      Multimodal.MediaRow(3L, "audio", "stub fallback".getBytes))
    val out = Multimodal.decodeFeatures(spark.createDataset(rows))
      .orderBy("media_id").collect()
    // WAV: [rms, peak, clip, zcr, 0...]
    out(0).feature(0) shouldBe (0.5f / math.sqrt(2).toFloat) +- 0.001f
    out(0).feature(1) shouldBe 0.5f +- 0.001f
    out(0).feature(2) shouldBe 0.0f
    out(0).duration_ms shouldBe 250L // 4000 samples at 16 kHz
    // BMP: [meanR, meanG, meanB, luma, 0...]
    (out(1).width, out(1).height) shouldBe ((2, 1))
    out(1).feature(0) shouldBe 1.0f +- 1e-6f
    out(1).feature(1) shouldBe 0.0f
    out(1).feature(2) shouldBe 0.0f
    out(1).feature(3) shouldBe 0.299f +- 1e-6f
    // unrecognized payloads keep the deterministic stub vector
    out(2).feature.size shouldBe 8
  }

  test("sniffFormat + decodeOutcome: real decoders report decoded, codec-bound formats refuse honestly") {
    // the full zoo: (payload, expected format, expected outcome)
    val zoo = Seq(
      (MediaCodec.Fixtures.sineWav(440, 0.5), "wav", "decoded"),
      (MediaCodec.Fixtures.gradientBmp(16, 16), "bmp", "decoded"),
      (MediaCodec.Fixtures.gradientPgm(8, 8), "pnm", "decoded"),
      (MediaCodec.Fixtures.gradientPng(16, 10), "png", "decoded"),
      (JpegCodec.Fixtures.gradientJpeg(24, 16, mode = "420"), "jpeg", "decoded"),
      (GifCodec.Fixtures.gradientGif(16, 10), "gif", "decoded"),
      // real header, codec-bound samples: envelope only — never fake pixels
      (MediaCodec.Fixtures.minimalMp4(1000, 5000L), "mp4", "envelope_only"),
      // deliberately refused: decoding needs real codec libraries
      (MediaCodec.Fixtures.mp3Frame(), "mp3", "refused"),
      (MediaCodec.Fixtures.h264AnnexB(), "h26x", "refused"),
      (Array.fill[Byte](64)(0x51), "unknown", "refused"))
    zoo.foreach { case (payload, fmt, outcome) =>
      withClue(s"format $fmt: ") {
        MediaCodec.decodeOutcome(payload) shouldBe ((fmt, outcome))
      }
    }
    // the mp4 fixture's advertised duration is really read by the box walk
    MediaCodec.mp4DurationMs(MediaCodec.Fixtures.minimalMp4(1000, 5000L)) shouldBe Some(5000L)
  }

  test("frameSamplePlan emits timestamps every interval within duration") {
    import spark.implicits._
    val feats = Multimodal.decodeFeatures(media.as[Multimodal.MediaRow]).toDF()
    val plan = Multimodal.frameSamplePlan(feats, everyMs = 1000L)
      .select(col("media_id"), col("duration_ms"), col("frame_ts_ms"))
      .collect()
    plan should not be empty
    plan.foreach { r =>
      val dur = r.getAs[Long]("duration_ms")
      val frames = r.getSeq[Long](2)
      frames.head shouldBe 0L
      all(frames) should be < dur
      frames.sliding(2).foreach {
        case Seq(a, b) => (b - a) shouldBe 1000L
        case _ =>
      }
    }
  }
}
