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
