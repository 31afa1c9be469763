package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** [[GifCodec]] against the closed-form fixture distribution and the
  * JDK's independent ImageIO GIF codec in both directions — ImageIO's
  * writer emits real variable-width LZW with a growing dictionary, so
  * the decoder's table-growth and KwKwK paths run against foreign
  * bytes, not just the fixture's dictionary-free uncompressed stream.
  */
class GifSpec extends AnyFunSuite with Matchers {

  private val Palette = Seq((255, 0, 0), (0, 255, 0), (0, 0, 255), (96, 96, 96))

  private def expectedMeans(w: Int, h: Int): (Double, Double, Double) = {
    var er = 0L; var eg = 0L; var eb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = Palette((x + y) % 4)
      er += r; eg += g; eb += b
    }
    val n = w.toLong * h * 255L
    (er.toDouble / n, eg.toDouble / n, eb.toDouble / n)
  }

  private def imageIoGif(w: Int, h: Int): Array[Byte] = {
    val cm = new java.awt.image.IndexColorModel(8, 4,
      Array(255, 0, 0, 96).map(_.toByte),
      Array(0, 255, 0, 96).map(_.toByte),
      Array(0, 0, 255, 96).map(_.toByte))
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x + y) % 4)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", bos) shouldBe true
    bos.toByteArray
  }

  test("own fixture decodes to the exact palette distribution") {
    val (w, h) = (19, 11)
    val Some((r, g, b)) = GifCodec.pixelStats(GifCodec.Fixtures.gradientGif(w, h))
    val (er, eg, eb) = expectedMeans(w, h)
    r shouldBe er +- 1e-12
    g shouldBe eg +- 1e-12
    b shouldBe eb +- 1e-12
  }

  test("ImageIO decodes the own fixture to the same pixels (foreign decoder)") {
    val (w, h) = (19, 11)
    val bytes = GifCodec.Fixtures.gradientGif(w, h)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    img.getWidth shouldBe w
    img.getHeight shouldBe h
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val p = img.getRGB(x, y)
      sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
    }
    val n = w.toLong * h * 255L
    val Some((r, g, b)) = GifCodec.pixelStats(bytes)
    r shouldBe sr.toDouble / n +- 1e-12
    g shouldBe sg.toDouble / n +- 1e-12
    b shouldBe sb.toDouble / n +- 1e-12
  }

  test("ImageIO-encoded GIF (real LZW, growing dictionary) decodes exactly (foreign encoder)") {
    for ((w, h) <- Seq((19, 11), (64, 48), (255, 7))) {
      val Some((r, g, b)) = GifCodec.pixelStats(imageIoGif(w, h))
      val (er, eg, eb) = expectedMeans(w, h)
      withClue(s"${w}x$h: ") {
        r shouldBe er +- 1e-12
        g shouldBe eg +- 1e-12
        b shouldBe eb +- 1e-12
      }
    }
  }

  test("refusals: truncated, trailer-first, no color table, oversized, non-GIF") {
    val good = GifCodec.Fixtures.gradientGif(19, 11)
    GifCodec.pixelStats(good.take(good.length / 2)) shouldBe None
    GifCodec.pixelStats("GIF89a then junk".getBytes) shouldBe None
    GifCodec.pixelStats("plain text".getBytes) shouldBe None
    GifCodec.pixelStats(Array.emptyByteArray) shouldBe None
    // strip the GCT flag: frame then has NO color table anywhere
    val noTable = good.clone()
    noTable(10) = (noTable(10) & 0x7F).toByte
    GifCodec.pixelStats(noTable) shouldBe None
    // forged logical screen + frame dims past the 64 M pixel cap
    val forged = good.clone()
    forged(6) = -1; forged(7) = -1; forged(8) = -1; forged(9) = -1
    // image descriptor dims start at 13 + 12 (GCT) + 5
    val id = 13 + 12
    forged(id + 5) = -1; forged(id + 6) = -1
    forged(id + 7) = -1; forged(id + 8) = -1
    GifCodec.pixelStats(forged) shouldBe None
  }

  test("decodeBytes feature head: GIF row equals the palette PNG row's means") {
    val gif = MediaCodec.decodeBytes(
      Multimodal.MediaRow(-13L, "image", GifCodec.Fixtures.gradientGif(19, 11)))
    val png = MediaCodec.decodeBytes(
      Multimodal.MediaRow(-12L, "image", MediaCodec.Fixtures.palettePng(19, 11)))
    gif.width shouldBe 19
    gif.height shouldBe 11
    gif.feature.take(4) shouldBe png.feature.take(4)
  }
}
