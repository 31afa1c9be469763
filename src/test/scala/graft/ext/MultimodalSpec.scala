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

  test("imageDimensions parses real PNG/JPEG/GIF headers") {
    MediaCodec.imageDimensions(pngBytes(1920, 1080)) shouldBe Some((1920, 1080))
    MediaCodec.imageDimensions(jpegBytes(640, 480)) shouldBe Some((640, 480))
    MediaCodec.imageDimensions(gifBytes(320, 200)) shouldBe Some((320, 200))
    MediaCodec.imageDimensions("not an image".getBytes) shouldBe None
    MediaCodec.imageDimensions(Array[Byte](0xFF.toByte, 0xD8.toByte)) shouldBe None
    // truncated JPEG: SOF length field runs past the buffer
    MediaCodec.imageDimensions(jpegBytes(640, 480).take(22)) shouldBe None
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
