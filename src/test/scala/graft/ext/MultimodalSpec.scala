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
