package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase
import graft.ext.TextPipeline

/** Streaming corpus ingestion ([[TextPipeline.cleanStream]]): the
  * quality gate, language filter, watermark-bounded exact dedup, and
  * split stamping run incrementally; survivors match what the batch
  * stages would have decided.
  */
class StreamingCorpusSpec extends AnyFunSuite with Matchers with SparkTestBase {

  test("gates, filters, dedups, and splits an incoming document stream") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[StreamDoc]
    val cleaned = TextPipeline.cleanStream(
      input.toDF(), textCol = "text", eventTimeCol = "ts",
      config = TextPipeline.Config(minQuality = 0.2, langs = Seq("en")))
    val query = cleaned.writeStream
      .format("memory").queryName("corpus_out").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-corpus-ckpt").toString)
      .start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      val good = "the quick brown fox jumps over the lazy dog and it is a fine day for running"
      input.addData(
        StreamDoc(1L, good, t("2024-05-25 10:00:00")),
        StreamDoc(2L, "zz", t("2024-05-25 10:00:10")), // fails quality gate
        StreamDoc(3L, "el perro y la casa de los vecinos en la calle y una puerta", t("2024-05-25 10:00:20")), // not en
        StreamDoc(4L, good, t("2024-05-25 10:00:30")), // exact duplicate of 1
        StreamDoc(5L, "it was the best of times and it was the worst of times for all of us", t("2024-05-25 10:00:40")))
      query.processAllAvailable()
      val out = spark.table("corpus_out")
      out.select("doc_id").as[Long].collect().sorted shouldBe Array(1L, 5L)
      // survivors carry a split label from the deterministic content key
      out.select("split").as[String].collect().toSet
        .subsetOf(Set("train", "val", "test")) shouldBe true
    } finally query.stop()
  }

  test("fuzzy streaming admission: paraphrase dropped, new doc admitted AND indexed, within-batch dups collapse") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("graft-fuzzy-admit").toString
    val input = MemoryStream[StreamDoc]
    val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = TextPipeline.admitStreamNearUnique(
      input.toDF(), "doc_id", "text",
      indexPath = s"$dir/index", checkpointDir = s"$dir/ckpt",
      minJaccard = 0.5, numHashes = 64, bands = 16, shingleSize = 2) {
      (batch, _) =>
        admitted ++= batch.select("doc_id").as[Long].collect(): Unit
    }
    try {
      def t(s: String) = Timestamp.valueOf(s)
      val fox = "the quick brown fox jumps over the lazy dog and it is " +
        "a fine day in the park for a long walk"
      val db = "completely novel text about database engines and the " +
        "query planners that power them at scale"
      // batch 1 bootstraps the index
      input.addData(
        StreamDoc(1L, fox, t("2024-05-25 10:00:00")),
        StreamDoc(2L, "a wholly different document about mountains and " +
          "weather patterns in the far north", t("2024-05-25 10:00:10")))
      q.processAllAvailable()
      admitted.sorted.toSeq shouldBe Seq(1L, 2L)
      // batch 2: paraphrased re-crawl of 1 drops at the INDEX gate; a
      // genuinely-new doc and its within-batch near-dup collapse to the
      // representative, which is admitted and indexed
      input.addData(
        StreamDoc(3L, fox + " indeed", t("2024-05-25 11:00:00")),
        StreamDoc(4L, db, t("2024-05-25 11:00:10")),
        StreamDoc(5L, db + " today", t("2024-05-25 11:00:20")))
      q.processAllAvailable()
      admitted.sorted.toSeq shouldBe Seq(1L, 2L, 4L)
      // batch 3: a re-crawl of batch 2's survivor drops — proof that 4
      // was APPENDED to the index, not just admitted
      input.addData(
        StreamDoc(6L, db + " tomorrow", t("2024-05-25 12:00:00")))
      q.processAllAvailable()
      admitted.sorted.toSeq shouldBe Seq(1L, 2L, 4L)
    } finally q.stop()
  }

  test("ingestNewOnly admits only content absent from the previous snapshot") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val previous = Seq(
      (100L, "an old document we already have"),
      (101L, "another known text")).toDF("doc_id", "text")
    val input = MemoryStream[StreamDoc]
    val admitted = TextPipeline.ingestNewOnly(
      input.toDF(), "text", previous, "text")
    val query = admitted.writeStream
      .format("memory").queryName("ingest_out").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ingest-ckpt").toString)
      .start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      input.addData(
        StreamDoc(1L, "a genuinely new document", t("2024-05-25 10:00:00")),
        // byte-identical re-crawl of a known doc -> dropped
        StreamDoc(2L, "an old document we already have", t("2024-05-25 10:00:10")),
        // formatting-only re-crawl (same normalized content) -> dropped
        StreamDoc(3L, "Another   KNOWN text!", t("2024-05-25 10:00:20")),
        // real edit of known content -> admitted
        StreamDoc(4L, "another known text plus an edit", t("2024-05-25 10:00:30")),
        // failed fetch (null text) carries no content -> dropped
        StreamDoc(5L, null, t("2024-05-25 10:00:40")))
      query.processAllAvailable()
      spark.table("ingest_out").select("doc_id").as[Long].collect().sorted shouldBe
        Array(1L, 4L)
    } finally query.stop()
  }
}
