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
