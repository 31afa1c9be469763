package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase
import graft.ext.{Dedup, TextAnalysis}

/** Top level so the Dataset encoder codegen-compiles. */
case class StreamDoc(doc_id: Long, text: String, ts: Timestamp)

/** Ingestion-time exact dedup ([[Dedup.streamingExact]]): first
  * arrival of a content fingerprint wins within the watermark horizon;
  * state is evicted once the watermark passes, so a re-crawl of old
  * content past the horizon is admitted again (bounded state, not a
  * forever-set).
  */
class StreamingDedupSpec extends AnyFunSuite with Matchers with SparkTestBase {

  test("duplicates within the horizon dropped; state evicted past it") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[StreamDoc]
    val deduped = Dedup.streamingExact(
      input.toDF().withColumn("__fp", TextAnalysis.fingerprintMd5(col("text"))),
      on = Seq("__fp"), eventTimeCol = "ts", delay = "10 minutes")
    val query = deduped.writeStream
      .format("memory").queryName("dedup_out").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-dedup-ckpt").toString)
      .start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      // batch 1: A, B, and an in-batch near-arrival duplicate of A
      // (same text → same fingerprint, different id)
      input.addData(
        StreamDoc(1L, "alpha document", t("2024-05-25 10:00:00")),
        StreamDoc(2L, "beta document", t("2024-05-25 10:00:30")),
        StreamDoc(3L, "alpha document", t("2024-05-25 10:01:00")))
      query.processAllAvailable()
      // batch 2/3: advance the watermark past A's expiry
      // (first-seen 10:00 + 10 min = 10:10 < watermark 11:50)
      input.addData(StreamDoc(4L, "gamma document", t("2024-05-25 12:00:00")))
      query.processAllAvailable()
      input.addData(StreamDoc(5L, "delta document", t("2024-05-25 12:10:00")))
      query.processAllAvailable()
      // batch 4: the same alpha content re-crawled PAST the horizon —
      // its state is gone, so it is admitted again
      input.addData(StreamDoc(6L, "alpha document", t("2024-05-25 12:05:00")))
      query.processAllAvailable()

      val out = spark.table("dedup_out")
        .select("doc_id").as[Long].collect().sorted
      // doc 3 (in-horizon duplicate) is the only drop; doc 6 re-admits
      out shouldBe Array(1L, 2L, 4L, 5L, 6L)
    } finally query.stop()
  }
}
