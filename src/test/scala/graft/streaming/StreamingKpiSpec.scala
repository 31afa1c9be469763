package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase
import graft.core.KpiAggregation

/** Top level so the Dataset encoder codegen-compiles (an inner case
  * class carries an outer pointer that defeats it).
  */
case class Trip(
    trip_id: String,
    status: String,
    pickup_datetime: Timestamp,
    fare_amount: Double)

/** Incremental daily KPIs: the A6 aggregation as a watermarked
  * streaming window (SURVEY.md §7.2 step 3).
  */
class StreamingKpiSpec extends AnyFunSuite with Matchers with SparkTestBase {

  test("windowed streaming aggregation matches the batch daily KPIs") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Trip]
    val kpis = KpiAggregation.dailyKpisStream(input.toDF())
    val query = kpis.writeStream
      .format("memory").queryName("daily_kpis").outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-kpi-ckpt").toString)
      .start()
    try {
      input.addData(
        Trip("a", "Completed", Timestamp.valueOf("2024-05-25 10:00:00"), 10.0),
        Trip("b", "Completed", Timestamp.valueOf("2024-05-25 23:59:59"), 30.0),
        Trip("c", "Started", Timestamp.valueOf("2024-05-25 11:00:00"), 99.0),
        Trip("d", "Completed", Timestamp.valueOf("2024-05-26 00:10:00"), 7.0))
      query.processAllAvailable()
      val out = spark.table("daily_kpis")
        .select("date", "total_fare", "count_trips", "average_fare",
          "max_fare", "min_fare")
        .collect()
        .map(r => r.getDate(0).toString ->
          (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
        .toMap
      out("2024-05-25") shouldBe ((40.0, 2L, 20.0, 30.0, 10.0))
      out("2024-05-26") shouldBe ((7.0, 1L, 7.0, 7.0, 7.0))

      // a later completion in an open window updates that day's row
      input.addData(
        Trip("e", "Completed", Timestamp.valueOf("2024-05-26 01:00:00"), 13.0))
      query.processAllAvailable()
      val day2 = spark.table("daily_kpis")
        .where($"date" === "2024-05-26")
        .orderBy($"count_trips".desc)
        .select("total_fare", "count_trips").head
      (day2.getDouble(0), day2.getLong(1)) shouldBe ((20.0, 2L))
    } finally query.stop()
  }

  test("streaming KPIs publish dated JSON docs via foreachBatch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val outDir = Files.createTempDirectory("graft-kpi-docs").toString
    val input = MemoryStream[Trip]
    val kpis = KpiAggregation.dailyKpisStream(input.toDF())
    val query = kpis.writeStream.outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-kpi-ckpt2").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.sink.KpiJsonSink.writeDaily(
          KpiAggregation.kpiDocument(batch), outDir): Unit
      }
      .start()
    try {
      input.addData(
        Trip("a", "Completed", Timestamp.valueOf("2024-05-25 10:00:00"), 10.0),
        Trip("b", "Completed", Timestamp.valueOf("2024-05-25 12:00:00"), 30.0))
      query.processAllAvailable()
      val doc = java.nio.file.Paths.get(outDir, "2024-05", "2024-05-25.json")
      Files.exists(doc) shouldBe true
      val json = Files.readString(doc)
      json should include(""""count_trips":2""")
      json should include(""""total_fare":40.0""")
    } finally query.stop()
  }
}
