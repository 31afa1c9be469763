package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase
import graft.core.TripCorrelation
import graft.schema._
import graft.sink.TripTableSink

/** Real StreamingQuery runs: correlation lifecycle, faithful late-end
  * drop, event-time timeout eviction, and the full TripStreamJob wiring
  * (JSON decode → union → state → append sink).
  */
class StreamingCorrelationSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def mkStart(id: String, pickup: String) =
    TripStart(id, Some(1), Some(2), Some(1), Some(ts(pickup)),
      Some(ts(pickup)), Some(20.0))

  private def mkEnd(id: String, dropoff: String) =
    TripEnd(id, Some(ts(dropoff)), Some(1), Some(2), Some(3.0),
      Some(24.5), Some(2.0), Some(1), Some(1))

  test("streaming: lifecycle, late-end drop, event-time timeout eviction") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[TripEvent]
    val records = TripCorrelation.correlateStream(
      input.toDS(), faithful = true,
      timeoutMs = 60000L, watermarkDelay = "1 minute")
    val query = records.toDF().writeStream
      .format("memory").queryName("trips_out").outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt").toString)
      .start()
    def emitted() = spark.table("trips_out")
      .select("trip_id", "status").as[(String, String)].collect().toSeq
    try {
      // batch 1: t1 starts; late end for t9 (no start) must be dropped
      input.addData(
        TripEvent.ofStart(mkStart("t1", "2024-05-25 10:00:00")),
        TripEvent.ofEnd(mkEnd("t9", "2024-05-25 10:00:30")))
      query.processAllAvailable()
      emitted() should contain(("t1", TripSchemas.StatusStarted))
      emitted().map(_._1) should not contain "t9"

      // batch 2: t1 completes
      input.addData(TripEvent.ofEnd(mkEnd("t1", "2024-05-25 10:25:00")))
      query.processAllAvailable()
      emitted() should contain(("t1", TripSchemas.StatusCompleted))

      // batch 3: t2 starts and never ends
      input.addData(TripEvent.ofStart(mkStart("t2", "2024-05-25 10:30:00")))
      query.processAllAvailable()
      emitted() should contain(("t2", TripSchemas.StatusStarted))

      // batches 4-5: event time jumps far ahead; watermark passes
      // t2's (watermark + 60 s) timeout → evicted as Expired
      input.addData(TripEvent.ofStart(mkStart("t3", "2024-05-25 13:00:00")))
      query.processAllAvailable()
      input.addData(TripEvent.ofStart(mkStart("t4", "2024-05-25 13:30:00")))
      query.processAllAvailable()
      emitted() should contain(("t2", TripSchemas.StatusExpired))
      // completed trips are never evicted
      emitted() should not contain (("t1", TripSchemas.StatusExpired))
    } finally query.stop()
  }

  test("robust mode: an early end is buffered and completes on late start") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[TripEvent]
    val records = TripCorrelation.correlateStream(input.toDS(), faithful = false)
    val query = records.toDF().writeStream
      .format("memory").queryName("robust_out").outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt").toString)
      .start()
    try {
      input.addData(TripEvent.ofEnd(mkEnd("r1", "2024-05-25 10:25:00")))
      query.processAllAvailable()
      spark.table("robust_out").count() shouldBe 0 // buffered, not emitted
      input.addData(TripEvent.ofStart(mkStart("r1", "2024-05-25 10:00:00")))
      query.processAllAvailable()
      val rows = spark.table("robust_out")
        .select("trip_id", "status", "fare_amount").collect()
      rows.map(r => (r.getString(0), r.getString(1))) should contain(
        ("r1", TripSchemas.StatusCompleted))
    } finally query.stop()
  }

  test("robust mode: a buffered end with no start evicts as an Expired record") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[TripEvent]
    val records = TripCorrelation.correlateStream(input.toDS(), faithful = false,
      timeoutMs = 60000L, watermarkDelay = "1 minute")
    val query = records.toDF().writeStream
      .format("memory").queryName("robust_evict").outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt").toString)
      .start()
    try {
      input.addData(TripEvent.ofEnd(mkEnd("b1", "2024-05-25 10:00:00")))
      query.processAllAvailable()
      // advance watermark far past the buffered end's timeout
      input.addData(TripEvent.ofStart(mkStart("z1", "2024-05-25 13:00:00")))
      query.processAllAvailable()
      input.addData(TripEvent.ofStart(mkStart("z2", "2024-05-25 13:30:00")))
      query.processAllAvailable()
      val evicted = spark.table("robust_evict")
        .where($"trip_id" === "b1").collect()
      evicted should have size 1
      evicted.head.getAs[String]("status") shouldBe TripSchemas.StatusExpired
      evicted.head.getAs[Double]("fare_amount") shouldBe 24.5 // fare not lost
    } finally query.stop()
  }

  test("TripStreamJob: JSON streams through decode/union/state/append sink") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val startLines = MemoryStream[String]
    val endLines = MemoryStream[String]
    val table = Files.createTempDirectory("graft-stream").resolve("trips").toString
    val query = TripStreamJob.start(
      spark,
      startLines.toDF(), endLines.toDF(),
      table,
      Files.createTempDirectory("graft-ckpt").toString,
      trigger = Trigger.ProcessingTime("100 milliseconds"))
    try {
      startLines.addData(
        """{"trip_id":"s1","pickup_location_id":132,"dropoff_location_id":83,
           "vendor_id":1,"pickup_datetime":"2024-05-25 10:00:00",
           "estimated_dropoff_datetime":"2024-05-25 10:30:00",
           "estimated_fare_amount":25.1}""".replaceAll("\n\\s*", ""))
      query.processAllAvailable()
      // end arrives with the CSV's 5.0-style float quad (wire schema)
      endLines.addData(
        """{"trip_id":"s1","dropoff_datetime":"2024-05-25 10:25:00",
           "rate_code":1.0,"passenger_count":2.0,"trip_distance":3.1,
           "fare_amount":24.5,"tip_amount":2.0,"payment_type":1.0,
           "trip_type":1.0}""".replaceAll("\n\\s*", ""))
      // corrupt record must be skipped without killing the query
      endLines.addData("""{not json at all""")
      query.processAllAvailable()
      val merged = TripTableSink.readMerged(spark, table)
      val row = merged.where($"trip_id" === "s1").collect()
      row should have size 1
      row.head.getAs[String]("status") shouldBe TripSchemas.StatusCompleted
      row.head.getAs[Int]("rate_code") shouldBe 1
      row.head.getAs[Double]("fare_amount") shouldBe 24.5
      row.head.getAs[java.sql.Date]("date").toString shouldBe "2024-05-25"
    } finally query.stop()
  }

  test("startStreamJoin: window-bounded matches only; append sink receives the pair") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val startLines = MemoryStream[String]
    val endLines = MemoryStream[String]
    val out = Files.createTempDirectory("graft-ssj").resolve("joined").toString
    def startJson(id: String, ts: String) =
      s"""{"trip_id":"$id","pickup_location_id":1,"dropoff_location_id":2,
         |"vendor_id":1,"pickup_datetime":"$ts",
         |"estimated_dropoff_datetime":"$ts",
         |"estimated_fare_amount":10.0}""".stripMargin.replaceAll("\n", "")
    def endJson(id: String, ts: String) =
      s"""{"trip_id":"$id","dropoff_datetime":"$ts","rate_code":1.0,
         |"passenger_count":1.0,"trip_distance":1.0,"fare_amount":20.5,
         |"tip_amount":0.0,"payment_type":1.0,"trip_type":1.0}"""
        .stripMargin.replaceAll("\n", "")
    val query = TripStreamJob.startStreamJoin(
      spark, startLines.toDF(), endLines.toDF(), out,
      Files.createTempDirectory("graft-ssj-ckpt").toString,
      trigger = Trigger.ProcessingTime("100 milliseconds"),
      joinWindow = "1 hour")
    try {
      // in-window end matches; 2-hours-later end falls outside the
      // window; an end before pickup never matches
      startLines.addData(
        startJson("in", "2024-05-25 10:00:00"),
        startJson("late", "2024-05-25 10:00:00"),
        startJson("early", "2024-05-25 10:00:00"))
      endLines.addData(
        endJson("in", "2024-05-25 10:30:00"),
        endJson("late", "2024-05-25 12:00:00"),
        endJson("early", "2024-05-25 09:59:00"))
      query.processAllAvailable()
      val rows = spark.read.parquet(out)
        .select("trip_id", "fare_amount").collect()
        .map(r => (r.getString(0), r.getDouble(1)))
      rows.toSeq shouldBe Seq(("in", 20.5))
    } finally query.stop()
  }
}
