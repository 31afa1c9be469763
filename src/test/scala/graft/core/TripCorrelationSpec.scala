package graft.core

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase
import graft.schema._

/** FIXTURES.md §6 correlation scenarios against the shared step logic
  * (batch replay harness) plus the batch-join duplicate-end guard.
  */
class TripCorrelationSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def mkStart(id: String, pickup: String = "2024-05-25 10:00:00") =
    TripStart(id, Some(132), Some(83), Some(1), Some(ts(pickup)),
      Some(ts("2024-05-25 10:30:00")), Some(25.0))

  private def mkEnd(
      id: String,
      dropoff: String = "2024-05-25 10:25:00",
      nullQuad: Boolean = false,
      fare: Double = 24.5) =
    TripEnd(id, Some(ts(dropoff)),
      if (nullQuad) None else Some(1),
      if (nullQuad) None else Some(2),
      Some(3.1), Some(fare), Some(2.0),
      if (nullQuad) None else Some(1),
      if (nullQuad) None else Some(1))

  private def replay(events: Seq[TripEvent], faithful: Boolean = true): Seq[TripRecord] = {
    import spark.implicits._
    TripCorrelation.correlateBatchViaState(
      spark.createDataset(events), faithful).collect().toSeq
  }

  test("scenario 1: start then end completes the trip") {
    val out = replay(Seq(
      TripEvent.ofStart(mkStart("t1")), TripEvent.ofEnd(mkEnd("t1"))))
    out.map(_.status) shouldBe Seq(TripSchemas.StatusCompleted)
    out.head.fare_amount shouldBe Some(24.5)
    out.head.date.map(_.toString) shouldBe Some("2024-05-25")
  }

  test("scenario 2: end-before-start dropped in faithful mode, buffered in robust") {
    // Note: correlateBatchViaState replays starts first within a group
    // (producer skew), so use step() directly for true end-first order.
    val st0 = TripCorrelation.CorrelationState(None, None)
    val (st1, out1) = TripCorrelation.step(st0, TripEvent.ofEnd(mkEnd("t2")), faithful = true)
    out1 shouldBe empty
    st1.record shouldBe None // F3: dropped forever
    val (st2, out2) = TripCorrelation.step(st0, TripEvent.ofEnd(mkEnd("t2")), faithful = false)
    out2 shouldBe empty
    st2.bufferedEnd.isDefined shouldBe true // robust: buffered
    val (st3, out3) = TripCorrelation.step(st2, TripEvent.ofStart(mkStart("t2")), faithful = false)
    out3.map(_.status) shouldBe Seq(TripSchemas.StatusCompleted)
    st3.record.map(_.status) shouldBe Some(TripSchemas.StatusCompleted)
  }

  test("scenario 3: null telemetry quad never completes in faithful mode") {
    val out = replay(Seq(
      TripEvent.ofStart(mkStart("t3")),
      TripEvent.ofEnd(mkEnd("t3", nullQuad = true))))
    out.map(_.status) shouldBe Seq(TripSchemas.StatusStarted)
    // robust mode completes; downstream KPI filters decide
    val rob = replay(Seq(
      TripEvent.ofStart(mkStart("t3")),
      TripEvent.ofEnd(mkEnd("t3", nullQuad = true))), faithful = false)
    rob.map(_.status) shouldBe Seq(TripSchemas.StatusCompleted)
  }

  test("scenario 4: duplicate replays are idempotent last-write-wins") {
    val out = replay(Seq(
      TripEvent.ofStart(mkStart("t4")),
      TripEvent.ofEnd(mkEnd("t4", fare = 10.0)),
      TripEvent.ofEnd(mkEnd("t4", fare = 99.0))))
    out should have size 1
    out.head.status shouldBe TripSchemas.StatusCompleted
    out.head.fare_amount shouldBe Some(99.0) // last write wins
  }

  test("scenario 6: malformed union row is skipped") {
    val (st, out) = TripCorrelation.step(
      TripCorrelation.CorrelationState(None, None),
      TripEvent("tX", "start", None, None, None), faithful = true)
    out shouldBe empty
    st.record shouldBe None
  }

  test("batch correlate: duplicate end events yield one output row per trip") {
    import spark.implicits._
    val starts = Seq(mkStart("t5")).toDF()
    val ends = Seq(
      mkEnd("t5", dropoff = "2024-05-25 10:25:00", fare = 10.0),
      mkEnd("t5", dropoff = "2024-05-25 11:00:00", fare = 50.0)).toDF()
    val out = TripCorrelation.correlate(starts, ends).collect()
    out should have size 1
    out.head.getAs[Double]("fare_amount") shouldBe 50.0 // latest dropoff wins
  }

  test("batch correlate: duplicate start events also yield one row per trip") {
    import spark.implicits._
    val starts = Seq(
      mkStart("t6", pickup = "2024-05-25 09:00:00"),
      mkStart("t6", pickup = "2024-05-25 10:00:00")).toDF()
    val ends = Seq(mkEnd("t6")).toDF()
    val out = TripCorrelation.correlate(starts, ends).collect()
    out should have size 1
    out.head.getAs[java.sql.Timestamp]("pickup_datetime") shouldBe
      ts("2024-05-25 10:00:00") // latest start wins
  }

  test("batch correlate matches reference counts on tiny mixed input") {
    import spark.implicits._
    val starts = Seq(mkStart("a"), mkStart("b"), mkStart("c")).toDF()
    val ends = Seq(mkEnd("a"), mkEnd("b", nullQuad = true), mkEnd("zz")).toDF()
    val out = TripCorrelation.correlate(starts, ends)
    out.where($"status" === TripSchemas.StatusCompleted).count() shouldBe 1
    out.where($"status" === TripSchemas.StatusStarted).count() shouldBe 2
    TripCorrelation.droppedEnds(starts, ends).count() shouldBe 1
  }
}
