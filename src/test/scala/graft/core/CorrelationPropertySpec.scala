package graft.core

import java.sql.Timestamp

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.schema._

/** Property-based invariants of the correlation state machine
  * (SURVEY.md §5), over seeded random interleavings / duplications of
  * start-end events: (a) Completed implies both events were seen,
  * (b) replaying the same stream is idempotent, (c) faithful mode never
  * completes a trip from a null-quad end.
  */
class CorrelationPropertySpec extends AnyFunSuite with Matchers {

  private def ts(minute: Int) =
    Timestamp.valueOf(f"2024-05-25 10:$minute%02d:00")

  private def mkStart(id: String) =
    TripStart(id, Some(1), Some(2), Some(1), Some(ts(0)), Some(ts(30)), Some(20.0))

  private def mkEnd(id: String, nullQuad: Boolean, fare: Double) =
    TripEnd(id, Some(ts(25)),
      if (nullQuad) None else Some(1), if (nullQuad) None else Some(2),
      Some(3.0), Some(fare), Some(1.0),
      if (nullQuad) None else Some(1), if (nullQuad) None else Some(1))

  private def genEvents(rnd: Random, n: Int): Seq[TripEvent] =
    Seq.fill(n) {
      val id = s"t${rnd.nextInt(3) + 1}"
      if (rnd.nextBoolean()) TripEvent.ofStart(mkStart(id))
      else TripEvent.ofEnd(mkEnd(id, rnd.nextInt(4) == 0, 10.0 + rnd.nextInt(80)))
    }

  /** Replay through the pure step function, per key, in stream order. */
  private def run(events: Seq[TripEvent], faithful: Boolean): Map[String, TripRecord] =
    events.groupBy(_.trip_id).flatMap { case (id, evs) =>
      var st = TripCorrelation.CorrelationState(None, None)
      evs.foreach { ev => st = TripCorrelation.step(st, ev, faithful)._1 }
      st.record.map(id -> _)
    }

  test("Completed implies a start and a gate-passing end were seen") {
    val rnd = new Random(42)
    for (_ <- 1 to 300; faithful <- Seq(true, false)) {
      val events = genEvents(rnd, rnd.nextInt(12))
      run(events, faithful).foreach { case (id, rec) =>
        if (rec.status == TripSchemas.StatusCompleted) {
          withClue(s"events=$events id=$id faithful=$faithful: ") {
            events.exists(e => e.trip_id == id && e.kind == TripEvent.KindStart) shouldBe true
            val gateOkEnds = events
              .filter(e => e.trip_id == id && e.kind == TripEvent.KindEnd)
              .flatMap(_.end)
              .filter(e => !faithful || e.telemetryComplete)
            gateOkEnds should not be empty
            rec.fare_amount.isDefined shouldBe true
          }
        }
      }
    }
  }

  test("replay idempotency: extra replays do not change final statuses") {
    val rnd = new Random(7)
    for (_ <- 1 to 300) {
      val events = genEvents(rnd, rnd.nextInt(12))
      val twice = run(events ++ events, faithful = true)
        .view.mapValues(_.status).toMap
      val thrice = run(events ++ events ++ events, faithful = true)
        .view.mapValues(_.status).toMap
      withClue(s"events=$events: ") { twice shouldBe thrice }
    }
  }

  test("faithful mode: a null-quad end never completes its trip") {
    val rnd = new Random(13)
    for (_ <- 1 to 300) {
      val events = genEvents(rnd, rnd.nextInt(12)).map {
        case e if e.kind == TripEvent.KindEnd =>
          e.copy(end = e.end.map(_.copy(
            rate_code = None, passenger_count = None,
            payment_type = None, trip_type = None)))
        case e => e
      }
      run(events, faithful = true).values.foreach { rec =>
        withClue(s"events=$events: ") {
          rec.status should not be TripSchemas.StatusCompleted
        }
      }
    }
  }
}
