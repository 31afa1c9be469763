package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class AsofJoinSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin picks the latest right row at-or-before each left row") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")), // after two clicks
      (2L, "u1", ts("2024-01-01 08:00:00")), // exactly at a click (<=)
      (3L, "u1", ts("2024-01-01 07:00:00")), // before any click
      (4L, "u2", ts("2024-01-01 12:00:00")), // other key
      (5L, "u3", ts("2024-01-01 12:00:00"))  // key with no right rows
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      ("u1", ts("2024-01-01 08:00:00"), 10.0),
      ("u1", ts("2024-01-01 09:30:00"), 20.0),
      ("u2", ts("2024-01-01 11:00:00"), 30.0)
    ).toDF("user_id", "ts", "value")
    val out = AsofJoin.asofJoin(left, right, "user_id", "ts", "ts", Seq("value"))
      .orderBy("event_id")
      .select("event_id", "asof_value")
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
    out shouldBe Array(
      1L -> Some(20.0), // latest of the two preceding clicks
      2L -> Some(10.0), // equal timestamp matches
      3L -> None, // nothing precedes
      4L -> Some(30.0),
      5L -> None)
  }

  test("asofJoin null times and keys never match (DuckDB ASOF semantics)") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")), // normal match
      (2L, "u1", null.asInstanceOf[Timestamp]), // null leftTime -> no match
      (3L, null.asInstanceOf[String], ts("2024-01-01 10:00:00")) // null key -> no match
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      ("u1", ts("2024-01-01 08:00:00"), 10.0),
      ("u1", null.asInstanceOf[Timestamp], 99.0), // null rightTime: dropped
      (null.asInstanceOf[String], ts("2024-01-01 07:00:00"), 98.0) // null key: dropped
    ).toDF("user_id", "ts", "value")
    val out = AsofJoin.asofJoin(left, right, "user_id", "ts", "ts", Seq("value"))
      .orderBy("event_id")
      .select("event_id", "asof_value")
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
    out shouldBe Array(1L -> Some(10.0), 2L -> None, 3L -> None)
  }

  test("asofJoin output is deterministic and keeps all left rows") {
    import spark.implicits._
    val left = (1 to 200).map(i =>
      (i.toLong, s"u${i % 7}", ts(f"2024-01-01 ${i % 24}%02d:00:00"))).toDF("id", "k", "t")
    val right = (1 to 50).map(i =>
      (s"u${i % 7}", ts(f"2024-01-01 ${(i * 3) % 24}%02d:30:00"), i.toDouble)).toDF("k", "t", "v")
    val a = AsofJoin.asofJoin(left, right, "k", "t", "t", Seq("v"))
    a.count() shouldBe 200
    val b = AsofJoin.asofJoin(left.repartition(13), right.repartition(3), "k", "t", "t", Seq("v"))
    a.orderBy("id").collect() shouldBe b.orderBy("id").collect()
  }
}
