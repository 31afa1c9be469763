package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class RangeJoinSpec extends AnyFunSuite with Matchers with SparkTestBase {

  // deterministic intervals, including negatives and shared keys
  private def intervals(n: Int, seed: Long): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val s = ((i * 2654435761L + seed) % 2000) - 1000 // [-1000, 1000)
      val len = (i * 40503L + seed) % 97
      (i.toLong, "k" + (i % 3), s, s + len)
    }.toDF("id", "key", "st", "en")
  }

  private def naive(l: DataFrame, r: DataFrame, keyed: Boolean): Set[(Long, Long)] = {
    val rr = r.select(col("id").as("rid"), col("key").as("rkey"),
      col("st").as("rst"), col("en").as("ren"))
    val cond = (if (keyed) col("key") === col("rkey") else lit(true)) &&
      col("st") <= col("ren") && col("rst") <= col("en")
    l.join(rr, cond).select("id", "rid").collect()
      .map(row => (row.getLong(0), row.getLong(1))).toSet
  }

  test("overlapJoin equals the naive theta join for every bucket width") {
    val l = intervals(200, 1)
    val r = intervals(150, 77)
    val expected = naive(l, r, keyed = true)
    expected should not be empty
    for (bucket <- Seq(1L, 7L, 64L, 1000L, 100000L)) {
      val got = RangeJoin.overlapJoin(l, r, "st", "en", bucket, Seq("key"))
        .select(col("id"), col("r_id")).collect()
        .map(row => (row.getLong(0), row.getLong(1)))
      got.length shouldBe got.toSet.size // ownership dedup: no duplicate pairs
      got.toSet shouldBe expected
    }
  }

  test("overlapJoin without keys matches the unkeyed theta join") {
    val l = intervals(80, 3)
    val r = intervals(60, 9)
    val got = RangeJoin.overlapJoin(l, r, "st", "en", bucket = 50)
      .select(col("id"), col("r_id")).collect()
      .map(row => (row.getLong(0), row.getLong(1))).toSet
    got shouldBe naive(l, r, keyed = false)
  }

  test("null and inverted intervals drop; touching endpoints count as overlap") {
    import spark.implicits._
    val l = Seq((1L, Some(0L), Some(10L)), (2L, Some(20L), Some(15L)),
      (3L, None, Some(5L))).toDF("id", "st", "en")
      .select(col("id"), col("st"), col("en"))
    val r = Seq((9L, 10L, 12L)).toDF("id", "st", "en")
    val got = RangeJoin.overlapJoin(l, r, "st", "en", bucket = 4)
      .select("id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1)))
    got.toSeq shouldBe Seq((1L, 9L)) // [0,10] touches [10,12]; others drop
  }

  test("the bucketed plan is an equi-join, not a nested-loop join") {
    val l = intervals(50, 1)
    val r = intervals(50, 2)
    val plan = RangeJoin.overlapJoin(l, r, "st", "en", 64, Seq("key"))
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    // the naive spelling, for contrast, nested-loops
    val naivePlan = l.join(r.select(col("st").as("rst"), col("en").as("ren")),
      col("st") <= col("ren") && col("rst") <= col("en"))
      .queryExecution.executedPlan.toString
    naivePlan should include("BroadcastNestedLoopJoin")
  }
}
