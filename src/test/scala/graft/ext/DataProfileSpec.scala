package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class DataProfileSpec extends AnyFunSuite with Matchers with SparkTestBase {

  test("profile: nulls, exact distincts, NATIVE-typed min/max (not lexicographic)") {
    import spark.implicits._
    val df = Seq(
      (Some(9L), Some("b"), Some(1.5)),
      (Some(10L), None, Some(-2.0)),
      (None, Some("a"), Some(1.5))
    ).toDF("n", "s", "d")
    val out = DataProfile.profile(df, Seq("n", "s", "d"))
      .orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
    // numeric min/max computed as numbers: 9 < 10 even though "10" < "9"
    out.toSeq shouldBe Seq(
      ("d", 0L, 2L, "-2.0", "1.5"),
      ("n", 1L, 2L, "9", "10"),
      ("s", 1L, 2L, "a", "b"))
  }

  test("psi: identical samples ~0; a shifted sample alarms; drifting bin visible") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, sum => sqlSum}
    val ref = (1 to 1000).map(i => i % 100 / 100.0).toDF("m")
    // identical distribution: every term ~0 (smoothing only)
    val same = DataProfile.psi(ref, ref, col("m"))
      .agg(sqlSum(col("psi_term"))).head.getDouble(0)
    math.abs(same) should be < 1e-9
    // shift half the mass up by 0.5: PSI must cross the 0.25
    // "investigate" threshold, and the top bin must gain mass
    val drifted = (1 to 1000)
      .map(i => math.min(0.999, i % 100 / 100.0 + (if (i % 2 == 0) 0.5 else 0.0)))
      .toDF("m")
    val rows = DataProfile.psi(ref, drifted, col("m"))
      .orderBy("bin").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    rows.map(_._4).sum should be > 0.25
    rows.last._3 should be > rows.last._2 // top decile gained mass
    rows.map(_._1).toSeq shouldBe (0 until 10)
    rows.map(_._2).sum shouldBe 1000L
    // every term is finite even where a current bin is empty
    rows.foreach(r => r._4.isNaN shouldBe false)
  }

  test("profile rejects unknown columns") {
    import spark.implicits._
    val df = Seq(1).toDF("x")
    an[IllegalArgumentException] should be thrownBy
      DataProfile.profile(df, Seq("nope"))
  }
}
