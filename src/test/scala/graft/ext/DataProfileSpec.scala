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

  test("profile rejects unknown columns") {
    import spark.implicits._
    val df = Seq(1).toDF("x")
    an[IllegalArgumentException] should be thrownBy
      DataProfile.profile(df, Seq("nope"))
  }
}
