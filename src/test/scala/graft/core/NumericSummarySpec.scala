package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Guards on the exact-moment summary path: the s2 − s1²/n subtraction
  * is clamped (catastrophic cancellation on high-mean/low-variance data
  * can land a hair negative → sqrt → NaN) and n = 1 yields NULL (sample
  * stddev undefined; DuckDB agrees, Spark's legacy behavior was a
  * divide-by-zero null anyway).
  */
class NumericSummarySpec extends AnyFunSuite with Matchers with SparkTestBase {

  test("constant high-mean column: stddev is 0.0, never NaN") {
    import spark.implicits._
    // mean 9,999,999.99 with zero variance — the worst case for the
    // moment subtraction once the exact decimals round to double
    val df = Seq.fill(1000)(9999999.99).toDF("x")
    val row = KpiAggregation.numericSummary(df, Seq("x"), fixedPointScale = Some(2))
      .select("stddev").head
    row.isNullAt(0) shouldBe false
    val sd = row.getDouble(0)
    sd.isNaN shouldBe false
    sd shouldBe 0.0
  }

  test("n = 1: stddev is NULL, mean is the value") {
    import spark.implicits._
    val df = Seq(42.5).toDF("x")
    val row = KpiAggregation.numericSummary(df, Seq("x"), fixedPointScale = Some(2))
      .select("mean", "stddev").head
    row.getDouble(0) shouldBe 42.5
    row.isNullAt(1) shouldBe true
  }
}
