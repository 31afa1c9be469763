package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class FirstMatchingBandSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def fmb(a: Seq[Long], b: Seq[Long], r: Int): Option[Int] = {
    import spark.implicits._
    val row = Seq((a, b)).toDF("a", "b")
      .select(GraftFunctions.firstMatchingBand(col("a"), col("b"), lit(r)).as("f"))
      .head
    if (row.isNullAt(0)) None else Some(row.getInt(0))
  }

  test("first fully-agreeing band wins; partial agreement does not") {
    // r=2: bands are [0,1] [2,3] [4,5]
    fmb(Seq(1L, 2L, 3L, 4L, 5L, 6L), Seq(1L, 2L, 9L, 9L, 5L, 6L), 2) shouldBe Some(0)
    fmb(Seq(1L, 2L, 3L, 4L, 5L, 6L), Seq(9L, 2L, 3L, 4L, 5L, 6L), 2) shouldBe Some(1)
    fmb(Seq(1L, 2L, 3L, 4L, 5L, 6L), Seq(1L, 9L, 3L, 9L, 5L, 6L), 2) shouldBe Some(2)
    fmb(Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 9L), 2) shouldBe Some(-1)
  }

  test("identical signatures match at band 0; r=1 is per-component") {
    fmb(Seq(7L, 8L), Seq(7L, 8L), 1) shouldBe Some(0)
    fmb(Seq(7L, 8L), Seq(9L, 8L), 1) shouldBe Some(1)
  }

  test("interpreted path agrees with codegen") {
    import spark.implicits._
    val df = Seq((Seq(1L, 2L, 3L, 4L), Seq(9L, 9L, 3L, 4L))).toDF("a", "b")
    val expr = GraftFunctions.firstMatchingBand(col("a"), col("b"), lit(2)).as("f")
    val gen = df.select(expr).head.getInt(0)
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try df.select(expr).head.getInt(0) shouldBe gen
    finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    gen shouldBe 1
  }

  test("rowsPerBand <= 0 throws instead of matching every pair at band 0") {
    // Spark may wrap the expression's exception; check the cause chain
    def rootMsg(t: Throwable): String = {
      var c = t
      while (c.getCause != null && c.getCause != c) c = c.getCause
      String.valueOf(c.getMessage)
    }
    rootMsg(intercept[Exception](fmb(Seq(1L, 2L), Seq(3L, 4L), 0))) should
      include("rowsPerBand must be positive")
    rootMsg(intercept[Exception](fmb(Seq(1L, 2L), Seq(3L, 4L), -1))) should
      include("rowsPerBand must be positive")
  }

  test("null input yields null") {
    import spark.implicits._
    val df = Seq((Some(Seq(1L, 2L)), None: Option[Seq[Long]])).toDF("a", "b")
    df.select(GraftFunctions.firstMatchingBand(col("a"), col("b"), lit(1)))
      .head.isNullAt(0) shouldBe true
  }
}
