package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class SigMatchCountSpec extends AnyFunSuite with Matchers with SparkTestBase {

  test("matches the higher-order-function spelling, including nulls") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 4L)), // 3 matches
      (2L, Seq(5L, 5L), Seq(5L, 5L)), // all match
      (3L, Seq(1L, 2L), Seq(3L, 4L)) // none
    ).toDF("id", "a", "b")
    val out = df.select(col("id"),
      GraftFunctions.sigMatchCount(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, v) => acc + v).as("hof"))
      .collect()
    out.foreach { r => r.getInt(1) shouldBe r.getInt(2) }
    out.map(_.getInt(1)).toSeq shouldBe Seq(3, 2, 0)
  }

  test("registered SQL function works end-to-end") {
    org.apache.spark.sql.graft.SigMatchCount.register(spark)
    spark.sql("SELECT sig_match_count(array(1L,2L,3L), array(1L,9L,3L)) AS c")
      .head.getInt(0) shouldBe 2
  }

  test("null input yields null; interpreted path agrees with codegen") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq(1L, 2L)), None: Option[Seq[Long]]),
      (2L, Some(Seq(1L, 2L)), Some(Seq(1L, 2L)))).toDF("id", "a", "b")
    val rows = df.select(GraftFunctions.sigMatchCount(col("a"), col("b")).as("c"))
      .collect()
    rows(0).isNullAt(0) shouldBe true
    rows(1).getInt(0) shouldBe 2
    // interpreted (eval) path: same expression evaluated via a filter on
    // a literal frame with codegen disabled
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val c = df.select(GraftFunctions.sigMatchCount(col("a"), col("b")).as("c"))
        .collect()
      c(1).getInt(0) shouldBe 2
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }
}
