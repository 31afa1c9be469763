package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorOps
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class VectorOpsSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("dot_f64 is BIT-identical to the HOF spelling on float arrays") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.5f, -2.25f, 3.125f), Seq(0.5f, 4.0f, -1.75f)),
      (2L, Seq(0.1f, 0.2f, 0.3f), Seq(0.7f, 0.8f, 0.9f)),
      (3L, Seq.empty[Float], Seq.empty[Float])).toDF("id", "a", "b")
    val out = df.select(
      VectorOps.dot(col("a"), col("b")).as("fast"),
      hofDot(col("a"), col("b")).as("hof")).collect()
    // bit-identical, not approximately equal: same upcasts, same order
    out.foreach { r =>
      java.lang.Double.doubleToLongBits(r.getDouble(0)) shouldBe
        java.lang.Double.doubleToLongBits(r.getDouble(1))
    }
  }

  test("dot_f64 handles double arrays and mixed float/double inputs") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.5f, 2.5f, -3.0f))).toDF("id", "v")
    val q = typedLit(Seq(2.0, -1.0, 0.5))
    val r = df.select(
      VectorOps.dot(col("v"), q).as("fast"),
      hofDot(col("v"), q).as("hof"),
      VectorOps.dot(q, q).as("qq")).head
    r.getDouble(0) shouldBe r.getDouble(1)
    r.getDouble(2) shouldBe (4.0 + 1.0 + 0.25)
  }

  test("sqdist_f64 matches the HOF spelling bit-for-bit") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.5f, 2.5f, -3.0f))).toDF("id", "v")
    val c = Seq(0.25, 2.0, 1.5)
    val hof = aggregate(
      zip_with(col("v"), typedLit(c), (x, y) => {
        val d = x.cast("double") - y
        d * d
      }), lit(0.0), (acc, v) => acc + v)
    val r = df.select(
      VectorOps.sqdist(col("v"), typedLit(c)).as("fast"), hof.as("hof")).head
    java.lang.Double.doubleToLongBits(r.getDouble(0)) shouldBe
      java.lang.Double.doubleToLongBits(r.getDouble(1))
  }

  test("zip_with null semantics preserved: length mismatch and null elements poison") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq(Some(1.0f), Some(2.0f))), Some(Seq(Some(1.0f)))), // mismatch
      (2L, Some(Seq(Some(1.0f), None)), Some(Seq(Some(1.0f), Some(2.0f)))), // null elem
      (3L, None: Option[Seq[Option[Float]]], Some(Seq(Some(1.0f)))), // null array
      (4L, Some(Seq(Some(2.0f), Some(3.0f))), Some(Seq(Some(4.0f), Some(0.5f))))
    ).toDF("id", "a", "b")
    val rows = df.orderBy("id")
      .select(VectorOps.dot(col("a"), col("b")).as("d")).collect()
    rows(0).isNullAt(0) shouldBe true
    rows(1).isNullAt(0) shouldBe true
    rows(2).isNullAt(0) shouldBe true
    rows(3).getDouble(0) shouldBe 9.5
  }

  test("interpreted (eval) path agrees with codegen; SQL registration works") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("id", "a", "b")
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      df.select(VectorOps.dot(col("a"), col("b"))).head.getDouble(0) shouldBe 11.0
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    VectorOps.register(spark)
    spark.sql("SELECT dot_f64(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head.getDouble(0) shouldBe 11.0
    spark.sql("SELECT sqdist_f64(array(1.0D, 2.0D), array(3.0D, 0.0D)) AS d")
      .head.getDouble(0) shouldBe 8.0
  }
}
