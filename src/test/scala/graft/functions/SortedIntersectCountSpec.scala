package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SortedIntersectCount
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class SortedIntersectCountSpec extends AnyFunSuite with Matchers with SparkTestBase {

  test("equals size(array_intersect) on sorted distinct arrays") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "b", "c", "d"), Seq("b", "c", "x")),
      (2L, Seq("a", "b"), Seq("a", "b")),
      (3L, Seq("a"), Seq("z")),
      (4L, Seq.empty[String], Seq("a")),
      (5L, Seq("aa", "ab", "b"), Seq("ab", "b", "ba"))
    ).toDF("id", "a", "b")
    val out = df.select(col("id"),
      SortedIntersectCount.column(col("a"), col("b")).as("fast"),
      org.apache.spark.sql.functions.size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
      .collect()
    out.foreach { r => r.getLong(1) shouldBe r.getLong(2) }
    out.map(_.getLong(1)).toSeq shouldBe Seq(2L, 2L, 0L, 0L, 2L)
  }

  test("property: matches array_intersect on random sorted distinct sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      def set() = (0 until rnd.nextInt(20))
        .map(_ => s"t${rnd.nextInt(30)}").distinct.sorted
      (i.toLong, set(), set())
    }
    val df = rows.toDF("id", "a", "b")
    val bad = df.select(
      SortedIntersectCount.column(col("a"), col("b")).as("fast"),
      org.apache.spark.sql.functions.size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
      .where(col("fast") =!= col("builtin")).count()
    bad shouldBe 0L
  }

  test("null array yields null; null ELEMENTS are skipped, not matched") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq[Option[String]](None, Some("a"), Some("b"))),
        Some(Seq[Option[String]](None, Some("b")))),
      (2L, None: Option[Seq[Option[String]]],
        Some(Seq[Option[String]](Some("a"))))
    ).toDF("id", "a", "b")
    val out = df.select(SortedIntersectCount.column(col("a"), col("b")).as("c"))
      .collect()
    out(0).getLong(0) shouldBe 1L // "b" only; null-null is NOT a match
    out(1).isNullAt(0) shouldBe true
  }

  test("interpreted eval equals codegen") {
    import spark.implicits._
    val df = Seq((Seq("a", "c", "e"), Seq("b", "c", "e"))).toDF("a", "b")
    val codegen = df.select(SortedIntersectCount.column(col("a"), col("b")))
      .head.getLong(0)
    codegen shouldBe 2L
    // interpreted: eval the expression directly over Literal children
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val interp = SortedIntersectCount(
      Literal.create(Seq("a", "c", "e"), ArrayType(StringType)),
      Literal.create(Seq("b", "c", "e"), ArrayType(StringType))).eval(null)
    interp shouldBe 2L
  }

  test("registered SQL function works end-to-end") {
    SortedIntersectCount.register(spark)
    spark.sql(
      "SELECT sorted_intersect_count(array('a','b','c'), array('b','c','d')) AS c")
      .head.getLong(0) shouldBe 2L
  }
}
