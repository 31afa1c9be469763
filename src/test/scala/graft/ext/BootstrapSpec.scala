package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class BootstrapSpec extends AnyFunSuite with Matchers with SparkTestBase {

  test("PoissonCum is the Poisson(1) CDF; weights distribute like Poisson(1)") {
    import spark.implicits._
    // closed form: c0 = 1/e, c1 = 2/e
    Bootstrap.PoissonCum(0) shouldBe math.exp(-1.0) +- 1e-15
    Bootstrap.PoissonCum(1) shouldBe 2 * math.exp(-1.0) +- 1e-15
    Bootstrap.PoissonCum.last shouldBe 1.0 +- 2e-7 // P(X > 9) ≈ 1.1e-7
    // empirical: weights of 100k md5 uniforms ~ Poisson(1)
    val n = 100000
    val w = spark.range(n).toDF("id")
      .select(Bootstrap.poissonWeight(
        conv(substring(md5(col("id").cast("string")), 1, 12), 16, 10)
          .cast("long").cast("double") / lit(281474976710656.0)).as("w"))
      .groupBy("w").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    val p0 = w.getOrElse(0, 0L).toDouble / n
    p0 shouldBe math.exp(-1.0) +- 0.01
    val mean = w.map { case (k, c) => k.toLong * c }.sum.toDouble / n
    mean shouldBe 1.0 +- 0.02
  }

  test("poissonWeightSql mirrors the column expression through DuckDB-free eval") {
    import spark.implicits._
    // evaluate the GENERATED SQL chain via Spark's own SQL parser on a
    // grid of uniforms: both spellings must agree everywhere
    val grid = (0 until 1000).map(i => i / 1000.0).toDF("u")
    val viaSql = grid.selectExpr(s"${Bootstrap.poissonWeightSql("u")} AS w")
      .as[Int].collect()
    val viaCol = grid.select(Bootstrap.poissonWeight(col("u")).as("w"))
      .as[Int].collect()
    viaSql.toSeq shouldBe viaCol.toSeq
  }

  test("poissonBootstrapCi: interval brackets the mean, narrows with n, deterministic") {
    import spark.implicits._
    // group a: 2000 values ~ spread; group b: same distribution, 125 values
    val rows = (1 to 2000).map(i => (i.toLong, "a", (i % 100).toLong)) ++
      (1 to 125).map(i => (10000L + i, "b", (i % 100).toLong))
    val df = rows.toDF("id", "g", "v")
    val out = Bootstrap.poissonBootstrapCi(df, "id", col("v"), "g")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    out.foreach { case (_, _, mean, lo, hi) =>
      lo should be < mean
      hi should be > mean
    }
    // same per-value spread, 16x the rows -> roughly 4x tighter interval
    val widthA = out(0)._5 - out(0)._4
    val widthB = out(1)._5 - out(1)._4
    widthB / widthA should be > 2.0
    widthB / widthA should be < 8.0
    // bit-deterministic under repartitioning
    val again = Bootstrap.poissonBootstrapCi(df.repartition(13), "id", col("v"), "g")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    again.toSeq shouldBe out.toSeq
  }
}
