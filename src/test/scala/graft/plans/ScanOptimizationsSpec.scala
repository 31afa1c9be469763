package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Pins two scan-side optimizations the 100 TB story leans on but no
  * query row can show directly:
  *
  *  - dynamic partition pruning: a fact table partitioned on the join
  *    key scans ONLY the partitions the filtered dim side selects —
  *    at warehouse scale this is the difference between reading one
  *    day and reading five years;
  *  - parquet aggregate pushdown: MIN/MAX/COUNT without filters
  *    answer from footer statistics, never materializing data pages.
  *
  * Both are config-and-layout products, not code — exactly the kind
  * of regression a refactor silently loses, hence the pins.
  */
class ScanOptimizationsSpec extends AnyFunSuite with Matchers with SparkTestBase {

  test("dynamic partition pruning fires on a partitioned fact join") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    (0 until 1000).map(i => (i.toLong, i % 10))
      .toDF("v", "part").write.partitionBy("part").parquet(s"$dir/fact")
    (0 until 10).map(i => (i, if (i < 2) "keep" else "drop"))
      .toDF("part", "tag").write.parquet(s"$dir/dim")
    val fact = spark.read.parquet(s"$dir/fact")
    val dim = spark.read.parquet(s"$dir/dim").where(col("tag") === "keep")
    val joined = fact.join(dim, Seq("part"))
    joined.queryExecution.executedPlan.toString should include("dynamicpruning")
    joined.count() shouldBe 200L // only partitions 0 and 1 survive
  }

  test("min/max/count push down to parquet footers when enabled") {
    import spark.implicits._
    val dir =
      s"${java.nio.file.Files.createTempDirectory("graft-aggpd")}/data"
    (1 to 1000).map(_.toLong).toDF("v").write.parquet(dir)
    // aggregate pushdown exists only on the DSv2 parquet path, so the
    // test scopes BOTH confs (v1-source opt-out + the pushdown flag)
    val aggKey = "spark.sql.parquet.aggregatePushdown"
    val v1Key = "spark.sql.sources.useV1SourceList"
    val prevAgg = spark.conf.get(aggKey, "false")
    val prevV1 = spark.conf.get(v1Key)
    try {
      spark.conf.set(aggKey, "true")
      spark.conf.set(v1Key,
        prevV1.split(",").filterNot(_.trim == "parquet").mkString(","))
      val agg = spark.read.parquet(dir).agg(
        min(col("v")).as("mn"), max(col("v")).as("mx"),
        count(lit(1)).as("n"))
      agg.queryExecution.executedPlan.toString should include("PushedAggregation")
      agg.head.toSeq shouldBe Seq(1L, 1000L, 1000L)
    } finally {
      spark.conf.set(aggKey, prevAgg)
      spark.conf.set(v1Key, prevV1)
    }
  }
}
