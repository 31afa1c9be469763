package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** [[Prefix]] replaces every unpartitioned `Window.orderBy` (the
  * one-task WindowExec funnel) with a two-branch prefix pass. The
  * contract under test: BOTH branches produce exactly the values the
  * global window produced — running totals and row numbers depend only
  * on the total order, never on partition boundaries or branch choice.
  */
class PrefixSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def frame(n: Int, parts: Int) = {
    import spark.implicits._
    // non-monotone key order, unique keys, values with nulls
    (1 to n).map { i =>
      val key = (i * 7919) % n // permutation of 0..n-1 (n coprime ok for n not multiple of 7919)
      (key.toLong, if (i % 13 == 0) None else Some(i.toLong))
    }.toDF("k", "v").repartition(parts)
  }

  private def reference(n: Int) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("k"))
    frame(n, 5)
      .withColumn("ref_sum",
        coalesce(sum(col("v")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), lit(0L)))
      .withColumn("ref_rn", row_number().over(w).cast("long"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
  }

  test("small branch matches the global-window reference exactly") {
    val n = 500
    val ref = reference(n)
    val got = Prefix.withRunningTotals(frame(n, 5), Seq(col("k")),
        totals = Seq(col("v") -> "s"), rowNumberCol = Some("rn"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    got shouldBe ref
  }

  test("large branch (forced) matches the reference exactly") {
    val n = 500
    val ref = reference(n)
    val key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "1b") // every frame is "too big" -> range branch
      val got = Prefix.withRunningTotals(frame(n, 5), Seq(col("k")),
          totals = Seq(col("v") -> "s"), rowNumberCol = Some("rn"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
      got shouldBe ref
    } finally spark.conf.set(key, old)
  }

  test("large branch plans no unpartitioned window and no single-partition funnel") {
    val key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "1b")
      val out = Prefix.withRunningTotals(frame(512, 7), Seq(col("k")),
        totals = Seq(col("v") -> "s"))
      val plan = out.queryExecution.executedPlan.toString
      plan should not include "Window"
      // the accumulating pass runs over the range partitions, plural
      out.rdd.getNumPartitions should be > 1
      // descending order works through repartitionByRange too
      val desc = Prefix.withRunningTotals(frame(512, 7), Seq(col("k").desc),
          totals = Seq(col("v") -> "s"), rowNumberCol = Some("rn"))
        .orderBy(col("k")).collect()
      desc.last.getLong(desc.head.schema.fieldIndex("rn")) shouldBe 1L
    } finally spark.conf.set(key, old)
  }

  test("boundedExclusiveOffsets matches a driver-side prefix on string and long keys") {
    import spark.implicits._
    val g = Seq(("0a", 5L), ("00", 2L), ("ff", 9L), ("3c", 1L)).toDF("k", "t")
    val got = Prefix.boundedExclusiveOffsets(g, "k", "t", "base")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe Map("00" -> 0L, "0a" -> 2L, "3c" -> 7L, "ff" -> 8L)
    val gl = Seq((3L, 4L), (1L, 2L), (2L, 10L)).toDF("k", "t")
    val gotL = Prefix.boundedExclusiveOffsets(gl, "k", "t", "base")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    gotL shouldBe Map(1L -> 0L, 2L -> 2L, 3L -> 12L)
  }
}
