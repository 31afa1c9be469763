package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-keyed sampling and dataset splitting.
  *
  * Training-data pipelines need samples and train/val/test splits that
  * are (a) reproducible across runs and cluster layouts — `rand()` is
  * neither — and (b) keyed on CONTENT, so the same document lands in the
  * same split even after re-crawls or repartitioning. Both are built on
  * the md5 hex prefix of the key column: uniformly distributed, engine-
  * independent, and comparable as a plain string, so thresholds are
  * lexicographic hex bounds (each leading hex pair = 1/256 of mass).
  * Pure codegen column algebra; at scale this is a free filter pushed
  * into the scan projection.
  */
object Sampling {

  /** md5-hex of the key column — the sampling/splitting coordinate. */
  def contentKey(key: Column): Column = md5(key.cast("string"))

  /** Keep rows whose content key is below `hexUpperBound` (e.g. "0d" ≈
    * 13/256 ≈ 5.1% of rows). Stable under any repartitioning.
    */
  def contentSample(df: DataFrame, keyCol: String, hexUpperBound: String): DataFrame =
    df.where(contentKey(col(keyCol)) < lit(hexUpperBound.toLowerCase))

  /** Assign a deterministic split label from hex bounds: key < testBound
    * → "test", < valBound → "val", else "train". Bounds are two-char hex
    * prefixes; e.g. ("0d", "1a") ≈ 5% test, 5% val, 90% train.
    */
  def contentSplit(
      df: DataFrame,
      keyCol: String,
      testBound: String = "0d",
      valBound: String = "1a",
      labelCol: String = "split"): DataFrame = {
    val k = contentKey(col(keyCol))
    df.withColumn(labelCol,
      when(k < lit(testBound.toLowerCase), "test")
        .when(k < lit(valBound.toLowerCase), "val")
        .otherwise("train"))
  }

  /** Deterministic k-per-group sample: for each value of `groupCol`,
    * keep the `k` rows ranking lowest by md5(keyCol) (ties by key) —
    * the balanced-sampling primitive (k docs per language / domain /
    * source) that `rand()`-based `sampleBy` can't reproduce across
    * runs or partitionings. The md5 coordinate makes the choice
    * pseudo-random but engine-independent, so an external system (or
    * the DuckDB oracle) selects the identical rows.
    *
    * Shape at scale: one shuffle on `groupCol` + a rank window; rows
    * beyond rank k are dropped at the window, so only k·|groups| rows
    * survive the stage.
    */
  def sampleByGroup(df: DataFrame, groupCol: String, keyCol: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(contentKey(col(keyCol)), col(keyCol))
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .drop("__rk")
  }

  /** Token-budget sampling — the corpus-MIXING primitive: per group
    * (source / language / domain), keep documents in md5-coordinate
    * order while the RUNNING token total stays within that group's
    * budget. This is how a training mixture is drawn ("web 60B tokens,
    * code 20B, books 10B…"): deterministic (same docs chosen on any
    * partitioning or engine — no `rand()`), content-keyed (a re-crawl
    * keeps the same selection), and budgeted in tokens, not documents.
    *
    * The first document of a group is always kept even when it alone
    * overflows the budget (a mixture spec of N tokens means "roughly
    * N", never zero). `budgets` misses drop the group — an explicit
    * mixture is a whitelist.
    *
    * Shape at scale: one shuffle on the group key + a running-sum
    * window; the window's sort is per-group, so skewed sources are the
    * only long poles (salt upstream via [[graft.plans.Layout]] if a
    * single source dominates).
    */
  def sampleByTokenBudget(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      tokenCol: String,
      budgets: Map[String, Long]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(contentKey(col(keyCol)), col(keyCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val budget = budgets.foldLeft(lit(null).cast("long")) {
      case (acc, (g, b)) => when(col(groupCol) === g, b).otherwise(acc)
    }
    df.withColumn("__budget", budget)
      .where(col("__budget").isNotNull)
      // tokens BEFORE this row: the row is kept while the budget is
      // not yet exhausted when it starts (first row: 0 < budget)
      .withColumn("__before", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .where(col("__before") < col("__budget"))
      .drop("__budget", "__before")
  }
}
