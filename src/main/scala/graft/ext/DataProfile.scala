package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality scorecard a pipeline owner
  * reads before trusting a new drop: per column, null count, exact
  * distinct count, and min/max (computed in the NATIVE type, then
  * rendered as strings so every column fits one output schema —
  * `min(cast(x as string))` would order "10" before "9" and is
  * deliberately not what this does).
  *
  * One aggregation pass computes all metrics; the frame unpivots via
  * `stack` into one row per column. Exact multi-column distincts make
  * Catalyst plan an Expand (one duplicate of the input per distinct
  * aggregate) — correct, and what the DuckDB oracle can mirror; at
  * 100 TB swap `countDistinct` for `approx_count_distinct` (the HLL
  * sketch already covered by q43) and the Expand disappears.
  */
object DataProfile {

  /** Population stability index between a reference and a current
    * sample of one metric — the standard drift alarm a pipeline runs
    * per crawl: bin the metric by the REFERENCE's quantile cuts
    * (`bins` equal-mass bins), then
    * `PSI = Σ_b (p_cur − p_ref) · ln(p_cur / p_ref)`. Rule of thumb:
    * < 0.1 stable, 0.1–0.25 drifting, > 0.25 investigate. Bin shares
    * are Laplace-smoothed (`(n_b + 0.5) / (N + bins/2)`) so an empty
    * current bin contributes a large-but-finite term instead of ∞.
    * Cuts and terms round to 6 before use/output, keeping the whole
    * chain engine-reproducible (the q40 quantile-parity + round-
    * before-compare conventions).
    *
    * Output: one row per bin — `bin`, `n_ref`, `n_cur`, `psi_term` —
    * total PSI = the sum (derivable; kept per-bin so the DRIFTING bin
    * is visible, not just the alarm).
    *
    * Shape at scale: one quantile pass over the reference (the exact
    * form here for the oracle; `approx_percentile` at 100 TB — the
    * q40/q62 pair), the 9-value cut row broadcast, one counting
    * aggregate per side, a |bins|-row join.
    */
  def psi(
      ref: DataFrame, cur: DataFrame, value: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 100, s"bins must be in [2,100], got $bins")
    val cutCols = (1 until bins).map(i =>
      round(percentile(value, lit(i.toDouble / bins)), 6).as(s"__c$i"))
    val cuts = broadcast(ref.agg(cutCols.head, cutCols.tail: _*))
    def binned(df: DataFrame): DataFrame = df.crossJoin(cuts)
      .select((1 until bins).map(i =>
        when(value > col(s"__c$i"), 1).otherwise(0))
        .reduce(_ + _).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("__n"))
    val r = binned(ref).withColumnRenamed("__n", "n_ref")
    val c = binned(cur).withColumnRenamed("__n", "n_cur")
    val allBins = ref.sparkSession.range(bins).select(col("id").cast("int").as("bin"))
    val joined = allBins
      .join(r, Seq("bin"), "left").join(c, Seq("bin"), "left")
      .na.fill(0L, Seq("n_ref", "n_cur"))
      .localCheckpoint() // totals + the term projection both read it
    val tot = broadcast(joined.agg(
      sum(col("n_ref")).as("__NR"), sum(col("n_cur")).as("__NC")))
    val half = lit(bins.toDouble / 2)
    joined.crossJoin(tot)
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round(
          ((col("n_cur") + 0.5) / (col("__NC") + half) -
            (col("n_ref") + 0.5) / (col("__NR") + half)) *
            log(((col("n_cur") + 0.5) / (col("__NC") + half)) /
              ((col("n_ref") + 0.5) / (col("__NR") + half))), 6)
          .as("psi_term"))
  }

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    cols.foreach(c => require(df.columns.contains(c), s"no column $c"))
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `__nn_$c`, `__nd_$c`, `__mn_$c`, `__mx_$c`").mkString(", ")
    wide.selectExpr(
      s"stack(${cols.length}, $stackArgs) " +
        "as (col_name, n_nulls, n_distinct, min_value, max_value)")
  }
}
