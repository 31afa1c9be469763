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
