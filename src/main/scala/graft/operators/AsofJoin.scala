package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single most recent right row of
  * the same key with `rightTime <= leftTime` (the operator the reference
  * ecosystem lacks and time-series engines make native — DuckDB's ASOF
  * JOIN is the oracle twin).
  *
  * Spark-first composition (SURVEY.md §7.3 preference (a)): tag and
  * union both sides, then one `last(_, ignoreNulls)` running window per
  * key ordered by (time, side) carries the latest right payload forward
  * onto each left row. Cost at scale: ONE shuffle by key + a per-key
  * sort — same shape as a sort-merge join, with no range-explosion. A
  * right row is carried in partition-local window state, never
  * replicated per left row (the naive `l.join(r, r.t <= l.t)` +
  * greatest-per-group form is quadratic in matches).
  *
  * Right-side ties on (key, time): the later row in (time, tag) order
  * wins — deterministic given a deterministic right-side order; add a
  * tiebreak column to `rightTime` ordering upstream if ties matter.
  *
  * Null semantics match DuckDB ASOF JOIN: right rows with a null key or
  * null `rightTime` never match anything (dropped before the union), and
  * a left row with a null `leftTime` gets null `asof_*` columns — a null
  * time is "unknown", not "before everything".
  */
object AsofJoin {

  /** Left columns pass through; each right value column `c` appears as
    * `asof_c` (null when no right row precedes the left row).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTime: String,
      rightTime: String,
      rightValueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct(rightValueCols.map(col): _*)
    // side 0 = right, 1 = left: at equal timestamps the right row sorts
    // first, so `rightTime == leftTime` matches (<= semantics).
    val r = right
      .where(col(keyCol).isNotNull && col(rightTime).isNotNull)
      .select(
        col(keyCol).as("__k"), col(rightTime).as("__t"),
        lit(0).as("__side"), payload.as("__rv"))
    val l = left.select(
      (leftCols.map(col) :+
        col(keyCol).as("__k") :+ col(leftTime).as("__t") :+
        lit(1).as("__side") :+ lit(null).cast(r.schema("__rv").dataType).as("__rv")): _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r.select(
        (leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
          col("__k") :+ col("__t") :+ col("__side") :+ col("__rv")): _*))
      .withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      // Belt-and-braces for null leftTime: such rows sort nulls-first and
      // can only see other null-__t left rows (right nulls are filtered),
      // but make the no-match contract explicit rather than order-derived.
      .select((leftCols.map(col) ++
        rightValueCols.map(c =>
          when(col("__t").isNotNull, col(s"__asof.$c")).as(s"asof_$c"))): _*)
  }
}
