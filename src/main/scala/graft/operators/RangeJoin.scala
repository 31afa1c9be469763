package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join — pair every left interval with every right
  * interval it overlaps (`l.start <= r.end && r.start <= l.end`),
  * optionally within equi-key groups. Spark's planner turns a naive
  * theta join on that predicate into BroadcastNestedLoopJoin — an
  * all-pairs scan that is quadratic per key group and the classic
  * time-series scale cliff.
  *
  * Scale construction (the standard bucketed range join): quantize the
  * number line into `bucket`-wide cells; each interval registers in
  * every cell it touches (`floor(start/b) .. floor(end/b)` — an
  * explode of `len/b + 1` rows); the join becomes an EQUI-join on
  * (keys…, cell) that shuffles and hash-matches like any other, with
  * the true overlap predicate re-checked on the bucket-local
  * candidates. A pair overlapping several shared cells would emit
  * duplicates, so each pair is OWNED by exactly one cell — the first
  * cell both intervals touch, `max(floor(l.start/b), floor(r.start/b))`
  * — a pure filter, no distinct, no extra shuffle.
  *
  * `bucket` trades replication (long intervals touch many cells)
  * against candidate density (a huge bucket puts everything in one
  * cell); set it near the typical interval length. Correctness is
  * bucket-independent (spec-pinned) — only the plan shape moves.
  *
  * Negative coordinates are handled (floor division via pmod, not
  * truncation); rows with null or inverted (`end < start`) intervals
  * drop — an unknown or empty interval overlaps nothing.
  */
object RangeJoin {

  private def cell(c: Column, bucket: Long): Column =
    ((c - pmod(c, lit(bucket))) / lit(bucket)).cast("long")

  /** Output: every left column, plus every right column prefixed
    * `r_`. `startCol`/`endCol` name LONG columns present in both
    * inputs (epoch seconds, positions, …); `keys` are equi-join
    * columns also present in both.
    */
  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      startCol: String,
      endCol: String,
      bucket: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(bucket >= 1, s"bucket must be >= 1, got $bucket")
    val ls = col(startCol).cast("long")
    val le = col(endCol).cast("long")
    val l2 = left
      .where(ls.isNotNull && le.isNotNull && le >= ls)
      .withColumn("__lb", explode(sequence(cell(ls, bucket), cell(le, bucket))))
    val rPref = right.columns.foldLeft(right) { (d, c) =>
      d.withColumnRenamed(c, "r_" + c)
    }
    val rs = col("r_" + startCol).cast("long")
    val re = col("r_" + endCol).cast("long")
    val r2 = rPref
      .where(rs.isNotNull && re.isNotNull && re >= rs)
      .withColumn("__rb", explode(sequence(cell(rs, bucket), cell(re, bucket))))
    val equiKeys = keys.map(k => col(k) === col("r_" + k))
    val cond = (Seq(col("__lb") === col("__rb")) ++ equiKeys ++ Seq(
      ls <= re, rs <= le,
      col("__lb") === greatest(cell(ls, bucket), cell(rs, bucket))))
      .reduce(_ && _)
    l2.join(r2, cond).drop("__lb", "__rb")
  }
}
