package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Poisson bootstrap — error bars for corpus statistics at cluster
  * scale. The classical bootstrap resamples n rows WITH replacement,
  * which is unimplementable on a distributed corpus (it needs global
  * coordinated sampling); the Poisson bootstrap replaces each row's
  * multiplicity in replica r with an independent Poisson(1) draw —
  * for large n the replica distributions converge to the classical
  * bootstrap's, and each row decides its own multiplicity LOCALLY.
  * That makes the whole procedure one scan: explode `replicas` copies
  * of each row's (weight, value) contribution straight into a hash
  * aggregation keyed (group, replica) — map-side combine collapses
  * each task to |groups|·replicas partial rows, so the shuffle never
  * sees corpus-sized data.
  *
  * Determinism and engine-independence: the Poisson draw is the
  * inverse CDF of Poisson(1) applied to a 48-bit md5 uniform
  * (`md5(key ":" replica)` prefix, exactly the [[Sampling]]
  * coordinate), with the CDF thresholds shared between the Spark
  * column expression and [[poissonWeightSql]] (the single-source
  * pattern — the oracle's CASE chain is GENERATED from the same
  * constants, so both engines place every row in the same replica
  * multiset).
  */
object Bootstrap {

  /** Cumulative Poisson(1) CDF at k = 0..9: `e⁻¹ Σ_{j≤k} 1/j!`. Mass
    * beyond k = 9 is ~1.1e-7 of draws; the chain truncates there (a
    * ~1-in-9M draw weights 10 instead of its true 10+ value — far
    * below the bootstrap's own resampling noise).
    */
  private[ext] val PoissonCum: Array[Double] = {
    val e = math.exp(-1.0)
    var fact = 1.0
    var acc = 0.0
    (0 to 9).map { k =>
      if (k > 0) fact *= k
      acc += e / fact
      acc
    }.toArray
  }

  /** Inverse-CDF Poisson(1) weight of a uniform in [0,1). */
  def poissonWeight(u: Column): Column =
    PoissonCum.zipWithIndex.foldRight(lit(PoissonCum.length): Column) {
      case ((c, k), acc) => when(u < lit(c), lit(k)).otherwise(acc)
    }

  /** The SAME inverse CDF as an ANSI SQL CASE chain over expression
    * `u` — rendered from the same double constants ([[PoissonCum]]),
    * whose shortest-roundtrip decimal forms parse back to identical
    * doubles in any IEEE-754 engine.
    */
  def poissonWeightSql(u: String): String =
    PoissonCum.zipWithIndex.foldRight(PoissonCum.length.toString) {
      case ((c, k), acc) => s"CASE WHEN $u < $c THEN $k ELSE $acc END"
    }

  /** 48-bit md5 uniform of (key, replica) — matches
    * `('0x' || substr(md5(key || ':' || r), 1, 12))::BIGINT / 2^48`.
    */
  private def uniform(key: Column, replica: Column): Column =
    conv(substring(md5(concat(key.cast("string"), lit(":"),
      replica.cast("string"))), 1, 12), 16, 10)
      .cast("long").cast("double") / lit(281474976710656.0)

  /** Per-group bootstrap confidence interval for `mean(value)`:
    * `(group, n, mean, ci_lo, ci_hi)`, the interval being the
    * [lo, hi] quantiles of the `replicas` Poisson-replica means.
    * `value` must be integral (weights × values sum exactly as longs —
    * order-independent without decimal widening). A replica whose
    * total weight lands at 0 contributes a null mean, which the
    * quantile ignores (possible only for tiny groups).
    */
  def poissonBootstrapCi(
      df: DataFrame,
      keyCol: String,
      value: Column,
      groupCol: String,
      replicas: Int = 64,
      lo: Double = 0.025,
      hi: Double = 0.975): DataFrame = {
    require(replicas >= 2, s"replicas must be >= 2, got $replicas")
    require(lo > 0 && hi < 1 && lo < hi, s"need 0 < lo < hi < 1, got [$lo, $hi]")
    val base = df.select(col(groupCol), col(keyCol).cast("string").as("__k"),
      value.cast("long").as("__v"))
    val reps = base
      .withColumn("__r", explode(sequence(lit(0), lit(replicas - 1))))
      .withColumn("__w", poissonWeight(uniform(col("__k"), col("__r"))))
      .groupBy(col(groupCol), col("__r"))
      .agg((sum(col("__w") * col("__v")).cast("double") / sum(col("__w")))
        .as("__mr"))
      .groupBy(col(groupCol))
      .agg(
        percentile(col("__mr"), lit(lo)).as("__lo"),
        percentile(col("__mr"), lit(hi)).as("__hi"))
    val point = base.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        (sum(col("__v")).cast("double") / count(lit(1))).as("__mean"))
    point.join(reps, Seq(groupCol))
      .select(col(groupCol), col("n"),
        round(col("__mean"), 6).as("mean"),
        round(col("__lo"), 6).as("ci_lo"),
        round(col("__hi"), 6).as("ci_hi"))
  }
}
