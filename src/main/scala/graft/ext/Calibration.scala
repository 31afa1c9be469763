package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier-score calibration — Platt scaling plus the calibration
  * metrics (ECE, Brier) a quality-gate owner reads before trusting a
  * model's probabilities. A hashed-n-gram (or any margin-producing)
  * classifier ranks well long before its raw `σ(score)` is an honest
  * probability: the NB-weight sum saturates, so raw confidences crowd
  * 0/1 and over-claim. Platt scaling fits the two-parameter logistic
  * `p = σ(a·score + b)` by maximum likelihood on labeled data — the
  * standard post-hoc fix (Platt 1999), exactly solvable here because
  * the problem is 2-dimensional.
  *
  * The fit is Newton–Raphson where each iteration reduces the corpus
  * to FIVE sufficient statistics (gradient and Hessian of the logistic
  * log-likelihood) in one aggregation pass; the 2×2 solve happens on
  * the driver. All reductions sum as `decimal(38,12)` so the fitted
  * parameters are bit-stable under any partitioning (the
  * KpiAggregation convention). At 100 TB you fit on a bounded
  * calibration sample ([[Sampling.contentSample]]) — the fit cost is
  * `iters` scans of THAT sample, never of the full corpus — and apply
  * the resulting (a, b) as a free scan-side projection everywhere.
  */
object Calibration {

  private def dsum(c: Column): Column =
    sum(c.cast("decimal(38,12)")).cast("double")

  /** σ(a·s + b) as a column. */
  def plattProb(score: Column, a: Double, b: Double): Column =
    lit(1.0) / (lit(1.0) + exp(-(score * lit(a) + lit(b))))

  /** Fit (a, b) of `p = σ(a·score + b)` by Newton–Raphson MLE.
    * `label` is boolean (nulls = false); null scores are dropped. The
    * tiny ridge keeps the 2×2 solvable on degenerate inputs (constant
    * scores, one-class labels); iteration stops early once the step is
    * below 1e-12 in both coordinates.
    */
  def plattFit(
      df: DataFrame,
      score: Column,
      label: Column,
      iters: Int = 30,
      ridge: Double = 1e-9): (Double, Double) = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val base = df
      .select(score.cast("double").as("__s"),
        when(coalesce(label, lit(false)), 1.0).otherwise(0.0).as("__y"))
      .where(col("__s").isNotNull)
      .localCheckpoint() // iters passes re-read THIS, not the corpus scan
    var a = 0.0
    var b = 0.0
    var i = 0
    var done = false
    while (i < iters && !done) {
      val p = plattProb(col("__s"), a, b)
      val w = p * (lit(1.0) - p)
      val r = base.agg(
        dsum((p - col("__y")) * col("__s")).as("g1"),
        dsum(p - col("__y")).as("g2"),
        dsum(w * col("__s") * col("__s")).as("h11"),
        dsum(w * col("__s")).as("h12"),
        dsum(w).as("h22")).head()
      val (g1, g2) = (r.getDouble(0), r.getDouble(1))
      val (h11, h12, h22) = (r.getDouble(2) + ridge, r.getDouble(3), r.getDouble(4) + ridge)
      val det = h11 * h22 - h12 * h12
      val da = (h22 * g1 - h12 * g2) / det
      val db = (h11 * g2 - h12 * g1) / det
      a -= da
      b -= db
      done = math.abs(da) < 1e-12 && math.abs(db) < 1e-12
      i += 1
    }
    (a, b)
  }

  /** One-row calibration scorecard of a probability column: `n`,
    * `ece` (expected calibration error over `bins` equal-width
    * confidence bins: `Σ_b n_b/N · |conf_b − acc_b|`, which reduces to
    * `Σ_b |Σp − Σy| / N`), and `brier` (mean squared error of the
    * probability). Decimal reductions → bit-stable under partitioning.
    */
  def calibrationScore(
      df: DataFrame,
      prob: Column,
      label: Column,
      bins: Int = 15): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val p = prob.cast("double")
    val y = when(coalesce(label, lit(false)), 1.0).otherwise(0.0)
    df.select(
        least(lit(bins - 1), floor(p * bins)).cast("int").as("__bin"),
        p.as("__p"), y.as("__y"))
      .where(col("__p").isNotNull)
      .groupBy(col("__bin"))
      .agg(count(lit(1)).as("__n"),
        dsum(col("__p")).as("__sp"),
        dsum(col("__y")).as("__sy"),
        dsum((col("__p") - col("__y")) * (col("__p") - col("__y"))).as("__sq"))
      .agg(
        sum(col("__n")).as("n"),
        (dsum(abs(col("__sp") - col("__sy"))) / sum(col("__n"))).as("ece"),
        (dsum(col("__sq")) / sum(col("__n"))).as("brier"))
  }
}
