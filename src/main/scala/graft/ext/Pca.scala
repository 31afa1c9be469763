package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorOps

/** PCA over an embedding column — the dimensionality reduction every
  * large-scale embedding pipeline eventually wants in front of ANN /
  * clustering / dedup (q80's random projection is the data-oblivious
  * baseline; PCA is the variance-optimal one).
  *
  * Shape at scale (the whole point): fitting touches the data ONCE —
  * a single typed aggregation accumulates `n`, `Σx`, and the upper
  * triangle of `Σxxᵀ` (d=64 → 2 081 doubles ≈ 16 KB of buffer) with
  * map-side partial merges, so 100 TB of vectors reduce to one
  * d²-sized moment row on the driver. Eigendecomposition of the d×d
  * covariance is driver-side cyclic Jacobi (d ≤ a few hundred — the
  * matrix is tiny even when the data is not). Projection back over
  * the corpus is `r` codegen dot products against plan-literal
  * components (centering folds into a constant: `(x−μ)·c = x·c −
  * μ·c`), so the projection pass shuffles nothing.
  *
  * Determinism: double moment sums are partition-order-dependent in
  * the last ulp, so eigenpairs can wobble at ~1e-12 relative across
  * runs — callers that emit projections should round (q106 rounds to
  * 6 digits). The SIGN of each eigenvector is pinned by convention
  * (largest-magnitude entry positive), so projections never flip
  * wholesale between runs.
  */
object Pca {

  final case class PcaModel(
      dim: Int,
      n: Long,
      mean: Array[Double],
      eigenvalues: Array[Double], // all d, descending
      components: Array[Array[Double]]) { // top-r rows, orthonormal
    def totalVariance: Double = eigenvalues.sum
    def varianceExplained: Double = {
      val r = components.length
      eigenvalues.take(r).sum / math.max(totalVariance, Double.MinPositiveValue)
    }
  }

  /** One-pass raw-moment accumulator over d-dim vectors. Buffer layout:
    * `[n, Σx(d), Σ upper-triangle xxᵀ (d(d+1)/2)]`.
    */
  final class MomentsAgg(d: Int) extends Aggregator[Seq[Double], Array[Double], Array[Double]] {
    private val len = 1 + d + d * (d + 1) / 2
    override def zero: Array[Double] = new Array[Double](len)
    override def reduce(buf: Array[Double], x: Seq[Double]): Array[Double] = {
      require(x.length == d,
        s"vector width ${x.length} != fitted width $d — mixed-width corpus")
      buf(0) += 1.0
      var i = 0
      var t = 1 + d
      while (i < d) {
        val xi = x(i)
        buf(1 + i) += xi
        var j = i
        while (j < d) { buf(t) += xi * x(j); t += 1; j += 1 }
        i += 1
      }
      buf
    }
    override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < len) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(b: Array[Double]): Array[Double] = b
    override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder()
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (upper
    * storage ignored — reads the full square array). Returns
    * (eigenvalues desc, eigenvectors as rows, same order), vectors
    * sign-pinned: largest-|entry| positive. Converges quadratically;
    * non-convergence in `maxSweeps` throws (the connected-components
    * convention: never silently return garbage).
    */
  def jacobiEigen(
      sym: Array[Array[Double]],
      maxSweeps: Int = 64,
      relTol: Double = 1e-14): (Array[Double], Array[Array[Double]]) = {
    val n = sym.length
    val m = Array.tabulate(n, n)((i, j) => sym(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def offNorm: Double = {
      var s = 0.0
      var i = 0
      while (i < n) { var j = i + 1; while (j < n) { s += 2 * m(i)(j) * m(i)(j); j += 1 }; i += 1 }
      math.sqrt(s)
    }
    val scale = {
      var s = 0.0
      var i = 0
      while (i < n) { var j = 0; while (j < n) { s += m(i)(j) * m(i)(j); j += 1 }; i += 1 }
      math.max(math.sqrt(s), Double.MinPositiveValue)
    }
    var sweep = 0
    while (offNorm > relTol * scale) {
      if (sweep >= maxSweeps)
        throw new IllegalStateException(
          s"Jacobi did not converge in $maxSweeps sweeps (off=${offNorm})")
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = m(p)(q)
          if (apq != 0.0) {
            val theta = (m(q)(q) - m(p)(p)) / (2.0 * apq)
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < n) {
              val mkp = m(k)(p); val mkq = m(k)(q)
              m(k)(p) = c * mkp - s * mkq
              m(k)(q) = s * mkp + c * mkq
              k += 1
            }
            k = 0
            while (k < n) {
              val mpk = m(p)(k); val mqk = m(q)(k)
              m(p)(k) = c * mpk - s * mqk
              m(q)(k) = s * mpk + c * mqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until n).sortBy(i => -m(i)(i))
    val values = order.map(i => m(i)(i)).toArray
    val vectors = order.map { i =>
      val col = Array.tabulate(n)(k => v(k)(i))
      // sign convention: the entry with the largest magnitude is
      // positive (first such index on exact ties)
      var best = 0
      var k = 1
      while (k < n) { if (math.abs(col(k)) > math.abs(col(best))) best = k; k += 1 }
      if (col(best) < 0) col.map(x => -x) else col
    }.toArray
    (values, vectors)
  }

  /** Fit a top-`r` PCA model on `vecCol` (array<float|double>, uniform
    * width) in one corpus pass + one driver-side d×d eigensolve.
    */
  def fitPca(df: DataFrame, vecCol: String, r: Int): PcaModel = {
    val s = df.sparkSession
    import s.implicits._
    val clean = df.where(col(vecCol).isNotNull)
    val d = clean.select(size(col(vecCol))).head().getInt(0) // one-row width probe
    require(r > 0 && r <= d, s"r=$r must be in [1, $d]")
    val moments = clean
      .select(col(vecCol).cast("array<double>").as("__v")).as[Seq[Double]]
      .select(new MomentsAgg(d).toColumn)
      .head()
    val n = moments(0)
    require(n > 1, s"PCA needs at least 2 vectors, got ${n.toLong}")
    val mean = Array.tabulate(d)(i => moments(1 + i) / n)
    val cov = Array.ofDim[Double](d, d)
    var t = 1 + d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        // E[xixj] − μiμj, with the n/(n−1) sample correction
        val c = (moments(t) / n - mean(i) * mean(j)) * (n / (n - 1.0))
        cov(i)(j) = c
        cov(j)(i) = c
        t += 1
        j += 1
      }
      i += 1
    }
    val (values, vectors) = jacobiEigen(cov)
    PcaModel(d, n.toLong, mean, values, vectors.take(r))
  }

  /** Project `vecCol` onto the model's components: `r` codegen dot
    * products, centering folded into per-component constants. Output:
    * input columns + `proj` (array<double>, length r).
    */
  def projectPca(df: DataFrame, vecCol: String, model: PcaModel): DataFrame = {
    val comps = model.components.map(c =>
      (c, c.zip(model.mean).map { case (ci, mi) => ci * mi }.sum))
    val cols = comps.map { case (c, meanDot) =>
      VectorOps.dot(col(vecCol), typedLit(c.toSeq)) - lit(meanDot)
    }
    df.withColumn("proj", array(cols: _*))
  }

  /** Variance captured by an ARBITRARY (row) basis `basis` under the
    * model's covariance spectrum is not directly recoverable from the
    * model — this helper instead computes Σ bᵀC b from raw moments for
    * the comparison row; `basis` rows need not be orthonormal, they
    * are Gram-Schmidt orthonormalized first (a non-orthonormal basis
    * would double-count shared directions).
    */
  def capturedVariance(df: DataFrame, vecCol: String, basis: Array[Array[Double]]): Double = {
    val s = df.sparkSession
    import s.implicits._
    val clean = df.where(col(vecCol).isNotNull)
    val d = basis.head.length
    val ortho = gramSchmidt(basis)
    val moments = clean
      .select(col(vecCol).cast("array<double>").as("__v")).as[Seq[Double]]
      .select(new MomentsAgg(d).toColumn)
      .head()
    val n = moments(0)
    val mean = Array.tabulate(d)(i => moments(1 + i) / n)
    def cov(i: Int, j: Int): Double = {
      val (a, b) = if (i <= j) (i, j) else (j, i)
      val t = 1 + d + (a * (2 * d - a + 1)) / 2 + (b - a)
      (moments(t) / n - mean(a) * mean(b)) * (n / (n - 1.0))
    }
    ortho.map { v =>
      var s2 = 0.0
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) { s2 += v(i) * cov(i, j) * v(j); j += 1 }
        i += 1
      }
      s2
    }.sum
  }

  private def gramSchmidt(rows: Array[Array[Double]]): Array[Array[Double]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    rows.foreach { r =>
      val v = r.clone()
      out.foreach { u =>
        val dot = v.zip(u).map { case (a, b) => a * b }.sum
        var i = 0
        while (i < v.length) { v(i) -= dot * u(i); i += 1 }
      }
      val norm = math.sqrt(v.map(x => x * x).sum)
      if (norm > 1e-12) out += v.map(_ / norm)
    }
    out.toArray
  }
}
