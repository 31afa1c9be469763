package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PcaSpec extends AnyFunSuite with Matchers with SparkTestBase {

  /** Planted 2-D subspace in d=16 with deterministic pseudo-noise:
    * x = a·u + b·w + eps, directions u=e0+e1, w=e2−e3 (unnormalized on
    * purpose — PCA must find the normalized versions itself).
    */
  private def plantedDf(n: Int, noise: Double) = {
    import spark.implicits._
    val d = 16
    (0 until n).map { i =>
      // a real mixing hash — Objects.hash is affine in (i, tag), which
      // would make the two planted coefficients linearly dependent and
      // collapse the plane to a line
      def h(tag: Int): Double = {
        var x = i.toLong * 0x9E3779B97F4A7C15L + tag.toLong * 0xC2B2AE3D27D4EB4FL
        x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL; x ^= x >>> 33
        (x & 0xFFFFFF).toDouble / 0xFFFFFF.toDouble - 0.5
      }
      val a = 10.0 * h(1)
      val b = 4.0 * h(2)
      val v = Array.tabulate(d) { j =>
        val base = j match {
          case 0 | 1 => a
          case 2 => b
          case 3 => -b
          case _ => 0.0
        }
        base + noise * h(100 + j)
      }
      (i.toLong, v.toSeq)
    }.toDF("id", "vec")
  }

  test("recovers a planted 2-D subspace: top-2 variance explained ~ 1") {
    val m = Pca.fitPca(plantedDf(500, noise = 0.01), "vec", r = 2)
    m.dim shouldBe 16
    m.n shouldBe 500L
    m.varianceExplained should be > 0.999
    // the two recovered directions span {e0+e1, e2-e3}: components
    // have ~zero mass outside coords 0..3
    m.components.foreach { c =>
      c.drop(4).map(math.abs).max should be < 0.05
    }
  }

  test("components are orthonormal and sign-pinned") {
    val m = Pca.fitPca(plantedDf(300, noise = 0.05), "vec", r = 4)
    for (i <- m.components.indices; j <- i until m.components.length) {
      val dot = m.components(i).zip(m.components(j)).map { case (a, b) => a * b }.sum
      if (i == j) dot shouldBe 1.0 +- 1e-9
      else dot shouldBe 0.0 +- 1e-9
    }
    m.components.foreach { c =>
      c(c.zipWithIndex.maxBy { case (x, _) => math.abs(x) }._2) should be > 0.0
    }
  }

  test("eigenvalues are the variances of the projections, and projections are centered") {
    val df = plantedDf(400, noise = 0.02)
    val m = Pca.fitPca(df, "vec", r = 2)
    val proj = Pca.projectPca(df, "vec", m)
      .select(element_at(col("proj"), 1).as("p1"), element_at(col("proj"), 2).as("p2"))
    val row = proj.agg(
      avg(col("p1")), avg(col("p2")),
      var_samp(col("p1")), var_samp(col("p2"))).head()
    row.getDouble(0) shouldBe 0.0 +- 1e-6
    row.getDouble(1) shouldBe 0.0 +- 1e-6
    row.getDouble(2) shouldBe m.eigenvalues(0) +- 1e-6 * m.eigenvalues(0)
    row.getDouble(3) shouldBe m.eigenvalues(1) +- 1e-6 * math.max(m.eigenvalues(1), 1e-9)
  }

  test("partition-invariant at rounded precision (well-separated components)") {
    // r = 2: the planted directions have well-separated eigenvalues, so
    // ulp-level moment differences across partitionings cannot rotate
    // them; the noise-floor eigenvectors (r > 2) are degenerate BY
    // NATURE and excluded (any basis of the noise subspace is valid)
    val df = plantedDf(400, noise = 0.05)
    def fitted(parts: Int) =
      Pca.fitPca(df.repartition(parts), "vec", r = 2)
        .components.flatten.map(x => math.rint(x * 1e6) / 1e6).toSeq
    fitted(1) shouldBe fitted(8)
  }

  test("variance-optimal: beats the q80 random projection basis at equal rank") {
    val df = plantedDf(500, noise = 0.3)
    val m = Pca.fitPca(df, "vec", r = 2)
    val planes = SimilaritySearch.hyperplanes(numPlanes = 2, dim = 16, seed = 42L)
      .map(_.toArray).toArray
    val pcaVar = m.eigenvalues.take(2).sum
    val randVar = Pca.capturedVariance(df, "vec", planes)
    pcaVar should be > randVar
  }

  test("jacobiEigen matches a known 2x2 closed form") {
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    vals(0) shouldBe 3.0 +- 1e-12
    vals(1) shouldBe 1.0 +- 1e-12
    val s = 1.0 / math.sqrt(2)
    vecs(0)(0) shouldBe s +- 1e-12 // sign-pinned positive
    vecs(0)(1) shouldBe s +- 1e-12
    // second vector: ±(1,−1)/√2 — entries tie in magnitude, so only
    // shape is asserted (the tie-break pin is representation-sensitive)
    math.abs(vecs(1)(0)) shouldBe s +- 1e-12
    math.abs(vecs(1)(1)) shouldBe s +- 1e-12
    (vecs(1)(0) * vecs(1)(1)) should be < 0.0
  }

  test("mixed-width corpus throws, never silently truncates") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(1.0, 2.0, 3.0))).toDF("id", "vec")
    an[Exception] should be thrownBy Pca.fitPca(df, "vec", r = 1)
  }
}
