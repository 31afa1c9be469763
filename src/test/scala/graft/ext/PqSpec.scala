package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PqSpec extends AnyFunSuite with SparkTestBase {

  /** Clustered fixture: 300 vectors in 16 dims around 6 well-separated
    * centers (deterministic hash jitter) — geometry where a correct PQ
    * must retrieve well, unlike the near-uniform corpus table.
    */
  private def clustered = {
    val s = spark
    import s.implicits._
    def h(a: Long, b: Long): Double = {
      var x = a * 0x9E3779B97F4A7C15L + b * 0xC2B2AE3D27D4EB4FL
      x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL; x ^= x >>> 33
      (x.toDouble / Long.MaxValue) * 0.05 // small jitter
    }
    (0L until 300L).map { id =>
      val c = (id % 6).toInt
      val vec = Array.tabulate(16)(d =>
        (if (d % 6 == c) 1.0 else 0.0) + h(id, d.toLong)).map(_.toFloat)
      (id, vec)
    }.toDF("vec_id", "embedding")
  }

  test("fit: codebook shapes and code range") {
    val m = Pq.fit(clustered, "embedding", dim = 16, m = 4, k = 8, sampleN = 300)
    assert(m.m == 4 && m.k == 8 && m.subDim == 4)
    assert(m.codebooks.forall(_.forall(_.length == 4)))
    val codes = clustered
      .select(Pq.encode(col("embedding"), m).as("c"))
      .select(explode(col("c")).as("x"))
      .agg(min(col("x")), max(col("x"))).head()
    assert(codes.getInt(0) >= 0 && codes.getInt(1) < 8)
  }

  test("encode is deterministic and partition-invariant") {
    val m = Pq.fit(clustered, "embedding", dim = 16, m = 4, k = 8, sampleN = 300)
    val a = clustered.repartition(7)
      .select(col("vec_id"), Pq.encode(col("embedding"), m).as("c"))
      .orderBy(col("vec_id")).collect().toSeq
    val b = clustered.coalesce(1)
      .select(col("vec_id"), Pq.encode(col("embedding"), m).as("c"))
      .orderBy(col("vec_id")).collect().toSeq
    assert(a == b)
  }

  test("ADC distance approximates exact L2 on clustered data") {
    val m = Pq.fit(clustered, "embedding", dim = 16, m = 4, k = 16, sampleN = 300)
    val query = clustered.where(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val rows = clustered
      .select(col("vec_id"),
        Pq.adcDistance(Pq.encode(col("embedding"), m), query, m).as("adc"),
        org.apache.spark.sql.graft.VectorOps
          .sqdist(col("embedding"), typedLit(query)).as("exact"))
      .collect()
    // ADC error = −2⟨q−c, ε⟩ + ‖ε‖² for reconstruction offset ε: the
    // cross term scales with √exact · ‖ε‖, so the bound must too
    rows.foreach { r =>
      val tol = 0.1 + 0.15 * math.sqrt(r.getDouble(2))
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < tol,
        s"vec ${r.getLong(0)}: adc=${r.getDouble(1)} exact=${r.getDouble(2)}")
    }
  }

  test("retrieval floors: ADC stays in-cluster; shortlist+rerank recovers top-10") {
    // Within a cluster the top-10 ordering is jitter-scale (the same
    // concentration that caps pure-ADC recall on the corpus table), so
    // the honest floors are (a) every ADC hit is from the query's
    // cluster and (b) the production two-stage number — ADC shortlist,
    // exact re-rank — recovers the exact top-10.
    val m = Pq.fit(clustered, "embedding", dim = 16, m = 4, k = 16, sampleN = 300)
    val query = clustered.where(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val rest = clustered.where(col("vec_id") =!= 0)
    val encoded = rest.select(col("vec_id"),
      Pq.encode(col("embedding"), m).as("codes"))
    val pq10 = Pq.adcTopK(encoded, "vec_id", "codes", query, m, k = 10)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(pq10.forall(_ % 6 == 0), s"ADC left the query's cluster: $pq10")
    val exact = rest
      .select(col("vec_id"), org.apache.spark.sql.graft.VectorOps
        .sqdist(col("embedding"), typedLit(query)).as("d"))
    val exact10 = exact.orderBy(col("d"), col("vec_id")).limit(10)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val short30 = Pq.adcTopK(encoded, "vec_id", "codes", query, m, k = 30)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val rerank10 = exact.where(col("vec_id").isin(short30.toSeq: _*))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val recall = (rerank10 & exact10).size / 10.0
    assert(recall >= 0.9, s"rerank recall=$recall short=$short30 exact=$exact10")
  }

  test("IVF-PQ: probe pruning stays in-cluster and finds the cluster's members") {
    val m = Pq.fit(clustered, "embedding", dim = 16, m = 4, k = 16, sampleN = 300)
    val coarse = SimilaritySearch.learnCentroids(clustered, "embedding", k = 6, sampleN = 300)
    val query = clustered.where(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val top = Pq.ivfPqTopK(clustered.where(col("vec_id") =!= 0),
        "vec_id", "embedding", query, k = 10,
        coarseCentroids = coarse, model = m, nProbe = 2)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(top.size == 10, s"pruned scan must still fill k: $top")
    assert(top.forall(_ % 6 == 0), s"IVF-PQ left the query's cluster: $top")
  }

  test("fit rejects invalid shapes") {
    intercept[IllegalArgumentException](
      Pq.fit(clustered, "embedding", dim = 16, m = 5, k = 8))
    intercept[IllegalArgumentException](
      Pq.fit(clustered, "embedding", dim = 16, m = 4, k = 300))
  }
}
