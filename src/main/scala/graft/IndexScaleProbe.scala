package graft

import org.apache.spark.sql.functions.col

import graft.ext.{Dedup, SyntheticCorpus}

/** Scale-linearity probe for the persisted MinHash index admission
  * (q92's shape, round-11 verdict ask #6): the "index never shuffles —
  * the new batch broadcasts against a linear index scan" claim needs a
  * measured curve in BOTH directions, each holding the other side
  * GENUINELY fixed (the round-9 lesson: a probe whose two sides grow
  * together confounds the reading).
  *
  *  - Index curve: the SAME 2000-doc batch (its own seed, identical
  *    bytes at every probe point) admitted against indexes of 25k and
  *    100k docs — expected ~linear in index size once the fixed
  *    batch-signature cost amortizes.
  *  - Batch curve: 500 vs 2000 batch docs against the FIXED 100k-doc
  *    index — expected ~linear in batch size on the signature side
  *    with the index scan as the fixed floor.
  *
  * Prints one JSON line per measurement; indexes are written to temp
  * dirs and removed. Run: `sbt "runMain graft.IndexScaleProbe"`.
  */
object IndexScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-index-scale-probe")
    spark.sparkContext.setLogLevel("WARN")
    // fixed batch: 1800 docs from a disjoint seed PLUS 200 re-crawls
    // of the index corpus's first ids (the generator is deterministic
    // per (seed, id), so those docs are byte-identical in BOTH index
    // corpora — the verify/emission stage does real work at every
    // probe point instead of emitting zero pairs). Re-crawls carry
    // negative ids, the planted-fixture convention.
    val fixedBatch = SyntheticCorpus.realistic(spark, 1800, seed = 7L)
      .select(col("doc_id"), col("text"))
      .unionByName(SyntheticCorpus.realistic(spark, 200)
        .select((-(col("doc_id") + 1L)).as("doc_id"), col("text")))
      .localCheckpoint()
    // untimed warmup: codegen + parquet writer/reader paths, so the
    // first timed index write doesn't carry JVM cold-start
    locally {
      val wpath = java.nio.file.Files.createTempDirectory("graft-probe-warm").toString
      try {
        Dedup.writeMinhashIndex(SyntheticCorpus.realistic(spark, 1000),
          "doc_id", "text", wpath, numHashes = 64, shingleSize = 1)
        Dedup.pairsAgainstMinhashIndex(fixedBatch.limit(100), "doc_id", "text",
            wpath, minJaccard = 0.7, numHashes = 64, shingleSize = 1)
          .queryExecution.toRdd.count(): Unit
      } finally {
        val p = new org.apache.hadoop.fs.Path(wpath)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(p, true): Unit
      }
    }
    for (idxN <- Seq(25000, 100000)) {
      val idxDocs = SyntheticCorpus.realistic(spark, idxN.toLong).localCheckpoint()
      val path = java.nio.file.Files
        .createTempDirectory(s"graft-probe-idx$idxN").toString
      try {
        val tW = System.nanoTime()
        Dedup.writeMinhashIndex(idxDocs, "doc_id", "text", path,
          numHashes = 64, shingleSize = 1)
        val secW = (System.nanoTime() - tW) / 1e9
        println(s"""{"metric":"minhash_index_write","n_index":$idxN,""" +
          s""""sec":${fmt3(secW)},"cpus":$cpus}""")
        val batches = if (idxN == 100000) Seq(500, 2000) else Seq(2000)
        for (batchN <- batches) {
          // the 500-doc slice keeps the same 200 re-crawls + the first
          // 300 novel docs — a fixed, deterministic subset
          val batch =
            if (batchN == 2000) fixedBatch
            else fixedBatch.where(col("doc_id") < batchN - 200)
          val t0 = System.nanoTime()
          val pairs = Dedup.pairsAgainstMinhashIndex(batch, "doc_id", "text",
              path, minJaccard = 0.7, numHashes = 64, shingleSize = 1)
            .queryExecution.toRdd.count()
          val sec = (System.nanoTime() - t0) / 1e9
          println(s"""{"metric":"minhash_index_admission","n_index":$idxN,""" +
            s""""n_batch":$batchN,"pairs":$pairs,""" +
            s""""sec":${fmt3(sec)},"cpus":$cpus}""")
        }
      } finally {
        val p = new org.apache.hadoop.fs.Path(path)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(p, true): Unit
      }
    }
    // ---- IVF-PQ maintenance: append vs rebuild (round 15) ----
    // The q181 claim priced: admitting a 10% delta into a persisted
    // index must cost O(delta) — encode only the new rows with the
    // frozen model — where a rebuild re-encodes everything. Vectors
    // are deterministic hash-noise (content-keyed, any partitioning).
    locally {
      import org.apache.spark.sql.functions._
      def vecs(n: Long, salt: Int) = spark.range(n)
        .select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(63)),
            d => (pmod(xxhash64(col("id"), d, lit(salt)), lit(2001L)) - 1000L)
              .cast("double") / 1000.0)
            .cast("array<float>").as("embedding"))
        .localCheckpoint()
      val nBase = 200000L
      val base = vecs(nBase, salt = 1)
      val delta = vecs(nBase / 10, salt = 2)
        .select((col("vec_id") + nBase).as("vec_id"), col("embedding"))
        .localCheckpoint()
      val model = graft.ext.Pq.fit(base, "embedding", dim = 64, m = 8, k = 64)
      val coarse = graft.ext.SimilaritySearch
        .learnCentroids(base, "embedding", k = 16)
      val path = java.nio.file.Files
        .createTempDirectory("graft-probe-ivfpq").toString
      try {
        val tB = System.nanoTime()
        graft.ext.Pq.writeIvfPqIndex(base, "vec_id", "embedding",
          coarse, model, path)
        val secB = (System.nanoTime() - tB) / 1e9
        println(s"""{"metric":"ivfpq_index_build","n_vectors":$nBase,""" +
          s""""sec":${fmt3(secB)},"cpus":$cpus}""")
        val tA = System.nanoTime()
        graft.ext.Pq.appendToIvfPqIndex(delta, "vec_id", "embedding", path,
          appendId = "probe-delta")
        val secA = (System.nanoTime() - tA) / 1e9
        println(s"""{"metric":"ivfpq_index_append","n_delta":${nBase / 10},""" +
          s""""sec":${fmt3(secA)},"cpus":$cpus}""")
        val tR = System.nanoTime()
        graft.ext.Pq.writeIvfPqIndex(base.unionByName(delta), "vec_id",
          "embedding", coarse, model, s"$path-rebuild")
        val secR = (System.nanoTime() - tR) / 1e9
        println(s"""{"metric":"ivfpq_index_rebuild","n_vectors":${nBase + nBase / 10},""" +
          s""""sec":${fmt3(secR)},"cpus":$cpus}""")
      } finally {
        for (d <- Seq(path, s"$path-rebuild")) {
          val p = new org.apache.hadoop.fs.Path(d)
          p.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(p, true): Unit
        }
      }
    }
    spark.stop()
  }

  /** Locale-pinned 3-decimal seconds (the Bench convention). */
  private def fmt3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
}
