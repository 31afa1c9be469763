package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the manifest table (the PageRankProbe pattern —
  * measured locally, recorded in BENCH_NOTES.md, not benched): the
  * small-commits problem and its compaction remedy. A long append
  * history leaves the head version reading N parquet dirs (N× file
  * listing + footer opens + tiny row groups); `compact` collapses the
  * file set to one dir and the SAME logical read gets cheap. Also
  * times the commit path itself (write + manifest rename) so the
  * per-commit overhead is on record.
  *
  * Usage: `sbt "runMain graft.ManifestProbe"` (optional env
  * SPARK_GRAFT_CPUS).
  */
object ManifestProbe {

  private def timed[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val r = f
    ((System.nanoTime() - t0) / 1e9, r)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-manifest-probe")
    val base = java.nio.file.Files.createTempDirectory("graft-mprobe").toString
    try {
      val commits = 200
      val rowsPer = 10000L
      val (tCommit, _) = timed {
        (0 until commits).foreach { i =>
          graft.sink.ManifestTable.append(
            spark.range(i * rowsPer, (i + 1) * rowsPer).toDF("id"), base)
        }
      }
      println(f"commits: $commits x $rowsPer rows, total ${tCommit}%.1f s " +
        f"(${tCommit / commits * 1000}%.0f ms/commit incl. write+rename)")
      def readSum(): Long = graft.sink.ManifestTable.readLatest(spark, base)
        .agg(sum(col("id"))).head.getLong(0)
      val (tFrag, s1) = timed(readSum())
      val (tFrag2, _) = timed(readSum())
      val (tCompact, _) = timed(graft.sink.ManifestTable.compact(spark, base))
      val (tOne, s2) = timed(readSum())
      val (tOne2, _) = timed(readSum())
      require(s1 == s2, s"compaction changed the table: $s1 vs $s2")
      println(f"read  $commits-dir head: ${tFrag}%.2f s (warm ${tFrag2}%.2f s)")
      println(f"compact: ${tCompact}%.2f s; read 1-dir head: ${tOne}%.2f s " +
        f"(warm ${tOne2}%.2f s)")
      // graceMs=0: single-writer probe, no commit can be in flight
      val deleted = graft.sink.ManifestTable
        .vacuum(spark, base, keepVersions = 1, graceMs = 0L)
      println(s"vacuum: ${deleted.length} data dirs reclaimed")

      // Retention economics for the streaming ledger (the round-16
      // ADVICE fix): many idempotent micro-batches with periodic
      // vacuum must keep the ledger at ONE file of O(retention) lines
      // and the floor moving — not one sidecar per vacuum enumerating
      // every batch id ever.
      val base2 = java.nio.file.Files
        .createTempDirectory("graft-mprobe2").toString
      try {
        val batches = 300
        val (tIdem, _) = timed {
          (0 until batches).foreach { b =>
            graft.sink.ManifestTable.appendIdempotent(
              spark.range(100).toDF("id"), base2, batchId = b.toLong)
            if (b % 50 == 49)
              graft.sink.ManifestTable.vacuum(spark, base2,
                keepVersions = 1, graceMs = 0L, batchIdRetention = 20L)
          }
        }
        val ledgers = new java.io.File(s"$base2/_manifests").listFiles()
          .filter(_.getName.endsWith(".ledger"))
        val ledgerLines = ledgers.map(f =>
          scala.io.Source.fromFile(f).getLines().size).sum
        val floor = graft.sink.ManifestTable.committedBatchFloor(spark, base2)
        val enumerated = graft.sink.ManifestTable
          .committedBatchIds(spark, base2).size
        println(f"idempotent ledger: $batches batches + vacuum/50 in " +
          f"${tIdem}%.1f s -> ${ledgers.length} ledger file(s), " +
          f"$ledgerLines lines, floor=$floor, $enumerated enumerated ids")
        require(ledgers.length <= 1, "ledger sidecars accumulated")
        require(graft.sink.ManifestTable.isBatchCommitted(spark, base2, 3L),
          "a folded batch id lost its committed status")
      } finally {
        def rm2(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm2))
          f.delete(): Unit
        }
        rm2(new java.io.File(base2))
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(base))
      spark.stop()
    }
  }
}
