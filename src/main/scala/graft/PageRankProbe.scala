package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** PageRank scale probe: q109's fixture is 25 nodes (correctness-
  * perfect, scale-silent); this main runs the SAME operator over a
  * synthetic web-shaped graph — default 100k nodes / 1M weighted
  * edges, authority-skewed in-degree, 10% dangling nodes — and prints
  * one JSON line with per-iteration wall seconds, the L1 convergence
  * residual, and the steady-state cache footprint (which is bounded:
  * pinned shares + dangling set + TWO iterates, because
  * [[graft.ext.LinkGraph.pageRankRun]] unpersists iterate k−2 as soon
  * as k lands).
  *
  * Edge generation is pure codegen column algebra over `spark.range`
  * (deterministic hash mixing, the SyntheticCorpus discipline): src
  * uniform over the first 90% of nodes (the last 10% never source →
  * dangling), dst ∝ u³ (Zipf-ish authority skew, parallel edges merge
  * into weights).
  *
  * Run: `SPARK_GRAFT_PROBE_NODES=100000 SPARK_GRAFT_PROBE_EDGES=1000000
  * sbt "runMain graft.PageRankProbe"`
  */
object PageRankProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_PROBE_NODES", "100000").toLong
    val e = sys.env.getOrElse("SPARK_GRAFT_PROBE_EDGES", "1000000").toLong
    val iters = sys.env.getOrElse("SPARK_GRAFT_PROBE_ITERS", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-pagerank-probe"),
      shufflePartitions = cpus
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val srcSpace = math.max(1L, n * 9 / 10)
    val edges = spark.range(e).select(
      pmod(xxhash64(col("id"), lit(1)), lit(srcSpace)).as("src"),
      // u in [0,1) from a second hash; u³ skews dst toward low ids
      floor(lit(n.toDouble) *
        pow(pmod(xxhash64(col("id"), lit(2)), lit(1000000L)).cast("double") / 1e6,
          lit(3.0))).cast("long").as("dst"))

    val t0 = System.nanoTime()
    val run = graft.ext.LinkGraph.pageRankRun(edges, "src", "dst",
      damping = 0.85, iterations = iters)
    val top = run.ranks.orderBy(col("rank").desc, col("node")).limit(5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val totalSec = (System.nanoTime() - t0) / 1e9
    val cachedMb = spark.sparkContext.getRDDStorageInfo
      .map(_.memSize).sum / 1e6
    val massErr = math.abs(
      run.ranks.agg(sum(col("rank"))).head().getDouble(0) - 1.0)
    val iterJson = run.iterSeconds
      .map(s => String.format(java.util.Locale.ROOT, "%.3f", Double.box(s)))
      .mkString("[", ",", "]")
    val topJson = top.map { case (v, r) =>
      s"""{"node":$v,"rank":${String.format(java.util.Locale.ROOT, "%.8f", Double.box(r))}}"""
    }.mkString("[", ",", "]")
    println(
      s"""{"metric":"pagerank_probe","nodes":$n,"edges":$e,"iterations":$iters,""" +
        s""""total_sec":${String.format(java.util.Locale.ROOT, "%.3f", Double.box(totalSec))},""" +
        s""""iter_sec":$iterJson,""" +
        s""""l1_residual":${String.format(java.util.Locale.ROOT, "%.2e", Double.box(run.l1Residual))},""" +
        s""""mass_error":${String.format(java.util.Locale.ROOT, "%.2e", Double.box(massErr))},""" +
        s""""cached_mb":${String.format(java.util.Locale.ROOT, "%.1f", Double.box(cachedMb))},""" +
        s""""top5":$topJson}""")
    spark.stop()
  }
}
