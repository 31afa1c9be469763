package graft

import org.apache.spark.sql.functions._

import graft.ext.Sampling

/** Measures the claim `Sampling.autoSplit` exists for: on a skewed
  * stratum layout, the exact window form funnels the dominant stratum
  * through ONE task's sort while the hybrid's hex-bound bulk path is a
  * partition-parallel codegen projection. Rows are synthesized in the
  * executors (one long id column + a stratum label — 90% of rows in
  * one stratum, the tail across 50 small ones), so the probe measures
  * the split operators, not fixture I/O.
  *
  * One JSON line per (n, operator): `{"metric":"split_scale",...}`.
  */
object SplitScaleProbe {
  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(2000000, 8000000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-split-probe")
    spark.sparkContext.setLogLevel("WARN")
    for (n <- sizes) {
      val rows = spark.range(n.toLong).select(col("id"),
          when(pmod(col("id"), lit(10)) < 9, lit("dominant"))
            .otherwise(concat(lit("tail"), pmod(col("id"), lit(50))
              .cast("string"))).as("stratum"))
        .localCheckpoint() // both operators read the same materialized input
      def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
        val t0 = System.nanoTime()
        val cnt = df.queryExecution.toRdd.count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"metric":"split_scale","op":"$label","n":$n,""" +
          f""""rows":$cnt,"sec":$sec%.3f,"cpus":$cpus}""")
      }
      time("stratified_exact") {
        Sampling.stratifiedSplit(rows, "stratum", "id", 0.1, 0.1)
      }
      time("auto_hybrid") {
        Sampling.autoSplit(rows, "stratum", "id", 0.1, 0.1,
          exactThreshold = 100000L)
      }
    }
    spark.stop()
  }
}
