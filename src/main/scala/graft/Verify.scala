package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * The session goes through [[GraftSession.configure]] so correctness is
  * verified under the SAME engine configuration Bench measures (AQE,
  * skew-join, parquet pushdown, nanos handling) — a results bug caused
  * by a production setting must not be invisible to the oracle.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    // Optional trailing args name a subset of queries to dump (local
    // spot-checks); the driver always calls with exactly two args.
    val Array(sfDir, outDir) = args.take(2)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-verify"),
      shufflePartitions = cpus
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .foreach { case (name, fn) =>
      val target = s"$outDir/$name"
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(target)
      catch {
        case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          // Remove any stale result from a previous run: a leftover
          // parquet dir would let the compare silently validate old
          // output and mask the regression.
          deleteRecursively(new java.io.File(target))
      }
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${JsonUtil.quote(k)}: ${JsonUtil.quote(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
