package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-query time attribution: runs named queries (bench methodology —
  * `queryExecution.toRdd.count()`) with a listener that splits wall time
  * into scheduled-job time vs driver-only gaps (analysis/optimization/
  * codegen/collect-free planning), and reports per-stage task time,
  * shuffle bytes and spill. The missing Spark-UI view for a headless
  * optimization loop: "is this query executor-bound or driver-bound,
  * and in which stage?"
  *
  * Run: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.QueryProfile q28_minhash_pairs q182_char_span_dedup"`
  */
object QueryProfile {
  private final class Probe extends SparkListener {
    case class StageAgg(var name: String, var tasks: Int = 0, var taskTimeMs: Long = 0,
        var shuffleReadB: Long = 0, var shuffleWriteB: Long = 0,
        var spillB: Long = 0, var wallMs: Long = 0, var inputB: Long = 0,
        var outRows: Long = 0)
    val stages = scala.collection.mutable.LinkedHashMap[Int, StageAgg]()
    var jobWallMs: Long = 0
    var nJobs: Int = 0
    private val jobStart = scala.collection.mutable.Map[Int, Long]()
    override def onJobStart(e: SparkListenerJobStart): Unit =
      jobStart(e.jobId) = e.time
    override def onJobEnd(e: SparkListenerJobEnd): Unit = {
      jobStart.remove(e.jobId).foreach { t0 =>
        jobWallMs += (e.time - t0); nJobs += 1
      }
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val si = e.stageInfo
      val a = stages.getOrElseUpdate(si.stageId, StageAgg(si.name))
      a.name = si.name // onTaskEnd may have created the row with ""
      a.wallMs = (for {c <- si.completionTime; s <- si.submissionTime}
        yield c - s).getOrElse(0L)
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val a = stages.getOrElseUpdate(e.stageId, StageAgg(""))
      a.tasks += 1
      val m = e.taskMetrics
      if (m != null) {
        a.taskTimeMs += m.executorRunTime
        a.shuffleReadB += m.shuffleReadMetrics.totalBytesRead
        a.shuffleWriteB += m.shuffleWriteMetrics.bytesWritten
        a.spillB += m.memoryBytesSpilled + m.diskBytesSpilled
        a.inputB += m.inputMetrics.bytesRead
        a.outRows += m.outputMetrics.recordsWritten
      }
    }
    def reset(): Unit = { stages.clear(); jobWallMs = 0; nJobs = 0; jobStart.clear() }
  }

  def main(args: Array[String]): Unit = {
    System.setProperty("graft.lane", "bench")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "2").toInt.max(1)
    val names = args.filterNot(_.startsWith("--"))
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-profile"),
      shufflePartitions = cpus
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same global warmup as Bench
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().queryExecution.toRdd.count()
    val probe = new Probe
    spark.sparkContext.addSparkListener(probe)
    def mb(b: Long): String = f"${b / 1048576.0}%.1fMB"
    names.foreach { name =>
      (1 to reps).foreach { rep =>
        probe.reset()
        spark.sparkContext.setJobDescription(s"$name rep$rep")
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
        val wallMs = (System.nanoTime() - t0) / 1000000
        Thread.sleep(300) // let straggling listener events drain
        val sumStageWall = probe.stages.values.map(_.wallMs).sum
        println(f"==== $name rep$rep wall=${wallMs / 1000.0}%.2fs rows=$rows " +
          f"jobs=${probe.nJobs} jobWall=${probe.jobWallMs / 1000.0}%.2fs " +
          f"driverGap=${(wallMs - probe.jobWallMs) / 1000.0}%.2fs " +
          f"stageWallSum=${sumStageWall / 1000.0}%.2fs")
        if (rep == reps) { // only print stage detail on the last (warm) rep
          probe.stages.toSeq.sortBy(-_._2.taskTimeMs).take(12).foreach {
            case (id, a) =>
              println(f"  stage$id%5d wall=${a.wallMs / 1000.0}%6.2fs " +
                f"taskSum=${a.taskTimeMs / 1000.0}%7.2fs n=${a.tasks}%4d " +
                f"in=${mb(a.inputB)}%9s sr=${mb(a.shuffleReadB)}%9s " +
                f"sw=${mb(a.shuffleWriteB)}%9s spill=${mb(a.spillB)}%9s  ${a.name.take(80)}")
          }
        }
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
      }
    }
    spark.stop()
  }
}
