package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.GraftSession
import graft.ingest.EventReader

/** Streaming-path throughput measurement (BENCH_NOTES.md §streaming).
  *
  * Replays a synthetic trip feed — `n` starts + `n` ends as JSON lines,
  * produced through the same [[EventReader.toJsonStream]] wire encoding
  * the publisher uses — through the FULL pipeline ([[TripStreamJob]]:
  * file source → JSON decode → tagged union → flatMapGroupsWithState
  * correlation → keyed upsert sink) under `Trigger.AvailableNow` with a
  * files-per-trigger cap, so the run exercises several micro-batches of
  * realistic size rather than one giant batch.
  *
  * Prints ONE JSON line: total rows, wall seconds, rows/sec, batch
  * count, and peak state-store rows.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.streaming.StreamBench 200000"
  */
object StreamBench {

  def main(args: Array[String]): Unit = {
    val nTrips = args.headOption.map(_.toInt).getOrElse(200000)
    // 16 files per side; both sources admit 4 files per trigger
    // CONCURRENTLY, so the run drains in 4 micro-batches (each batch
    // carries 4 start shards + 4 end shards).
    val shards = 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-stream-bench")
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("graft-streambench")
    val startDir = s"$base/starts"
    val endDir = s"$base/ends"

    // Event time advances 50 ms per trip (~2.8 h of feed at n=200k);
    // dropoff 5 min after pickup. Deterministic fares via seeded rand.
    val t0 = java.sql.Timestamp.valueOf("2024-01-15 00:00:00").getTime
    val starts = spark.range(nTrips).select(
      concat(lit("trip-"), col("id")).as("trip_id"),
      (col("id") % 256).cast("int").as("pickup_location_id"),
      (col("id") % 128).cast("int").as("dropoff_location_id"),
      (col("id") % 8).cast("int").as("vendor_id"),
      timestamp_millis(lit(t0) + col("id") * 50).as("pickup_datetime"),
      timestamp_millis(lit(t0) + col("id") * 50 + 300000L).as("estimated_dropoff_datetime"),
      round(rand(42) * 50 + 5, 2).as("estimated_fare_amount"))
    val ends = spark.range(nTrips).select(
      concat(lit("trip-"), col("id")).as("trip_id"),
      timestamp_millis(lit(t0) + col("id") * 50 + 300000L).as("dropoff_datetime"),
      lit(1.0).as("rate_code"),
      (col("id") % 4 + 1).cast("double").as("passenger_count"),
      round(rand(43) * 20 + 1, 2).as("trip_distance"),
      round(rand(44) * 50 + 5, 2).as("fare_amount"),
      round(rand(45) * 10, 2).as("tip_amount"),
      lit(1.0).as("payment_type"),
      lit(1.0).as("trip_type"))
    EventReader.toJsonStream(starts, "trip_id", shards)
      .select("value").write.text(startDir)
    EventReader.toJsonStream(ends, "trip_id", shards)
      .select("value").write.text(endDir)
    // The file source admits files in modification-time order, and the
    // parallel write leaves mtimes racy — an end shard could enter a
    // trigger BEFORE its start shard and be faithful-dropped. Restamp
    // both sides with the same increasing per-shard mtimes so start/end
    // shard k ride the same trigger (same key-hash → same shard index).
    for (dir <- Seq(startDir, endDir)) {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter(_.getPath.getName.startsWith("part-"))
        .sortBy(_.getPath.getName).zipWithIndex
        .foreach { case (st, i) =>
          fs.setTimes(st.getPath, 1700000000000L + i * 60000L, -1)
        }
    }

    def lines(dir: String) = spark.readStream
      .option("maxFilesPerTrigger", "4")
      .text(dir)

    val wall0 = System.nanoTime()
    val q = TripStreamJob.start(
      spark,
      startLines = lines(startDir),
      endLines = lines(endDir),
      tablePath = s"$base/table",
      checkpointDir = s"$base/ckpt",
      trigger = Trigger.AvailableNow())
    q.awaitTermination()
    val secs = (System.nanoTime() - wall0) / 1e9

    val progress = q.recentProgress
    val inputRows = progress.map(_.numInputRows).sum
    val batches = progress.count(_.numInputRows > 0)
    val peakState = progress
      .flatMap(_.stateOperators.map(_.numRowsTotal)).maxOption.getOrElse(0L)
    val completed = graft.sink.TripTableSink.readMerged(spark, s"$base/table")
      .where(col("status") === graft.schema.TripSchemas.StatusCompleted)
      .count()
    println(
      s"""{"metric":"stream_rows_per_sec","value":${(inputRows / secs).round},""" +
        s""""unit":"rows/sec","rows":$inputRows,"wall_sec":$secs,""" +
        s""""batches":$batches,"peak_state_rows":$peakState,""" +
        s""""completed_trips":$completed,"n_trips":$nTrips,"cpus":$cpus}""")
    spark.stop()
  }
}
