package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed upsert sink for the trips table (SURVEY.md §2.1 S7/S8).
  *
  * The DynamoDB analog: a `date`-partitioned parquet table with
  * last-write-wins merge by `trip_id`. Partitioning by `date` gives the
  * daily KPI job free partition pruning (Catalyst
  * PruneFileSourcePartitions replaces the reference's manual
  * KeyConditionExpression, daily_kpi_aggregation.py:45-56).
  *
  * Merge strategy: each micro-batch rewrites only the partitions it
  * touches (dynamic partition overwrite), merging batch rows over
  * existing rows per key. On a production cluster the same interface
  * targets a Delta/Iceberg MERGE; plain parquet keeps the engine
  * dependency-free here.
  */
object TripTableSink {

  private val seqCol = "__graft_seq"

  /** Full-snapshot write, date-partitioned. */
  def writeSnapshot(trips: DataFrame, path: String): Unit =
    trips.write.mode(SaveMode.Overwrite).partitionBy("date").parquet(path)

  /** Last-write-wins upsert of `batch` into the table at `path`,
    * keyed by `trip_id`, rewriting only touched `date` partitions.
    * `epoch` orders writers (foreachBatch passes its batchId).
    */
  def upsert(spark: SparkSession, batch: DataFrame, path: String, epoch: Long): Unit = {
    val incoming = batch.withColumn(seqCol, lit(epoch))
    val merged =
      if (!tableExists(spark, path)) incoming
      else {
        val existing = spark.read.parquet(path).withColumn(seqCol, lit(-1L))
        // Prune to touched dates only: tiny broadcast semi-join against
        // the batch's date set, so a day's upsert never reads the table's
        // full history.
        val touched = incoming.select("date").distinct()
        val existingTouched =
          existing.join(broadcast(touched), Seq("date"), "left_semi")
        val w = Window.partitionBy(col("trip_id")).orderBy(col(seqCol).desc)
        existingTouched.unionByName(incoming)
          .withColumn("__rn", row_number().over(w))
          .where(col("__rn") === 1)
          .drop("__rn")
      }
    val out = merged.drop(seqCol)
    val conf = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try out.write.mode(SaveMode.Overwrite).partitionBy("date").parquet(path)
    finally conf.foreach(spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
  }

  /** foreachBatch hook for a streaming correlation query. */
  def foreachBatchUpsert(path: String): (DataFrame, Long) => Unit =
    (batch, epoch) => {
      // Materialize first: foreachBatch re-evaluates the batch plan per
      // action, and upsert both reads and writes the target.
      val spark = batch.sparkSession
      val cached = batch.cache()
      try upsert(spark, cached, path, epoch)
      finally cached.unpersist()
    }

  private def tableExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }
}
