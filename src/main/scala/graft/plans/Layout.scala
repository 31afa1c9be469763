package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Physical-layout helpers for 100 TB-scale joins: key salting for skew
  * and bucketed tables for shuffle-free co-located joins.
  *
  * These complement AQE (GraftSession turns on runtime skew-join
  * splitting): salting is the static answer when one key dominates so
  * hard that even a split partition is one task's worth of work, and
  * bucketing removes the per-query shuffle entirely for join keys that
  * are stable across many queries (the fact-table pattern).
  */
object Layout {

  /** Salted equi-join: big side gets a deterministic per-row salt in
    * [0, salts); the (small) other side is exploded across all salts, so
    * a key with a billion rows spreads over `salts` reducers instead of
    * one. Result equals `big.join(small, key, joinType)` for inner/left
    * joins; the extra cost is a `salts`× replication of the small side.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // right/full-outer would emit `salts` null-padded copies of every
    // unmatched small-side row (it is exploded across all salts)
    require(Set("inner", "left", "left_outer", "leftouter").contains(joinType),
      s"saltedJoin supports inner/left joins only, got $joinType")
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Write a bucketed+sorted table into the session catalog: two tables
    * bucketed the same way join with ZERO shuffle (each task zips bucket
    * i with bucket i). This is the stable-join-key layout for the trips
    * table (`trip_id`) and any fact table at scale.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Morton (Z-order) code of two non-negative integer columns, `bits`
    * bits each, interleaved x-high: bit i of x lands at position 2i+1,
    * bit i of y at 2i. Inputs must already sit in [0, 2^bits) —
    * compose with [[rankScaled]] for arbitrary numerics.
    *
    * Pure shift/and/or arithmetic (2·bits codegen ops, no UDF, no
    * branch), and [[mortonCodeSql]] emits the IDENTICAL formula for
    * DuckDB from the same loop, so the q row oracles the bit math
    * end-to-end from one source of truth (the canonicalUrlSql pattern).
    */
  def mortonCode(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i))
    }
  }

  /** [[mortonCode]]'s formula as a DuckDB SQL expression over the two
    * argument expressions — generated from the same loop.
    */
  def mortonCodeSql(xExpr: String, yExpr: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).flatMap(i => Seq(
      s"(((($xExpr) >> $i) & 1) << ${2 * i + 1})",
      s"(((($yExpr) >> $i) & 1) << ${2 * i})")).mkString(" | ")
  }

  /** Min-max scale a numeric column into [0, 2^bits) as a long —
    * `lo`/`hi` are the column's bounds (compute them once with an agg
    * and pass literals; a 1-row broadcast cross-join keeps the plan
    * lazy if preferred). Values at `hi` map to 2^bits − 1.
    */
  def rankScaled(v: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    val span = hi - lo
    val maxCode = (1L << bits) - 1
    least(lit(maxCode), greatest(lit(0L),
      floor((v.cast("double") - lo) / span * (maxCode + 1)).cast("long")))
  }

  /** Rewrite `df` into Z-order along two integer-coded columns: range
    * partition + sort by the interleaved code. Each written file then
    * covers a small 2-D tile, so its parquet min/max stats are TIGHT ON
    * BOTH columns and a 2-D box predicate prunes most row groups —
    * where a linear sort gives tight stats on one column and full-range
    * stats on the other. This is the multi-dimensional data-skipping
    * layout for scan-heavy tables (time × key, host × depth).
    *
    * The helper column is dropped before return; write the result with
    * `maxRecordsPerFile` (or one task per output partition) so file
    * boundaries track the range partitioning.
    */
  def zOrdered(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int,
      partitions: Int): DataFrame =
    df.withColumn("__z", mortonCode(col(xCol), col(yCol), bits))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")

  /** True when the compiled physical plan contains no shuffle exchange
    * of any kind (hash, range, or single-partition) — the assertion that
    * a bucketed or pre-partitioned join really is co-located. Broadcast
    * exchanges don't count: they replicate, they don't repartition.
    */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.linesIterator.exists(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange"))

  /** Write with parquet BLOOM FILTERS on `bloomCols` — the row-group
    * skipping structure for point lookups on NON-sorted, NON-partition
    * columns (min/max stats skip nothing when every row group spans the
    * full value range; a bloom answers "definitely absent" per group).
    * At 100 TB this is the difference between a needle-in-haystack id
    * probe scanning every row group and touching only the groups whose
    * bloom might contain it — Spark's parquet reader consults the
    * blooms automatically for equality/IN pushdown.
    */
  def writeWithBloom(
      df: DataFrame,
      path: String,
      bloomCols: Seq[String],
      expectedNdv: Long = 100000L): Unit = {
    require(bloomCols.nonEmpty, "bloomCols must be non-empty")
    val opts = bloomCols.flatMap(c => Seq(
      s"parquet.bloom.filter.enabled#$c" -> "true",
      s"parquet.bloom.filter.expected.ndv#$c" -> expectedNdv.toString)).toMap
    df.write.options(opts).mode("overwrite").parquet(path)
  }

  /** Footer-level audit of the blooms [[writeWithBloom]] wrote: per
    * row group, whether a bloom exists for `column`, and for each
    * probe value whether the bloom might contain it. A metadata walk
    * (footers + bloom pages only — no data pages), driver-side like
    * every manifest read here. Returns
    * `(rowGroups, groupsWithBloom, mightContainByValue)`.
    */
  def bloomAudit(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      column: String,
      probes: Seq[Long]): (Int, Int, Map[Long, Int]) = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val files = fs.listStatus(root).toSeq
      .filter(f => f.getPath.getName.endsWith(".parquet"))
    var groups = 0
    var withBloom = 0
    val hits = scala.collection.mutable.Map.empty[Long, Int]
      .withDefaultValue(0)
    files.foreach { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
      try {
        reader.getFooter.getBlocks.asScala.foreach { block =>
          groups += 1
          val col = block.getColumns.asScala
            .find(_.getPath.toDotString == column)
            .getOrElse(throw new IllegalArgumentException(
              s"no column $column in ${f.getPath}"))
          val bloom = reader.getBloomFilterDataReader(block).readBloomFilter(col)
          if (bloom != null) {
            withBloom += 1
            probes.foreach { v =>
              if (bloom.findHash(bloom.hash(v))) hits(v) += 1
            }
          }
        }
      } finally reader.close()
    }
    (groups, withBloom, hits.toMap.withDefaultValue(0))
  }
}
