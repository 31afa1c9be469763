package graft.plans

import org.apache.spark.sql.{DataFrame, SaveMode}
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

  /** True when the compiled physical plan contains no shuffle exchange
    * of any kind (hash, range, or single-partition) — the assertion that
    * a bucketed or pre-partitioned join really is co-located. Broadcast
    * exchanges don't count: they replicate, they don't repartition.
    */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.linesIterator.exists(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange"))
}
