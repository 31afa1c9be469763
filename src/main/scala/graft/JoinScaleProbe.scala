package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the two round-14 join operators (the
  * PageRankProbe pattern: measured locally, recorded in
  * BENCH_NOTES.md, NOT part of the bench set):
  *
  *  - skew: a 70%-hot-key join, plain sort-merge vs salted — the
  *    salted form bounds the largest reducer task at hot/salts rows,
  *    so its wall tracks the EVEN share while the plain join's wall
  *    tracks the hot key.
  *  - range: interval-overlap join, naive theta (nested loop) vs the
  *    bucketed equi-join — quadratic vs near-linear in rows at fixed
  *    overlap density.
  *
  * Usage: `sbt "runMain graft.JoinScaleProbe"` (optional env
  * SPARK_GRAFT_CPUS).
  */
object JoinScaleProbe {

  private def timed[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val r = f
    ((System.nanoTime() - t0) / 1e9, r)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-join-probe")
    import spark.implicits._

    // Three spellings of the same 70%-hot-key join: a plain sort-merge
    // with AQE's skew split disabled (the straggler an unprotected
    // plan suffers), plain with AQE on (Spark's adaptive remedy), and
    // the explicit salt. The salt's value proposition at scale is the
    // cases the adaptive path can't cover — a skewed AGGREGATION key
    // downstream, or a sink that needs the spread partitioning — so
    // parity with AQE-on here is the expected (and honest) result.
    println("== skew probe: 70% of rows on ONE key, dim 10k keys ==")
    for (n <- Seq(4000000L, 16000000L)) {
      val big = spark.range(n).select(
        col("id"),
        when(pmod(col("id"), lit(10)) < 7, 0L)
          .otherwise(pmod(col("id"), lit(10000))).as("k"))
        .localCheckpoint()
      val dim = spark.range(10000).select(col("id").as("k"),
        concat(lit("name"), col("id")).as("name")).localCheckpoint()
      def plainCount(): Long =
        big.hint("merge").join(dim, Seq("k")).groupBy("name").count()
          .agg(sum("count")).head.getLong(0)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val (tNoAqe, cNoAqe) = timed(plainCount())
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      val (tAqe, cAqe) = timed(plainCount())
      val (tSalted, cSalted) = timed(
        graft.operators.SkewJoin
          .saltedInnerJoin(big, dim, Seq("k"), salts = 32, forceShuffle = true)
          .groupBy("name").count().agg(sum("count")).head.getLong(0))
      require(cNoAqe == cSalted && cAqe == cSalted,
        s"row mismatch: $cNoAqe/$cAqe vs $cSalted")
      println(f"n=$n%9d  plain-noAQEskew=$tNoAqe%6.2fs  plain-AQE=$tAqe%6.2fs  " +
        f"salted=$tSalted%6.2fs  rows=$cSalted")
      big.unpersist(); dim.unpersist()
    }

    println("== range probe: overlap join, naive theta vs bucketed ==")
    for (n <- Seq(40000L, 80000L, 160000L, 320000L)) {
      val iv = spark.range(n).select(
        col("id"),
        (pmod(col("id") * 2654435761L, lit(n * 20L))).as("st"))
        .withColumn("en", col("st") + pmod(col("id"), lit(200)) + 1)
        .localCheckpoint()
      val l = iv.where(pmod(col("id"), lit(2)) === 0)
      val r = iv.where(pmod(col("id"), lit(2)) === 1)
        .select(col("id").as("rid"), col("st").as("rst"), col("en").as("ren"))
      val (tNaive, cNaive) = timed(
        l.join(r, col("st") <= col("ren") && col("rst") <= col("en")).count())
      val (tBucket, cBucket) = timed(
        graft.operators.RangeJoin.overlapJoin(
          l, iv.where(pmod(col("id"), lit(2)) === 1), "st", "en",
          bucket = 256).count())
      require(cNaive == cBucket, s"pair mismatch: $cNaive vs $cBucket")
      println(f"n=$n%6d  naive=$tNaive%6.2fs  bucketed=$tBucket%6.2fs  pairs=$cNaive")
      iv.unpersist()
    }
    spark.stop()
  }
}
