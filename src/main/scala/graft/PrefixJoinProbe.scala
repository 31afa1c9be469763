package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prefix-filter join scale probe: q130/q131 prove correctness (hash
  * match vs brute force) and the sf0.1 profile; this main runs the SAME
  * construction over growing realistic corpora and prints one JSON line
  * per scale point with the candidate-pair count, emitted-pair count,
  * and wall seconds — the evidence that candidates grow near-linearly
  * with n on a Zipfian vocabulary (the brute-force index join is
  * Θ(Σ df²), quadratic in the hottest posting list).
  *
  * The candidate stage is instrumented inline (mirroring
  * [[graft.ext.Dedup.prefixJaccardPairs]] stage for stage) because the
  * operator itself keeps candidates lazy; equivalence of the mirrored
  * chain is guaranteed by using the same building blocks on the same
  * corpus seed.
  *
  * Run: `SPARK_GRAFT_PROBE_DOCS=5000,20000,80000
  * sbt "runMain graft.PrefixJoinProbe"`
  */
object PrefixJoinProbe {
  def main(args: Array[String]): Unit = {
    val sizes = sys.env.getOrElse("SPARK_GRAFT_PROBE_DOCS", "5000,20000,80000")
      .split(",").map(_.trim.toLong).toSeq
    val tau = sys.env.getOrElse("SPARK_GRAFT_PROBE_TAU", "0.8").toDouble
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-prefixjoin-probe"),
      shufflePartitions = cpus
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ext.Dedup

    // vocabulary scales with corpus size (Heaps' law): with a FIXED
    // vocabulary every posting list grows ∝ n and Σdf² grows n² — no
    // exact method escapes that; the probe's claim is about realistic
    // growth, so vocab defaults to 2×docs (min 10k)
    val vocabX = sys.env.getOrElse("SPARK_GRAFT_PROBE_VOCAB_X", "2.0").toDouble
    val results = sizes.map { nDocs =>
      val vocab = math.max(10000L, (nDocs * vocabX).toLong).toInt
      val docs = graft.ext.SyntheticCorpus
        .realistic(spark, nDocs, vocab = vocab).localCheckpoint()
      val t0 = System.nanoTime()
      // mirrored candidate chain (instrumentation)
      val sh = docs.select(col("doc_id").as("__id"),
        sort_array(Dedup.wordShingles(col("text"), 1)).as("__sh")).localCheckpoint()
      val inv = sh.select(col("__id"), size(col("__sh")).cast("long").as("__n"),
        explode(col("__sh")).as("__g"))
      val freq = inv.groupBy("__g").agg(count(lit(1)).as("__gdf"))
      val sized = inv.join(broadcast(freq), Seq("__g"))
        .withColumn("__pos", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("__id")).orderBy(col("__gdf"), col("__g"))))
      val prefix = sized
        .where(col("__pos") <= col("__n") - ceil(lit(tau) * col("__n") - 1e-9) + 1)
        .select(col("__id"), col("__g"), col("__n")).localCheckpoint()
      val cands = prefix.as("x").join(prefix.as("y"), col("x.__g") === col("y.__g"))
        .where(col("x.__id") < col("y.__id"))
        .where(greatest(col("x.__n"), col("y.__n")) * tau - 1e-9 <=
          least(col("x.__n"), col("y.__n")))
        .select(col("x.__id").as("id_a"), col("y.__id").as("id_b"))
        .distinct().count()
      val candSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val pairs = Dedup.prefixJaccardPairs(docs, "doc_id", "text",
        n = 1, minJaccard = tau).count()
      val fullSec = (System.nanoTime() - t1) / 1e9
      (nDocs, vocab, cands, candSec, pairs, fullSec)
    }
    val json = results.map { case (n, v, c, cs, p, fs) =>
      f"""{"docs":$n,"vocab":$v,"candidates":$c,"cand_sec":$cs%.2f,"pairs":$p,"full_sec":$fs%.2f}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"prefix_join_probe","tau":$tau,"points":$json}""")
    spark.stop()
  }
}
