package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BloomBytes

import graft.SparkTestBase

class BloomGateSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def keyedDf(ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(i => (i, s"key-$i")).toDF("id", "k")
  }

  test("no false negatives: every inserted key probes true (10k keys)") {
    val seen = keyedDf(0L until 10000L)
    val filter = BloomGate.buildFilter(seen, "k", 10000L, 0.01)
    val missed = seen.where(!BloomGate.mightContain(filter, col("k"))).count()
    missed shouldBe 0L
  }

  test("measured FPR on disjoint keys is near the configured target") {
    val seen = keyedDf(0L until 10000L)
    val filter = BloomGate.buildFilter(seen, "k", 10000L, 0.01)
    val strangers = keyedDf(100000L until 120000L) // disjoint by construction
    val fp = strangers.where(BloomGate.mightContain(filter, col("k"))).count()
    val fpr = fp.toDouble / 20000
    fpr should be < 0.03 // 3x headroom over the 1% design point
    fpr should be > 0.0005 // and not vacuously zero — the filter is real
  }

  test("bloomedAntiJoin output is EXACTLY the plain anti-join, at several fpp points") {
    val big = keyedDf(0L until 2000L)
    val seen = keyedDf(500L until 1500L).select(col("k").as("sk"))
    val expected = big.join(seen.select(col("sk").as("k")), Seq("k"), "left_anti")
      .select("id").collect().map(_.getLong(0)).toSet
    expected shouldBe ((0L until 500L) ++ (1500L until 2000L)).toSet
    for (fpp <- Seq(0.5, 0.05, 0.001)) {
      val got = BloomGate.bloomedAntiJoin(big, "k", seen, "sk", fpp)
        .select("id").collect().map(_.getLong(0)).toSet
      withClue(s"fpp=$fpp: ") { got shouldBe expected }
    }
  }

  test("empty seen set: everything is definite-new") {
    val big = keyedDf(0L until 100L)
    val seen = keyedDf(Nil).select(col("k").as("sk"))
    BloomGate.bloomedAntiJoin(big, "k", seen, "sk").count() shouldBe 100L
  }

  test("serialized header round-trips and corrupt bytes throw, never return") {
    val words = new Array[Long](4)
    BloomBytes.setBits(words, 256L, 3, 42L)
    val f = BloomBytes.serialize(3, 256L, words)
    BloomBytes.mightContain(f, 42L) shouldBe true
    an[IllegalArgumentException] should be thrownBy
      BloomBytes.mightContain(Array[Byte](1, 2, 3), 42L)
    // flip the magic: structurally long enough, wrong signature
    val bad = f.clone(); bad(0) = 'X'.toByte
    an[IllegalArgumentException] should be thrownBy BloomBytes.mightContain(bad, 42L)
  }

  test("probe math: build-side setBits and probe-side mightContain share bit indices") {
    val numBits = 1024L
    val words = new Array[Long](16)
    val hashes = Seq(0L, -1L, Long.MinValue, Long.MaxValue, 123456789L)
    hashes.foreach(h => BloomBytes.setBits(words, numBits, 5, h))
    val f = BloomBytes.serialize(5, numBits, words)
    hashes.foreach(h => BloomBytes.mightContain(f, h) shouldBe true)
  }

  test("the definite-new branch's plan is shuffle-free: one scan, one codegen filter") {
    // spark.range, not a local Seq — ConvertToLocalRelation would
    // pre-evaluate the probe at optimize time and hide the plan shape
    val big = spark.range(100).select(col("id"), concat(lit("key-"), col("id")).as("k"))
    val filter = BloomGate.buildFilter(keyedDf(0L until 10L), "k", 10L, 0.01)
    val probed = big.where(!BloomGate.mightContain(filter, col("k")))
    val plan = probed.queryExecution.executedPlan.toString
    plan should not include "Exchange"
    plan.toLowerCase should include("bloom_contains")
    plan should include("*(1) Filter") // *(n) = inside WholeStageCodegen
    // the probe really gates: no true member survives (authoritative
    // "no"), and at most a small FP sliver of the 90 strangers drops
    val got = probed.select("id").collect().map(_.getLong(0)).toSet
    got.intersect((0L until 10L).toSet) shouldBe empty
    got.size should be >= 85
  }

  test("bloom_contains registers as a SQL function") {
    org.apache.spark.sql.graft.BloomContains.register(spark)
    val filter = BloomGate.buildFilter(keyedDf(Seq(7L)), "k", 1L, 0.01)
    val hex = filter.map(b => f"$b%02X").mkString
    import spark.implicits._
    val df = Seq(("key-7", true), ("key-8", false)).toDF("k", "expected")
    df.createOrReplaceTempView("bloom_probe_t")
    try {
      spark.sql(
          s"SELECT expected, bloom_contains(unhex('$hex'), xxhash64(k)) AS got " +
            "FROM bloom_probe_t")
        .collect().foreach(r => r.getBoolean(1) shouldBe r.getBoolean(0))
    } finally spark.catalog.dropTempView("bloom_probe_t")
  }
}
