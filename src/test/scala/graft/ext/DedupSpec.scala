package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class DedupSpec extends AnyFunSuite with Matchers with SparkTestBase {

  import Dedup._

  test("exact dedup: null-position adversarial keys do NOT collide") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), None: Option[String]),
      (2L, None: Option[String], Some("a")),
      (3L, Some("a"), None: Option[String])).toDF("id", "c1", "c2")
    val out = exact(df, Seq("c1", "c2"), "id")
    out.count() shouldBe 2 // rows 1 and 2 are distinct keys; 3 dups 1
    out.select("id").as[Long].collect().sorted shouldBe Array(1L, 2L)
  }

  test("exact dedup keeps the smallest tieBreak row") {
    import spark.implicits._
    val df = Seq((9L, "x"), (4L, "x"), (7L, "y")).toDF("id", "k")
    val out = exact(df, Seq("k"), "id")
    out.select("id").as[Long].collect().sorted shouldBe Array(4L, 7L)
  }

  test("exactGroups counts copies and picks min representative") {
    import spark.implicits._
    val df = Seq((5L, "x"), (2L, "x"), (8L, "y")).toDF("id", "k")
    val out = exactGroups(df, Seq("k"), "id")
      .orderBy("k").collect()
    out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))) shouldBe
      Array(("x", 2L, 2L), ("y", 8L, 1L))
  }

  test("minhash: aggregate-path signatures equal the scalar expression") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "the quick brown fox jumps over the lazy dog again")).toDF("id", "text")
    val viaAgg = minhashSignatures(docs, "id", "text", numHashes = 16, shingleSize = 2)
      .select(col("__id").as("id"), col("__sig"))
    val viaExpr = docs.select(col("id"),
      minhashSignature(col("text"), numHashes = 16, shingleSize = 2).as("__sig"))
    val joined = viaAgg.alias("a").join(viaExpr.alias("e"), "id")
      .where(col("a.__sig") =!= col("e.__sig"))
    joined.count() shouldBe 0
  }

  test("minhash pairs: identical docs found with est_jaccard 1.0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "one two three four five six seven eight")).toDF("id", "text")
    val pairs = minhashPairs(docs, "id", "text", 0.9, numHashes = 32, bands = 8, shingleSize = 2)
      .collect()
    pairs.map(r => (r.getLong(0), r.getLong(1))) shouldBe Array((1L, 2L))
    pairs.head.getDouble(2) shouldBe 1.0
  }

  test("simhash: aggregate-path frame equals the scalar expression") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "sphinx of black quartz judge my vow")).toDF("id", "text")
    val viaAgg = simhashFrame(docs, "id", "text")
      .select(col("__id").as("id"), col("__sh"))
    val viaExpr = docs.select(col("id"), simhash64(col("text")).as("__sh"))
    viaAgg.alias("a").join(viaExpr.alias("e"), "id")
      .where(col("a.__sh") =!= col("e.__sh"))
      .count() shouldBe 0
  }

  test("simhash: identical docs collide; hamming bound respected") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark engine query plan optimizer shuffle partition"),
      (2L, "spark engine query plan optimizer shuffle partition"),
      (3L, "completely different words about cooking pasta tonight")).toDF("id", "text")
    val pairs = simhashPairs(docs, "id", "text", maxHamming = 3).collect()
    pairs.map(r => (r.getLong(0), r.getLong(1))) should contain((1L, 2L))
    all(pairs.map(_.getInt(2))) should be <= 3
  }

  test("ngram jaccard: identical docs score 1.0, disjoint docs absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g"),
      (2L, "a b c d e f g"),
      (3L, "q r s t u v w")).toDF("id", "text")
    val pairs = ngramJaccardPairs(docs, "id", "text", n = 2, minJaccard = 0.5)
      .collect()
    pairs.map(r => (r.getLong(0), r.getLong(1))) shouldBe Array((1L, 2L))
    pairs.head.getDouble(2) shouldBe 1.0
  }

  test("connected components: transitive chain collapses to min label") {
    import spark.implicits._
    val nodes = (1L to 6L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val comp = connectedComponents(nodes, pairs)
      .orderBy("id").as[(Long, Long)].collect()
    comp shouldBe Array((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 6L))
  }

  test("hot-shingle guard drops stopword shingles from the index") {
    import spark.implicits._
    // "the" appears in every doc; with maxDocFreq=2 it is excluded, so
    // docs sharing ONLY "the" produce no pair.
    val docs = Seq(
      (1L, "the apple orchard"),
      (2L, "the rusty bicycle"),
      (3L, "the quiet harbor")).toDF("id", "text")
    val pairs = ngramJaccardPairs(docs, "id", "text", n = 1, minJaccard = 0.01,
      maxDocFreq = 2L)
    pairs.count() shouldBe 0
  }
}
