package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Persisted MinHash index: the filesystem round-trip must not change
  * the pair estimates, admission must gate on near-dups of INDEXED
  * docs only, and append-mode maintenance must extend the gate to
  * previously admitted batches.
  */
class MinhashIndexSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def docText(k: Int): String =
    (0 until 40).map(i => s"v${k}w$i").mkString(" ")

  // ~10% token substitution: well above a 0.5 Jaccard threshold
  private def nearDup(text: String): String =
    text.split(" ").zipWithIndex
      .map { case (t, i) => if (i % 10 == 9) "qz" else t }.mkString(" ")

  test("index round-trip reproduces the in-memory cross-pair estimates") {
    import spark.implicits._
    val indexed = (1 to 6).map(k => (k.toLong, docText(k))).toDF("doc_id", "text")
    val fresh = Seq(
      (101L, docText(1)),          // exact copy of indexed 1
      (102L, nearDup(docText(2))), // near-dup of indexed 2
      (103L, docText(9))           // novel
    ).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft-mhidx").toString
    Dedup.writeMinhashIndex(indexed, "doc_id", "text", path)
    val viaIndex = Dedup.pairsAgainstMinhashIndex(
        fresh, "doc_id", "text", path, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inMemory = Dedup.crossPairsFromSigs(
        Dedup.minhashSignatures(indexed, "doc_id", "text"),
        Dedup.minhashSignatures(fresh, "doc_id", "text"),
        minJaccard = 0.5, numHashes = 128)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    viaIndex shouldBe inMemory
    viaIndex.map { case (a, b, _) => (a, b) } shouldBe Set((1L, 101L), (2L, 102L))
    // the exact copy estimates at 1.0; the near-dup strictly below
    viaIndex.find(_._2 == 101L).get._3 shouldBe 1.0
    viaIndex.find(_._2 == 102L).get._3 should (be >= 0.5 and be < 1.0)
  }

  test("admitNearUnique gates on the index and append extends the gate") {
    import spark.implicits._
    val indexed = (1 to 6).map(k => (k.toLong, docText(k))).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft-mhidx2").toString
    Dedup.writeMinhashIndex(indexed, "doc_id", "text", path)
    // batch 1: a near-dup of indexed 3 is rejected, novel 201 admitted
    val batch1 = Seq(
      (200L, nearDup(docText(3))),
      (201L, docText(20))).toDF("doc_id", "text")
    val admitted1 = Dedup.admitNearUnique(
      batch1, "doc_id", "text", path, minJaccard = 0.5)
    admitted1.select("doc_id").collect().map(_.getLong(0)).toSet shouldBe Set(201L)
    // maintain: append the admitted rows' signatures
    Dedup.writeMinhashIndex(admitted1, "doc_id", "text", path, mode = "append")
    // batch 2: a near-dup of batch-1's 201 must now be rejected too
    val batch2 = Seq(
      (300L, nearDup(docText(20))),
      (301L, docText(30))).toDF("doc_id", "text")
    val admitted2 = Dedup.admitNearUnique(
      batch2, "doc_id", "text", path, minJaccard = 0.5)
    admitted2.select("doc_id").collect().map(_.getLong(0)).toSet shouldBe Set(301L)
  }

  test("signature-family mismatch is rejected on query AND on append") {
    import spark.implicits._
    val indexed = (1 to 4).map(k => (k.toLong, docText(k))).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft-mhidx3").toString
    Dedup.writeMinhashIndex(indexed, "doc_id", "text", path,
      numHashes = 128, shingleSize = 3)
    val batch = Seq((500L, docText(50))).toDF("doc_id", "text")
    // wrong width on query
    val e1 = intercept[IllegalArgumentException] {
      Dedup.pairsAgainstMinhashIndex(batch, "doc_id", "text", path,
        minJaccard = 0.5, numHashes = 64)
    }
    e1.getMessage should include("numHashes=128")
    // wrong shingle size on query (same width — only the metadata
    // sidecar can catch this; the stored rows are indistinguishable)
    val e2 = intercept[IllegalArgumentException] {
      Dedup.pairsAgainstMinhashIndex(batch, "doc_id", "text", path,
        minJaccard = 0.5, numHashes = 128, shingleSize = 2)
    }
    e2.getMessage should include("shingleSize=3")
    // a mismatched append must fail BEFORE writing anything — a mixed
    // index silently under-estimates every Jaccard
    val e3 = intercept[IllegalArgumentException] {
      Dedup.writeMinhashIndex(batch, "doc_id", "text", path,
        numHashes = 64, mode = "append")
    }
    e3.getMessage should include("append")
    // the index is unpoisoned: the original query still runs clean
    Dedup.pairsAgainstMinhashIndex(batch, "doc_id", "text", path,
      minJaccard = 0.5, numHashes = 128, shingleSize = 3).count() shouldBe 0L
  }

  test("md5 sigMode: same pair semantics, and mode mismatch is rejected") {
    import spark.implicits._
    val indexed = (1 to 6).map(k => (k.toLong, docText(k))).toDF("doc_id", "text")
    val fresh = Seq(
      (101L, docText(1)),          // exact copy of indexed 1
      (102L, nearDup(docText(2))), // near-dup of indexed 2
      (103L, docText(9))           // novel
    ).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft-mhidx4").toString
    Dedup.writeMinhashIndex(indexed, "doc_id", "text", path,
      sigMode = Dedup.SigMode.Md5)
    val pairs = Dedup.pairsAgainstMinhashIndex(
        fresh, "doc_id", "text", path, minJaccard = 0.5,
        sigMode = Dedup.SigMode.Md5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the verify-mode lanes must reach the same verdicts as xxhash64:
    // exact copy at 1.0, near-dup in [0.5, 1), novel absent
    pairs.map { case (a, b, _) => (a, b) }.toSet shouldBe
      Set((1L, 101L), (2L, 102L))
    pairs.find(_._2 == 101L).get._3 shouldBe 1.0
    pairs.find(_._2 == 102L).get._3 should (be >= 0.5 and be < 1.0)
    // querying an md5 index with xxhash64 lanes must be rejected — the
    // signatures are mutually meaningless
    val e = intercept[IllegalArgumentException] {
      Dedup.pairsAgainstMinhashIndex(fresh, "doc_id", "text", path,
        minJaccard = 0.5)
    }
    e.getMessage should include("sigMode=md5")
  }
}
