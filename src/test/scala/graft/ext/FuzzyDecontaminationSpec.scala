package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Fuzzy (MinHash) eval-set decontamination: the planted-paraphrase
  * fixture that bounds driver row q87. The benchmark set contains an
  * exact copy, a paraphrase (every 5th token replaced — no word-5-gram
  * survives, most trigram shingles do), and an unrelated document;
  * exact n-gram decontamination must miss the paraphrase, the fuzzy
  * path must catch it.
  */
class FuzzyDecontaminationSpec extends AnyFunSuite with Matchers
    with SparkTestBase {

  // 60 tokens, all distinct, vocabulary disjoint across docs
  private def docText(k: Int): String =
    (0 until 60).map(i => s"w${k}x$i").mkString(" ")

  // every 5th token replaced: max run of surviving tokens is 4, so no
  // 5-token window of the paraphrase appears verbatim in the original
  private def paraphrase(text: String): String =
    text.split(" ").zipWithIndex
      .map { case (t, i) => if (i % 5 == 4) "qz" else t }.mkString(" ")

  private def fixture = {
    import spark.implicits._
    val corpus = (1 to 4).map(k => (k.toLong, docText(k))).toDF("doc_id", "text")
    val bench = Seq(
      (101L, docText(1)),              // verbatim leak of doc 1
      (102L, paraphrase(docText(2))),  // paraphrased leak of doc 2
      (103L, docText(9))               // unrelated
    ).toDF("bench_id", "bench_text")
    (corpus, bench)
  }

  test("exact n-gram decontamination misses the paraphrase") {
    val (corpus, bench) = fixture
    val exact = TextPipeline.contaminatedIds(
        corpus, "doc_id", "text", bench, "bench_text", n = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    exact shouldBe Set(1L) // the verbatim copy only
  }

  test("fuzzy decontamination catches verbatim AND paraphrase, not unrelated") {
    val (corpus, bench) = fixture
    val fuzzy = TextPipeline.contaminatedIdsFuzzy(
      corpus, "doc_id", "text", bench, "bench_id", "bench_text",
      minJaccard = 0.2)
    val byId = fuzzy.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    byId.keySet shouldBe Set(1L, 2L)
    // verbatim copy: identical shingle set -> identical signature
    byId(1L)._2 shouldBe 1.0
    byId(1L)._1 shouldBe 1L
    // paraphrase: true trigram Jaccard = 24/92 ~ 0.26; the 128-hash
    // estimate must land in the detection zone, well under verbatim
    byId(2L)._2 should be >= 0.2
    byId(2L)._2 should be < 0.6
  }

  test("decontaminateFuzzy drops exactly the contaminated docs") {
    val (corpus, bench) = fixture
    val kept = TextPipeline.decontaminateFuzzy(
        corpus, "doc_id", "text", bench, "bench_id", "bench_text",
        minJaccard = 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    kept shouldBe Set(3L, 4L)
  }

  test("crossPairsFromSigs emits each colliding pair exactly once") {
    val (corpus, bench) = fixture
    val cSigs = Dedup.minhashSignatures(corpus, "doc_id", "text", 128, 3)
    val bSigs = Dedup.minhashSignatures(
      bench, "bench_id", "bench_text", 128, 3)
    val pairs = Dedup.crossPairsFromSigs(cSigs, bSigs,
      minJaccard = 0.2, numHashes = 128).collect()
    val keys = pairs.map(r => (r.getLong(0), r.getLong(1)))
    keys.toSet.size shouldBe keys.length // no duplicate emissions
    keys.toSet shouldBe Set((1L, 101L), (2L, 102L))
  }
}
