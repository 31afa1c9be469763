package graft.ext

import org.apache.spark.sql.functions.{explode, split, sum}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Pins [[Bpe]] exactly against an INDEPENDENT reference
  * implementation (plain Scala collections, no regex, no Spark) of the
  * same published algorithm: greedy pair-count merge learning and
  * rank-ordered left-to-right encoding. The q88 pattern — the
  * distributed spelling must reproduce the sequential one bit-for-bit.
  */
class BpeSpec extends AnyFunSuite with Matchers with SparkTestBase {

  // ----- reference implementation (deliberately naive) -----

  private def refNormalize(text: String): Seq[String] =
    text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
      .split(" ").toSeq.filter(_.nonEmpty)

  /** Greedy left-to-right single-rule merge over a symbol sequence. */
  private def refApply(syms: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  private def refEncodeWord(word: String, merges: Seq[(String, String)]): List[String] =
    merges.foldLeft(word.map(_.toString).toList) {
      case (syms, (a, b)) => refApply(syms, a, b)
    }

  /** Frequency-weighted pair counts, overlapping occurrences included. */
  private def refPairCounts(vocab: Map[List[String], Long]): Map[(String, String), Long] =
    vocab.toSeq.flatMap { case (syms, f) =>
      syms.zip(syms.drop(1)).map(p => p -> f)
    }.groupMapReduce(_._1)(_._2)(_ + _)

  private def refLearn(texts: Seq[String], numMerges: Int): Seq[(String, String)] = {
    var vocab: Map[List[String], Long] = texts.flatMap(refNormalize)
      .groupMapReduce(identity)(_ => 1L)(_ + _)
      .map { case (w, f) => w.map(_.toString).toList -> f }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.size < numMerges) {
      val pc = refPairCounts(vocab)
      if (pc.isEmpty) done = true
      else {
        val (pair, cnt) = pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        if (cnt < 2L) done = true
        else {
          merges += pair
          vocab = vocab.toSeq
            .map { case (syms, f) => refApply(syms, pair._1, pair._2) -> f }
            .groupMapReduce(_._1)(_._2)(_ + _)
        }
      }
    }
    merges.toSeq
  }

  private def refDocCount(text: String, merges: Seq[(String, String)]): (Long, Long) = {
    val words = refNormalize(text)
    (words.size.toLong, words.map(w => refEncodeWord(w, merges).size.toLong).sum)
  }

  // ----- specs -----

  private val fixture = Seq(
    (1L, "the cat sat on the mat and the cat was flat"),
    (2L, "the bat and the rat sat near the cat on the mat"),
    (3L, "lower lowest newer newest wider widest low new wide"),
    (4L, "aaaa aaa aa aaaaaa repeated letters stress the greedy pairing"),
    (5L, "numbers 12345 and 67890 mixed with words like cat777cat"),
    (6L, ""), // gram-less doc: must still emit a (0, 0) row
    (7L, "!!! ??? ...")) // normalizes to empty too

  test("learnMerges reproduces the reference merge table in rank order") {
    import spark.implicits._
    val df = fixture.toDF("doc_id", "text")
    val model = Bpe.learnMerges(df, "text", numMerges = 24)
    val expected = refLearn(fixture.map(_._2), numMerges = 24)
    model.merges shouldBe expected
    model.merges.size should be > 8 // the fixture genuinely learns
  }

  test("learnMerges: driver-local and distributed loop branches learn identical tables") {
    // r22 added a measured-size branch: small vocabularies run the
    // greedy loop in driver memory, large ones keep the distributed
    // per-round aggregate. Forcing the byte threshold to 1 byte drives
    // the SAME fixture down the distributed branch; the tables must be
    // equal rule for rule (and both equal the reference, via the test
    // above).
    import spark.implicits._
    val df = fixture.toDF("doc_id", "text")
    val local = Bpe.learnMerges(df, "text", numMerges = 24)
    val key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val old = spark.conf.get(key)
    val dist = try {
      spark.conf.set(key, "1b")
      Bpe.learnMerges(df, "text", numMerges = 24)
    } finally spark.conf.set(key, old)
    dist.merges shouldBe local.merges
  }

  test("encode matches the reference word-by-word, including (0,0) for gram-less docs") {
    import spark.implicits._
    val df = fixture.toDF("doc_id", "text")
    val model = Bpe.learnMerges(df, "text", numMerges = 24)
    val got = Bpe.encode(df, "doc_id", "text", model)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val expected = fixture.map { case (id, t) =>
      val (nw, nb) = refDocCount(t, model.merges); (id, nw, nb)
    }
    got shouldBe expected
    got.find(_._1 == 6L).get shouldBe ((6L, 0L, 0L))
    got.find(_._1 == 7L).get shouldBe ((7L, 0L, 0L))
  }

  test("greedy run pairing: aaaa -> [aa,aa], aaa -> [aa,a] under rule (a,a)") {
    import spark.implicits._
    val df = Seq((1L, "aaaa aaa aa a")).toDF("doc_id", "text")
    // (a,a) dominates this corpus, so it is the first learned rule
    val model = Bpe.learnMerges(df, "text", numMerges = 1)
    model.merges.head shouldBe (("a", "a"))
    val wp = Bpe.wordPieces(
        Seq("aaaa", "aaa", "aa", "a").toDF("__w"), "__w", model)
      .select("__w", "__pieces").as[(String, String)].collect().toMap
    wp("aaaa") shouldBe "aa aa"
    wp("aaa") shouldBe "aa a"
    wp("aa") shouldBe "aa"
    wp("a") shouldBe "a"
  }

  test("encode matches the reference on a realistic-profile corpus") {
    import spark.implicits._
    val corpus = SyntheticCorpus.realistic(spark, 200L).select("doc_id", "text")
    val texts = corpus.as[(Long, String)].collect().sortBy(_._1)
    val model = Bpe.learnMerges(corpus, "text", numMerges = 16)
    model.merges shouldBe refLearn(texts.map(_._2), numMerges = 16)
    val got = Bpe.encode(corpus, "doc_id", "text", model)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val expected = texts.map { case (id, t) =>
      val (nw, nb) = refDocCount(t, model.merges); (id, nw, nb)
    }
    got shouldBe expected
    // word-internal merges can never drop below one piece per word
    got.foreach { case (_, nw, nb) => nb should be >= nw }
  }

  test("chunkByBpeTokens: budget respected up to the straddling word, words never split, text reassembles") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one"),
      (3L, "supercalifragilistic tiny words here")).toDF("doc_id", "text")
    val model = Bpe.learnMerges(df, "text", numMerges = 8)
    val chunks = Bpe.chunkByBpeTokens(df, "doc_id", "text", model, chunkBudget = 12)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, Long, String)].collect()
    // reassembly: concatenating a doc's chunks restores its normalized text
    val byDoc = chunks.groupBy(_._1)
    for ((id, text) <- Seq((1L, "alpha beta gamma delta epsilon zeta eta " +
        "theta iota kappa"), (2L, "one"),
        (3L, "supercalifragilistic tiny words here"))) {
      byDoc(id).sortBy(_._2).map(_._4).mkString(" ") shouldBe text
      // chunk_idx is derived from running start offsets: contiguity
      byDoc(id).map(_._2).toSeq shouldBe (0L until byDoc(id).length.toLong)
    }
    // per-word piece costs, to bound the overflow check
    val wp = Bpe.wordPieces(
        df.select(explode(split(graft.ext.TextAnalysis.normalize($"text"), " "))
          .as("__w")).distinct(), "__w", model)
      .select("__w", "__np").as[(String, Long)].collect().toMap
    val maxPieces = wp.values.max
    chunks.foreach { case (_, _, tot, txt) =>
      val words = txt.split(" ")
      // overflow bounded by the straddling word; single-word chunks
      // may exceed the budget only because the word itself does
      if (words.length > 1) tot should be <= (12L + maxPieces - 1L)
    }
  }

  test("packSequences accepts the learned count column") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "a much longer document with many more words than the first one"),
      (3L, "short")).toDF("doc_id", "text")
    val model = Bpe.learnMerges(df, "text", numMerges = 8)
    val enc = Bpe.encode(df, "doc_id", "text", model)
    val packed = Sampling.packSequences(enc, "doc_id", "n_bpe_tokens", 16L)
    val total = enc.agg(sum("n_bpe_tokens")).as[Long].head()
    val rows = packed.select("doc_id", "pack_id", "n_packs")
      .as[(Long, Long, Long)].collect()
    rows should have length 3
    // every pack id in range implied by the total stream length
    val maxPack = rows.map(_._2).max
    maxPack should be <= (total / 16L)
  }
}
