package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class SyntheticCorpusSpec extends AnyFunSuite with Matchers with SparkTestBase {

  test("realistic corpus is deterministic across partitionings") {
    val a = SyntheticCorpus.realistic(spark, 300).orderBy("doc_id").collect()
    val b = SyntheticCorpus.realistic(spark, 300).repartition(7)
      .orderBy("doc_id").collect()
    a.map(r => (r.getLong(0), r.getString(1))) shouldBe
      b.map(r => (r.getLong(0), r.getString(1)))
  }

  test("realistic corpus has a wide vocabulary, unlike the degenerate fixture") {
    val docs = SyntheticCorpus.realistic(spark, 1000)
    val distinctWords = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .select(countDistinct("w")).head.getLong(0)
    // the degenerate documents fixture has ~50; realistic English-like
    // corpora have thousands of distinct tokens at this size
    distinctWords should be > 2000L
    // near-dup pair density is SPARSE: candidates come from the planted
    // ~8% dups, not from 75% of all pairs
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
      minJaccard = 0.7, numHashes = 64, shingleSize = 1).count()
    // ~80 planted dups → roughly one pair each (plus intra-cluster
    // pairs when dups share a source), and ≪ n²/2 = 500k possible
    pairs should be > 50L
    pairs should be < 500L
  }

  test("lang-weighted corpus makes lang-ID quality measurable: diagonal dominance") {
    val docs = SyntheticCorpus.realistic(spark, 2000, langWeights =
      Seq("en" -> 40, "es" -> 20, "de" -> 15, "fr" -> 15, "zh" -> 10))
    val perLang = docs
      .select(col("lang"), LangId.langId(col("text")).as("pred"))
      .groupBy("lang").agg(
        count(lit(1)).as("n"),
        sum(when(col("lang") === col("pred"), 1L).otherwise(0L)).as("hit"))
      .collect()
    perLang.map(_.getString(0)).sorted shouldBe Array("de", "en", "es", "fr", "zh")
    perLang.foreach { r =>
      val recall = r.getLong(2).toDouble / r.getLong(1)
      withClue(s"lang ${r.getString(0)} recall $recall (n=${r.getLong(1)}): ") {
        recall should be >= 0.9
      }
    }
    // and this is NOT guaranteed-by-construction: the generator salts
    // from the held-out 30-word lexicon, of which the classifier's
    // feature list is a strict 10-word subset per language
    SyntheticCorpus.lexicon.keySet shouldBe LangId.stopwords.keySet
    LangId.stopwords.foreach { case (l, ws) =>
      withClue(s"lang $l: ") {
        ws.toSet.subsetOf(SyntheticCorpus.lexicon(l).toSet) shouldBe true
        SyntheticCorpus.lexicon(l).size should be > (2 * ws.size)
      }
    }
  }

  test("lang-weighted corpus confusion is structured: es/fr overlap, nothing else") {
    // The held-out es and fr pools genuinely share function words
    // (de/la/que/le/un/les/se/si/en), so a correct classifier confuses
    // SOME es<->fr docs — measured 7% each way at n=2000 — while every
    // other language pair stays clean. A broken classifier (wrong
    // argmax, tokenizer, or scoring) cannot reproduce this shape:
    // uniform guessing smears mass everywhere, and a tautological
    // fixture (salt = exactly the classifier's list) would have NO
    // off-diagonal mass at all.
    val docs = SyntheticCorpus.realistic(spark, 2000, langWeights =
      Seq("en" -> 40, "es" -> 20, "de" -> 15, "fr" -> 15, "zh" -> 10))
    val cells = docs
      .select(col("lang"), LangId.langId(col("text")).as("pred"))
      .groupBy("lang", "pred").agg(count(lit(1)).as("n"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    cells.getOrElse(("es", "fr"), 0L) should be > 0L
    cells.getOrElse(("fr", "es"), 0L) should be > 0L
    // every other off-diagonal cell carries less mass than either es/fr
    // confusion cell ("und" excepted — short docs may miss the
    // classifier's subset entirely)
    val esFrFloor = math.min(
      cells.getOrElse(("es", "fr"), 0L), cells.getOrElse(("fr", "es"), 0L))
    cells.foreach { case ((lang, pred), n) =>
      if (lang != pred && pred != "und" &&
          Set(lang, pred) != Set("es", "fr")) {
        withClue(s"confusion cell $lang->$pred (n=$n): ") {
          n should be < esFrFloor
        }
      }
    }
  }

  test("lang-weighted corpus is deterministic and dups inherit their source's language") {
    val w = Seq("en" -> 50, "fr" -> 50)
    val a = SyntheticCorpus.realistic(spark, 400, langWeights = w)
      .orderBy("doc_id").collect()
    val b = SyntheticCorpus.realistic(spark, 400, langWeights = w)
      .repartition(5).orderBy("doc_id").collect()
    a.map(r => (r.getLong(0), r.getString(1), r.getString(2))) shouldBe
      b.map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // both languages actually appear
    a.map(_.getString(2)).toSet shouldBe Set("en", "fr")
    // legacy path: no weights → every label is "en" (round-7 corpus)
    SyntheticCorpus.realistic(spark, 100).select("lang").distinct()
      .collect().map(_.getString(0)) shouldBe Array("en")
  }

  test("planted dups straddle exact and near-dup dedup stages") {
    val docs = SyntheticCorpus.realistic(spark, 1000)
    val n = docs.count()
    val exactDeduped = Dedup.exact(
      docs.withColumn("__fp", TextAnalysis.fingerprintMd5(col("text"))),
      on = Seq("__fp"), tieBreak = "doc_id").count()
    // some dups are byte-identical (zero mutations drawn)
    exactDeduped should be < n
    // and some survive exact dedup but fall to the near-dup stage
    val cleaned = TextPipeline.cleanCorpus(docs, "doc_id", "text",
      TextPipeline.Config(minQuality = 0.2, langs = Seq("en"),
        nearDupJaccard = 0.9, numHashes = 64, shingleSize = 3)).count()
    cleaned should be < exactDeduped
    // the language gate keeps the corpus (stopword mix reads as English)
    cleaned should be > n / 2
  }
}
