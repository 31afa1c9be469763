package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** The hashed-n-gram linear classifier (q90's operator): separation on
  * a planted two-vocabulary corpus, determinism, and the model-shape
  * contracts (bounded bucket space, label-null handling).
  */
class ClassifierSpec extends AnyFunSuite with Matchers with SparkTestBase {

  // two disjoint vocabularies; "good" docs labeled true
  private def fixture = {
    import spark.implicits._
    val good = (1L to 10L).map(i =>
      (i, s"clean prose sentence number $i about weather and science", true))
    val bad = (11L to 20L).map(i =>
      (i, s"spam casino jackpot click winner prize $i buy now cheap", false))
    val mixed = Seq(
      (21L, "clean prose sentence about weather science and more weather", true),
      (22L, "spam casino jackpot prize winner buy cheap now click spam", false),
      (23L, null.asInstanceOf[String], true)) // null text: no output row
    (good ++ bad ++ mixed).toDF("doc_id", "text", "label")
  }

  test("separates the two vocabularies by score sign") {
    val out = TextAnalysis.hashedNgramClassifier(
        fixture, "doc_id", "text", col("label"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getInt(3)))).toMap
    // null-text doc emits nothing
    out.keySet shouldBe ((1L to 22L).toSet)
    (1L to 10L).foreach { id => out(id)._1 should be > 0.0 }
    (11L to 20L).foreach { id => out(id)._1 should be < 0.0 }
    // held-out-shaped docs (same vocab, unseen combinations) classify
    // with their vocabulary
    out(21L)._2 shouldBe 1
    out(22L)._2 shouldBe 0
  }

  test("deterministic across partitionings; null labels count as negative") {
    val a = TextAnalysis.hashedNgramClassifier(
        fixture, "doc_id", "text", col("label"))
      .collect().map(_.toSeq).toSet
    val b = TextAnalysis.hashedNgramClassifier(
        fixture.repartition(7), "doc_id", "text", col("label"))
      .collect().map(_.toSeq).toSet
    a shouldBe b
    // a null label is a negative example, not a dropped row
    val nullLab = fixture.withColumn("label",
      when(col("doc_id") <= 10, lit(null).cast("boolean")).otherwise(col("label")))
    val out = TextAnalysis.hashedNgramClassifier(
        nullLab, "doc_id", "text", col("label"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    out.keySet shouldBe ((1L to 22L).toSet) // rows survive
    // with zero positive examples every weight is non-positive
    out.values.foreach(_ should be <= 0.0)
  }

  test("train/apply split: novel vocabulary takes the default weight") {
    import spark.implicits._
    val model = TextAnalysis.hashedNgramModel(fixture, "text", col("label"))
    // a held-out doc of entirely new words: every gram bucket is
    // either unseen (-> w0) or a hash collision with a trained bucket
    // (-> that bucket's weight) — the reference below resolves each
    // gram through the collected model exactly as the operator must
    val novel = Seq((31L, "zzz yyy xxx www")).toDF("doc_id", "text")
    val out = TextAnalysis.scoreHashedNgrams(novel, "doc_id", "text", model)
      .collect()
    out.length shouldBe 1
    out(0).getLong(1) shouldBe 7L // 4 unigrams + 3 bigrams
    val pr = model.prior.collect()(0)
    val (bias, w0) = (pr.getDouble(0), pr.getDouble(1))
    val wmap = model.weights.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    def bucket(g: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(3)
    val grams = Seq("zzz", "yyy", "xxx", "www",
      "zzz yyy", "yyy xxx", "xxx www")
    val expected = bias + grams.map(g => wmap.getOrElse(bucket(g), w0)).sum
    out(0).getDouble(2) shouldBe BigDecimal(expected)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-9
    // all-novel text scores like the negative prior direction: w0 < 0
    // whenever training saw more positive than negative mass
    w0 should not be 0.0
  }

  test("gram-less docs score at the prior, not silently dropped") {
    import spark.implicits._
    val model = TextAnalysis.hashedNgramModel(fixture, "text", col("label"))
    // "!!! ???" normalizes to empty — no grams survive the tokenizer —
    // and a null-text doc must still emit nothing
    val docs = Seq((41L, "!!! ???"), (42L, ""), (43L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.scoreHashedNgrams(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    out.keySet shouldBe Set(41L, 42L)
    val bias = model.prior.collect()(0).getDouble(0)
    val expected = BigDecimal(bias)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    out(41L) shouldBe ((0L, expected))
    out(42L) shouldBe ((0L, expected))
  }

  test("score is bias plus summed bucket weights (linearity on a 1-gram doc)") {
    import spark.implicits._
    // one doc = one word = 2 gram occurrences (unigram + whole-text
    // bigram fallback) in the SAME bucket; the other doc is the
    // negative class
    val df = Seq((1L, "alpha", true), (2L, "beta", false))
      .toDF("doc_id", "text", "label")
    val out = TextAnalysis.hashedNgramClassifier(df, "doc_id", "text", col("label"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val B = 4096.0
    // both docs: 2 occurrences of their own bucket, none of the other's
    val wAlpha = math.log(3.0 / (2 + B)) - math.log(1.0 / (2 + B))
    val wBeta = math.log(1.0 / (2 + B)) - math.log(3.0 / (2 + B))
    val bias = math.log(2.0 / 2.0)
    out(1L)._1 shouldBe 2L
    out(2L)._1 shouldBe 2L
    out(1L)._2 shouldBe BigDecimal(2 * wAlpha + bias)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-9
    out(2L)._2 shouldBe BigDecimal(2 * wBeta + bias)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-9
  }

  test("precisionRecallCurve: cumulative, monotone, and consistent with the single-threshold row") {
    import spark.implicits._
    val df = fixture
    val scored = TextAnalysis.hashedNgramClassifier(
        df, "doc_id", "text", col("label"))
      .join(df.select(col("doc_id"), col("label")), Seq("doc_id"))
    val curve = TextAnalysis.precisionRecallCurve(scored, col("label"), "score")
      .orderBy(col("threshold").desc)
      .as[(Double, Long, Long, Double, Double)].collect()
    curve.length should be > 2
    // descending thresholds: n_predicted strictly increases (one new
    // distinct score per row), tp and recall non-decreasing
    curve.sliding(2).foreach { case Array(hi, lo) =>
      lo._2 should be > hi._2
      lo._3 should be >= hi._3
      lo._5 should be >= hi._5
    }
    // loosest threshold predicts everyone: recall 1.0, precision = base rate
    val last = curve.last
    last._5 shouldBe 1.0
    last._2 shouldBe scored.count()
    // consistency with the confusion-matrix row at the sign threshold:
    // the curve row at the smallest positive threshold has the same tp
    // as binaryClassificationMetrics (predicted = score > 0)
    val m = TextAnalysis.binaryClassificationMetrics(
      scored, col("label"), "score", "predicted").collect().head
    val atSign = curve.filter(_._1 > 0).last // smallest threshold > 0
    atSign._3 shouldBe m.getAs[Long]("tp")
    atSign._2 shouldBe (m.getAs[Long]("tp") + m.getAs[Long]("fp"))
  }
}
