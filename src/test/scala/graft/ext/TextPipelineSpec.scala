package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class TextPipelineSpec extends AnyFunSuite with Matchers with SparkTestBase {

  test("cleanCorpus gates quality/lang, dedupes exact + near, splits") {
    import spark.implicits._
    val prose = "the quick brown fox jumps over the lazy dog and it " +
      "is a fine day in the park for a long walk with friends"
    val docs = Seq(
      (1L, prose), // keeper (representative of 1,2,3)
      (2L, prose), // exact dup of 1
      (3L, prose + " indeed"), // near dup of 1
      (4L, "@@!! ## $$%% ^^&& ** (())"), // quality reject
      (5L, "el perro y la casa de los vecinos en la calle para el dia"), // lang reject
      (6L, "a completely different keeper document that talks about the " +
        "weather in the mountains and the sea for many days and it is nice")
    ).toDF("doc_id", "text")
    val out = TextPipeline.cleanCorpus(docs, "doc_id", "text",
      TextPipeline.Config(nearDupJaccard = 0.5, numHashes = 64, bands = 16,
        shingleSize = 2))
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    kept shouldBe Set(1L, 6L)
    out.columns should contain("split")
    out.select("split").collect().foreach(r =>
      Set("train", "val", "test") should contain(r.getString(0)))
  }

  test("cleanCorpusExact agrees with cleanCorpus on a clear-cut corpus") {
    import spark.implicits._
    val prose = "the quick brown fox jumps over the lazy dog and it " +
      "is a fine day in the park for a long walk with friends"
    val docs = Seq(
      (1L, prose),
      (2L, prose),
      (3L, prose + " indeed"),
      (4L, "@@!! ## $$%% ^^&& ** (())"),
      (5L, "el perro y la casa de los vecinos en la calle para el dia"),
      (6L, "a completely different keeper document that talks about the " +
        "weather in the mountains and the sea for many days and it is nice")
    ).toDF("doc_id", "text")
    val cfg = TextPipeline.Config(nearDupJaccard = 0.5, numHashes = 64,
      shingleSize = 2)
    val exact = TextPipeline.cleanCorpusExact(docs, "doc_id", "text", cfg)
    val minhash = TextPipeline.cleanCorpus(docs, "doc_id", "text", cfg)
    exact.select("doc_id", "split").as[(Long, String)].collect().toSet shouldBe
      minhash.select("doc_id", "split").as[(Long, String)].collect().toSet
    exact.select("doc_id").as[Long].collect().toSet shouldBe Set(1L, 6L)
  }

  test("minhashDedupApply keeps exactly one representative per cluster") {
    import spark.implicits._
    val docs = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (11L, "alpha beta gamma delta epsilon zeta eta theta"),
      (20L, "one two three four five six seven eight nine")).toDF("id", "text")
    val kept = Dedup.minhashDedupApply(docs, "id", "text",
        minJaccard = 0.9, numHashes = 32, bands = 8, shingleSize = 2)
      .select("id").collect().map(_.getLong(0)).toSet
    kept shouldBe Set(10L, 20L)
  }

  test("decontaminate drops exactly the docs sharing an n-gram with the benchmark") {
    import spark.implicits._
    val corpus = Seq(
      // shares the 4-gram "the quick brown fox" with bench doc 100
      (1L, "we saw the quick brown fox jumping over things"),
      // same words, different order: no shared 4-gram
      (2L, "brown the fox quick saw we things over jumping"),
      // clean
      (3L, "an entirely unrelated sentence about database engines"),
      // sub-n doc, exact normalized match of short bench doc 101
      (4L, "Tiny doc!"),
      // sub-n doc, no match
      (5L, "other tiny")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "tiny doc")
    ).toDF("bid", "btext")
    val flagged = TextPipeline.contaminatedIds(
        corpus, "doc_id", "text", bench, "btext", n = 4)
      .as[(Long, Long)].collect().toMap
    flagged.keySet shouldBe Set(1L, 4L)
    flagged(1L) shouldBe 1L // exactly one shared 4-gram
    flagged(4L) shouldBe 1L // whole-text shingle match
    TextPipeline.decontaminate(corpus, "doc_id", "text", bench, "btext", n = 4)
      .select("doc_id").as[Long].collect().toSet shouldBe Set(2L, 3L, 5L)
  }

  test("filterByDomains drops docs citing a blocklisted host, keeps the rest") {
    import spark.implicits._
    val df = Seq(
      (1L, "ok doc https://good.example.org/a"),
      (2L, "spam https://bad.example.net/z linked"),
      (3L, "mixed https://good.example.org/b then https://bad.example.net/y"),
      (4L, "no urls here"),
      // blocked domain as a SUBSTRING of a longer host must NOT match
      (5L, "https://bad.example.net.evil.org/path")
    ).toDF("doc_id", "text")
    TextPipeline.filterByDomains(df, "text", Seq("bad.example.net"))
      .select("doc_id").as[Long].collect().toSet shouldBe Set(1L, 4L, 5L)
  }

  test("filterByDomains: punctuation/port/case/userinfo cannot dodge the blocklist; null text kept") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("end of sentence https://bad.example.net.")),
      (2L, Some("port http://bad.example.net:8080/x")),
      (3L, Some("caps HTTP://BAD.EXAMPLE.NET/y")),
      (4L, Some("creds https://u:p@bad.example.net/z")),
      (5L, None: Option[String]), // cites nothing -> kept
      (6L, Some("clean https://fine.example.org/ok"))
    ).toDF("doc_id", "text")
    TextPipeline.filterByDomains(df, "text", Seq("BAD.example.net"))
      .select("doc_id").as[Long].collect().toSet shouldBe Set(5L, 6L)
  }
}
