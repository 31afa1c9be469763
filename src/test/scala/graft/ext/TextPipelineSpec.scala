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

  test("extractText keeps article lines byte-exact, drops chrome/script/style/comments") {
    import spark.implicits._
    val page =
      """<html><head><title>My Page</title>
        |<style>body { color: red; }</style>
        |<script type="text/javascript">var nav = "<div>"; if (1 < 2) load();</script>
        |</head><body>
        |<nav><a href="/">Home</a> <a href="/news">News</a> <a href="/about">About</a></nav>
        |<h1>Short Title</h1>
        |<!-- rendered by cms version 7 -->
        |<p>The <b>article</b> body text is a full sentence with enough words &amp; substance to pass the density gate.</p>
        |<p>A second paragraph also survives, mentioning 1 &lt; 2 and &quot;quotes&quot; decoded.</p>
        |<div class="share"><a href="/s">Share</a> <a href="/t">Tweet</a> <a href="/m">Mail</a></div>
        |<footer>Copyright Example Corp <a href="/p">Privacy</a> <a href="/t">Terms</a> <a href="/c">Contact</a></footer>
        |</body></html>""".stripMargin
    val out = TextPipeline.extractText(
      Seq((1L, page)).toDF("doc_id", "html"), "doc_id", "html")
      .as[(Long, Long, String)].collect()
    out should have length 1
    val (_, nKept, extracted) = out.head
    nKept shouldBe 2L
    extracted shouldBe
      "The article body text is a full sentence with enough words & " +
        "substance to pass the density gate.\n" +
        "A second paragraph also survives, mentioning 1 < 2 and " +
        "\"quotes\" decoded."
  }

  test("extractText: all-boilerplate page yields an empty row, not a missing one; null html omitted") {
    import spark.implicits._
    val chrome = "<nav><a href=\"/\">Home</a> <a href=\"/b\">B</a></nav>" +
      "<footer><a href=\"/p\">Privacy</a></footer>"
    val out = TextPipeline.extractText(
      Seq((1L, Some(chrome)), (2L, None: Option[String])).toDF("doc_id", "html"),
      "doc_id", "html")
      .as[(Long, Long, String)].collect()
    out should have length 1
    out.head shouldBe ((1L, 0L, ""))
  }

  test("extractText link-density gate: link-heavy line drops, prose line with one link survives") {
    import spark.implicits._
    val page = "<p>Read the full report at <a href=\"/r\">this link</a> " +
      "for all of the details we gathered.</p>" +
      "<p><a href=\"/a\">One</a> <a href=\"/b\">Two</a> <a href=\"/c\">Three</a> links only</p>"
    val out = TextPipeline.extractText(
      Seq((1L, page)).toDF("doc_id", "html"), "doc_id", "html")
      .as[(Long, Long, String)].collect().head
    out._2 shouldBe 1L
    out._3 shouldBe "Read the full report at this link for all of the details we gathered."
  }

  test("cleanCorpus htmlInput: markup-identical articles with different chrome exact-dedup") {
    import spark.implicits._
    val article = "the quick brown fox jumps over the lazy dog and it " +
      "is a fine day in the park for a long walk with friends"
    def page(navLinks: String, body: String) =
      s"<html><body><nav>$navLinks</nav><p>$body</p></body></html>"
    val docs = Seq(
      (1L, page("<a href=\"/\">Home</a> <a href=\"/x\">X</a>", article)),
      // same article, different crawl chrome — must exact-dedup with 1
      (2L, page("<a href=\"/\">Start</a> <a href=\"/y\">Y</a> <a href=\"/z\">Z</a>", article)),
      (3L, page("<a href=\"/\">Home</a>",
        "a completely different keeper document that talks about the " +
          "weather in the mountains and the sea for many days and it is nice"))
    ).toDF("doc_id", "html")
    val out = TextPipeline.cleanCorpus(docs, "doc_id", "html",
      TextPipeline.Config(nearDupJaccard = 0.95, numHashes = 64, bands = 16,
        shingleSize = 2, htmlInput = true))
    out.select("doc_id").as[Long].collect().toSet shouldBe Set(1L, 3L)
    // the surviving text column is the EXTRACTED article, not markup
    out.where($"doc_id" === 1L).select("html").as[String].head() shouldBe article
  }

  test("hrefHostnames + includeHrefs: protocol-relative links are the text pattern's true blind spot") {
    import spark.implicits._
    val df = Seq(
      // protocol-relative href: NO http prefix anywhere in the bytes —
      // the text-URL pattern cannot see it, the href pattern must
      (1L, Some("<p>read more</p><a href=\"//bad.example.net/x\">x</a>")),
      // absolute href: caught by BOTH (the URL is a raw-text substring)
      (2L, Some("<a href='HTTP://BAD.EXAMPLE.NET:8080/y'>y</a>")),
      // userinfo behind a protocol-relative href
      (3L, Some("<a href='//u:p@bad.example.net/z'>z</a>")),
      // path-relative href carries no host; clean absolute href kept
      (4L, Some("<a href=\"/about\">about</a> <a href=\"https://fine.example.org/ok\">ok</a>")),
      // substring of a longer host must not match
      (5L, Some("<a href=\"//bad.example.net.evil.org/p\">p</a>")),
      (6L, None: Option[String])
    ).toDF("doc_id", "html")
    // text-only gate: catches the absolute href (2) as a raw substring,
    // blind to both protocol-relative citations (1, 3)
    TextPipeline.filterByDomains(df, "html", Seq("bad.example.net"))
      .select("doc_id").as[Long].collect().toSet shouldBe Set(1L, 3L, 4L, 5L, 6L)
    TextPipeline.filterByDomains(df, "html", Seq("bad.example.net"), includeHrefs = true)
      .select("doc_id").as[Long].collect().toSet shouldBe Set(4L, 5L, 6L)
    // provenance split: linked-to vs mentioned-in-text are separable
    val hosts = df.where($"doc_id" === 1L)
      .select(TextPipeline.hrefHostnames($"html")).as[Seq[String]].head()
    hosts shouldBe Seq("bad.example.net")
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

  test("anchorPairs: href/anchor stay paired; multiline, nested tags, entities") {
    import spark.implicits._
    val html =
      """<a href="https://a.example.com/x">First link</a> filler
        |<a href='https://b.example.com/y'>spans
        |two lines</a>
        |<A HREF="https://c.example.com/z">click <b>here</b> &amp; now</A>
        |<a href="/relative">rel</a>
        |<a name="anchor-no-href">not a link</a>""".stripMargin
    val out = TextPipeline.anchorPairs(
        Seq((1L, html)).toDF("doc_id", "html"), "doc_id", "html")
      .orderBy("href").collect()
      .map(r => (r.getString(1), r.getString(2)))
    out shouldBe Array(
      ("/relative", "rel"),
      ("https://a.example.com/x", "First link"),
      ("https://b.example.com/y", "spans two lines"),
      ("https://c.example.com/z", "click here & now"))
  }

  test("anchorTextSummary merges aliasing spellings and picks a deterministic top") {
    import spark.implicits._
    val docs = Seq(
      // doc 1 cites the same canonical target twice, two spellings
      (1L, "<a href=\"https://T.EXAMPLE.com:443/p?utm_source=x\">alpha</a>" +
        "<a href='https://t.example.com/p'>beta</a>"),
      // doc 2 cites it once more with anchor beta -> beta wins (2 vs 1)
      (2L, "<a href=\"https://t.example.com/p\">beta</a>" +
        "<a href=\"/rel\">skipped</a>"),
      (3L, (null: String))).toDF("doc_id", "html")
    val out = TextPipeline.anchorTextSummary(docs, "doc_id", "html").collect()
    out.length shouldBe 1
    val r = out.head
    r.getString(0) shouldBe "https://t.example.com/p"
    r.getLong(1) shouldBe 3L // n_anchors: both spellings + doc 2's
    r.getLong(2) shouldBe 2L // n_docs
    r.getString(3) shouldBe "beta"
  }

  test("anchorTextSummary top-anchor tie breaks to the smaller text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "<a href=\"https://t.example.com/\">zeta</a>"),
      (2L, "<a href=\"https://t.example.com/\">alpha</a>")).toDF("doc_id", "html")
    val out = TextPipeline.anchorTextSummary(docs, "doc_id", "html").collect()
    out.head.getString(3) shouldBe "alpha"
  }
}
