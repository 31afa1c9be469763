package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class TextAnalysisSpec extends AnyFunSuite with Matchers with SparkTestBase {

  import TextAnalysis._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T = {
    import spark.implicits._
    Seq(text).toDF("t").select(c.as("r")).head.getAs[T]("r")
  }

  test("tokenCount counts whitespace tokens") {
    one[Int](tokenCount(col("t")), "the quick  brown\tfox") shouldBe 4
  }

  test("bpeishTokenCount splits letter runs, digits, punctuation") {
    // "hello," -> hello + ","  ; "42" -> 4 + 2 ; "world" -> world
    one[Int](bpeishTokenCount(col("t")), "hello, 42 world") shouldBe 5
  }

  test("normalize lowercases and collapses separators") {
    one[String](normalize(col("t")), "  Hello,   WORLD!! 7 ") shouldBe "hello world 7"
  }

  test("fingerprintMd5 is invariant to case and punctuation noise") {
    val a = one[String](fingerprintMd5(col("t")), "Hello, World!")
    val b = one[String](fingerprintMd5(col("t")), "hello world")
    a shouldBe b
  }

  test("qualityScore stays in [0,1] and ranks prose above garbage") {
    val prose = "the quick brown fox jumps over the lazy dog and it is a fine day for running in the park with friends who enjoy long walks"
    val garbage = "@@!! ## $$%% ^^&& ** (()) {{}} [[]] || \\\\ ~~``"
    val ps = one[Double](qualityScore(col("t")), prose)
    val gs = one[Double](qualityScore(col("t")), garbage)
    ps should be >= 0.0
    ps should be <= 1.0
    gs should be >= 0.0
    gs should be <= 1.0
    ps should be > gs
  }

  test("langId picks the stopword-dominant language, und on no hits") {
    one[String](LangId.langId(col("t")), "the cat is in the house and it is warm") shouldBe "en"
    one[String](LangId.langId(col("t")), "el perro y la casa de los vecinos en la calle") shouldBe "es"
    one[String](LangId.langId(col("t")), "der hund und die katze sind nicht zu hause mit den") shouldBe "de"
    one[String](LangId.langId(col("t")), "le chat est dans les maisons et une porte pour") shouldBe "fr"
    one[String](LangId.langId(col("t")), "\u6211\u662f\u5b66\u751f\uff0c\u8fd9\u662f\u6211\u7684\u4e66") shouldBe "zh"
    one[String](LangId.langId(col("t")), "xyzzy plugh qwerty") shouldBe "und"
  }

  test("tfIdf: smoothed weights match hand computation") {
    import spark.implicits._
    val docs = Seq((1L, "a b a"), (2L, "a c")).toDF("doc_id", "text")
    val out = TextAnalysis.tfIdf(docs, "doc_id", "text")
      .orderBy("doc_id", "term")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // N=2; a: df=2 -> idf=ln(3/3)+1=1; b,c: df=1 -> idf=ln(3/2)+1
    val idf1 = math.log(3.0 / 2.0) + 1.0
    out shouldBe Array(
      (1L, "a", 2L, 2.0), (1L, "b", 1L, idf1),
      (2L, "a", 1L, 1.0), (2L, "c", 1L, idf1))
  }

  test("bm25: hand-computed Okapi scores; absent term inert; query is a set") {
    import spark.implicits._
    // N=3 scorable docs (null omitted), dl = 2, 3, 0; avgdl = 5/3
    val docs = Seq(
      (1L, Some("cat dog")),
      (2L, Some("cat cat fish")),
      (3L, Some("")),
      (4L, None: Option[String])).toDF("doc_id", "text")
    def contrib(tf: Double, df: Double, dl: Double): Double = {
      val n = 3.0; val avgdl = 5.0 / 3.0
      math.log(1.0 + (n - df + 0.5) / (df + 0.5)) *
        tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    }
    val out = TextAnalysis.bm25(docs, "doc_id", "text", Seq("cat", "fish", "zebra"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    out.map(x => (x._1, x._2)) shouldBe Array((1L, 1L), (2L, 2L))
    out(0)._3 shouldBe contrib(1, 2, 2) +- 1e-12
    out(1)._3 shouldBe (contrib(2, 2, 3) + contrib(1, 1, 3)) +- 1e-12
    // a repeated query term must not double-count (bag-of-words SET)
    val dup = TextAnalysis.bm25(docs, "doc_id", "text", Seq("cat", "cat", "fish"))
      .orderBy("doc_id").collect().map(_.getDouble(2))
    dup(0) shouldBe out(0)._3
    dup(1) shouldBe out(1)._3
  }

  test("bm25: longer doc scores below shorter at equal tf (length normalization)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "cat dog"),
      (2L, "cat dog bird fish mouse horse goat frog")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(docs, "doc_id", "text", Seq("cat"))
      .orderBy("doc_id").collect().map(_.getDouble(2))
    out(0) should be > out(1)
  }

  test("redactPii replaces each PII class with its typed tag") {
    def red(s: String): String = one[String](TextAnalysis.redactPii(col("t")), s)
    red("mail me at jo.an+x@sub.example.org please") shouldBe
      "mail me at <EMAIL> please"
    red("see https://a.example/path?q=1#f and http://b.example") shouldBe
      "see <URL> and <URL>"
    red("host 192.168.001.17 is up") shouldBe "host <IP> is up"
    red("ssn 123-45-6789 on file") shouldBe "ssn <ID> on file"
    red("call +4915123456789 or 555-123-4567") shouldBe "call <PHONE> or <PHONE>"
    // URL userinfo is consumed by the URL pass, not half-eaten as email
    red("ftp via https://user@host.example/x done") shouldBe "ftp via <URL> done"
    // plain text and bare numbers survive
    red("version 1.2 of 3 things") shouldBe "version 1.2 of 3 things"
  }

  test("topTokens counts normalized tokens with deterministic tie-break") {
    import spark.implicits._
    val docs = Seq("b a a", "C! b?", "a c").toDF("text")
    val out = TextAnalysis.topTokens(docs, "text", 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // a:3, b:2, c:2 — ties at the k-boundary break token-ascending
    out shouldBe Array(("a", 3L), ("b", 2L))
  }

  test("shingleFingerprint is robust to a distant edit") {
    import spark.implicits._
    def fp(text: String): Seq[Long] =
      Seq(text).toDF("t")
        .select(shingleFingerprint(col("t"), n = 4, k = 8).as("r"))
        .head.getSeq[Long](0)
    val a = fp("abcdefghijklmnopqrstuvwxyz0123456789")
    val b = fp("abcdefghijklmnopqrstuvwxyz012345678X")
    // one trailing edit perturbs at most n of the shingles; the k-min
    // sketch keeps most elements in common
    a.intersect(b).size should be >= 4
  }

  test("repetitionScores: hand-computed line/word/bigram repetition fractions") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaa\nbbb ccc\naaa\nddd"), // repeated line, all bigrams unique
      (2L, "x y x y x y"),            // single line, heavy bigram repetition
      (3L, "hello")                   // sub-bigram doc: its own shingle
    ).toDF("doc_id", "text")
    val out = repetitionScores(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    // doc 1: lines [aaa, bbb ccc, aaa, ddd] -> 1-3/4; dup line chars
    // 3*2 of 3*2+7+3; words aaa bbb ccc aaa ddd -> 1-4/5; every bigram
    // unique, len 7, norm len 19
    out(0) shouldBe ((1L, 0.25, 0.375, 0.2, 0.368421))
    // doc 2: one line; words 6 with 2 distinct; "x y" x3 covers 9 of 11
    out(1) shouldBe ((2L, 0.0, 0.0, 0.666667, 0.818182))
    // doc 3: single word -> whole text is its own shingle, coverage 1
    out(2) shouldBe ((3L, 0.0, 0.0, 0.0, 1.0))
  }

  test("unigramCrossEntropy: hand-computed corpus-model surprisal") {
    import spark.implicits._
    // corpus counts: a:2 b:2 c:1, N=5
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = unigramCrossEntropy(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // doc 1: all three tokens have p = 2/5 -> xent = -ln(0.4)
    out(0)._1 shouldBe 1L
    out(0)._2 shouldBe 3L
    out(0)._3 shouldBe (-math.log(0.4) +- 1e-6)
    // doc 2: -(ln(2/5) + ln(1/5)) / 2
    out(1)._2 shouldBe 2L
    out(1)._3 shouldBe (-(math.log(0.4) + math.log(0.2)) / 2 +- 1e-6)
    // boilerplate scores LOWER than rare-token text: common tokens are
    // corpus-probable
    out(0)._3 should be < out(1)._3
  }

  test("corpusStats rolls up exact counts and the mean quality per group") {
    import spark.implicits._
    val docs = Seq(
      ("web", "the quick brown fox jumps over the lazy dog"),
      ("web", "a small document for the test"),
      ("book", "el perro y la casa de los vecinos en la calle")
    ).toDF("source", "text")
    val out = corpusStats(docs, "source", "text").orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    out.map(x => (x._1, x._2, x._3)) shouldBe
      Array(("book", 1L, 11L), ("web", 2L, 15L))
    // the es doc is not English-predicted; both web docs are
    out.map(x => (x._1, x._5)) shouldBe Array(("book", 0L), ("web", 2L))
    // mean quality agrees with averaging the per-doc scalar
    val perDoc = docs.where(col("source") === "web")
      .select(qualityScore(col("text")).as("q")).collect().map(_.getDouble(0))
    out(1)._4 shouldBe
      (BigDecimal(perDoc.sum / 2).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-9)
  }

  test("crossDocDupFraction counts cross-doc grams only; within-doc repeats excluded") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),       // grams: [alpha beta gamma, beta gamma delta]
      (2L, "x alpha beta gamma y"),         // shares "alpha beta gamma" with doc 1
      (3L, "unique words only here now"),   // nothing shared
      (4L, "rep rep rep rep"),              // "rep rep rep" twice — SAME doc only
      (5L, "hi"),                           // short doc: whole text is the gram
      (6L, "hi")                            // exact short-doc duplicate of 5
    ).toDF("doc_id", "text")
    val out = crossDocDupFraction(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    out shouldBe Array(
      (1L, 2L, 0.5),      // 1 of 2 grams cross-duplicated
      (2L, 3L, 0.333333), // 1 of 3
      (3L, 3L, 0.0),
      (4L, 2L, 0.0),      // within-doc repetition does NOT count
      (5L, 1L, 1.0),
      (6L, 1L, 1.0))
  }

  test("chunkByTokens: full coverage, overlap shared, short tail kept") {
    import spark.implicits._
    val doc = (1 to 10).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, doc), (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    val out = chunkByTokens(df, "doc_id", "text", chunkTokens = 4, overlapTokens = 1)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // step 3: starts 0,3,6,9 — last chunk is the single tail token
    out.filter(_._1 == 1L) shouldBe Array(
      (1L, 0L, 4L, "t1 t2 t3 t4"),
      (1L, 1L, 4L, "t4 t5 t6 t7"),
      (1L, 2L, 4L, "t7 t8 t9 t10"),
      (1L, 3L, 1L, "t10"))
    // consecutive chunks share exactly the overlap token
    out.filter(_._1 == 1L).sliding(2).foreach { case Array(a, b) =>
      a._4.split(" ").last shouldBe b._4.split(" ").head
    }
    // sub-chunk doc -> one short chunk; empty text -> one empty chunk
    out.filter(_._1 == 2L) shouldBe Array((2L, 0L, 1L, "solo"))
    out.filter(_._1 == 3L).length shouldBe 1
  }

  test("dsirWeights: hand-computed add-one log-ratios; target-like docs score higher") {
    import spark.implicits._
    val df = Seq(
      (1L, "apple apple", "en"),
      (2L, "banana", "de"),
      (3L, "!!!", "en") // no alphanumeric tokens -> absent from output
    ).toDF("doc_id", "text", "lang")
    val out = dsirWeights(df, "doc_id", "text", col("lang") === "en")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // vocab {apple: ct=2 cr=2, banana: ct=0 cr=1}; nt=2 nr=3 v=2
    // apple:  ln((3/4)/(3/5)) = ln 1.25;  banana: ln((1/4)/(2/5)) = ln 0.625
    out shouldBe Array(
      (1L, 2L, BigDecimal(math.log(1.25)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble),
      (2L, 1L, BigDecimal(math.log(0.625)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    out(0)._3 should be > out(1)._3 // English-looking doc ranks above
  }

  test("bigramCrossEntropy: hand-computed conditional surprisal; repetition scores low") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a b"),   // transitions: (a,b) (b,a) (a,b)
      (2L, "a c"),       // transition: (a,c)
      (3L, "solo")       // < 2 tokens -> absent
    ).toDF("doc_id", "text")
    val out = bigramCrossEntropy(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // corpus: c(a)=3 c(b)=2 c(c)=1; c(a,b)=2 c(b,a)=1 c(a,c)=1
    // doc1: p(ab)=2/3 (twice), p(ba)=1/2 -> -(2 ln(2/3) + ln(1/2)) / 3
    // doc2: p(ac)=1/3 -> -ln(1/3)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    out shouldBe Array(
      (1L, 3L, r6(-(2 * math.log(2.0 / 3) + math.log(0.5)) / 3)),
      (2L, 1L, r6(-math.log(1.0 / 3))))
    // the repetitive doc's transitions are more predictable
    out(0)._3 should be < out(1)._3
  }

  test("knBigramXent: hand-computed interpolated Kneser-Ney probabilities") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a b"),   // transitions: (a,b) (b,a) (a,b)
      (2L, "a c"),       // transition: (a,c)
      (3L, "solo")       // < 2 tokens -> absent
    ).toDF("doc_id", "text")
    val out = knBigramXent(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // bc: (a,b)=2 (b,a)=1 (a,c)=1; T=3 types
    // ctx a: ctot=3 nfollow=2; ctx b: ctot=1 nfollow=1
    // cont: nprec(a)=nprec(b)=nprec(c)=1
    // p(b|a) = 1.25/3 + (.75*2/3)(1/3) = 7/12
    // p(a|b) = 0.25/1 + (.75*1/1)(1/3) = 1/2
    // p(c|a) = 0.25/3 + (.75*2/3)(1/3) = 1/4
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val x1 = -(2 * math.log(7.0 / 12) + math.log(0.5)) / 3
    val x2 = -math.log(0.25)
    out shouldBe Array(
      (1L, 3L, r6(x1), r6(math.exp(x1))),
      (2L, 1L, r6(x2), r6(math.exp(x2))))
    // discounting strictly lowers every observed bigram's probability
    // vs the MLE model, so KN entropy is strictly higher per doc
    val mle = bigramCrossEntropy(df, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getDouble(2))
    out(0)._3 should be > mle(0)
    out(1)._3 should be > mle(1)
  }

  test("collocations: hand-computed PMI, minCount gate, deterministic ranking") {
    import spark.implicits._
    // "a b" appears 3x and a/b appear ONLY together; "x y" appears 3x
    // but x and y are also frequent apart -> "a b" must out-PMI "x y"
    val df = Seq(
      (1L, "a b c a b c a b"),
      (2L, "x y x y x y x x x y y y")
    ).toDF("doc_id", "text")
    val out = collocations(df, "doc_id", "text", minCount = 3, k = 10)
      .select("prev", "cur", "n_pair", "pmi")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // U = 8 + 12 = 20 tokens; B = 7 + 11 = 18 bigrams
    // c(ab)=3, c(a)=3, c(b)=3 -> pmi = ln((3/18)/((3/20)(3/20)))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ab = out.find(p => p._1 == "a" && p._2 == "b").get
    ab._3 shouldBe 3L
    ab._4 shouldBe r6(math.log((3.0 / 18) / ((3.0 / 20) * (3.0 / 20))))
    val xy = out.find(p => p._1 == "x" && p._2 == "y").get
    ab._4 should be > xy._4 // exclusive pair beats promiscuous pair
    // pairs below minCount are absent ("b c" appears twice)
    out.exists(p => p._1 == "b" && p._2 == "c") shouldBe false
    // ranked by (pmi desc, prev, cur)
    out.map(_._4).toSeq shouldBe out.map(_._4).toSeq.sorted.reverse
  }

  test("oovRate: tokens outside the top-k vocabulary, deterministic vocab tie-break") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a b"),
      (2L, "b c")
    ).toDF("doc_id", "text")
    // counts: a=2 b=2 c=1 -> top-2 vocab {a, b} (tie a/b irrelevant at k=2)
    val out = oovRate(df, "doc_id", "text", vocabSize = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    out shouldBe Array((1L, 3L, 0.0), (2L, 2L, 0.5))
    // k=1: tie between a(2) and b(2) broken by token -> vocab {a}
    val k1 = oovRate(df, "doc_id", "text", vocabSize = 1)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getDouble(2)))
    k1 shouldBe Array((1L, 0.333333), (2L, 1.0)) // avg rounded to 6
  }

  test("zipfSlope: OLS of ln(freq) on ln(rank) matches the hand formula") {
    import spark.implicits._
    val df = Seq((1L, "a a a a b b c")).toDF("doc_id", "text")
    // counts a=4 b=2 c=1 -> (rank, freq) = (1,4) (2,2) (3,1)
    val xs = Seq(1.0, 2.0, 3.0).map(math.log)
    val ys = Seq(4.0, 2.0, 1.0).map(math.log)
    val n = 3.0
    val slope = (n * xs.zip(ys).map { case (x, y) => x * y }.sum - xs.sum * ys.sum) /
      (n * xs.map(x => x * x).sum - xs.sum * xs.sum)
    val out = zipfSlope(df, "text").head
    out.getLong(0) shouldBe 3L
    out.getDouble(1) shouldBe
      BigDecimal(slope).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    out.getDouble(1) should be < 0.0 // frequency falls with rank
  }

  test("urlHostnames extracts every http(s) host in order, canonicalized") {
    import spark.implicits._
    val df = Seq(
      "see https://a.example.org/path x http://b.example.net/q https://a.example.org/y",
      "bare host https://tail.example.com end",
      "no urls at all",
      // sentence-final punctuation, a port, userinfo, uppercase — none
      // may leak into (or hide) the host: the blocklist-bypass cases
      "spam at https://bad.example.net. or https://bad.example.net, ok",
      "port https://bad.example.net:8080/x userinfo https://u:p@bad.example.net/y",
      "HTTPS://BAD.EXAMPLE.NET/x",
      // an @ inside the query must NOT re-attribute the host, and
      // IDN / underscore hosts survive intact
      "q https://bad.example.net?x=a@innocent.com end",
      "idn https://xn--bcher-kva.example.net/x under https://my_cdn.example.net/y").toDF("text")
    val out = df.select(urlHostnames(col("text"))).as[Seq[String]].collect()
    out(0) shouldBe Seq("a.example.org", "b.example.net", "a.example.org")
    out(1) shouldBe Seq("tail.example.com")
    out(2) shouldBe Seq.empty
    out(3) shouldBe Seq("bad.example.net", "bad.example.net")
    out(4) shouldBe Seq("bad.example.net", "bad.example.net")
    out(5) shouldBe Seq("bad.example.net")
    out(6) shouldBe Seq("bad.example.net")
    out(7) shouldBe Seq("xn--bcher-kva.example.net", "my_cdn.example.net")
  }

  test("gopherQualityFlags: each rule trips on its planted violator") {
    import spark.implicits._
    val good = (("the quick brown fox jumps over the lazy dog and " * 6)
      + "that have with be of to").trim // ~60 words, clean prose
    val docs = Seq(
      (0L, good), // passes everything
      (1L, "too short of a doc"), // < 50 words
      (2L, ("ab " * 60).trim), // mean word length 2 < 3
      (3L, good + (" #tag" * 20)), // symbol ratio > 0.1
      (4L, good + (" 123" * 30)), // alpha-word ratio < 0.8
      (5L, ("zz yy xx ww vv " * 12).trim), // no required stopwords
      (6L, good + ("\nmore...\n" * 40)), // > 30% ellipsis lines
      (7L, good + ("\n- item" * 200)) // > 90% bullet lines
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherQualityFlags(docs, "doc_id", "text",
        minWords = 50)
      .orderBy("doc_id").collect()
    def flag(r: org.apache.spark.sql.Row, name: String): Boolean =
      r.getBoolean(r.fieldIndex(name))
    flag(out(0), "kept") shouldBe true
    flag(out(1), "word_count_ok") shouldBe false
    flag(out(2), "mean_word_len_ok") shouldBe false
    flag(out(3), "symbol_ratio_ok") shouldBe false
    flag(out(4), "alpha_word_ok") shouldBe false
    flag(out(5), "stopwords_ok") shouldBe false
    flag(out(6), "ellipsis_ok") shouldBe false
    flag(out(7), "bullet_ok") shouldBe false
    // every violator is dropped
    (1 to 7).foreach(i => flag(out(i), "kept") shouldBe false)
  }

  test("sourceDiversity: exact ppm shares and the Simpson effective-source count") {
    import spark.implicits._
    def doc(n: Int): String = Seq.fill(n)("w").mkString(" ")
    // source a: 300 tokens over 3 docs; source b: 100 tokens over 1
    val docs = Seq(
      ("a", doc(100)), ("a", doc(120)), ("a", doc(80)), ("b", doc(100))
    ).toDF("source", "text")
    val out = sourceDiversity(docs, "source", "text").orderBy("source")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // shares: 300/400 and 100/400 exactly; Simpson: 400²/(300²+100²)
    // = 1.6 sources → 1_600_000 micro-units on every row
    out shouldBe Array(
      ("a", 3L, 300L, 750000L, 1600000L),
      ("b", 1L, 100L, 250000L, 1600000L))
  }

  test("sourceDiversity: a uniform k-way mix has effective count k; ppm floors") {
    import spark.implicits._
    def doc(n: Int): String = Seq.fill(n)("w").mkString(" ")
    val docs = Seq(("a", doc(7)), ("b", doc(7)), ("c", doc(7)))
      .toDF("source", "text")
    val out = sourceDiversity(docs, "source", "text").orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(3), r.getLong(4)))
    // 7/21 each: integer DIV floors to 333333 ppm; Simpson = exactly 3
    out shouldBe Array(
      ("a", 333333L, 3000000L),
      ("b", 333333L, 3000000L),
      ("c", 333333L, 3000000L))
  }
}
