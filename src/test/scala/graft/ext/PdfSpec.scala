package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PdfSpec extends AnyFunSuite with SparkTestBase {

  private val Latin = java.nio.charset.StandardCharsets.ISO_8859_1

  test("round trip: multi-page build → parse recovers exact text + salt") {
    val texts = Seq(
      "plain page",
      "escapes: (parens) back\\slash fifty% [brackets] <angles>",
      "unicode: café € 你好 emoji 😀",
      "multi\nline\ntext\nwith trailing newline\n",
      "")
    val pages = Pdf.parseFile("f", Pdf.buildPdf(texts))
    assert(pages.size == texts.size)
    assert(pages.forall(_.refused == null))
    assert(pages.map(_.n_pages).distinct == Seq(texts.size))
    pages.zip(texts).zipWithIndex.foreach { case ((p, t), i) =>
      assert(p.page == i + 1)
      val sep = if (t.endsWith("\n") || t.isEmpty) "" else "\n"
      assert(p.text == s"$t$sep(pdf) (salt)\n", s"page ${i + 1}")
    }
  }

  test("structure-driven walk: PDF keywords inside text cannot confuse parsing") {
    // a content stream whose TEXT contains every structural token a
    // magic-scanner would trip on — the xref walk must not care
    val hostile = "endstream endobj startxref trailer %PDF-1.7 xref\n5 0 obj"
    val pages = Pdf.parseFile("f", Pdf.buildPdf(Seq(hostile)))
    assert(pages.size == 1 && pages.head.refused == null)
    assert(pages.head.text.startsWith(hostile))
  }

  test("refusals are loud and typed, never garbage output") {
    // not a PDF at all
    assert(Pdf.parseFile("f", "hello world".getBytes(Latin)).head.refused == "not_pdf")
    // encrypted: plant /Encrypt in the trailer
    val enc = new String(Pdf.buildPdf(Seq("x")), Latin)
      .replace("/Root 1 0 R", "/Root 1 0 R /Encrypt 9 0 R")
    val encPages = Pdf.parseFile("f", enc.getBytes(Latin))
    assert(encPages.head.refused == "encrypted" && encPages.head.page == -1)
    // unsupported filter: only THAT page refuses, with the filter
    // named. Same-LENGTH splice — changing byte counts would shift
    // every xref offset and turn the failure into a different refusal
    val lzw = new String(Pdf.buildPdf(Seq("x")), Latin)
      .replace("/Filter /FlateDecode", "/Filter   /LZWDecode")
    val lzwPages = Pdf.parseFile("f", lzw.getBytes(Latin))
    assert(lzwPages.head.refused == "filter:LZWDecode")
    // truncated bytes
    val cut = Pdf.buildPdf(Seq("x")).dropRight(40)
    assert(Pdf.parseFile("f", cut).head.refused != null)
  }

  test("parsePages: distributed round trip over the fixture builder") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "alpha"), (2L, "beta\nlines"), (7L, "gamma (x)"))
      .toDF("doc_id", "text")
    val files = Pdf.textFixture(docs, "doc_id", "text", numFiles = 2)
    val pages = Pdf.parsePages(files, "file_id", "payload").toDF()
      .where(col("refused").isNull)
      .select(regexp_extract(col("text"), "^doc ([0-9]+)\n", 1).cast("long").as("doc_id"),
        col("page"), col("n_pages"))
      .orderBy(col("doc_id"))
      .as[(Long, Int, Int)].collect()
    // files keyed id % 2: file 0 → {2}, file 1 → {1, 7} in id order
    assert(pages.toSeq == Seq((1L, 1, 2), (2L, 1, 1), (7L, 2, 2)))
  }

  test("textCorpus: pages rejoin per document and feed cleanCorpus") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "one high quality sentence with many plain words here"),
        (3L, "another perfectly ordinary english sentence for the gate"))
      .toDF("doc_id", "text")
    val files = Pdf.textFixture(docs, "doc_id", "text", numFiles = 1)
    val corpus = Pdf.textCorpus(files, "file_id", "payload")
    val rows = corpus.orderBy(col("doc_id")).collect()
    assert(rows.length == 1 && rows.head.getAs[Int]("n_pages") == 2)
    // both pages present, in id order, newline-joined
    val text = rows.head.getAs[String]("text")
    assert(text.indexOf("one high quality") < text.indexOf("another perfectly"))
    // the adapter's output schema composes directly into the pipeline
    val cleaned = TextPipeline.cleanCorpusExact(corpus, "doc_id", "text",
      TextPipeline.Config(minQuality = 0.0, langs = Seq("en")))
    assert(cleaned.count() == 1)
  }

  test("extractContentText: uncompressed stream operators directly") {
    val content = ("BT (a) Tj [ (b) -300 (c) -50 (d) ] TJ T* (e) Tj ET " +
      "(outside-BT is ignored) Tj").getBytes(Latin)
    // TJ: -300 <= -180 → space; -50 → no space. T* → newline.
    assert(Pdf.extractContentText(content) == "ab cd\ne\n")
  }

  test("octal escapes and hex strings decode byte-exact") {
    val content = "BT (\\101\\102\\103) Tj <343536> Tj ET".getBytes(Latin)
    assert(Pdf.extractContentText(content) == "ABC456\n")
  }
}
