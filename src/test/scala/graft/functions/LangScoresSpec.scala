package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase
import graft.ext.LangId
import org.apache.spark.sql.graft.LangScores

class LangScoresSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val adversarial = Seq(
    "the cat of the house and a dog",           // plain en
    "el perro de la casa y los gatos",          // plain es
    "  the   a\tof\nand  ",                     // \s variety + leading/trailing
    "THE The tHe",                              // case folding
    "the. a, of; and!",                         // punctuation glued: NO token hits
    "a",                                        // single-char whole-text token
    "de la que les",                            // es/fr shared words count for BOTH
    "这是一个测试 的 人",                        // zh chars, spaced and embedded
    "的的的 不不",                              // repeated zh chars: DISTINCT chars
    "word\u000Bthe\u000Ba\fword",                 // exotic \\s members VT and FF
    "derder der derde",                         // substrings must not match
    "",                                         // empty
    "   ",                                      // whitespace only
    "und the und die und")                      // de word vs en inside one text

  test("fused expression equals the per-language regexp scores on adversarial text") {
    import spark.implicits._
    val df = adversarial.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val out = df.select(
      col("id"),
      LangScores.column(col("text")).as("fused"),
      array(LangId.langs.map(l => LangId.score(col("text"), l)): _*).as("slow"))
      .collect()
    out.foreach { r =>
      withClue(s"id=${r.getLong(0)}: ") {
        r.getSeq[Int](1) shouldBe r.getSeq[Int](2)
      }
    }
  }

  test("langId over the fused scores matches expectations incl. und and tie-break") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat of the house"),      // en
      (2L, "el perro de la casa y"),     // es
      (3L, "xyzzy plugh"),               // no hits -> und
      (4L, "这是我的"),                   // zh
      (5L, "la de que")                  // es/fr tie (3-3) -> es (declaration order)
    ).toDF("id", "text")
    val out = df.select(col("id"), LangId.langId(col("text")).as("lang"))
      .as[(Long, String)].collect().toMap
    out(1L) shouldBe "en"
    out(2L) shouldBe "es"
    out(3L) shouldBe "und"
    out(4L) shouldBe "zh"
    out(5L) shouldBe "es"
  }

  test("null text yields null scores and und language") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String]), (2L, Some("the a"))).toDF("id", "text")
    val rows = df.select(LangScores.column(col("text"))).collect()
    rows(0).isNullAt(0) shouldBe true
    rows(1).getSeq[Int](0).head shouldBe 2
    df.select(LangId.langId(col("text")).as("l"))
      .collect().map(_.getString(0)).toSeq shouldBe Seq("und", "en")
  }

  test("registered SQL function works end-to-end; interpreted path agrees") {
    LangScores.register(spark)
    spark.sql("SELECT lang_scores('the a of und die') AS s")
      .head.getSeq[Int](0) shouldBe Seq(3, 0, 2, 0, 0)
    import spark.implicits._
    val df = adversarial.toDF("text")
    val codegen = df.select(LangScores.column(col("text"))).collect()
      .map(r => if (r.isNullAt(0)) null else r.getSeq[Int](0))
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = df.select(LangScores.column(col("text"))).collect()
        .map(r => if (r.isNullAt(0)) null else r.getSeq[Int](0))
      interp.toSeq shouldBe codegen.toSeq
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }
}
