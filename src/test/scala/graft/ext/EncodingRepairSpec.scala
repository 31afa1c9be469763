package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions.col

import graft.SparkTestBase

/** Encoding repair ([[TextPipeline.repairText]] and friends). Every
  * fixture string is built from `\u` escapes — the mojibake sequences
  * include characters that are invisible (U+009D, U+00A0) or easily
  * mangled by editors, so no raw sequence appears in this source.
  */
class EncodingRepairSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def one(input: String): String = {
    import spark.implicits._
    Seq(Tuple1(input)).toDF("t")
      .select(TextPipeline.repairText(col("t")).as("r"))
      .collect().head.getString(0)
  }

  // mojibake spellings by repaired char, from the operator's own table
  private val moj: Map[String, String] =
    TextPipeline.MojibakeTable.map { case (m, r) => (r, m) }.toMap

  test("repairText fixes every mojibake category") {
    val garbled = "caf" + moj("é") + " " + moj("“") + "well" +
      moj("”") + " " + moj("–") + " ok " + moj("€") + "9 " +
      moj("ü") + "ber"
    one(garbled) shouldBe
      "café “well” – ok €9 über"
  }

  test("every table entry round-trips in isolation") {
    TextPipeline.MojibakeTable.foreach { case (m, r) =>
      withClue(s"pattern ${m.map(c => f"\\u${c.toInt}%04X").mkString}: ") {
        one(s"x${m}y") shouldBe s"x${r}y"
      }
    }
  }

  test("control debris strips: C0 bell and stray C1, while tab/newline/CR survive") {
    one("ab c\td\ne\rf") shouldBe "ab c\td\ne\rf"
  }

  test("U+009D right-quote repairs only because controls strip AFTER the table") {
    // stripping C1 controls first would eat the sequence's third char
    // (U+009D is itself C1) and leave a bare a-circumflex + euro behind
    one("aâ€b") shouldBe "a”b"
  }

  test("legitimate text is untouched, including real accents and curly quotes") {
    val clean = "café touché “quoted” plain"
    one(clean) shouldBe clean
  }

  test("NBSP mojibake becomes a real NBSP; A-circumflex + plain space survives") {
    one("xÂ y") shouldBe "x y"
    one("xÂ y") shouldBe "xÂ y"
  }

  test("single-pass by design: double-encoded mojibake leaves residue, not corruption") {
    import spark.implicits._
    // e-acute double-garbled: C3 A9 -> mis-decode -> re-encode ->
    // mis-decode again = A-tilde, latin-f-hook, A-circumflex,
    // copyright. No single-pass table entry matches the full sequence;
    // the pass must leave it alone (repairing half would corrupt).
    val doubled = "cafÃƒÂ©"
    one(doubled) shouldBe doubled
    val counted = Seq(Tuple1(doubled)).toDF("t")
      .select(TextPipeline.mojibakeCount(col("t")).as("n"))
      .collect().head.getInt(0)
    counted shouldBe 0
  }

  test("mojibakeCount is pre-repair; controlCount is post-repair-pre-strip") {
    import spark.implicits._
    // one e-acute garble + one right-single-quote garble + a bell +
    // a stray U+009D NOT part of any sequence
    val garbled = moj("é") + moj("’") + "   end"
    val r = Seq(Tuple1(garbled)).toDF("t")
      .select(
        TextPipeline.mojibakeCount(col("t")).as("m"),
        TextPipeline.controlCount(col("t")).as("c"))
      .collect().head
    r.getInt(0) shouldBe 2
    r.getInt(1) shouldBe 2 // the C0 bell and the stray U+009D
  }

  test("cleanCorpus repairEncoding: a garbled copy exact-dedups with its clean twin") {
    import spark.implicits._
    val clean = "the quick brown fox jumps over the lazy dog and it " +
      "is a fine day in the park for a long walk with café friends"
    val garbled = clean.replace("café", "caf" + moj("é"))
    val docs = Seq((1L, clean), (2L, garbled)).toDF("doc_id", "text")
    val out = TextPipeline.cleanCorpus(docs, "doc_id", "text",
      TextPipeline.Config(nearDupJaccard = 0.5, numHashes = 64, bands = 16,
        shingleSize = 2, repairEncoding = true))
    out.select("doc_id").collect().map(_.getLong(0)).toSet shouldBe Set(1L)
  }
}
