package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.UnicodeNormalize

import graft.SparkTestBase

/** Every non-ASCII code point here is spelled as a \\uXXXX escape: a
  * raw literal would be silently stored NFC by the editor/toolchain
  * and the NFD fixtures would stop exercising anything.
  */
class UnicodeNormalizeSpec extends AnyFunSuite with SparkTestBase {

  private val NfdCafe = "cafe\u0301"      // e + combining acute
  private val NfcCafe = "caf\u00E9"       // precomposed
  private val NfdManana = "man\u0303ana"  // n + combining tilde
  private val NfcManana = "ma\u00F1ana"

  private def run(form: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      inputs: String*): Seq[String] = {
    val s = spark
    import s.implicits._
    inputs.toDF("t").select(form(col("t")).as("n"))
      .collect().toSeq.map(_.getString(0))
  }

  test("NFC: combining sequences precompose; precomposed passes through") {
    assert(run(UnicodeNormalize.nfc(_), NfdCafe, NfdManana, NfcCafe, "") ==
      Seq(NfcCafe, NfcManana, NfcCafe, ""))
  }

  test("NFKC additionally folds compatibility forms NFC must preserve") {
    val inputs = Seq(
      "\uFB01le",   // fi ligature \u2192 fi
      "\uFF33park", // fullwidth S \u2192 S
      "x\u00B2")    // superscript 2 \u2192 2
    assert(run(UnicodeNormalize.nfkc(_), inputs: _*) == Seq("file", "Spark", "x2"))
    // NFC is canonical-only: every one of these passes through unchanged
    assert(run(UnicodeNormalize.nfc(_), inputs: _*) == inputs)
  }

  test("normalized-key equality: NFD and NFC spellings fingerprint identically after NFC") {
    val s = spark
    import s.implicits._
    val row = Seq((NfdCafe, NfcCafe))
      .toDF("a", "b")
      .select(
        (md5(UnicodeNormalize.nfc(col("a"))) === md5(UnicodeNormalize.nfc(col("b")))).as("eq"),
        (md5(col("a")) === md5(col("b"))).as("raw_eq"))
      .head()
    assert(row.getBoolean(0), "NFC keys must match")
    assert(!row.getBoolean(1), "raw keys must differ (else the fixture is vacuous)")
  }

  test("null passes through; SQL registration works") {
    val s = spark
    import s.implicits._
    UnicodeNormalize.register(s)
    val out = Seq[Option[String]](None, Some(NfdCafe))
      .toDF("t")
      .selectExpr("nfc_normalize(t) AS n", "nfkc_normalize(t) AS k")
      .collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1))
    assert(out(1).getString(0) == NfcCafe && out(1).getString(1) == NfcCafe)
  }

  test("interpreted and codegen paths agree with java.text.Normalizer") {
    // incl. a double-combining-mark oddity that must not crash either path
    val inputs = Seq(NfdCafe, "\uFB01", "plain", "e\u0301\u0301")
    val viaExpr = run(UnicodeNormalize.nfc(_), inputs: _*)
    val viaJava = inputs.map(t =>
      java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC))
    assert(viaExpr == viaJava)
  }
}
