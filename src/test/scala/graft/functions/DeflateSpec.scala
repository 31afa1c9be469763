package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{DeflateBytes, DeflateSize}
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkTestBase
import graft.ext.TextAnalysis

class DeflateSpec extends AnyFunSuite with SparkTestBase {

  private def ratios(texts: String*): Seq[Option[Double]] = {
    val s = spark
    import s.implicits._
    texts.toDF("t")
      .select(TextAnalysis.compressionRatio(col("t")).as("r"))
      .collect().toSeq.map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
  }

  test("signal separates: repetition ≪ prose < random-ish glyph soup") {
    val repetitive = ("the same phrase again and " * 60).trim
    val prose = "The quick brown fox jumps over the lazy dog while a second " +
      "sentence keeps ordinary English statistics in play for the measure."
    // LCG over the full printable range: ~94 equiprobable symbols leave
    // deflate nothing to model, unlike hex/base36 (16/36-symbol
    // alphabets compress to ~0.5-0.75 and sit BELOW long prose)
    var x = 88172645463325252L
    val soup = new String(Array.fill(600) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      (33 + (math.floorMod(x, 94L)).toInt).toChar
    })
    val Seq(Some(rep), Some(pr), Some(junk)) = ratios(repetitive, prose, soup)
    assert(rep < 0.2, s"repetition should crush: $rep")
    assert(pr > rep * 2 && pr < 1.0, s"prose in the middle: $pr")
    assert(junk > pr, s"incompressible junk above prose: $junk")
  }

  test("null and empty yield null; interpreted matches direct helper") {
    val s = spark
    import s.implicits._
    val out = Seq[Option[String]](None, Some(""), Some("abc"))
      .toDF("t").select(TextAnalysis.compressionRatio(col("t")).as("r")).collect()
    assert(out(0).isNullAt(0) && out(1).isNullAt(0) && !out(2).isNullAt(0))
    val viaExpr = Seq("abc").toDF("t")
      .select(DeflateSize(col("t"))).head().getLong(0)
    assert(viaExpr == DeflateBytes.deflatedSize(UTF8String.fromString("abc")))
  }

  test("deterministic across partitionings and repeated evaluation") {
    val s = spark
    import s.implicits._
    val docs = (1 to 50).map(i => (i.toLong, s"document $i " * (i % 7 + 1))).toDF("id", "t")
    val a = docs.repartition(7).select(col("id"), DeflateSize(col("t")).as("d"))
      .orderBy(col("id")).collect().toSeq
    val b = docs.coalesce(1).select(col("id"), DeflateSize(col("t")).as("d"))
      .orderBy(col("id")).collect().toSeq
    assert(a == b)
  }

  test("SQL registration") {
    val s = spark
    import s.implicits._
    org.apache.spark.sql.graft.DeflateSize.register(s)
    val r = Seq("hello hello hello").toDF("t")
      .selectExpr("deflate_size(t) AS d").head().getLong(0)
    assert(r > 0 && r < 17)
  }
}
