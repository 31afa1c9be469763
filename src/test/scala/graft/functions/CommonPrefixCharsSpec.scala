package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CommonPrefixChars
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class CommonPrefixCharsSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def cpl(a: String, b: String): Long = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b")
      .select(CommonPrefixChars.column(col("a"), col("b")))
      .head().getLong(0)
  }

  test("character-counted common prefix, ASCII") {
    cpl("hello world", "hello there") shouldBe 6L
    cpl("abc", "abc") shouldBe 3L
    cpl("abc", "abcdef") shouldBe 3L
    cpl("", "x") shouldBe 0L
    cpl("xyz", "abc") shouldBe 0L
  }

  test("multi-byte characters count as ONE and a partial final char never counts") {
    cpl("café au lait", "café noir") shouldBe 5L // 'caf', the é, space
    cpl("ééa", "ééb") shouldBe 2L
    // é (C3 A9) vs è (C3 A8) share their first BYTE but not the char
    cpl("éx", "èx") shouldBe 0L
    cpl("你好世界", "你好吗") shouldBe 2L
  }

  test("matches the reference scala implementation on random pairs") {
    import spark.implicits._
    def ref(a: String, b: String): Long =
      a.zip(b).takeWhile { case (x, y) => x == y }.size.toLong
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      val base = rnd.alphanumeric.take(rnd.nextInt(20)).mkString
      val x = base + rnd.alphanumeric.take(rnd.nextInt(10)).mkString
      val y = base + rnd.alphanumeric.take(rnd.nextInt(10)).mkString
      (x, y)
    }
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"),
        CommonPrefixChars.column(col("a"), col("b")).as("c"))
      .collect()
    got.foreach { r =>
      // alphanumeric is ASCII: char-zip reference is exact here
      r.getLong(2) shouldBe ref(r.getString(0), r.getString(1))
    }
  }

  test("SQL registration surfaces the function") {
    CommonPrefixChars.register(spark)
    spark.sql("SELECT common_prefix_chars('abcd', 'abxy') AS c")
      .head().getLong(0) shouldBe 2L
  }
}
