package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class UrlsSpec extends AnyFunSuite with SparkTestBase {

  private def canon(urls: String*): Seq[Option[String]] = {
    val s = spark
    import s.implicits._
    urls.toDF("u")
      .select(Urls.canonicalUrl(col("u")).as("c"))
      .collect().toSeq.map(r => Option(r.getString(0)))
  }

  test("scheme/host case, default port, fragment, userinfo, trailing dot") {
    assert(canon(
      "HTTP://Example.COM:80/Path?a=1#frag",
      "https://User:pw@Sub.Example.ORG:443/x",
      "http://host.example.io./q",
      "  https://ws.example.net/padded  ") == Seq(
      Some("http://example.com/Path?a=1"), // path case PRESERVED
      Some("https://sub.example.org/x"),
      Some("http://host.example.io/q"),
      Some("https://ws.example.net/padded")))
  }

  test("non-default ports survive; non-http(s) and garbage go null") {
    assert(canon(
      "https://example.net:8443/p",
      "http://example.net:8080/p",
      "ftp://files.example.com/x",
      "mailto:a@b.c",
      "javascript:alert(1)",
      "not a url") == Seq(
      Some("https://example.net:8443/p"),
      Some("http://example.net:8080/p"),
      None, None, None, None))
  }

  test("path normalization: slashes, dot segments, root escapes, empty path") {
    assert(canon(
      "https://e.io//a///b/c",
      "https://e.io/a/./b/././c",
      "https://e.io/a/b/../c",
      "https://e.io/a/b/../../c",
      "https://e.io/../a",       // .. at root drops (RFC 3986)
      "https://e.io/a/..",       // trailing ..
      "https://e.io/a/.",        // trailing .
      "https://e.io") == Seq(
      Some("https://e.io/a/b/c"),
      Some("https://e.io/a/b/c"),
      Some("https://e.io/a/c"),
      Some("https://e.io/c"),
      Some("https://e.io/a"),
      Some("https://e.io/"),
      Some("https://e.io/a/"),
      Some("https://e.io/")))
  }

  test("query: tracking params drop, remainder sorts, empty query vanishes") {
    assert(canon(
      "https://e.io/p?utm_source=x&utm_campaign=y&b=2&a=1",
      "https://e.io/p?fbclid=z&gclid=1&msclkid=2&mc_eid=3&igshid=4&ref_src=5&ref_url=6",
      "https://e.io/p?z=9&&y=5",
      "https://e.io/p?UTM_SOURCE=case") == Seq(
      Some("https://e.io/p?a=1&b=2"),
      Some("https://e.io/p"),
      Some("https://e.io/p?y=5&z=9"),
      Some("https://e.io/p"))) // (?i) catches uppercase spellings
  }

  test("aliasing spellings collapse to ONE canonical key") {
    val spellings = Seq(
      "https://News.Example.com/story?id=7&utm_source=mail",
      "HTTPS://news.example.COM:443/story?id=7#top",
      "https://news.example.com./a/../story?utm_campaign=x&id=7")
    assert(canon(spellings: _*).distinct ==
      Seq(Some("https://news.example.com/story?id=7")))
  }

  test("null input stays null") {
    val s = spark
    import s.implicits._
    val out = Seq[Option[String]](None).toDF("u")
      .select(Urls.canonicalUrl(col("u")).as("c")).collect()
    assert(out.head.isNullAt(0))
  }
}
