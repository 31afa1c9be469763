package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SitemapSpec extends AnyFunSuite with SparkTestBase {

  private def entries(xml: String): Seq[(String, Option[String], Option[String], Option[Double])] = {
    val s = spark
    import s.implicits._
    Sitemap.urlEntries(Seq(xml).toDF("xml"), "xml")
      .select(col("loc"), col("lastmod"), col("changefreq"), col("priority"))
      .collect().toSeq.map(r => (r.getString(0), Option(r.getString(1)),
        Option(r.getString(2)), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
  }

  test("urlset: multiline entries, optional fields, entity + CDATA decode") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url>
        |    <loc>https://a.example/p?x=1&amp;y=2</loc>
        |    <lastmod>2026-01-01</lastmod>
        |    <changefreq>daily</changefreq>
        |    <priority>0.8</priority>
        |  </url>
        |  <url><loc><![CDATA[https://a.example/cdata?q=1&r=2]]></loc></url>
        |  <url><lastmod>2026-02-02</lastmod></url>
        |  <url><loc>  https://a.example/ws  </loc></url>
        |</urlset>
        |""".stripMargin
    assert(entries(xml) == Seq(
      ("https://a.example/p?x=1&y=2", Some("2026-01-01"), Some("daily"), Some(0.8)),
      ("https://a.example/cdata?q=1&r=2", None, None, None), // loc-less entry dropped
      ("https://a.example/ws", None, None, None)))
  }

  test("CDATA content is literal: entity references inside it do NOT decode") {
    val xml = "<urlset><url><loc><![CDATA[https://e/p?a=1&amp;b=2]]></loc></url></urlset>"
    assert(entries(xml).map(_._1) == Seq("https://e/p?a=1&amp;b=2"))
  }

  test("all five XML entities decode; &amp; cannot re-create others") {
    val xml = "<urlset><url><loc>https://e/&lt;&gt;&quot;&apos;&amp;lt;</loc></url></urlset>"
    // &amp;lt; must decode to the LITERAL text "&lt;", not to "<"
    assert(entries(xml).map(_._1) == Seq("https://e/<>\"'&lt;"))
  }

  test("sitemapindex fan-out") {
    val s = spark
    import s.implicits._
    val xml =
      """<sitemapindex><sitemap><loc>https://h/a.xml</loc><lastmod>2026-01-01</lastmod></sitemap>
        |<sitemap><loc>https://h/b.xml</loc></sitemap></sitemapindex>""".stripMargin
    val out = Sitemap.indexEntries(Seq(xml).toDF("xml"), "xml")
      .select(col("loc"), col("lastmod")).collect().toSeq
      .map(r => (r.getString(0), Option(r.getString(1))))
    assert(out == Seq(
      ("https://h/a.xml", Some("2026-01-01")), ("https://h/b.xml", None)))
  }

  test("empty / entry-less documents explode to zero rows, not errors") {
    assert(entries("<urlset></urlset>").isEmpty)
    assert(entries("not xml at all").isEmpty)
  }

  test("recrawlPriority: staleness = age/period, due at >=1, never/absent/null handled") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val entries = Seq(
      ("a", "2026-08-10", "daily"),    // age 4 / 1 -> 4.0, due
      ("b", "2026-08-10", "weekly"),   // 4 / 7 -> not due
      ("c", "2026-07-01", "monthly"),  // 44 / 30 -> due
      ("d", "2020-01-01", "never"),    // infinite period -> 0, not due
      ("e", "2026-01-01", null),       // absent -> monthly default, due
      ("f", null, "daily"),            // never seen -> due, null staleness
      ("g", "2026-08-15", "daily")     // future lastmod -> negative, not due
    ).toDF("loc", "lastmod", "changefreq")
    val out = Sitemap.recrawlPriority(entries, asOf = "2026-08-14")
      .select("loc", "staleness", "due").collect()
      .map(r => r.getString(0) -> ((Option(r.get(1)).map(_.asInstanceOf[Double]), r.getBoolean(2))))
      .toMap
    assert(out("a") == ((Some(4.0), true)))
    assert(math.abs(out("b")._1.get - 4.0 / 7.0) < 1e-12)
    assert(!out("b")._2)
    assert(out("c")._2)
    assert(out("d") == ((Some(0.0), false)))
    assert(out("e")._2)
    assert(out("f") == ((None, true)))
    assert(out("g")._1.get < 0.0)
    assert(!out("g")._2)
  }
}
