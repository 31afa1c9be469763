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
}
