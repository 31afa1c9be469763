package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sitemap parsing (sitemaps.org XML) — the crawl frontier's OTHER
  * input stream beside discovered links: `<urlset>` entries carry the
  * site's own canonical URL list with freshness hints, and
  * `<sitemapindex>` files fan out to child sitemaps.
  *
  * Deliberately regexp-shaped, not a general XML parser: sitemap files
  * are machine-generated, flat, and spec-bounded (≤50k entries), so
  * `(?s)`-dotall block extraction + per-block field extraction is both
  * robust here and fully SQL-oracle-able (DuckDB runs the identical
  * pattern chain). Everything is a scan-projection HOF over per-row
  * blocks — no shuffle, no plan surface; CDATA and entity handling
  * cover the forms real generators emit.
  */
object Sitemap {

  private val CdataPattern = "(?s)^\\s*<!\\[CDATA\\[(.*)\\]\\]>\\s*$"

  private def decodeEntities(c: Column): Column = {
    // the five XML built-ins; &amp; LAST so it can't re-create others
    val amp = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(c, "&lt;", "<"),
          "&gt;", ">"),
        "&quot;", "\""),
      "&apos;", "'")
    regexp_replace(amp, "&amp;", "&")
  }

  private def field(block: Column, tag: String): Column = {
    val raw = regexp_extract(block, s"(?s)<$tag>(.*?)</$tag>", 1)
    val t = trim(raw)
    // CDATA content is LITERAL per the XML spec — entity references
    // inside it are plain text, so decodeEntities only runs on the
    // non-CDATA branch (`<![CDATA[a&amp;b]]>` yields `a&amp;b`, not `a&b`).
    when(raw === "", lit(null).cast("string"))
      .otherwise(when(t.rlike(CdataPattern), regexp_extract(t, CdataPattern, 1))
        .otherwise(decodeEntities(t)))
  }

  /** Explode a `<urlset>` sitemap column into one row per `<url>`
    * entry with `(loc, lastmod, changefreq, priority)`; rows without a
    * `<loc>` are dropped (spec-invalid). Input columns pass through.
    */
  def urlEntries(df: DataFrame, xmlCol: String): DataFrame =
    df
      .withColumn("__block",
        explode(regexp_extract_all(col(xmlCol), lit("(?s)<url>(.*?)</url>"), lit(1))))
      .withColumn("loc", field(col("__block"), "loc"))
      .withColumn("lastmod", field(col("__block"), "lastmod"))
      .withColumn("changefreq", field(col("__block"), "changefreq"))
      .withColumn("priority", field(col("__block"), "priority").cast("double"))
      .where(col("loc").isNotNull)
      .drop("__block")

  /** Freshness-driven recrawl scheduling over parsed sitemap entries
    * ([[urlEntries]] output): `staleness` = days since `lastmod`
    * divided by the `changefreq` period (always/hourly 1/24, daily 1,
    * weekly 7, monthly 30, yearly 365, never ∞ → staleness 0; absent
    * changefreq defaults to monthly, the conservative read), and
    * `due` = staleness ≥ 1 — a page is due when at least one declared
    * change period has elapsed. A null `lastmod` (never seen) is due
    * with null staleness. Adds `(staleness, due)`; pure scan
    * projection, no shuffle — ordering/top-k is the caller's.
    */
  def recrawlPriority(entries: DataFrame, asOf: String): DataFrame = {
    val period = when(lower(col("changefreq")).isin("always", "hourly"), 1.0 / 24)
      .when(lower(col("changefreq")) === "daily", 1.0)
      .when(lower(col("changefreq")) === "weekly", 7.0)
      .when(lower(col("changefreq")) === "monthly", 30.0)
      .when(lower(col("changefreq")) === "yearly", 365.0)
      .when(lower(col("changefreq")) === "never", Double.PositiveInfinity)
      .otherwise(30.0) // absent/unknown → monthly
    val age = datediff(to_date(lit(asOf)), to_date(col("lastmod"))).cast("double")
    entries
      .withColumn("staleness",
        when(col("lastmod").isNull, lit(null).cast("double"))
          .otherwise(age / period))
      .withColumn("due", col("lastmod").isNull || col("staleness") >= 1.0)
  }

  /** Child sitemap locations of a `<sitemapindex>` column — the fan-out
    * list a crawler feeds back into its fetch queue.
    */
  def indexEntries(df: DataFrame, xmlCol: String): DataFrame =
    df
      .withColumn("__block",
        explode(regexp_extract_all(col(xmlCol), lit("(?s)<sitemap>(.*?)</sitemap>"), lit(1))))
      .withColumn("loc", field(col("__block"), "loc"))
      .withColumn("lastmod", field(col("__block"), "lastmod"))
      .where(col("loc").isNotNull)
      .drop("__block")
}
