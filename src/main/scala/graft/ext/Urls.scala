package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the missing key under every frontier
  * operator: crawl-diff ([[Dedup.crawlDiff]]), Bloom admission
  * ([[BloomGate.bloomedAntiJoin]]) and the domain gates all compare
  * URLs, and raw URLs alias wildly (`HTTP://X.COM:80/a/../b?utm=…#f`
  * is `http://x.com/b`). Canonicalizing to one spelling per resource
  * is what makes those keys actually dedupe.
  *
  * Steps (the common core of RFC 3986 §6 normalization + the
  * tracking-param strip every production frontier applies):
  *  1. trim; scheme+host lowercase; non-http(s) schemes → NULL
  *     (mailto/ftp/javascript are not crawl-frontier keys)
  *  2. userinfo stripped; trailing host dot stripped
  *  3. default ports dropped (http:80 / https:443); others kept
  *  4. path: `//`+ collapsed, `/./` removed, `/seg/../` resolved
  *     (fixed 8-pass chain — absolute paths resolve exactly because
  *     `..` at root drops; >8 nesting levels, pathological, remain),
  *     empty path → `/`
  *  5. query: params split on `&`, empties and tracking params
  *     (utm_*, fbclid, gclid, msclkid, mc_eid, igshid, ref_src,
  *     ref_url) dropped, the rest SORTED and rejoined — param order
  *     never aliases a key again
  *  6. fragment dropped
  *
  * Documented non-goals: IPv6 literal hosts and percent-encoding
  * normalization pass through untouched (rare in crawl frontiers;
  * an escape to a typed normalizer if ever needed).
  *
  * Every step is a codegen regexp/HOF over one row — pure scan
  * projection, no shuffle, no UDF. The SAME step table emits the
  * DuckDB spelling ([[canonicalUrlSql]]), so the q row oracles the
  * chain end-to-end from one source of truth (the q102 mojibake-table
  * pattern).
  */
object Urls {

  /** `(?i)` inline flag works in both Java regex and RE2. */
  private val TrackingParam =
    "^(?i)(utm_[a-z0-9_]*|fbclid|gclid|msclkid|mc_eid|igshid|ref_src|ref_url)="

  // One parse regex, shared verbatim by both engines (RE2-safe: no
  // lookarounds, non-greedy host). Groups: 1 scheme, 2 host, 3 port,
  // 4 path, 5 query.
  private val ParseRe =
    "^([A-Za-z][A-Za-z0-9+.-]*)://(?:[^/?#]*@)?([^/?#:]*)(?::([0-9]+))?([^?#]*)(?:\\?([^#]*))?(?:#.*)?$"

  // Dot-segment resolution chain: each pass removes one nesting level
  // of `/seg/../` plus root-level `..` (which RFC 3986 drops). 8
  // passes bound the chain; see object doc.
  private val DotSegmentPasses = 8

  /** Canonical spelling of `url`, or NULL for anything that is not an
    * absolute http(s) URL.
    */
  def canonicalUrl(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, ParseRe, 1))
    val host0 = lower(regexp_extract(u, ParseRe, 2))
    val host = regexp_replace(host0, "\\.$", "")
    val port = regexp_extract(u, ParseRe, 3)
    val rawPath = regexp_extract(u, ParseRe, 4)
    val query = regexp_extract(u, ParseRe, 5)

    val keepPort = when(
      port === "" || (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))

    // path: collapse //, drop /./ (two passes cover overlaps: /././),
    // then the bounded ../ chain, then trailing /. and /<seg>/..
    var p: Column = regexp_replace(rawPath, "/{2,}", "/")
    p = regexp_replace(p, "/\\./", "/")
    p = regexp_replace(p, "/\\./", "/")
    p = regexp_replace(p, "/\\.$", "/")
    for (_ <- 1 to DotSegmentPasses) {
      p = regexp_replace(p, "^/\\.\\./", "/")
      p = regexp_replace(p, "/[^/]+/\\.\\./", "/")
    }
    p = regexp_replace(p, "^/\\.\\.$", "/")
    p = regexp_replace(p, "/[^/]+/\\.\\.$", "/")
    val path = when(p === "", lit("/")).otherwise(p)

    val params = array_join(
      array_sort(filter(split(query, "&"),
        x => x =!= "" && !x.rlike(TrackingParam))), "&")
    val q = when(params === "", lit("")).otherwise(concat(lit("?"), params))

    when((scheme === "http" || scheme === "https") && host =!= "",
      concat(scheme, lit("://"), host, keepPort, path, q))
  }

  /** The identical chain as a DuckDB SQL expression over `expr` —
    * generated from the same constants so the oracle can never drift
    * from the operator.
    */
  def canonicalUrlSql(expr: String): String = {
    val re = ParseRe.replace("\\\\", "\\") // scala-escaped → literal
    def grp(i: Int) = s"regexp_extract(__u, '${re.replace("'", "''")}', $i)"
    // DuckDB fold of the path chain
    var p = s"regexp_replace(${grp(4)}, '/{2,}', '/', 'g')"
    p = s"regexp_replace($p, '/\\./', '/', 'g')"
    p = s"regexp_replace($p, '/\\./', '/', 'g')"
    p = s"regexp_replace($p, '/\\.$$', '/')"
    for (_ <- 1 to DotSegmentPasses) {
      p = s"regexp_replace($p, '^/\\.\\./', '/')"
      p = s"regexp_replace($p, '/[^/]+/\\.\\./', '/')"
    }
    p = s"regexp_replace($p, '^/\\.\\.$$', '/')"
    p = s"regexp_replace($p, '/[^/]+/\\.\\.$$', '/')"
    s"""(SELECT CASE WHEN __scheme IN ('http','https') AND __host <> ''
       |  THEN __scheme || '://' || __host ||
       |    CASE WHEN __port = '' OR (__scheme = 'http' AND __port = '80')
       |              OR (__scheme = 'https' AND __port = '443')
       |         THEN '' ELSE ':' || __port END ||
       |    CASE WHEN __path = '' THEN '/' ELSE __path END ||
       |    CASE WHEN __params = '' THEN '' ELSE '?' || __params END
       |  END
       | FROM (SELECT
       |    lower(${grp(1)}) AS __scheme,
       |    regexp_replace(lower(${grp(2)}), '\\.$$', '') AS __host,
       |    ${grp(3)} AS __port,
       |    $p AS __path,
       |    coalesce(list_aggregate(list_sort(list_filter(
       |      str_split(${grp(5)}, '&'),
       |      x -> x <> '' AND NOT regexp_matches(x, '$TrackingParam'))),
       |      'string_agg', '&'), '') AS __params
       |  FROM (SELECT trim($expr) AS __u)))""".stripMargin
  }
}
