package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** robots.txt parsing + the crawl-politeness gate — the admission
  * check that runs BESIDE the frontier key ([[Urls.canonicalUrl]],
  * [[BloomGate]]) in a crawler: a URL that passes dedup still must
  * not be fetched if the host's robots.txt disallows it.
  *
  * Scope (REP core; [[allowed]] matches LITERAL prefixes — the
  * SQL-oracle-able base — and [[allowedWildcards]] opts into the RFC
  * 9309 §2.2.3 special characters, star + end-anchor, oracled by a
  * closed-form verdict zoo instead):
  *  - `User-agent:` lines stack; a group's rules apply to every agent
  *    named since the last rule line (the standard group semantics)
  *  - `Allow:` / `Disallow:` with LITERAL path prefixes; empty
  *    `Disallow:` emits no rule (allow-all)
  *  - `Crawl-delay:` captured per (host, agent)
  *  - matching: the agent's own group if it has ANY rule, else the
  *    `*` group; within the group the LONGEST matching prefix wins,
  *    Allow beats Disallow on equal length; no match → allowed
  *  - `#` comments, blank lines, unknown directives skipped; field
  *    names case-insensitive
  *
  * Shape at scale: robots files are tiny and per-host (one flatMap
  * row each — per-file CPU, the [[Warc.parseFile]] class); the rules
  * table is host-cardinality-sized, orders of magnitude smaller than
  * a frontier, so the gate join broadcasts and the frontier never
  * shuffles. The verdict per URL is ONE aggregation (max of a
  * (prefix-length, allow) struct — the [[Dedup]] keep-first shape,
  * never a window).
  */
object Robots {

  /** One parsed rule. `allow=false` is Disallow. */
  final case class RobotsRule(host: String, agent: String, allow: Boolean, prefix: String)

  /** One crawl-delay directive. */
  final case class CrawlDelay(host: String, agent: String, delay_sec: Double)

  /** Parse one robots.txt payload. Returns (rules, delays). */
  def parseFile(host: String, text: String): (Seq[RobotsRule], Seq[CrawlDelay]) = {
    val rules = Seq.newBuilder[RobotsRule]
    val delays = Seq.newBuilder[CrawlDelay]
    var agents = List.empty[String] // current group, most-recent first
    var inGroupHeader = false       // true while stacking User-agent lines
    text.split("\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val field = line.substring(0, colon).trim.toLowerCase
          val value = line.substring(colon + 1).trim
          field match {
            case "user-agent" =>
              agents = if (inGroupHeader) value.toLowerCase :: agents
                else List(value.toLowerCase)
              inGroupHeader = true
            case "allow" | "disallow" =>
              inGroupHeader = false
              if (value.nonEmpty)
                agents.foreach(a => rules += RobotsRule(host, a, field == "allow", value))
            case "crawl-delay" =>
              inGroupHeader = false
              value.toDoubleOption.foreach(d =>
                agents.foreach(a => delays += CrawlDelay(host, a, d)))
            case _ => // sitemap/unknown directives: not group members
          }
        }
      }
    }
    (rules.result(), delays.result())
  }

  /** Rules of every robots.txt in `files` (`hostCol` string,
    * `textCol` string payload). Typed flatMap — per-file CPU.
    */
  def parseRules(files: DataFrame, hostCol: String, textCol: String): Dataset[RobotsRule] = {
    val s = files.sparkSession
    import s.implicits._
    files.select(col(hostCol).cast("string"), col(textCol).cast("string"))
      .as[(String, String)]
      .flatMap { case (h, t) => parseFile(h, Option(t).getOrElse(""))._1 }
  }

  /** Crawl delays of every robots.txt in `files`. */
  def parseDelays(files: DataFrame, hostCol: String, textCol: String): Dataset[CrawlDelay] = {
    val s = files.sparkSession
    import s.implicits._
    files.select(col(hostCol).cast("string"), col(textCol).cast("string"))
      .as[(String, String)]
      .flatMap { case (h, t) => parseFile(h, Option(t).getOrElse(""))._2 }
  }

  /** `Sitemap:` directives of every robots.txt in `files` — the
    * discovery stream a crawler feeds into sitemap ingest
    * ([[Sitemap.indexEntries]] / [[Sitemap.urlEntries]]). Per RFC 9309
    * the directive is NOT group-scoped, so this is a flat line scan:
    * split → comment-strip → case-insensitive field match, all codegen
    * projections (and therefore SQL-oracle-able, unlike the stateful
    * group walk in [[parseFile]]). Output: `(host, sitemap_url)`.
    */
  def sitemapDirectives(files: DataFrame, hostCol: String, textCol: String): DataFrame =
    files
      .select(col(hostCol).cast("string").as("host"),
        explode(split(col(textCol), "\n")).as("__line"))
      .select(col("host"),
        trim(regexp_replace(col("__line"), "#.*$", "")).as("__clean"))
      .where(col("__clean").rlike("(?i)^sitemap\\s*:"))
      .select(col("host"),
        trim(regexp_replace(col("__clean"), "(?i)^sitemap\\s*:", "")).as("sitemap_url"))
      .where(col("sitemap_url") =!= "")

  private def hostOf(url: Column): Column =
    lower(regexp_extract(url, "^[a-z]+://(?:[^/?#]*@)?([^/?#:]*)", 1))

  private def pathOf(url: Column): Column = {
    val p = regexp_extract(url, "^[a-z]+://[^/?#]*([^?#]*)", 1)
    when(p === "", lit("/")).otherwise(p)
  }

  /** Gate a URL frame on a rules frame for one crawler agent.
    * Adds `allowed` (boolean) to `urls`; URLs whose host has no
    * robots rules are allowed (the fetch-failed/absent-robots
    * default). Group selection and longest-match both happen in ONE
    * broadcast join + ONE aggregation over the (small) matched-rule
    * set; the URL frame itself is never shuffled beyond that
    * aggregation's key.
    *
    * Row multiplicity is preserved exactly (the aggregation key is a
    * generated per-row id, not the row's columns, so fully-duplicate
    * input rows stay duplicates), and the rules-side join columns are
    * renamed to reserved `__`-prefixed names before joining — input
    * frames may freely carry columns named `host`/`allow`/`prefix`.
    * `__`-prefixed input columns remain reserved engine-wide.
    */
  def allowed(
      urls: DataFrame,
      urlCol: String,
      rules: DataFrame,
      agent: String): DataFrame =
    allowedImpl(urls, urlCol, rules, agent, wildcards = false)

  /** [[allowed]] with RFC 9309 §2.2.3 special characters enabled:
    * `*` in a rule path matches any character sequence and a trailing
    * `$` anchors the rule to the path's end; precedence stays "most
    * specific = longest RULE TEXT, Allow beats Disallow on ties"
    * (the RFC measures specificity in pattern octets, not matched
    * octets). Patterns translate to regexes in a codegen projection
    * (escape metachars → `\*`→`.*` → trailing `\$`→`$`), and the
    * match becomes a per-(url, rule) `regexp_like` on the broadcast
    * join — rules are host-cardinality-small, so the regex row count
    * is |matched pairs|, not the frontier.
    */
  def allowedWildcards(
      urls: DataFrame,
      urlCol: String,
      rules: DataFrame,
      agent: String): DataFrame =
    allowedImpl(urls, urlCol, rules, agent, wildcards = true)

  private def allowedImpl(
      urls: DataFrame,
      urlCol: String,
      rules: DataFrame,
      agent: String,
      wildcards: Boolean): DataFrame = {
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    // per host: does the agent's OWN group exist (any rule)?
    val hostHasAgent = rules.where(col("agent") === agentLc)
      .select(col("host")).distinct()
      .withColumn("__has_agent", lit(true))
    val applicable = rules
      .where(col("agent") === agentLc || col("agent") === "*")
      .join(hostHasAgent, Seq("host"), "left")
      // exact-agent group wins entirely when present; else the * group
      .where(col("agent") === agentLc ||
        (col("agent") === "*" && col("__has_agent").isNull))
      .select(col("host").as("__r_host"), col("allow").as("__r_allow"),
        col("prefix").as("__r_prefix"))
      .withColumn("__r_re",
        if (!wildcards) lit(null).cast("string")
        else {
          // pattern → regex: escape metachars, then the (now-escaped)
          // REP specials back to their meanings: \* → .*, trailing \$
          // → end anchor; everything else literal, match from start
          val esc = regexp_replace(col("__r_prefix"),
            "([.^$+?()\\[\\]{}|\\\\*])", "\\\\$1")
          val star = regexp_replace(esc, "\\\\\\*", ".*")
          concat(lit("^"), regexp_replace(star, "\\\\\\$$", "\\$"))
        })
    val keyed = urls
      .withColumn("__rid", monotonically_increasing_id())
      .withColumn("__host", hostOf(col(urlCol)))
      .withColumn("__path", pathOf(col(urlCol)))
    // verdict = the most specific matching rule's allow (longest RULE
    // TEXT; Allow wins ties — struct max orders by (length, allow));
    // no match → allowed. first() per input column is exact here:
    // every row of a __rid group carries the same input values.
    val aggCols = urls.columns.map(c => first(col(c)).as(c)) :+
      max(when(col("__r_prefix").isNotNull,
        struct(length(col("__r_prefix")).as("l"), col("__r_allow").as("a"))))
        .as("__best")
    val matchCond =
      if (wildcards) regexp_like(col("__path"), col("__r_re"))
      else col("__path").startsWith(col("__r_prefix"))
    keyed
      .join(broadcast(applicable),
        col("__host") === col("__r_host") && matchCond,
        "left")
      .groupBy(col("__rid"))
      .agg(aggCols.head, aggCols.tail: _*)
      .withColumn("allowed",
        coalesce(col("__best").getField("a"), lit(true)))
      .select(urls.columns.map(col) :+ col("allowed"): _*)
  }

  /** Politeness scheduling: assign each URL a fetch offset so that
    * same-host fetches are `crawl-delay` seconds apart (the agent's
    * own delay, else `*`'s, else `defaultDelaySec`). Deterministic
    * order within a host (by URL), offsets start at 0.
    *
    * Shape at scale: ONE window partitioned by host — host cardinality
    * is the parallelism of a crawl frontier, so partitions are many
    * and individually small (the per-host fetch list); the delay table
    * is host-sized and broadcasts.
    */
  def schedule(
      urls: DataFrame,
      urlCol: String,
      delays: DataFrame,
      agent: String,
      defaultDelaySec: Double = 1.0): DataFrame = {
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    // per host: the agent's own delay beats *'s (struct max on
    // (is_exact, delay) keeps ONE row per host without a window)
    // delays-side column renamed to a reserved name so a user column
    // called `host` survives the join (same contract as [[allowed]])
    val d = delays
      .where(col("agent") === agentLc || col("agent") === "*")
      .groupBy(col("host").as("__d_host"))
      .agg(max(struct((col("agent") === agentLc).as("e"), col("delay_sec").as("d")))
        .getField("d").as("__delay"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__host")).orderBy(col(urlCol))
    urls
      .withColumn("__host", hostOf(col(urlCol)))
      .join(broadcast(d), col("__host") === col("__d_host"), "left")
      .withColumn("fetch_offset_sec",
        (row_number().over(w) - 1).cast("double") *
          coalesce(col("__delay"), lit(defaultDelaySec)))
      .drop("__d_host", "__delay", "__host")
  }
}
