package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RobotsSpec extends AnyFunSuite with SparkTestBase {

  test("parseFile: groups, stacking, comments, empty disallow, crawl-delay") {
    val text =
      """# front matter comment
        |User-agent: alpha
        |User-agent: beta
        |Disallow: /a/   # trailing comment
        |Allow: /a/ok
        |Crawl-delay: 2.5
        |
        |User-agent: *
        |Disallow:
        |Disallow: /b/
        |Sitemap: https://h/x.xml
        |""".stripMargin
    val (rules, delays) = Robots.parseFile("h", text)
    assert(rules.toSet == Set(
      Robots.RobotsRule("h", "alpha", allow = false, "/a/"),
      Robots.RobotsRule("h", "beta", allow = false, "/a/"),
      Robots.RobotsRule("h", "alpha", allow = true, "/a/ok"),
      Robots.RobotsRule("h", "beta", allow = true, "/a/ok"),
      Robots.RobotsRule("h", "*", allow = false, "/b/")))
    assert(delays.toSet == Set(
      Robots.CrawlDelay("h", "alpha", 2.5), Robots.CrawlDelay("h", "beta", 2.5)))
  }

  test("a rule line closes the user-agent header block") {
    // UA after a rule line starts a NEW group, not an extension
    val (rules, _) = Robots.parseFile("h",
      "User-agent: a\nDisallow: /x/\nUser-agent: b\nDisallow: /y/")
    assert(rules.toSet == Set(
      Robots.RobotsRule("h", "a", allow = false, "/x/"),
      Robots.RobotsRule("h", "b", allow = false, "/y/")))
  }

  private def gate(urls: Seq[(Long, String)], robots: Seq[(String, String)],
      agent: String): Map[Long, Boolean] = {
    val s = spark
    import s.implicits._
    val rules = Robots.parseRules(robots.toDF("host", "text"), "host", "text").toDF()
    Robots.allowed(urls.toDF("id", "url"), "url", rules, agent)
      .select(col("id"), col("allowed"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
  }

  test("longest match wins; Allow beats Disallow on ties; boundary is prefix-literal") {
    val robots = Seq("h.example" ->
      "User-agent: *\nDisallow: /private/\nAllow: /private/public/\nAllow: /tie\nDisallow: /tie")
    val verdicts = gate(Seq(
      1L -> "https://h.example/private/x",        // blocked
      2L -> "https://h.example/private/public/y", // longest match allows
      3L -> "https://h.example/open",             // no rule → allowed
      4L -> "https://h.example/private",          // NOT "/private/" prefix → allowed
      5L -> "https://h.example/tie/z",            // equal length → Allow wins
      6L -> "https://h.example"                   // empty path reads as "/"
    ), robots, "anybot")
    assert(verdicts == Map(1L -> false, 2L -> true, 3L -> true,
      4L -> true, 5L -> true, 6L -> true))
  }

  test("schedule: same-host fetches space by resolved crawl-delay") {
    val s = spark
    import s.implicits._
    val robots = Seq(
      "slow.example" -> "User-agent: *\nCrawl-delay: 5\nUser-agent: graftbot\nCrawl-delay: 2\nDisallow: /x/",
      "star.example" -> "User-agent: *\nCrawl-delay: 3\n").toDF("host", "text")
    val delays = Robots.parseDelays(robots, "host", "text").toDF()
    val urls = Seq(
      "https://slow.example/a", "https://slow.example/b", "https://slow.example/c",
      "https://star.example/a", "https://star.example/b",
      "https://nodelay.example/a", "https://nodelay.example/b").toDF("url")
    val out = Robots.schedule(urls, "url", delays, "graftbot", defaultDelaySec = 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // exact-agent delay (2) beats *'s (5); * delay applies when no exact; default 1
    assert(out("https://slow.example/a") == 0.0 && out("https://slow.example/b") == 2.0
      && out("https://slow.example/c") == 4.0)
    assert(out("https://star.example/a") == 0.0 && out("https://star.example/b") == 3.0)
    assert(out("https://nodelay.example/a") == 0.0 && out("https://nodelay.example/b") == 1.0)
  }

  test("allowed: duplicate rows keep their multiplicity; host/allow/prefix input columns survive") {
    val s = spark
    import s.implicits._
    val robots = Seq("h.example" -> "User-agent: *\nDisallow: /no/").toDF("host", "text")
    val rules = Robots.parseRules(robots, "host", "text").toDF()
    // two fully-identical rows + columns that collide with the rules
    // frame's names — both must pass through the gate untouched
    val urls = Seq(
      ("https://h.example/no/x", "myhost", true, "p0"),
      ("https://h.example/no/x", "myhost", true, "p0"),
      ("https://h.example/ok", "other", false, "p1"))
      .toDF("url", "host", "allow", "prefix")
    val out = Robots.allowed(urls, "url", rules, "anybot").collect()
    assert(out.length == 3)
    assert(out.map(_.getString(0)).count(_ == "https://h.example/no/x") == 2)
    val byUrl = out.map(r => (r.getString(0),
      (r.getString(1), r.getBoolean(2), r.getString(3), r.getBoolean(4)))).toMap
    assert(byUrl("https://h.example/no/x") == (("myhost", true, "p0", false)))
    assert(byUrl("https://h.example/ok") == (("other", false, "p1", true)))
  }

  test("exact-agent group replaces the * group entirely; absent robots allows") {
    val robots = Seq(
      "a.example" -> "User-agent: *\nDisallow: /\nUser-agent: graftbot\nDisallow: /secret/",
      "b.example" -> "User-agent: other\nDisallow: /")
    val verdicts = gate(Seq(
      1L -> "https://a.example/anything",   // * blocks all, but graftbot group governs
      2L -> "https://a.example/secret/x",   // graftbot's own rule
      3L -> "https://b.example/x",          // no graftbot, no * group → allowed
      4L -> "https://norobots.example/x"    // host absent from rules → allowed
    ), robots, "GraftBot") // case-insensitive agent
    assert(verdicts == Map(1L -> true, 2L -> false, 3L -> true, 4L -> true))
  }

  private def gateW(urls: Seq[(Long, String)], robots: Seq[(String, String)],
      agent: String): Map[Long, Boolean] = {
    val s = spark
    import s.implicits._
    val rules = Robots.parseRules(robots.toDF("host", "text"), "host", "text").toDF()
    Robots.allowedWildcards(urls.toDF("id", "url"), "url", rules, agent)
      .select(col("id"), col("allowed"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
  }

  test("wildcards: * matches any sequence, trailing $ anchors, specificity = rule text") {
    val robots = Seq("w.example" ->
      "User-agent: *\nDisallow: /*.pdf$\nAllow: /pub/*.pdf$\nDisallow: /tmp$")
    val verdicts = gateW(Seq(
      1L -> "https://w.example/a.pdf",       // $-anchored wildcard block
      2L -> "https://w.example/deep/b.pdf",  // * spans slashes
      3L -> "https://w.example/pub/x.pdf",   // longer Allow wins
      4L -> "https://w.example/a.pdfz",      // $ anchor: no match
      5L -> "https://w.example/tmp",         // exact anchored block
      6L -> "https://w.example/tmp/x"        // /tmp$ must NOT block below
    ), robots, "anybot")
    assert(verdicts == Map(1L -> false, 2L -> false, 3L -> true,
      4L -> true, 5L -> false, 6L -> true))
  }

  test("wildcards: mid-pattern * vs longer literal Allow; regex metachars stay literal") {
    val robots = Seq("w.example" ->
      "User-agent: *\nDisallow: /private*/\nAllow: /private-pub/\nDisallow: /q?a=(1)")
    val verdicts = gateW(Seq(
      1L -> "https://w.example/private1/x",    // wildcard block
      2L -> "https://w.example/private-pub/x", // longer literal Allow wins
      3L -> "https://w.example/privateX/",     // wildcard block (trailing /)
      4L -> "https://w.example/private",       // no trailing / → pattern needs the /
      5L -> "https://w.example/other"          // untouched
    ), robots, "anybot")
    assert(verdicts == Map(1L -> false, 2L -> true, 3L -> false,
      4L -> true, 5L -> true))
  }

  test("wildcards off: allowed() keeps literal-prefix semantics for * in text") {
    // the literal matcher treats '*' as an ordinary character —
    // documented REP-core behavior, pinned so enabling wildcards is an
    // explicit opt-in rather than a silent change
    val robots = Seq("w.example" -> "User-agent: *\nDisallow: /*.pdf$")
    val s = spark
    import s.implicits._
    val rules = Robots.parseRules(robots.toDF("host", "text"), "host", "text").toDF()
    val out = Robots.allowed(
      Seq((1L, "https://w.example/a.pdf")).toDF("id", "url"), "url", rules, "anybot")
      .select("allowed").head().getBoolean(0)
    assert(out) // literal "/*.pdf$" prefix never matches
  }
}
