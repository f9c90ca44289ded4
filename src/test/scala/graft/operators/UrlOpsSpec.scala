package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def norm1(u: String): String = {
    val r = Seq(Tuple1(u)).toDF("u")
      .select(UrlOps.normalizeUrl($"u").as("n")).collect().head
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("canonicalization folds every noise axis") {
    assert(norm1("HTTPS://WWW.Site.COM:443/Docs/1/?b=2&utm_source=x&a=1&gclid=z#frag")
      == "https://site.com/Docs/1?a=1&b=2")
  }

  test("default ports drop per scheme; explicit others survive") {
    assert(norm1("http://site.com:80/a") == "http://site.com/a")
    assert(norm1("https://site.com:443/a") == "https://site.com/a")
    assert(norm1("http://site.com:8080/a") == "http://site.com:8080/a")
    assert(norm1("https://site.com:80/a") == "https://site.com:80/a")
  }

  test("root and trailing slashes trim away") {
    assert(norm1("http://site.com/") == "http://site.com")
    assert(norm1("http://site.com/a///") == "http://site.com/a")
  }

  test("tracker-only query leaves no '?'") {
    assert(norm1("http://site.com/a?utm_source=x&utm_medium=y") == "http://site.com/a")
    assert(norm1("http://site.com/a?fbclid=1") == "http://site.com/a")
  }

  test("trackers drop from any position; the rest sorts") {
    assert(norm1("http://s.co/p?z=9&utm_a=1&m=5&gclid=2&a=0")
      == "http://s.co/p?a=0&m=5&z=9")
  }

  test("already-canonical URLs are fixpoints (idempotent)") {
    val urls = Seq(
      "HTTP://WWW.A.ORG:80/x/?utm_c=1&b=2#f",
      "https://b.io:9000/deep/path?z=1&a=2",
      "http://plain.net")
    urls.foreach { u =>
      val once = norm1(u)
      assert(norm1(once) == once, s"not idempotent for $u")
    }
  }

  test("null -> null") {
    assert(norm1(null) == null)
  }

  test("domainOf strips www, port, and case") {
    val out = Seq(Tuple1("HTTP://WWW.Sub.Site.COM:8080/a?x=1#f")).toDF("u")
      .select(UrlOps.domainOf($"u")).collect().head.getString(0)
    assert(out == "sub.site.com")
  }

  test("capPerDomain keeps n per domain, deterministically by order") {
    val df = (1L to 10L).map(i =>
      (i, s"http://${if (i % 2 == 0) "even" else "odd"}.com/p/$i"))
      .toDF("id", "url")
    val kept = UrlOps.capPerDomain(df, "url", 2, $"id")
      .select($"id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("plan: normalizeUrl is narrow; capPerDomain shuffles once on domain") {
    val df = Seq((1L, "http://a.com/x")).toDF("id", "url")
    val narrowPlan = df.select(UrlOps.normalizeUrl($"url"))
      .queryExecution.executedPlan
    assert(collectPlan(narrowPlan) {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }.isEmpty, s"normalizeUrl should not shuffle:\n$narrowPlan")

    val capped = UrlOps.capPerDomain(df, "url", 1, $"id")
    val plan = capped.queryExecution.executedPlan
    val exchanges = collectPlan(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size == 1, s"expected exactly one shuffle:\n$plan")
  }

  test("keepDomainsByMean: weak origins drop wholesale, incl. their outliers") {
    val df = Seq(
      // good.com: 3 docs, mean 50 — kept whole, incl. the weak doc 3
      (1L, "https://good.com/a", 80L),
      (2L, "https://good.com/b", 60L),
      (3L, "https://good.com/c", 10L),
      // thin.com: mean 100 but only 2 docs — under minDocs, all drop
      (4L, "https://thin.com/a", 100L),
      (5L, "https://thin.com/b", 100L),
      // mill.com: 3 docs, mean 20 — under minMean, the 90 outlier drops TOO
      (6L, "https://mill.com/a", 5L),
      (7L, "https://mill.com/b", 90L),
      (8L, "https://MILL.com:443/c", -35L) // domain folding applies first
    ).toDF("doc_id", "url", "n")
    val kept = UrlOps.keepDomainsByMean(df, "url", "n",
        minMean = 40.0, minDocs = 3L)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L, 3L))
    // boundary: mean == minMean keeps (>=)
    val b = Seq((1L, "https://x.com/a", 40L), (2L, "https://x.com/b", 40L),
      (3L, "https://x.com/c", 40L)).toDF("doc_id", "url", "n")
    assert(UrlOps.keepDomainsByMean(b, "url", "n", 40.0, 3L).count() == 3)
    assert(intercept[IllegalArgumentException](
      UrlOps.keepDomainsByMean(b, "url", "n", 1.0, 0L))
      .getMessage.contains("minDocs"))
  }

  test("dropBlockedDomains: exact host, parent suffix, siblings survive") {
    val df = Seq(
      (1L, "https://ads.x.example.com/a"),   // parent suffix example.com
      (2L, "https://example.com/b"),         // exact entry
      (3L, "https://notexample.com/c"),      // NOT a dotted suffix match
      (4L, "https://example.org/d"),         // sibling TLD survives
      (5L, "https://WWW.Example.COM:443/e"), // case/www/port folded first
      (6L, "https://sub.bad.net/f"),         // second entry, one level up
      (7L, "no scheme, no host")             // unparseable: passes
    ).toDF("doc_id", "url")
    val blocked = Seq("Example.com", "bad.net").toDF("domain") // mixed case
    val kept = UrlOps.dropBlockedDomains(df, "url", "doc_id", blocked)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(3L, 4L, 7L))
    assert(intercept[IllegalArgumentException](
      UrlOps.dropBlockedDomains(df, "url", "doc_id",
        blocked.withColumnRenamed("domain", "host")))
      .getMessage.contains("lacks 'domain'"))
  }

  private def rules(body: String): Set[(String, Boolean)] = {
    val df = Seq(("h.example", body)).toDF("host", "body")
    UrlOps.parseRobots(df, "host", "body")
      .select($"prefix", $"allow").as[(String, Boolean)].collect().toSet
  }

  test("parseRobots: RFC 9309 group semantics — stacked agents, ONLY " +
      "rule lines end a stack (blanks keep stacking), non-* groups " +
      "never leak, Allow rules carry their kind") {
    // stacked * + named agent: rules belong to both
    assert(rules("User-agent: a\nUser-agent: *\nDisallow: /x") ===
      Set("/x" -> false))
    // a rule line ends the stack: the next UA starts a NEW group
    assert(rules("User-agent: *\nDisallow: /x\nUser-agent: b\nDisallow: /y")
      === Set("/x" -> false))
    // a blank line between User-agent lines KEEPS stacking (RFC 9309
    // group ABNF: emptyline is legal among startgrouplines — the
    // advisor's fail-open finding; both agents share the /y group)
    assert(rules("User-agent: *\n\nUser-agent: b\nDisallow: /y")
      === Set("/y" -> false))
    // blank between a * group's UA and its rules does NOT detach them
    assert(rules("User-agent: *\n\nDisallow: /z") === Set("/z" -> false))
    // ...and a blank BETWEEN rules doesn't split the group either
    assert(rules("User-agent: *\nDisallow: /x\n\nAllow: /x/ok") ===
      Set("/x" -> false, "/x/ok" -> true))
    // but after a rule, a UA (blank-separated or not) starts a NEW group
    assert(rules("User-agent: *\nDisallow: /x\n\nUser-agent: b\n" +
      "Disallow: /y") === Set("/x" -> false))
    // non-* group only: nothing applies
    assert(rules("User-agent: gptbot\nDisallow: /") === Set.empty)
    // comments strip; Sitemap lines don't end a UA stack
    assert(rules("User-agent: x # trailing\nUser-agent: *\n" +
      "Sitemap: https://h/s.xml\nDisallow: /p") === Set("/p" -> false))
    // Allow rules emit with their kind beside Disallows
    assert(rules("User-agent: *\nDisallow: /p\nAllow: /p/ok") ===
      Set("/p" -> false, "/p/ok" -> true))
    // empty Disallow/Allow are allow-all noise; pre-UA rules drop
    assert(rules("Disallow: /orphan\nUser-agent: *\nDisallow:\nAllow:\n")
      === Set.empty)
    // case-insensitive directives, CRLF bodies, host canonicalization
    val df = Seq(("WWW.H.example:8080",
      "USER-AGENT: *\r\nDISALLOW: /a\r\n")).toDF("host", "body")
    val out = UrlOps.parseRobots(df, "host", "body").collect().head
    assert(out.getString(0) === "h.example" && out.getString(1) === "/a")
  }

  private def agentRules(body: String, agent: String): Set[(String, Boolean)] = {
    val df = Seq(("h.example", body)).toDF("host", "body")
    UrlOps.parseRobots(df, "host", "body", agent = Some(agent))
      .select($"prefix", $"allow").as[(String, Boolean)].collect().toSet
  }

  test("parseRobots agent matching (RFC 9309 §2.2.1): case-insensitive " +
      "product token, matching groups COMBINE and override *, absent " +
      "agent falls back to *, an empty named group means allow-all") {
    val body = "User-agent: graftbot\nDisallow: /g/1\nAllow: /g/12\n\n" +
      "User-agent: *\nDisallow: /all\n\n" +
      "User-Agent: GRAFTBOT\nDisallow: /g/3\n"
    // both graftbot groups combine (case-insensitively); * is OVERRIDDEN
    assert(agentRules(body, "GraftBot") ===
      Set("/g/1" -> false, "/g/12" -> true, "/g/3" -> false))
    // an unnamed bot gets exactly the * policy
    assert(agentRules(body, "strangerbot") === Set("/all" -> false))
    // a group naming BOTH the agent and * is the agent's group too
    assert(agentRules("User-agent: graftbot\nUser-agent: *\nDisallow: /x",
      "graftbot") === Set("/x" -> false))
    // a named group with zero rules = allow-all for that bot, NOT a
    // fallback to * (the group EXISTS; empty Disallow contributes
    // nothing but ends the stack)
    assert(agentRules(
      "User-agent: graftbot\nDisallow:\n\nUser-agent: *\nDisallow: /x",
      "graftbot") === Set.empty)
    // agent = None stays the * posture on the same body
    assert(rules(body) === Set("/all" -> false))
    // '*' is not a product token — that's what None means
    assert(intercept[IllegalArgumentException](
      agentRules(body, "*")).getMessage.contains("product token"))
  }

  private def delays(body: String, agent: Option[String] = None)
      : Map[String, Double] = {
    val df = Seq(("h.example", body)).toDF("host", "body")
    UrlOps.parseCrawlDelays(df, "host", "body", agent)
      .as[(String, Double)].collect().toMap
  }

  test("parseCrawlDelays: group-selected like parseRobots, max-merged, " +
      "group-wide attribution, unparseable/pre-group values drop") {
    val body = "User-agent: graftbot\nCrawl-delay: 2.5\nDisallow: /g\n\n" +
      "User-agent: *\nCrawl-delay: 10\nDisallow: /x\n\n" +
      "User-Agent: GRAFTBOT\nCrawl-delay: 7\n"
    // the * posture reads the * group's delay
    assert(delays(body) === Map("h.example" -> 10.0))
    // the named agent's groups combine; max(2.5, 7); * never leaks
    assert(delays(body, Some("GraftBot")) === Map("h.example" -> 7.0))
    // an unnamed bot falls back to *
    assert(delays(body, Some("zbot")) === Map("h.example" -> 10.0))
    // group-wide attribution: a delay BETWEEN stacked User-agent lines
    // belongs to the whole group (crawl-delay doesn't end the stack —
    // the shared parseRobots group model)
    assert(delays("User-agent: a\nCrawl-delay: 3\nUser-agent: *\n" +
      "Disallow: /x") === Map("h.example" -> 3.0))
    // ...including for the agent path when its UA line comes AFTER
    assert(delays("User-agent: a\nCrawl-delay: 3\nUser-agent: b\n" +
      "Disallow: /x", Some("b")) === Map("h.example" -> 3.0))
    // the trailing group commits at finish; delays amid rules count
    assert(delays("User-agent: *\nDisallow: /x\nCrawl-delay: 4\n" +
      "Disallow: /y\nCrawl-delay: 9") === Map("h.example" -> 9.0))
    // a named group with no delay: absent, NOT a * fallback value
    assert(delays("User-agent: graftbot\nDisallow: /g\n\n" +
      "User-agent: *\nCrawl-delay: 10\nDisallow: /x",
      Some("graftbot")) === Map.empty[String, Double])
    // pre-group and unparseable values drop; no-delay hosts are absent
    assert(delays("Crawl-delay: 9\nUser-agent: *\nCrawl-delay: soon\n" +
      "Disallow: /x") === Map.empty[String, Double])
    assert(delays("User-agent: *\nDisallow: /x") === Map.empty[String, Double])
    // '*' is not a product token here either
    assert(intercept[IllegalArgumentException](
      delays("User-agent: *\n", Some("*"))).getMessage
      .contains("product token"))
  }

  test("parseSitemaps: host-wide extraction, any group position, " +
      "case-insensitive directive, host canonicalization, distinct") {
    val body = "# top comment\nSitemap: https://h/s1.xml\n" +
      "User-agent: *\nDisallow: /x\n" +
      "  sitemap: https://h/s2.xml\n" + // indented, lowercase, mid-group
      "User-agent: b\nSITEMAP: https://h/s1.xml\n" // dup collapses
    val df = Seq(("WWW.H.example:8080", body), ("other.example", "User-agent: *\n"))
      .toDF("host", "body")
    val got = UrlOps.parseSitemaps(df, "host", "body")
      .as[(String, String)].collect().toSet
    assert(got === Set(("h.example", "https://h/s1.xml"),
      ("h.example", "https://h/s2.xml")))
  }

  test("scheduleFetches: k-th URL of a host fetches at (k-1)*delay, " +
      "per-host lexicographic order, default for delay-less hosts, " +
      "rerun-deterministic, fail-fast matrix") {
    val frontier = Seq(
      (1L, "https://slow.example/b"),
      (2L, "https://slow.example/a"),
      (3L, "https://slow.example/c"),
      (4L, "https://fast.example/x"),
      (5L, "https://fast.example/y"),
      (6L, "https://unknown.example/z")
    ).toDF("doc_id", "url")
    val delays = Seq(("slow.example", 10.0), ("fast.example", 0.5))
      .toDF("host", "crawl_delay")
    val got = UrlOps.scheduleFetches(frontier, "url", delays,
      defaultDelay = 1.0)
    val at = got.select($"doc_id", $"fetch_at").as[(Long, Double)]
      .collect().toMap
    // slow.example in url order: /a -> 0, /b -> 10, /c -> 20
    assert(at(2L) === 0.0 && at(1L) === 10.0 && at(3L) === 20.0)
    assert(at(4L) === 0.0 && at(5L) === 0.5)
    // no stated delay: first fetch still at 0 under the default
    assert(at(6L) === 0.0)
    val second = Seq((7L, "https://unknown.example/z2"))
      .toDF("doc_id", "url").unionByName(frontier)
    assert(UrlOps.scheduleFetches(second, "url", delays, 1.0)
      .filter($"doc_id" === 7L).select($"fetch_at").as[Double]
      .head() === 1.0, "second unknown-host URL waits the default delay")
    // rerun-deterministic
    val again = UrlOps.scheduleFetches(frontier, "url", delays, 1.0)
    assert(got.exceptAll(again).isEmpty && again.exceptAll(got).isEmpty)
    // fail fast: bad default, delays frame missing contract columns
    assert(intercept[IllegalArgumentException](
      UrlOps.scheduleFetches(frontier, "url", delays, -1.0))
      .getMessage.contains(">= 0"))
    assert(intercept[IllegalArgumentException](
      UrlOps.scheduleFetches(frontier, "url",
        delays.withColumnRenamed("crawl_delay", "d"), 1.0))
      .getMessage.contains("crawl_delay"))
  }

  test("applyRobots: longest-match precedence per host; Allow wins " +
      "ties; unparseable URLs pass; queries count, fragments don't") {
    val rules = Seq(
      ("h.example", "/private", false),
      ("h.example", "/private/ok", true), // longer Allow carves a hole
      ("h.example", "/p/1", false),
      ("h.example", "/p", true) // SHORTER than /p/1: loses to it
    ).toDF("host", "prefix", "allow")
    val docs = Seq(
      (1L, "https://h.example/private/doc"), // blocked: /private
      (2L, "https://h.example/public/doc"), // no rule: survives
      (3L, "https://other.example/private/doc"), // other host: survives
      (4L, "https://h.example/p/10"), // /p/1 (len 4, dis) beats /p (allow)
      (5L, "https://h.example/p/2?x=/p/1"), // /p allow wins; query ≠ match
      (6L, "https://h.example/p/2#/p/1"), // fragment never matches
      (7L, "not a url"), // unparseable: passes
      (8L, "https://h.example/private/ok/file") // longer Allow wins
    ).toDF("doc_id", "url")
    val got = UrlOps.applyRobots(docs, "url", "doc_id", rules)
      .select($"doc_id").as[Long].collect().toSet
    assert(got === Set(2L, 3L, 5L, 6L, 7L, 8L))
    // a query string still counts when the prefix reaches into it
    val blockedByQuery = Seq((9L, "https://h.example/p/1?even=with-query"))
      .toDF("doc_id", "url")
    assert(UrlOps.applyRobots(blockedByQuery, "url", "doc_id", rules)
      .isEmpty)
    // an exact length tie goes to Allow
    val tie = Seq(("h.example", "/t", false), ("h.example", "/t", true))
      .toDF("host", "prefix", "allow")
    assert(UrlOps.applyRobots(
      Seq((10L, "https://h.example/t/x")).toDF("doc_id", "url"),
      "url", "doc_id", tie).count() === 1)
    // fail fast on a rules frame without the contract columns
    assert(intercept[IllegalArgumentException](
      UrlOps.applyRobots(docs, "url", "doc_id",
        rules.withColumnRenamed("allow", "a")))
      .getMessage.contains("lacks 'allow'"))
  }

  test("applyRobots wildcards: '*' spans octets, trailing '$' anchors, " +
      "regex metachars in patterns are literals, mid-'$' is a literal") {
    def survivors(rules: Seq[(String, Boolean)],
                  urls: Seq[(Long, String)]): Set[Long] = {
      val r = rules.map { case (p, a) => ("h.example", p, a) }
        .toDF("host", "prefix", "allow")
      UrlOps.applyRobots(urls.toDF("doc_id", "url"), "url", "doc_id", r)
        .select($"doc_id").as[Long].collect().toSet
    }
    // * spans any octets, including none
    assert(survivors(Seq(("/a*z", false)), Seq(
      (1L, "https://h.example/az"), // zero octets between
      (2L, "https://h.example/a-middle-z"),
      (3L, "https://h.example/a-middle-zAndMore"), // prefix semantics
      (4L, "https://h.example/b-z"))) === Set(4L))
    // trailing $ anchors: only exact ends block
    assert(survivors(Seq(("/doc.pdf$", false)), Seq(
      (1L, "https://h.example/doc.pdf"),
      (2L, "https://h.example/doc.pdf.html"), // $ means NOT this
      (3L, "https://h.example/docXpdf"))) === Set(2L, 3L),
      "the '.' must be a literal dot AND the '$' a real anchor")
    // combined: *.pdf$ — the classic 'no PDFs' rule
    assert(survivors(Seq(("/*.pdf$", false)), Seq(
      (1L, "https://h.example/a/b/c.pdf"),
      (2L, "https://h.example/a/b/c.pdfx"))) === Set(2L))
    // a '$' mid-pattern is a literal octet, not an anchor
    assert(survivors(Seq(("/price$usd", false)), Seq(
      (1L, "https://h.example/price$usd/x"),
      (2L, "https://h.example/priceusd/x"))) === Set(2L))
    // longest-match still governs: a longer wildcard Allow wins
    assert(survivors(Seq(("/p", false), ("/p/*.html$", true)), Seq(
      (1L, "https://h.example/p/a.html"),
      (2L, "https://h.example/p/a.txt"))) === Set(1L))
  }
}
