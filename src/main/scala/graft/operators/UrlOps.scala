package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL canonicalization and domain-level curation for web corpora: the
  * same page arrives under `HTTP://WWW.Site.com/a/?utm_source=x#frag`
  * and `http://site.com/a`, and crawl dumps are dominated by a few hot
  * domains — so dedup needs a canonical URL key, and corpus balance
  * needs a per-domain document cap (the standard crawl-curation knobs).
  *
  * All of it is codegen'd built-ins (regexp within the RE2-compatible
  * subset, split/sort/join for query params) so the DuckDB oracle
  * reproduces the exact rewrite; the normalizer is stateless
  * row-at-a-time (zero shuffles, streaming-valid) and the cap is ONE
  * shuffle on the domain key.
  *
  * Scope: absolute http(s)-style URLs (`scheme://host[:port]/path?q`).
  * Canonical form: lowercase scheme and host, `www.` and default ports
  * (:80 http, :443 https) dropped, fragment dropped, tracking params
  * (`utm_*`, `fbclid`, `gclid`) dropped, remaining query params sorted,
  * trailing path slashes trimmed. Userinfo and percent-encoding are
  * passed through untouched (documented non-goals — a PSL-aware
  * registered-domain split would slot in at [[domainOf]]).
  */
object UrlOps {

  private val SchemePrefix = "^[A-Za-z][A-Za-z0-9+.-]*://"

  private def dropFragment(u: Column): Column =
    regexp_replace(trim(u), "#.*$", "")

  private def hostPortOf(noFrag: Column): Column =
    regexp_extract(noFrag, s"$SchemePrefix([^/?#]*)", 1)

  private def bareHost(hostPort: Column): Column =
    regexp_replace(lower(regexp_replace(hostPort, ":[0-9]+$", "")), "^www\\.", "")

  /** Canonical URL (see object doc for the exact form). Null -> null;
    * strings without a `scheme://` prefix degrade to best-effort (empty
    * scheme/host, input treated as path). */
  def normalizeUrl(url: Column): Column = {
    val u = dropFragment(url)
    val scheme = lower(regexp_extract(u, s"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = hostPortOf(u)
    val host = bareHost(hostPort)
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val rest = regexp_extract(u, s"$SchemePrefix[^/?#]*([^#]*)", 1)
    val path = regexp_replace(regexp_extract(rest, "^([^?]*)", 1), "/+$", "")
    // Prefix every param with '&' so trackers drop uniformly wherever
    // they sit, then strip the sentinel and sort what survives.
    val query = regexp_replace(
      regexp_replace(concat(lit("&"), regexp_extract(rest, "\\?(.*)$", 1)),
        "&(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&]*", ""),
      "^&", "")
    concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(query === "", lit(""))
        .otherwise(concat(lit("?"), array_join(array_sort(split(query, "&")), "&"))))
  }

  /** The URL's domain key: lowercased host, `www.` and port stripped. */
  def domainOf(url: Column): Column = bareHost(hostPortOf(dropFragment(url)))

  /** Keeps at most `n` rows per domain, chosen by `order` (pass a
    * deterministic column — content hash or id — for rerun-stable
    * curation). One shuffle on the domain key; the per-domain window
    * sort is exactly the boilerplate-hot-domain case the cap exists to
    * bound, and spills rather than OOMs when a domain is huge. */
  def capPerDomain(df: DataFrame, urlCol: String, n: Int,
                   order: Column): DataFrame = {
    val w = Window.partitionBy(col("__graft_domain")).orderBy(order)
    df.withColumn("__graft_domain", domainOf(col(urlCol)))
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") <= n)
      .drop("__graft_domain", "__graft_rn")
  }

  /** Domain-level quality gate — FineWeb-style curation at ORIGIN
    * granularity: a weak domain (link farm, boilerplate mill, thin
    * content) gets dropped wholesale rather than doc-by-doc. Keeps
    * rows whose domain has at least `minDocs` documents AND a mean
    * `valueCol` of at least `minMean`; every doc of a failing domain
    * goes, including its above-average outliers — that is the point
    * (per-doc gates already exist; this one judges the origin).
    *
    * `valueCol` should be an exact integral per-doc stat (token count,
    * kept-line count): the mean is then ONE IEEE division of exact
    * sums — reproducible cross-engine. One shuffle on the domain key
    * for the stats + a broadcast-or-shuffle semi-join back; the stats
    * frame is domain-sized. */
  def keepDomainsByMean(df: DataFrame, urlCol: String, valueCol: String,
                        minMean: Double, minDocs: Long = 1L): DataFrame = {
    require(minDocs >= 1, s"keepDomainsByMean: minDocs must be >= 1: $minDocs")
    val dom = domainOf(col(urlCol))
    val healthy = df
      .select(dom.as("__graft_domain"), col(valueCol).as("__graft_v"))
      .groupBy(col("__graft_domain"))
      .agg(sum(col("__graft_v")).as("__graft_sum"),
        count(lit(1)).as("__graft_n"))
      .filter(col("__graft_n") >= minDocs &&
        col("__graft_sum").cast("double") / col("__graft_n").cast("double")
          >= minMean)
      .select(col("__graft_domain"))
    df.withColumn("__graft_domain", dom)
      .join(healthy, Seq("__graft_domain"), "left_semi")
      .drop("__graft_domain")
  }

  /** Domain blocklist gate — the UT1-style crawl filter: drop rows
    * whose URL host or ANY parent domain appears in `blocked`
    * (`ads.x.example.com` is blocked by `example.com`; the sibling
    * `example.org` is not). Blocklist entries are lowercased; hosts
    * come pre-lowercased from [[domainOf]]. Rows with no parseable
    * host PASS — a blocklist drops known-bad, it doesn't quarantine
    * unknown (compose with a scheme/host validity gate if you want
    * that).
    *
    * Scale shape: the host explodes into its dotted suffixes (bounded
    * by label count, a handful per row), suffixes LEFT SEMI join the
    * blocklist on the suffix key — a plain hash join that Spark
    * broadcasts when the list is small and shuffles when it is the
    * multi-million-entry UT1 shape — and the blocked ids anti-join
    * back. NOT a `LIKE`-per-entry scan: cost is rows×labels + the
    * join, independent of blocklist size per row. */
  def dropBlockedDomains(df: DataFrame, urlCol: String, idCol: String,
                         blocked: DataFrame,
                         domainCol: String = "domain"): DataFrame = {
    require(blocked.columns.contains(domainCol),
      s"dropBlockedDomains: blocklist frame lacks '$domainCol'")
    val host = domainOf(col(urlCol))
    val labels = split(host, "\\.")
    val sufs = transform(sequence(lit(1), size(labels)),
      i => array_join(slice(labels, i, size(labels)), "."))
    val hits = df.select(col(idCol), explode(sufs).as("__graft_suf"))
      .join(blocked.select(lower(col(domainCol)).as("__graft_suf")),
        Seq("__graft_suf"), "left_semi")
      .select(col(idCol))
    df.join(hits, Seq(idCol), "left_anti")
  }

  /** robots.txt → `User-agent: *` Allow/Disallow PREFIX rules — the
    * crawl-policy half of URL curation: a retroactive compliance pass
    * (the C4/CCNet practice: respect today's robots even for yesterday's
    * crawl) starts from the robots bodies the crawl itself captured and
    * needs them as a joinable (host, prefix, allow) rule table.
    *
    * Parsing is RFC 9309's group model: consecutive `User-agent` lines
    * STACK onto one group; only a RULE line ends the stack (the group
    * ABNF is `startgroupline *(startgroupline / emptyline) *(rule /
    * emptyline)` — blank lines between `User-agent` lines keep
    * stacking), so the next `User-agent` after a rule starts a new
    * group; a group applies when any of its agents is `*`. Comments
    * strip at `#`; `Sitemap:` and other non-group lines are ignored
    * without ending a stack; an empty `Disallow:`/`Allow:` contributes
    * nothing (allow-all, per spec) but DOES end the stack like any
    * rule; rules before any `User-agent` line belong to no group and
    * drop.
    *
    * Coverage: Allow/Disallow path patterns with full LONGEST-MATCH
    * precedence ([[applyRobots]]) including RFC 9309 §2.2.3's `*`
    * (any-sequence) and trailing `$` (end anchor) extensions, and
    * per-crawler AGENT MATCHING (§2.2.1): pass `agent = Some("mybot")`
    * and the effective group set is the groups whose `User-agent`
    * product token equals the agent CASE-INSENSITIVELY (the RFC's MUST;
    * all matching groups COMBINE, §2.2.1's merge rule), falling back to
    * the `*` groups only when NO group names the agent — a named group
    * with zero rules means allow-all for that bot, not a fallback. The
    * default `agent = None` keeps the retroactive-compliance posture:
    * `*` groups only, the policy every crawler is owed.
    *
    * One fold per body (the [[graft.operators.Chunk.bySentence]]
    * recurrence discipline: entirely per-row, nothing shuffles), then
    * one explode + distinct. Hosts normalize through the same
    * lowercase/`www.`/port canonicalization as [[domainOf]], so rules
    * join against document hosts on the same key. */
  def parseRobots(df: DataFrame, hostCol: String, bodyCol: String,
                  agent: Option[String] = None): DataFrame = {
    agent.foreach(a => require(a.trim.nonEmpty && a.trim != "*",
      "parseRobots: agent must be a concrete product token; " +
        "agent = None already selects the '*' groups"))
    val lines = split(
      regexp_replace(col(bodyCol), "#[^\n]*", ""), "\r?\n")
    val ruleType = "array<struct<prefix:string,allow:boolean>>"
    // the * tracking runs either way; with an agent, the fold ALSO
    // carries the agent-matching groups' rules plus a saw flag, and the
    // finish picks per §2.2.1 (matching groups if any exist, else *)
    val aLow = agent.map(a => lit(a.trim.toLowerCase))
    val st0Fields = Seq(lit(false).as("star"), lit(true).as("boundary"),
      array().cast(ruleType).as("rules")) ++ (if (aLow.isDefined)
      Seq(lit(false).as("agm"), lit(false).as("saw"),
        array().cast(ruleType).as("arules")) else Nil)
    val st0 = struct(st0Fields: _*)
    val folded = aggregate(lines, st0, (st, raw) => {
      val l = trim(raw)
      val low = lower(l)
      val isUa = low.startsWith("user-agent:")
      val isDis = low.startsWith("disallow:")
      val isAllow = low.startsWith("allow:")
      val value = trim(regexp_replace(l, "^[A-Za-z-]+\\s*:", ""))
      val star = st.getField("star")
      val boundary = st.getField("boundary")
      val rules = st.getField("rules")
      val rule = struct(value.as("prefix"), isAllow.as("allow"))
      val base = Seq(
        when(isUa && boundary, value === "*") // new group
          .when(isUa, star || (value === "*")) // stacked agent line
          .otherwise(star).as("star"),
        when(isUa, lit(false))
          // ONLY rule lines end a User-agent stack: RFC 9309's group
          // ABNF admits empty lines BETWEEN startgrouplines, so a blank
          // must keep stacking (the advisor's fail-open finding — the
          // old blank-line boundary dropped the rules of
          // `User-agent: * <blank> User-agent: x <rules>`)
          .when(isDis || isAllow, lit(true))
          .otherwise(boundary).as("boundary"),
        when((isDis || isAllow) && star && (value =!= ""),
          concat(rules, array(rule))).otherwise(rules).as("rules"))
      val extra = aLow.toSeq.flatMap { a =>
        val isA = lower(value) === a // case-insensitive product token
        val agm = st.getField("agm")
        val saw = st.getField("saw")
        val arules = st.getField("arules")
        Seq(
          when(isUa && boundary, isA)
            .when(isUa, agm || isA)
            .otherwise(agm).as("agm"),
          (saw || (isUa && isA)).as("saw"),
          when((isDis || isAllow) && agm && (value =!= ""),
            concat(arules, array(rule))).otherwise(arules).as("arules"))
      }
      struct(base ++ extra: _*)
    }, st => if (aLow.isDefined)
        when(st.getField("saw"), st.getField("arules"))
          .otherwise(st.getField("rules"))
      else st.getField("rules"))
    df.select(bareHost(col(hostCol)).as("host"), folded.as("__rules"))
      .select(col("host"), explode(col("__rules")).as("__r"))
      .select(col("host"), col("__r.prefix").as("prefix"),
        col("__r.allow").as("allow"))
      .distinct()
  }

  /** `Crawl-delay:` extraction — the politeness schedule a fetch
    * scheduler throttles by: one (host, crawl_delay seconds) row per
    * host that states one. Not in RFC 9309 but honored by major
    * crawlers; it lives INSIDE groups like a rule, so the effective
    * value follows the same group selection as [[parseRobots]] (same
    * `agent` semantics: matching groups, `*` fallback). Where the
    * effective group set states several delays, the MAXIMUM wins — the
    * conservative read of an ambiguous politeness request. Group-model
    * consistency: like `Sitemap:` (and like Google's reference parser,
    * which ignores the directive entirely), a `Crawl-delay` line does
    * NOT end a User-agent stack — [[parseRobots]] and this function
    * see identical group boundaries on any body. Unparseable values
    * are ignored; hosts stating none are absent (the caller owns the
    * default). */
  def parseCrawlDelays(df: DataFrame, hostCol: String, bodyCol: String,
                       agent: Option[String] = None): DataFrame = {
    agent.foreach(a => require(a.trim.nonEmpty && a.trim != "*",
      "parseCrawlDelays: agent must be a concrete product token; " +
        "agent = None already selects the '*' groups"))
    val lines = split(
      regexp_replace(col(bodyCol), "#[^\n]*", ""), "\r?\n")
    val aLow = agent.map(a => lit(a.trim.toLowerCase))
    // unlike rules, a Crawl-delay line may PRECEDE later stacked
    // User-agent lines of its own group (it doesn't end the stack), so
    // values accumulate in a per-group `pend` max and COMMIT against the
    // group's FINAL agent flags when the group ends (the next
    // boundary-starting User-agent line, or the fold's finish) — the
    // attribution is group-wide, exactly what the relational oracle
    // derives, never "agents seen so far"
    val st0Fields = Seq(lit(false).as("star"), lit(true).as("boundary"),
      lit(null).cast("double").as("pend"),
      lit(null).cast("double").as("d")) ++ (if (aLow.isDefined)
      Seq(lit(false).as("agm"), lit(false).as("saw"),
        lit(null).cast("double").as("ad")) else Nil)
    val st0 = struct(st0Fields: _*)
    def maxOf(acc: Column, v: Column): Column =
      when(acc.isNull, v).when(v.isNull, acc).otherwise(greatest(acc, v))
    val folded = aggregate(lines, st0, (st, raw) => {
      val l = trim(raw)
      val low = lower(l)
      val isUa = low.startsWith("user-agent:")
      val isDis = low.startsWith("disallow:")
      val isAllow = low.startsWith("allow:")
      val isCd = low.startsWith("crawl-delay:")
      val value = trim(regexp_replace(l, "^[A-Za-z-]+\\s*:", ""))
      val star = st.getField("star")
      val boundary = st.getField("boundary")
      val pend = st.getField("pend")
      val newGroup = isUa && boundary
      val base = Seq(
        when(newGroup, value === "*")
          .when(isUa, star || (value === "*"))
          .otherwise(star).as("star"),
        when(isUa, lit(false))
          .when(isDis || isAllow, lit(true)) // rules end stacks; cd does not
          .otherwise(boundary).as("boundary"),
        when(newGroup, lit(null).cast("double")) // fresh group, fresh pend
          .when(isCd, maxOf(pend, value.cast("double")))
          .otherwise(pend).as("pend"),
        // a new group COMMITS the previous group's pending delays
        // against its final * flag (pre-group delays never commit:
        // star is false until a User-agent line set it)
        when(newGroup && star, maxOf(st.getField("d"), pend))
          .otherwise(st.getField("d")).as("d"))
      val extra = aLow.toSeq.flatMap { a =>
        val isA = lower(value) === a
        val agm = st.getField("agm")
        Seq(
          when(newGroup, isA).when(isUa, agm || isA)
            .otherwise(agm).as("agm"),
          (st.getField("saw") || (isUa && isA)).as("saw"),
          when(newGroup && agm, maxOf(st.getField("ad"), pend))
            .otherwise(st.getField("ad")).as("ad"))
      }
      struct(base ++ extra: _*)
    }, st => {
      // finish = the last group's end: commit its pend, then select
      val d = when(st.getField("star"),
        maxOf(st.getField("d"), st.getField("pend")))
        .otherwise(st.getField("d"))
      if (aLow.isDefined) {
        val ad = when(st.getField("agm"),
          maxOf(st.getField("ad"), st.getField("pend")))
          .otherwise(st.getField("ad"))
        when(st.getField("saw"), ad).otherwise(d)
      } else d
    })
    df.select(bareHost(col(hostCol)).as("host"),
        folded.as("crawl_delay"))
      .filter(col("crawl_delay").isNotNull)
      .distinct()
  }

  /** `Sitemap:` extraction from robots bodies — the crawl-frontier
    * seed: sitemap lines are HOST-WIDE per the sitemaps protocol
    * (outside any User-agent group, so [[parseRobots]] rightly ignores
    * them), and a crawler bootstraps its per-host URL frontier from
    * exactly this (host, sitemap_url) table. Case-insensitive
    * directive, comments stripped first, one row per DISTINCT (host,
    * url); hosts canonicalize like [[parseRobots]] so the two tables
    * join. Zero shuffles before the distinct: a per-row regex
    * extraction, RE2-compatible so an external engine reproduces it. */
  def parseSitemaps(df: DataFrame, hostCol: String,
                    bodyCol: String): DataFrame =
    df.select(bareHost(col(hostCol)).as("host"),
      explode(regexp_extract_all(
        regexp_replace(col(bodyCol), "#[^\n]*", ""),
        lit("(?im)^[ \\t]*sitemap[ \\t]*:[ \\t]*(\\S+)"), lit(1)))
        .as("sitemap"))
      .distinct()

  /** Politeness-aware fetch scheduling — the step that turns a crawl
    * FRONTIER plus [[parseCrawlDelays]] output into a dispatchable
    * plan: each URL gets `fetch_at`, the seconds-offset at which its
    * host's delay budget allows the fetch (k-th URL of a host fetches
    * at `(k-1) × delay`). Hosts absent from `delays` use
    * `defaultDelay`; per-host order is the URL's lexicographic order —
    * deterministic across engines and reruns (URLs within a host must
    * be distinct for a total order; dedupe the frontier first, which a
    * frontier build does anyway).
    *
    * Scale shape: one host-keyed LEFT join (the delays table is
    * domain-cardinality — broadcasts when small) and one window
    * PARTITIONED BY HOST — partitions = hosts, millions of them, so no
    * task ever sees more than one host's frontier slice; never a
    * global sort. Output: input columns + `host` + `fetch_at`
    * (double seconds). */
  def scheduleFetches(df: DataFrame, urlCol: String, delays: DataFrame,
                      defaultDelay: Double): DataFrame = {
    require(defaultDelay >= 0, s"defaultDelay must be >= 0: $defaultDelay")
    Seq("host", "crawl_delay").foreach(c => require(
      delays.columns.contains(c),
      s"scheduleFetches: delays frame lacks '$c' (parseCrawlDelays " +
        "emits both)"))
    val host = domainOf(col(urlCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host")).orderBy(col(urlCol))
    df.withColumn("host", host)
      // no broadcast HINT: a curated delays table broadcasts on its own
      // statistics; a web-scale one (10^8 hosts) must be free to shuffle
      .join(delays.select(col("host"),
        col("crawl_delay").cast("double").as("__graft_delay")),
        Seq("host"), "left")
      .withColumn("fetch_at",
        (row_number().over(w).cast("double") - 1.0) *
          coalesce(col("__graft_delay"), lit(defaultDelay)))
      .drop("__graft_delay")
  }

  /** Crawl-policy gate over [[parseRobots]] rules with RFC 9309 §2.2.2
    * LONGEST-MATCH precedence: among the host's rules whose pattern
    * matches the URL path (query included, fragment not), the longest
    * pattern decides; an exact length tie goes to `Allow`; no matching
    * rule means allowed. Patterns support the §2.2.3 extensions — `*`
    * matches any octet sequence, a trailing `$` anchors the end —
    * translated per rule into the RE2-compatible subset both engines
    * share; plain prefixes (the overwhelming majority in real robots
    * files) stay on the codegen'd `startsWith` fast path and never pay
    * the regex. Rows with no parseable `scheme://host` PASS (the
    * [[dropBlockedDomains]] convention: a policy gate drops
    * known-disallowed, it doesn't quarantine unknown). Scale shape: one
    * host-keyed join (rules broadcast when small, shuffled when
    * web-scale) fanning each row out to its own host's rules only, the
    * match test in the join condition, then an id-keyed max over the
    * matched rules (state = one struct per id) — never a rules×corpus
    * cross product, never a window. */
  /** Is the URL a parseable `scheme://host` form? (Gates let
    * unparseable rows PASS — the blocklist convention.) */
  private[graft] def urlParseable(u: Column): Column =
    dropFragment(u).rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://")

  /** The URL's robots match target: path + query, fragment stripped,
    * empty path normalized to `/`. */
  private[graft] def urlPath(u: Column): Column = {
    val noFrag = dropFragment(u)
    val path0 = regexp_replace(noFrag,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*", "")
    when(path0 === "", "/").otherwise(path0)
  }

  /** Does the RFC 9309 pattern `pre` (literal prefix; `*` spans any
    * octets; trailing `$` anchors the end) match `path`? ONE
    * translation shared by the batch gate ([[applyRobots]]) and the
    * streaming gate ([[graft.streaming.RobotsGate]]) — the wildcard
    * semantics cannot drift between them. Strip a trailing '$' (the
    * anchor), escape every metachar (the '$' escape also covers
    * LITERAL mid-pattern dollars), then turn the surviving '*'s into
    * '.*'; plain prefixes (the real-world majority) never build the
    * regex and stay on the codegen'd startsWith fast path. */
  private[graft] def ruleMatches(path: Column, pre: Column): Column = {
    val hasWild = pre.contains("*") || pre.endsWith("$")
    val anchored = pre.endsWith("$")
    val body = when(anchored, substring(pre, lit(1), length(pre) - 1))
      .otherwise(pre)
    val escaped = regexp_replace(body,
      "([.\\\\+?(){}\\[\\]|^$])", "\\\\$1")
    val pattern = concat(lit("^"),
      regexp_replace(escaped, "\\*", ".*"),
      when(anchored, lit("$")).otherwise(lit("")))
    when(hasWild, regexp_like(path, pattern))
      .otherwise(path.startsWith(pre))
  }

  def applyRobots(df: DataFrame, urlCol: String, idCol: String,
                  rules: DataFrame): DataFrame = {
    Seq("host", "prefix", "allow").foreach(c =>
      require(rules.columns.contains(c),
        s"applyRobots: rules frame lacks '$c' (parseRobots emits all)"))
    val parseable = urlParseable(col(urlCol))
    val path = urlPath(col(urlCol))
    val matches = ruleMatches(col("__graft_path"), col("__graft_pre"))
    val blocked = df
      .filter(parseable)
      .select(col(idCol), domainOf(col(urlCol)).as("__graft_host"),
        path.as("__graft_path"))
      .join(rules.select(col("host").as("__graft_host"),
        col("prefix").as("__graft_pre"), col("allow").as("__graft_allow")),
        Seq("__graft_host"))
      .filter(matches)
      // longest match wins; ties go to allow (allow sorts above
      // disallow at equal length inside the max struct)
      .groupBy(col(idCol))
      .agg(max(struct(length(col("__graft_pre")).as("len"),
        col("__graft_allow").as("allow"))).as("__w"))
      .filter(!col("__w.allow"))
      .select(col(idCol))
    df.join(blocked, Seq(idCol), "left_anti")
  }
}
