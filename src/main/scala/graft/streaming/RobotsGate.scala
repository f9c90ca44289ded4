package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.UrlOps

/** Streaming twin of [[UrlOps.applyRobots]] — crawl-policy compliance
  * as an ingest gate (the readWarc-tail story: enforce robots on
  * records AS THEY LAND, not in a later batch pass). The batch gate's
  * join → per-id max-aggregate → anti-join needs aggregation state a
  * stateless Append-mode gate can't run, so the streaming form follows
  * the [[BlocklistGate]]/[[DecontamGate]] discipline: the rule table
  * rides the plan as a LITERAL host → rules map, and the RFC 9309
  * §2.2.2 longest-match precedence becomes a per-row FOLD over the
  * row's own host's rules — O(rules-per-host) per row, no state store,
  * no shuffle, no watermark; batch == stream by construction
  * (UrlStreamSpec pins the differential, wildcards and Allow-ties
  * included). The match test itself is [[UrlOps.ruleMatches]] — the
  * ONE translation the batch gate uses, so the two gates cannot drift.
  *
  * Same verdict semantics: longest matching pattern decides, exact
  * length ties go to Allow, no match = allowed, unparseable URLs PASS.
  * Rules refreshed mid-stream need the foreachBatch pattern (the
  * [[graft.operators.Takedown]] freshness note): this gate binds its
  * rules at plan time.
  *
  * The literal budget is REQUIRED: real robots tables for a curated
  * host set are thousands of rules; a web-scale rule table (10^8
  * hosts) belongs to the batch join. */
object RobotsGate {

  /** Literal-map budget: 2^16 rules ≈ a few MB of plan — the curated
    * regime; bigger tables belong to batch `UrlOps.applyRobots`. */
  val LiteralRuleLimit: Int = 1 << 16

  def admitted(stream: DataFrame, urlCol: String, rules: DataFrame,
               maxRules: Int = LiteralRuleLimit): DataFrame = {
    Seq("host", "prefix", "allow").foreach(c =>
      require(rules.columns.contains(c),
        s"RobotsGate: rules frame lacks '$c' (parseRobots emits all)"))
    val distinctRules = rules
      .select(col("host").cast("string"), col("prefix").cast("string"),
        col("allow").cast("boolean"))
      .na.drop().distinct()
    // budget-check BEFORE collecting (the BlocklistGate order): a
    // web-scale rule table must fail fast, not OOM the driver first
    val n = distinctRules.count()
    if (n > maxRules) throw new IllegalArgumentException(
      s"RobotsGate: rule table carries $n rules, over " +
        s"the $maxRules literal budget the stateless streaming gate " +
        "requires. Gate a curated host set, or run batch " +
        "UrlOps.applyRobots over the landed corpus, whose host-keyed " +
        "join handles web-scale rule tables")
    val collected = distinctRules.collect()
    val byHost: Map[String, Seq[(String, Boolean)]] = collected
      .map(r => (r.getString(0), (r.getString(1), r.getBoolean(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    if (byHost.isEmpty) return stream // no rules: everything allowed
    val m = typedlit(byHost)
    val rs = element_at(m, UrlOps.domainOf(col(urlCol)))
    // RFC 9309 §2.2.2 as a fold: carry (best length, its allow kind);
    // a longer match replaces, an equal-length match ORs allow in
    // (ties go to Allow), no match leaves len = -1 (allowed).
    // The path expression (a regexp chain) is bound ONCE via a
    // single-element-array HOF: referenced directly from inside the
    // fold lambda it would be re-inlined per rule per row, and the
    // verdict struct read twice in the filter would double the whole
    // fold (codegen subexpression elimination does not cross lambda
    // boundaries) — the BlocklistGate device.
    val allowedPred = exists(
      transform(array(UrlOps.urlPath(col(urlCol))), path => {
        val best = aggregate(
          coalesce(rs, typedlit(Seq.empty[(String, Boolean)])),
          struct(lit(-1).as("len"), lit(true).as("allow")),
          (acc, r) => {
            val pre = r.getField("_1")
            val kind = r.getField("_2")
            val hit = UrlOps.ruleMatches(path, pre)
            val l = length(pre)
            when(hit && l > acc.getField("len"),
              struct(l.as("len"), kind.as("allow")))
              .when(hit && l === acc.getField("len"),
                struct(acc.getField("len").as("len"),
                  (acc.getField("allow") || kind).as("allow")))
              .otherwise(acc)
          })
        best.getField("len") < 0 || best.getField("allow")
      }),
      verdict => verdict)
    stream.filter(!UrlOps.urlParseable(col(urlCol)) || allowedPred)
  }
}
