package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.SparkSession

/** Anti-pattern lint over EVERY registered query's physical plan — the
  * scale-audit (cartesian products, broadcast nested-loop joins,
  * windows with no partitioning) run mechanically instead of by
  * eyeball. CI-enforced: PlanLintSpec runs [[lint]] at sf0.001 inside
  * `sbt test`, so a NEW unbounded plan fails the build, not a code
  * review. Standalone: `runMain graft.tools.PlanLint [sfDir]` (default
  * sf0.001 — some query builders execute store writes/collects while
  * constructing, so the tool runs them at the smallest fixture).
  *
  * A flag is not automatically a defect — the library has DOCUMENTED
  * bounded uses (one-row stats frames cross-joined via broadcast, k-row
  * evaluation frames under a global window, a query-set side of a
  * bounded broadcast). The allowlist below names each accepted
  * (query, flag) pair with its bound; anything NEW fails the lint, so
  * an unbounded plan cannot slip in silently. */
object PlanLint {

  /** (query prefix, flag, why it is bounded) — exactly the pairs the
    * current registry fires (run the tool to regenerate; a stale entry
    * that stops firing is harmless, a NEW pair fails the lint). */
  val Allowed: Seq[(String, String, String)] = Seq(
    ("q84", "bnlj", "one-row sketch + one-row n broadcast to exact counts"),
    ("q96", "bnlj", "one-row CMS grid + one-row n broadcast to exact counts"),
    ("q193", "bnlj", "one-row quantile-sketch frame + 5-probe broadcast to exact ranks"),
    ("q27", "bnlj", "doc_id < 200 sample pair join — fixture-bounded demo of exact Jaccard"),
    ("q30", "bnlj", "bounded query set (vec_id < 10) broadcast — cosineTopK contract"),
    ("q33", "bnlj", "one-row centroid frame — IVF assignment fold"),
    ("q59", "bnlj", "bounded query set + one-row centroid frame — IVF probe"),
    ("q63", "bnlj", "bounded query set broadcast — cosineTopK contract"),
    ("q74", "bnlj", "bounded query set broadcast — ADC contract"),
    ("q93", "bnlj", "bounded query set broadcast — IVF-PQ contract"),
    ("q99", "bnlj", "bounded query set broadcast — projected re-rank contract"),
    ("q126", "bnlj", "bounded query set broadcast — SQ8 ADC contract"),
    ("q134", "bnlj", "two k-bounded top-k frames — recall evaluation"),
    ("q140", "bnlj", "bounded query set broadcast — IVF-SQ8 contract"),
    ("q182", "bnlj", "bounded b side broadcast — marginMine contract"),
    ("q87", "bnlj", "one-row vocabulary-size frame — bigram LM smoothing"),
    ("q135", "bnlj", "one-row quantile-threshold frame"),
    ("q148", "bnlj", "language-frame-bounded unimax plan"),
    ("q153", "bnlj", "language-frame-bounded unimax plan"),
    ("q156", "bnlj", "one-row token-total frame — interpolated LM"),
    ("q90", "bnlj", "one-row source-count frames — sqrt-rule balancing"),
    ("q119", "bnlj", "one-row (N, avgdl) stats frame — BM25"),
    ("q122", "bnlj", "one-row stats + per-token ceiling frames — max-score"),
    ("q133", "bnlj", "k-bounded ranking frames — RRF fusion"),
    ("q181", "bnlj", "bounded benchmark frames — contamination report"),
    ("q186", "bnlj", "one-row BM25 stats frame — rank evaluation"),
    ("q190", "bnlj", "one-row BM25 stats frame — graded rank evaluation"),
    ("q187", "bnlj", "bounded query set (doc_id < 10) broadcast — cosineTopK contract"),
    ("q82", "bnlj", "one-row (N, avgdl) stats frame — BM25"),
    ("q194", "bnlj", "one-row corpus-total frame — histogram-quantile rank arithmetic"),
    ("q195", "bnlj", "one-row corpus-total frames — two cards' histogram-quantile rank arithmetic"),
    ("q209", "bnlj", "one-row corpus-total frames — the q195 card pair under the drift gate; the tolerance side is a 6-row literal list"),
    ("q214", "bnlj", "one-row corpus-total frame (q194 shape) + the domain section's two one-row summary frames crossed"),
    ("q199", "bnlj", "one-row overlap-count frames — near-overlap report assembly"),
    ("q200", "bnlj", "one-row corpus-total frame — scan-quantile rank arithmetic"),
    ("q198", "bnlj", "language-frame-bounded unimax plan (the q148/q153 shape)"))
  // NOTE r19: no "global-window" entry is allowed any more — every
  // unpartitioned window (histogram quantiles, prefix-scan subtotals,
  // unimax water-filling, k-bounded rank frames) was rewritten to a
  // window-free form, and the lint now fails on any reintroduction.

  /** One lint finding: `allowed` iff the (query, flag) pair is named in
    * [[Allowed]] with its bound, or the query failed to build (ERROR
    * flags are surfaced as not-allowed so CI reports them). */
  case class Finding(query: String, flag: String, allowed: Boolean)

  /** The `graft_once` barrier's documented cost turned into a lint:
    * a filter stuck directly above a Once-wrapped projection whose
    * predicate references ONLY pass-through columns — i.e. a predicate
    * that WOULD have pushed toward the scan (pruning file reads) were
    * the barrier absent. Filters on the wrapped (rewritten) column are
    * the intended use and never flag; a mixed predicate could not push
    * whole either way. Public so PlanLintSpec can pin both polarities
    * on synthetic plans. */
  private[tools] def stuckAboveOnce(
      f: org.apache.spark.sql.execution.FilterExec): Boolean =
    f.child match {
      case pr: org.apache.spark.sql.execution.ProjectExec
          if pr.projectList.exists(_.exists(
            _.isInstanceOf[graft.functions.Once])) =>
        val passThrough = pr.projectList.collect {
          case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
            a.exprId
        }.toSet
        val refs = f.condition.references.toSeq
        refs.nonEmpty && refs.forall(r => passThrough.contains(r.exprId))
      case _ => false
    }

  /** Builds every registered query against `dir` and collects
    * cartesian/BNLJ/global-window nodes from the executed plan (walking
    * through AQE wrappers — the SparkSpec.collectPlan device:
    * AdaptiveSparkPlanExec has no children, so a bare collect sees
    * nothing past the root). Pure function of the registry — the CI
    * gate (PlanLintSpec) and the CLI both call it. */
  def lint(spark: SparkSession, dir: String): Seq[Finding] = {
    def expand(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val inner = p.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q.plan
      }
      p +: inner.flatMap(expand)
    }
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val flags =
        try {
          val plan = fn(spark, dir).queryExecution.executedPlan
          expand(plan).flatMap(_.collect {
            case _: org.apache.spark.sql.execution.joins.CartesianProductExec =>
              "cartesian"
            case _: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
              "bnlj"
            case w: org.apache.spark.sql.execution.window.WindowExec
                if w.partitionSpec.isEmpty => "global-window"
            case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
                if w.partitionSpec.isEmpty => "global-window"
            case f: org.apache.spark.sql.execution.FilterExec
                if stuckAboveOnce(f) => "once-stuck-filter"
          }).distinct
        } catch {
          case e: Throwable => Seq(s"ERROR: ${String.valueOf(e.getMessage).take(80)}")
        }
      flags.map { f =>
        Finding(name, f, Allowed.exists { case (p, fl, _) =>
          name.startsWith(p + "_") && fl == f })
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val findings = lint(spark, dir)
    findings.foreach { f =>
      if (f.allowed) println(s"ok   ${f.query}: ${f.flag} (documented bound)")
      else println(s"NEW  ${f.query}: ${f.flag}")
    }
    val newFlags = findings.count(!_.allowed)
    println(s"== plan lint: ${SparkEntry.queries.size} queries, " +
      s"$newFlags undocumented flags")
    spark.stop()
    if (newFlags > 0) sys.exit(1)
  }
}
