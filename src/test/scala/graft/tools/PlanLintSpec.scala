package graft.tools

import graft.SparkSpec

/** CI enforcement of the bounded-plan allowlist (VERDICT r11 item 2):
  * every registered query's physical plan is audited for cartesian
  * products, broadcast nested-loop joins, and unpartitioned windows; a
  * (query, flag) pair outside [[PlanLint.Allowed]] fails `sbt test` —
  * an unbounded plan can no longer merge silently behind a forgotten
  * `runMain graft.tools.PlanLint`. Runs at sf0.001 (some query builders
  * execute store writes/collects while constructing). */
class PlanLintSpec extends SparkSpec {

  test("no registered query plans an undocumented cartesian / BNLJ / " +
      "global window (the PlanLint allowlist, CI-enforced)") {
    val bad = PlanLint.lint(spark, sf()).filterNot(_.allowed)
    assert(bad.isEmpty,
      "undocumented anti-pattern flags (add a named bound to " +
        s"PlanLint.Allowed only if genuinely bounded):\n  " +
        bad.map(f => s"${f.query}: ${f.flag}").mkString("\n  "))
  }

  test("once-stuck-filter fires on a scan-column predicate stuck above " +
      "a graft_once projection, and NOT on the intended gate-on-wrapped-" +
      "column use") {
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    def filters(df: org.apache.spark.sql.DataFrame): Seq[FilterExec] =
      df.queryExecution.executedPlan.collect { case f: FilterExec => f }
    val src = spark.range(10).select(col("id"),
      concat(lit("x"), col("id")).as("t"))
    val wrapped = src.select(col("id"),
      graft.functions.Once.once(upper(col("t"))).as("u"))
    // predicate on the pass-through scan column: would have pushed to
    // the scan were the barrier absent -> the lint must fire
    val stuck = filters(wrapped.filter(col("id") > 5))
    assert(stuck.exists(PlanLint.stuckAboveOnce),
      "scan-column filter above a Once projection must flag")
    // predicate on the wrapped column itself: the documented intended
    // use (gate on the materialized expensive value) -> must NOT flag
    val intended = filters(wrapped.filter(col("u") =!= "X1"))
    assert(intended.nonEmpty && !intended.exists(PlanLint.stuckAboveOnce),
      "gating on the Once-wrapped column is the intended use; no flag")
    // no barrier at all: same stuck shape minus Once -> must NOT flag
    // (the filter is free to push; whatever FilterExec remains must
    // not be attributed to a barrier)
    val free = filters(src.select(col("id"), upper(col("t")).as("u"))
      .filter(col("id") > 5))
    assert(!free.exists(PlanLint.stuckAboveOnce),
      "without Once there is no barrier to blame")
  }
}
