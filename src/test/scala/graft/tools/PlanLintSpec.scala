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
}
