package graft

/** End-to-end smoke of the driver contract: entry() must run the real
  * dump pipeline and return rows (the driver's t1 check). */
class EntrySpec extends SparkSpec {

  test("SparkEntry.entry returns rows from the dumped output") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    // flatten=true output of lineitem must keep the 11 flat columns
    assert(df.columns.length == 11)
  }

  test("every query has an oracle unless explicitly rows-only") {
    // sketches have no cross-engine oracle; their accuracy is pinned by
    // SketchSpec against exact answers instead
    val rowsOnly = Set("q37_approx_sketches")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
    assert(rowsOnly.subsetOf(SparkEntry.queries.keySet))
  }

  test("all queries run green on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf()).count()
      withClue(name)(assert(n >= 0))
    }
  }
}
