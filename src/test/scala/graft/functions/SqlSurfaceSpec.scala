package graft.functions

import graft.{SparkSpec, Tables}

/** The SQL surface the SURVEY §7.0 stance promises: every native
  * kernel is reachable from `spark.sql` over a registered view — the
  * layer a spark-sql/JDBC user composes today — while the operator
  * library stays Scala-API (multi-relation transformations with
  * driver-side control flow have no SQL registration path in OSS
  * Spark). This spec is the stance's executable witness. */
class SqlSurfaceSpec extends SparkSpec {

  test("every registered graft_* kernel resolves from SQL") {
    GraftFunctions.ensureRegistered(spark)
    val names = GraftFunctions.all.map(_._1.funcName)
    assert(names.nonEmpty && names.forall(_.startsWith("graft_")))
    names.foreach { fn =>
      assert(spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(fn)),
        s"$fn must be registered")
      // DESCRIBE proves SQL-layer resolution, not just registry presence
      assert(spark.sql(s"DESCRIBE FUNCTION $fn").count() > 0)
    }
  }

  test("a pure-SQL pipeline drives the kernels over a view") {
    GraftFunctions.ensureRegistered(spark)
    Tables.load(spark, sf(), "documents").createOrReplaceTempView("sql_docs")
    // shingle -> minhash bands -> bucket count: the LSH front half in SQL
    val buckets = spark.sql(
      """SELECT band, count(*) AS n FROM (
        |  SELECT posexplode(graft_minhash_bands(
        |    filter(split(text, '\\s+'), t -> length(t) > 0), 5, 4)) AS (band, sig)
        |  FROM sql_docs) WHERE sig IS NOT NULL GROUP BY band""".stripMargin)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(buckets.keySet == Set(0, 1, 2, 3), buckets.toString)
    assert(buckets.values.toSet.size == 1, "every band has one sig per doc")
    // per-doc repetition + char stats compose in one SQL projection
    val stats = spark.sql(
      """SELECT doc_id,
        |  graft_rep_stats(filter(split(text, '\\s+'), t -> length(t) > 0), 3) AS rep,
        |  graft_char_stats(text).total_chars AS n_chars
        |FROM sql_docs WHERE doc_id < 5""".stripMargin)
      .selectExpr("doc_id",
        "CAST(rep.distinct_grams AS DOUBLE) / greatest(rep.total_grams, 1) AS uniq",
        "n_chars").collect()
    assert(stats.length == 5)
    assert(stats.forall(r => r.getLong(2) > 0))
    assert(stats.forall { r => val d = r.getDouble(1); d >= 0.0 && d <= 1.0 })
  }
}
