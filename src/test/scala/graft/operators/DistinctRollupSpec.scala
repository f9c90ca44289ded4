package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** HLL sketches as storable rollup state: exact in sparse mode,
  * merge == direct on the raw rows, error-bounded at fixture scale,
  * deterministic reruns. */
class DistinctRollupSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf("sf0.01"), "documents")
    .select($"lang", $"source", md5($"text").as("fp"))

  test("small-cardinality sketches estimate exactly (sparse mode)") {
    val tiny = Seq(("a", "x"), ("a", "y"), ("a", "y"), ("b", "x"))
      .toDF("g", "v")
    val est = DistinctRollup.sketchBy(tiny, Seq("g"), "v")
      .select($"g", DistinctRollup.estimate($"hll").as("est"))
      .as[(String, Long)].collect().toMap
    assert(est == Map("a" -> 2L, "b" -> 1L))
  }

  test("every aggregation path lands inside the HLL error band — " +
    "measured: paths do NOT agree bit-for-bit, which is the reason " +
    "consumers gate within the band instead of pinning values") {
    val exact = docs.agg(countDistinct($"fp")).head().getLong(0)
    def ok(est: Long, label: String): Unit =
      assert(math.abs(est - exact) <= 0.05 * exact,
        s"$label: est $est vs exact $exact outside 5%")
    // path 1: union of two-level stored sketches
    val perLangSrc = DistinctRollup.sketchBy(docs, Seq("lang", "source"), "fp")
    ok(DistinctRollup.rollup(perLangSrc, Nil)
      .select(DistinctRollup.estimate($"hll")).head().getLong(0),
      "two-level rollup")
    // path 2: union of one-level sketches
    ok(DistinctRollup.rollup(
        DistinctRollup.sketchBy(docs, Seq("lang"), "fp"), Nil)
      .select(DistinctRollup.estimate($"hll")).head().getLong(0),
      "one-level rollup")
    // path 3: direct build, two different partition layouts
    def direct(df: org.apache.spark.sql.DataFrame): Long =
      DistinctRollup.sketchBy(df.withColumn("g", lit(1)), Seq("g"), "fp")
        .select(DistinctRollup.estimate($"hll")).head().getLong(0)
    ok(direct(docs), "direct")
    ok(direct(docs.repartition(7)), "direct, relaid out")
    // per-group rollup from finer storage: same band per group
    val mergedLang = DistinctRollup.rollup(perLangSrc, Seq("lang"))
      .select($"lang", DistinctRollup.estimate($"hll").as("est"))
      .as[(String, Long)].collect().toMap
    val exactLang = docs.groupBy($"lang").agg(countDistinct($"fp").as("n"))
      .as[(String, Long)].collect().toMap
    exactLang.foreach { case (lang, n) =>
      assert(math.abs(mergedLang(lang) - n) <= math.max(1.0, 0.05 * n),
        s"lang $lang: ${mergedLang(lang)} vs $n")
    }
    // rerunning the SAME plan is stable (no RNG)
    val a = DistinctRollup.rollup(perLangSrc, Nil)
      .select(DistinctRollup.estimate($"hll")).head().getLong(0)
    val b = DistinctRollup.rollup(perLangSrc, Nil)
      .select(DistinctRollup.estimate($"hll")).head().getLong(0)
    assert(a == b)
  }

  test("lgK validated") {
    assert(intercept[IllegalArgumentException](
      DistinctRollup.sketchBy(docs, Seq("lang"), "fp", lgK = 2))
      .getMessage.contains("lgK"))
  }
}
