package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Checks: hand-computed observations per constraint type, the anchored
  * regex, the empty-corpus / all-null FAIL rule, the numeric-column
  * fail-fast, assertAll's gate behavior, and the card-drift gate
  * (relative tolerance, zero-before rule, vanished/ghost cells). */
class ChecksSpec extends SparkSpec {
  import Checks._

  private lazy val df = {
    import spark.implicits._
    Seq(
      (1L, Option("alpha"), Option(10.0)),
      (2L, Option("beta"), Option(20.0)),
      (3L, Option.empty[String], Option(30.0)),
      (4L, Option("beta"), Option.empty[Double])
    ).toDF("id", "name", "score")
  }

  /** run() keyed by (check, column, observed) — two checks of the same
    * type on the same column stay distinguishable. */
  private def report(checks: Seq[Check]): Seq[Row] =
    Checks.run(df, checks).collect().toSeq

  test("hand-computed observations and verdicts, one row per check") {
    val rows = report(Seq(
      Complete("id", 1.0), // 4/4 = 1.0 pass
      Complete("name", 0.9), // 3/4 = 0.75 fail
      Unique("id", 1.0), // 4/4 distinct pass
      Unique("name", 0.9), // 2 distinct / 3 non-null = 0.666 fail
      ValuesBetween("score", 0, 25), // 30.0 violates: observed 1, fail
      ValuesBetween("score", 0, 100), // 0 violations, pass
      MeanBetween("score", 15, 25), // (10+20+30)/3 = 20 pass
      MatchesRegex("name", "[a-z]+", 1.0) // 3/3 full matches, pass
    ))
    assert(rows.length === 8)
    val byKey = rows.map(r => (r.getString(0), r.getString(1),
      Option(r.get(2)).map(_ => r.getDouble(2)), r.getBoolean(3)))
    assert(byKey.contains(("complete", "id", Some(1.0), true)))
    assert(byKey.contains(("complete", "name", Some(0.75), false)))
    assert(byKey.contains(("unique", "id", Some(1.0), true)))
    assert(byKey.contains(("unique", "name", Some(2.0 / 3.0), false)))
    assert(byKey.contains(("between", "score", Some(1.0), false)))
    assert(byKey.contains(("between", "score", Some(0.0), true)))
    assert(byKey.contains(("mean", "score", Some(20.0), true)))
    assert(byKey.contains(("regex", "name", Some(1.0), true)))
  }

  test("between compares integral columns in LONG space — a bigint " +
      "beyond 2^53 can't round onto the boundary and fail open") {
    import spark.implicits._
    // 2^53 + 1 casts to double as exactly 2^53: the double-space test
    // would see it AS the boundary and hide the violation
    val big = Seq(1L << 53, (1L << 53) + 1).toDF("v")
    val Seq(r) = Checks.run(big,
      Seq(ValuesBetween("v", 0, (1L << 53).toDouble))).collect().toSeq
    assert(r.getDouble(2) === 1.0 && !r.getBoolean(3),
      "the 2^53+1 violation must be counted, not rounded away")
    // fractional bounds stay strict on integers: v=3 in [2.5, 3.5] ok,
    // v=2 violates low, v=4 violates high
    val f = Seq(2L, 3L, 4L).toDF("v")
    val Seq(r2) = Checks.run(f,
      Seq(ValuesBetween("v", 2.5, 3.5))).collect().toSeq
    assert(r2.getDouble(2) === 2.0 && !r2.getBoolean(3))
    // floating columns keep their native double comparison
    val d = Seq(2.4, 2.5, 3.5, 3.6).toDF("v")
    val Seq(r3) = Checks.run(d,
      Seq(ValuesBetween("v", 2.5, 3.5))).collect().toSeq
    assert(r3.getDouble(2) === 2.0 && !r3.getBoolean(3))
  }

  test("regex is ANCHORED — a substring hit is not a well-formed value") {
    // unanchored 'a' would hit 'alpha' and 'beta' (2/3); anchored hits 0
    val Seq(r) = report(Seq(MatchesRegex("name", "a", 0.1)))
    assert(r.getDouble(2) === 0.0 && !r.getBoolean(3))
  }

  test("empty corpus FAILS every check — a vacuous pass is how empty " +
      "shards ship") {
    val rows = Checks.run(df.limit(0), Seq(
      Complete("id", 0.0), Unique("id", 0.0),
      ValuesBetween("score", 0, 1), MeanBetween("score", 0, 1),
      MatchesRegex("name", ".*", 0.0))).collect()
    assert(rows.length === 5)
    assert(rows.forall(r => !r.getBoolean(3)),
      s"expected all failed on empty input: ${rows.mkString(", ")}")
  }

  test("an all-null column fails ratio checks even at minFraction 0") {
    import spark.implicits._
    val nulls = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "name")
    val rows = Checks.run(nulls, Seq(
      Unique("name", 0.0), MatchesRegex("name", ".*", 0.0),
      Complete("name", 0.0))).collect()
    val m = rows.map(r => (r.getString(0), r.getBoolean(3))).toMap
    assert(!m("unique") && !m("regex")) // 0/0 observed -> fail
    assert(m("complete")) // observed 0.0 >= 0.0: a real ratio, passes
  }

  test("fail-fast matrix: unknown column (real columns named), " +
      "fractions outside [0,1], inverted range, empty checks, " +
      "non-numeric range/mean column") {
    val e1 = intercept[IllegalArgumentException](
      Checks.run(df, Seq(Complete("nope", 1.0))))
    assert(e1.getMessage.contains("nope") && e1.getMessage.contains("score"))
    intercept[IllegalArgumentException](Checks.run(df, Seq(Complete("id", 1.5))))
    intercept[IllegalArgumentException](Checks.run(df, Seq(Unique("id", -0.1))))
    intercept[IllegalArgumentException](
      Checks.run(df, Seq(MatchesRegex("name", ".*", 2.0))))
    intercept[IllegalArgumentException](
      Checks.run(df, Seq(ValuesBetween("score", 5, 1))))
    intercept[IllegalArgumentException](
      Checks.run(df, Seq(MeanBetween("score", 5, 1))))
    intercept[IllegalArgumentException](Checks.run(df, Seq.empty))
    val e2 = intercept[IllegalArgumentException](
      Checks.run(df, Seq(ValuesBetween("name", 0, 1))))
    assert(e2.getMessage.contains("numeric"))
    intercept[IllegalArgumentException](Checks.run(df, Seq(MeanBetween("name", 0, 1))))
  }

  test("assertAll: all-green returns the frame unchanged for chaining; " +
      "a failure dies naming each failed check with its observation") {
    assert(assertAll(df, Seq(Complete("id", 1.0))) eq df)
    val e = intercept[IllegalStateException](assertAll(df, Seq(
      Complete("id", 1.0), Complete("name", 0.9), Unique("name", 0.9))))
    assert(e.getMessage.contains("2/3"))
    assert(e.getMessage.contains("complete(name): observed = 0.75"))
    assert(e.getMessage.contains("unique(name)"))
  }

  test("drift: relative tolerance against |before|, zero-before admits " +
      "only zero delta, vanished and ghost cells fail") {
    import spark.implicits._
    val diff = Seq(
      ("corpus", "n_docs", Option(100.0), Option(80.0), Option(-20.0)),
      ("tokens", "total", Option(0.0), Option(0.0), Option(0.0)),
      ("tokens", "mean", Option(0.0), Option(5.0), Option(5.0)),
      ("lang", "gone", Option(10.0), Option.empty[Double],
        Option.empty[Double])
    ).toDF("section", "key", "before", "after", "delta")
    val out = drift(diff, Seq(
      ("corpus", "n_docs", 0.25), // |−20| <= 25: pass
      ("tokens", "total", 0.5), // 0 <= 0: the zero-before zero-delta pass
      ("tokens", "mean", 10.0), // 5 <= 10*0: zero before, nonzero delta
      ("lang", "gone", 1.0), // delta NULL: a vanished cell is drift
      ("lang", "ghost", 1.0) // tolerance on a cell nobody computes
    )).collect().map(r => (r.getString(0), r.getString(1)) ->
      (r.getBoolean(5), r.isNullAt(2))).toMap
    assert(out(("corpus", "n_docs")) === ((true, false)))
    assert(out(("tokens", "total")) === ((true, false)))
    assert(out(("tokens", "mean")) === ((false, false)))
    assert(out(("lang", "gone")) === ((false, false)))
    assert(out(("lang", "ghost")) === ((false, true))) // observed NULL row
    intercept[IllegalArgumentException](drift(diff, Seq.empty))
    intercept[IllegalArgumentException](
      drift(diff, Seq(("corpus", "n_docs", -0.1))))
  }

  test("one-pass plan pin: every non-unique check folds into a single " +
      "scan of the source (the object-doc claim, held by the plan)") {
    val docs = graft.Tables.load(spark, sf(), "documents")
    val rep = Checks.run(docs, Seq(
      Complete("text", 1.0), Complete("lang", 0.9),
      ValuesBetween("n_chars", 1, 100000), MeanBetween("n_chars", 1, 1000),
      MatchesRegex("lang", "[a-z]{2}", 0.9)))
    rep.collect()
    val scans = collectPlan(rep.queryExecution.executedPlan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.length === 1,
      s"five checks must share ONE scan, got ${scans.length}")
    // and the scan is pruned to the checked columns only
    val read = scans.head match {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.requiredSchema.fieldNames.toSet
      case other => other.schema.fieldNames.toSet
    }
    assert(read === Set("text", "lang", "n_chars"),
      s"scan must prune to checked columns, read $read")
  }

  test("schema contract: exact simpleString types, absent column fails " +
      "with a null observation, assertSchema names every mismatch") {
    val rep = Checks.schema(df, Seq(
      ("id", "bigint"), ("name", "string"), ("score", "double"),
      ("score", "float"), ("ghost", "string")))
      .map(r => (r.column, r.expected) -> (r.observed, r.passed)).toMap
    assert(rep(("id", "bigint")) === ((Some("bigint"), true)))
    assert(rep(("name", "string")) === ((Some("string"), true)))
    assert(rep(("score", "double")) === ((Some("double"), true)))
    assert(rep(("score", "float")) === ((Some("double"), false)))
    assert(rep(("ghost", "string")) === ((None, false)))
    assert(assertSchema(df, Seq(("id", "bigint"))) eq df)
    val e = intercept[IllegalStateException](assertSchema(df, Seq(
      ("id", "bigint"), ("score", "float"), ("ghost", "string"))))
    assert(e.getMessage.contains("2/3") &&
      e.getMessage.contains("score: expected float, got double") &&
      e.getMessage.contains("ghost: expected string, got <absent>"))
    intercept[IllegalArgumentException](Checks.schema(df, Seq.empty))
  }

  test("tight drift loop against a real card diff: the q209 recipe " +
      "composes CorpusReport.diff with the gate") {
    import spark.implicits._
    val d = Seq((1L, "a b c d e", "en"), (2L, "a b", "en"),
      (3L, "x y z w v u", "de")).toDF("doc_id", "text", "lang")
    val gated = d.filter(size(split(col("text"), " ")) >= 5)
    def card(x: org.apache.spark.sql.DataFrame) =
      CorpusReport.build(x, "text", "doc_id", langCol = Some("lang"))
    val out = drift(CorpusReport.diff(card(d), card(gated)),
      Seq(("corpus", "n_docs", 0.5), ("lang", "en", 0.6)))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(5))
      .toMap
    assert(out(("corpus", "n_docs"))) // 3 -> 2: |−1| <= 1.5
    assert(out(("lang", "en"))) // 2 -> 1: |−1| <= 1.2
  }
}
