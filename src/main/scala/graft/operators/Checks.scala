package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — "unit tests for data"
  * (Schelter et al. 2018, *Automating Large-Scale Data Quality
  * Verification*, VLDB; the pattern Deequ/Great-Expectations ship) as a
  * one-pass gate a corpus runs before anything trains on it: declare
  * constraints over columns, get one row per constraint —
  * `(check, column, observed, passed)` — and fail the run (or just
  * publish the report beside the card) when one fails.
  *
  * Scale posture: every non-uniqueness statistic folds into ONE
  * map-side-combined aggregation pass over the corpus — each check
  * contributes a couple of aggregate expressions, never a second scan.
  * [[Unique]] checks need exact per-column distinct counts (a report
  * pins numbers — the [[CorpusReport]] discipline): Spark plans n
  * distinct aggregates in one pass via an Expand that replays the scan
  * n-fold through the shuffle, so budget uniqueness checks accordingly
  * at 100 TB (one is free-ish, five quintuple the shuffled rows) or
  * pre-pin the corpus and accept the cost — the honest trade, stated
  * here rather than hidden behind an approximation.
  *
  * Determinism contract (the cross-engine pin discipline): every
  * observed value is a count, an exact-integer ratio (one IEEE
  * division), or an order-independent min/max — never an ordered double
  * summation — EXCEPT [[MeanBetween]] over a floating column, whose sum
  * is association-order-dependent; use integral columns for
  * cross-engine pins (q203's exact-sums rule) and floating ones only
  * where a tolerance absorbs the last ulp. Regexes must stay inside the
  * RE2-compatible subset both engines share (the [[UrlOps]] rule).
  *
  * Empty corpus: ratio observations are NULL (0/0) and their checks
  * FAIL — an empty corpus is not a valid training set, and a gate that
  * vacuously passes on "no data" is how empty shards ship. Same rule
  * for an all-null column under [[Unique]]/[[MeanBetween]]/
  * [[MatchesRegex]]: a ratio over nothing is not evidence of health.
  * [[ValuesBetween]]/[[MeanBetween]] fail fast on non-numeric columns
  * (a string column would cast unparseable values to NULL and exempt
  * them — the direction a gate must never fail in).
  */
object Checks {

  /** One declared constraint; `observed` semantics per subclass. */
  sealed trait Check {
    def column: String
    def name: String
  }

  /** Non-null fraction of `column` ≥ `minFraction` (observed = the
    * fraction, exact counts divided once). */
  final case class Complete(column: String, minFraction: Double)
      extends Check { val name = "complete" }

  /** Exact distinct fraction among non-null values ≥ `minFraction`
    * (observed = distinct/non-null; 1.0 = a key column). */
  final case class Unique(column: String, minFraction: Double)
      extends Check { val name = "unique" }

  /** Every non-null value within [lo, hi] (observed = VIOLATION count;
    * passed = zero violations). */
  final case class ValuesBetween(column: String, lo: Double, hi: Double)
      extends Check { val name = "between" }

  /** Mean of `column` within [lo, hi] (observed = the mean — exact for
    * integral columns, order-dependent for floating ones; see the
    * object doc). */
  final case class MeanBetween(column: String, lo: Double, hi: Double)
      extends Check { val name = "mean" }

  /** Fraction of non-null values fully matching `re` ≥ `minFraction`
    * (anchored match — `rlike` semantics would pass on substrings;
    * a validation gate wants the whole value well-formed). */
  final case class MatchesRegex(column: String, re: String,
                                minFraction: Double)
      extends Check { val name = "regex" }

  /** Runs every check in one aggregation pass (see object doc for the
    * Unique caveat) and returns `(check, column, observed, passed)` —
    * one row per declared check, in declaration order under the
    * (check, column) sort the report is keyed by. Unknown columns fail
    * fast at plan time with the frame's real columns named. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "Checks.run: no checks declared")
    checks.foreach { c =>
      require(df.columns.contains(c.column),
        s"Checks.run: column '${c.column}' not in the frame " +
          s"(has: ${df.columns.sorted.mkString(", ")})")
      c match {
        case Complete(_, f) => require(f >= 0 && f <= 1,
          s"complete(${c.column}): minFraction in [0,1], got $f")
        case Unique(_, f) => require(f >= 0 && f <= 1,
          s"unique(${c.column}): minFraction in [0,1], got $f")
        case MatchesRegex(_, _, f) => require(f >= 0 && f <= 1,
          s"regex(${c.column}): minFraction in [0,1], got $f")
        case ValuesBetween(_, lo, hi) => require(lo <= hi,
          s"between(${c.column}): lo <= hi, got [$lo, $hi]")
        case MeanBetween(_, lo, hi) => require(lo <= hi,
          s"mean(${c.column}): lo <= hi, got [$lo, $hi]")
      }
      // range/mean checks demand a NUMERIC column at declaration time: a
      // string column would cast unparseable values to NULL and silently
      // EXEMPT them from the range — the one direction a gate must never
      // fail in
      c match {
        case _: ValuesBetween | _: MeanBetween =>
          val dt = df.schema(c.column).dataType
          require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
            s"${c.name}(${c.column}): numeric column required, " +
              s"got ${dt.simpleString}")
        case _ => ()
      }
    }
    // one aggregate expression list; aliases keyed by check index
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: checks.zipWithIndex
      .flatMap { case (c, i) =>
        val v = col(c.column)
        c match {
          case Complete(_, _) =>
            Seq(count(v).as(s"__nn_$i"))
          case Unique(_, _) =>
            Seq(countDistinct(v).as(s"__d_$i"), count(v).as(s"__nn_$i"))
          case ValuesBetween(_, lo, hi) =>
            // integral columns compare in LONG space: casting a bigint
            // with |v| > 2^53 to double can round it ONTO the boundary
            // and hide a real violation — the gate failing open, the one
            // direction it must never fail in. v < lo over the reals is
            // exactly v < ceil(lo) for integral v (strict: any
            // fractional lo rounds up past every integer below it), and
            // v > hi is v > floor(hi); bounds at or beyond the long
            // range can't be violated from inside it. Floating columns
            // keep the double comparison (their native space).
            val isIntegral = df.schema(c.column).dataType match {
              case org.apache.spark.sql.types.ByteType |
                   org.apache.spark.sql.types.ShortType |
                   org.apache.spark.sql.types.IntegerType |
                   org.apache.spark.sql.types.LongType => true
              case _ => false
            }
            val violates =
              if (isIntegral) {
                val lv = v.cast("long")
                val below =
                  if (math.ceil(lo) <= Long.MinValue.toDouble) lit(false)
                  else if (math.ceil(lo) >= Long.MaxValue.toDouble) lit(true)
                  else lv < lit(math.ceil(lo).toLong)
                val above =
                  if (math.floor(hi) >= Long.MaxValue.toDouble) lit(false)
                  else if (math.floor(hi) < Long.MinValue.toDouble) lit(true)
                  else lv > lit(math.floor(hi).toLong)
                below || above
              } else v.cast("double") < lo || v.cast("double") > hi
            Seq(sum(when(v.isNotNull && violates, 1L)
              .otherwise(0L)).as(s"__viol_$i"))
          case MeanBetween(_, _, _) =>
            Seq(sum(v.cast("double")).as(s"__sum_$i"), count(v).as(s"__nn_$i"))
          case MatchesRegex(_, re, _) =>
            Seq(sum(when(v.isNotNull &&
              regexp_like(v.cast("string"), lit("^(" + re + ")$")), 1L)
              .otherwise(0L)).as(s"__m_$i"), count(v).as(s"__nn_$i"))
        }
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows: Seq[Column] = checks.zipWithIndex.map { case (c, i) =>
      val (observed, passed): (Column, Column) = c match {
        case Complete(_, f) =>
          val o = col(s"__nn_$i").cast("double") / col("__n").cast("double")
          (o, o >= f)
        case Unique(_, f) =>
          val o = col(s"__d_$i").cast("double") / col(s"__nn_$i").cast("double")
          (o, o >= f)
        case ValuesBetween(_, _, _) =>
          val o = col(s"__viol_$i").cast("double")
          (o, o === 0.0)
        case MeanBetween(_, lo, hi) =>
          val o = col(s"__sum_$i") / col(s"__nn_$i").cast("double")
          (o, o >= lo && o <= hi)
        case MatchesRegex(_, _, f) =>
          val o = col(s"__m_$i").cast("double") / col(s"__nn_$i").cast("double")
          (o, o >= f)
      }
      struct(lit(c.name).as("check"), lit(c.column).as("column"),
        observed.cast("double").as("observed"),
        // NULL observed (0/0 on an empty corpus or an all-null column)
        // FAILS — a vacuous pass is how empty shards ship
        coalesce(passed, lit(false)).as("passed"))
    }
    one.select(explode(array(rows: _*)).as("__r")).select(col("__r.*"))
  }

  /** Every check must hold or the job dies HERE, naming each failure
    * with its observed value — the gate form ([[run]] is the report
    * form). Returns `df` unchanged for chaining. */
  def assertAll(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val failed = run(df, checks).filter(!col("passed"))
      .select(col("check"), col("column"), col("observed"))
      .collect() // check-count-bounded driver state
    if (failed.nonEmpty) {
      val msgs = failed.map { r =>
        s"${r.getString(0)}(${r.getString(1)}): observed = " +
          (if (r.isNullAt(2)) "null" else r.getDouble(2).toString)
      }
      throw new IllegalStateException(
        s"data-quality checks FAILED (${failed.length}/${checks.length}): " +
          msgs.mkString("; "))
    }
    df
  }

  /** SCHEMA contract check — the metadata half of the gate (zero data
    * touched): each `(column, typeName)` expectation passes iff the
    * frame has that column with exactly that Catalyst `simpleString`
    * type (`bigint`, `string`, `array<float>`, …). Returns the same
    * `(check, column, observed, passed)` report shape as [[run]] with
    * `observed` = the actual type (NULL when the column is absent —
    * absence fails, same rule as drift's ghost cells). Pair with
    * [[run]] at an ingest boundary: schema drift (a source re-typing a
    * column) is the failure mode value checks can't see. Driver-side
    * only — never triggers a job. */
  def schema(df: DataFrame,
             expected: Seq[(String, String)]): Seq[SchemaResult] = {
    require(expected.nonEmpty, "Checks.schema: no expectations declared")
    val actual = df.schema.map(f => f.name -> f.dataType.simpleString).toMap
    expected.map { case (c, t) =>
      val obs = actual.get(c)
      SchemaResult(c, t, obs, obs.contains(t))
    }
  }

  /** [[schema]]'s gate form: dies naming every mismatch. Returns `df`
    * for chaining. */
  def assertSchema(df: DataFrame,
                   expected: Seq[(String, String)]): DataFrame = {
    val failed = schema(df, expected).filterNot(_.passed)
    if (failed.nonEmpty)
      throw new IllegalStateException(
        s"schema checks FAILED (${failed.length}/${expected.length}): " +
          failed.map(f => s"${f.column}: expected ${f.expected}, got " +
            f.observed.getOrElse("<absent>")).mkString("; "))
    df
  }

  final case class SchemaResult(column: String, expected: String,
                                observed: Option[String], passed: Boolean)

  /** Card-DRIFT gate over a [[CorpusReport.diff]] frame — the alarm
    * half of the card family: each `(section, key, maxRel)` tolerance
    * row passes iff the cell moved by at most `maxRel` RELATIVE to its
    * `before` value (|delta| ≤ maxRel·|before|; a zero `before` admits
    * only a zero delta). Cells ABSENT on either side fail — a vanished
    * language or a section only the new code emits is drift, not noise.
    * Tolerance rows naming cells the diff lacks also fail (observed
    * NULL): a tolerance on a cell nobody computes is a config bug
    * surfaced, not silently ignored. Returns one row per tolerance:
    * `(section, key, before, after, delta, passed)`. Both sides are
    * report-sized; the join is trivial. */
  def drift(diff: DataFrame,
            tolerances: Seq[(String, String, Double)]): DataFrame = {
    require(tolerances.nonEmpty, "Checks.drift: no tolerances declared")
    tolerances.foreach { case (s, k, m) =>
      require(m >= 0, s"drift($s/$k): maxRel must be >= 0: $m") }
    val spark = diff.sparkSession
    import spark.implicits._
    val tol = tolerances.toDF("section", "key", "__max_rel")
    tol.join(diff, Seq("section", "key"), "left_outer")
      .select(col("section"), col("key"), col("before"), col("after"),
        col("delta"),
        coalesce(
          abs(col("delta")) <= col("__max_rel") * abs(col("before")),
          lit(false)).as("passed"))
  }
}
