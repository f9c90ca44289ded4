package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Intra-document repetition signals (the Gopher/C4-family quality
  * filters): what fraction of a document's word n-grams are repeats, and
  * how much of it is one n-gram repeated over and over. High values mark
  * boilerplate, keyword-stuffed spam, and generation loops — standard
  * drop criteria in LLM data prep.
  *
  * Scale shape: each document is scored against ITS OWN grams only, so
  * the whole operator is one narrow projection — a single codegen'd
  * call per row (`graft_rep_stats`: sort the gram array, scan runs;
  * O(d log d) per document) that stays inside whole-stage codegen. No
  * explode, no groupBy, ZERO shuffles; at 100 TB this runs entirely
  * map-side inside the input scans. (The equivalent explode +
  * groupBy(doc, gram) form shuffles one row per gram occurrence — n×
  * row amplification for no benefit when the aggregation never crosses
  * documents. The DuckDB oracle uses exactly that form, which makes the
  * check a genuine cross-formulation differential; the interpreted HOF
  * fold in [[signalsComposable]] is a second witness, pinned equal by
  * DecontamRepetitionSpec.)
  */
object Repetition {

  /** Adds to each row: `total_grams`, `distinct_grams`, `dup_fraction`
    * (share of gram occurrences that are repeats of an earlier one),
    * `top_fraction` (share taken by the single most frequent gram).
    * Gram-less documents (under `n` tokens or null text) score 0.0.
    */
  def signals(df: DataFrame, textCol: String, n: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    // the kernel shingles internally; null text scores as a gram-less doc
    val toks = coalesce(Text.tokens(col(textCol)), array().cast("array<string>"))
    // graft_once: [[filter]]'s ceilings otherwise push below this
    // projection and re-inline the kernel call once per predicate
    // (2x per row on the gate path, before the surviving row pays it
    // again here)
    df.withColumn("__st", graft.functions.Once.once(
        call_function(graft.functions.RepStats.name, toks, lit(n))))
      .withColumn("__total", col("__st.total_grams"))
      .withColumn("total_grams", col("__total"))
      .withColumn("distinct_grams", col("__st.distinct_grams"))
      .withColumn("dup_fraction", fractionOf(col("__total") - col("__st.distinct_grams")))
      .withColumn("top_fraction", fractionOf(col("__st.max_run")))
      .drop("__st", "__total")
  }

  /** The built-ins-only form of [[signals]] — sort the per-doc gram
    * array, fold adjacent-run statistics out of it with the `aggregate`
    * HOF. Same semantics, interpreted (HOFs don't codegen); kept as the
    * portability fallback and the differential-test witness for the
    * native kernel. */
  def signalsComposable(df: DataFrame, textCol: String, n: Int = 3): DataFrame = {
    val sorted = sort_array(Text.shingles(Text.tokens(col(textCol)), n))
    // One fold, struct accumulator: (prev gram, current run, max run,
    // distinct so far). Sorted input makes equal grams adjacent, so runs
    // ARE the per-gram counts.
    val folded = aggregate(
      sorted,
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("mx"), lit(0L).as("dst")),
      (acc, g) => {
        val sameRun = acc.getField("prev").isNotNull && acc.getField("prev") === g
        val run = when(sameRun, acc.getField("run") + 1L).otherwise(lit(1L))
        struct(g.as("prev"), run.as("run"),
          greatest(acc.getField("mx"), run).as("mx"),
          when(sameRun, acc.getField("dst"))
            .otherwise(acc.getField("dst") + 1L).as("dst"))
      })
    df.withColumn("__total", size(sorted).cast("long"))
      .withColumn("__f", folded) // staged: referenced twice below
      .withColumn("total_grams", col("__total"))
      .withColumn("distinct_grams", col("__f.dst"))
      .withColumn("dup_fraction", fractionOf(col("__total") - col("__f.dst")))
      .withColumn("top_fraction", fractionOf(col("__f.mx")))
      .drop("__total", "__f")
  }

  /** part / total_grams as a double, 0.0 when the document has no grams. */
  private def fractionOf(part: Column): Column =
    when(col("__total") > 0, part.cast("double") / col("__total"))
      .otherwise(lit(0.0))

  /** The filtering form: keep documents under both repetition ceilings —
    * the composable gate for prep pipelines (same pattern as
    * [[Quality.filter]]). */
  def filter(df: DataFrame, textCol: String, n: Int = 3,
             maxDupFraction: Double = 0.75,
             maxTopFraction: Double = 0.2): DataFrame =
    signals(df, textCol, n)
      .where(col("dup_fraction") <= maxDupFraction &&
        col("top_fraction") <= maxTopFraction)
      .drop("total_grams", "distinct_grams", "dup_fraction", "top_fraction")
}
