package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Cross-document duplicate-span detection — the span-level dedup signal
  * ("Deduplicating Training Data Makes Language Models Better", Lee et
  * al. 2022): a position is duplicated when its `w`-token window occurs
  * anywhere else in the corpus (another document, or again in the same
  * one — intra-doc repeats are corpus repeats too). Distinct from
  * [[Repetition]] (intra-doc only, never crosses documents) and from
  * [[Dedup]] (whole-document granularity); this is the signal that
  * catches boilerplate paragraphs inside otherwise-unique documents.
  *
  * Shape at 100 TB: spans are md5 fingerprints (one narrow shingle+hash
  * projection); occurrence counts are ONE groupBy(fp) with map-side
  * partial aggregation; only the fingerprints with occ > 1 — the
  * duplicated minority — join back (left join onto the span stream), so
  * the join's build side is dup-sized, not corpus-sized. Per-doc stats
  * are a final groupBy(id). The exact form shuffles the corpus's span
  * stream twice; when even that is too hot, the [[graft.functions
  * .HeavyHitters]] sketch over the same fingerprints is the bounded-state
  * screen to run first.
  */
object Spans {

  /** (id, n_spans, n_dup_spans, dup_span_fraction) per document —
    * fraction 0.0 for documents shorter than `w` tokens. */
  def dupSpanStats(df: DataFrame, textCol: String, idCol: String,
                   w: Int = 10): DataFrame = {
    require(w >= 1, s"span width must be positive: $w")
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val grams = df.select(col(idCol),
      explode(Text.shinglesNative(Text.tokens(col(textCol)), w)).as("__gram"))
      .select(col(idCol), md5(col("__gram")).as("__fp"))
    val dupFps = grams.groupBy(col("__fp"))
      .agg(count(lit(1)).as("__occ"))
      .filter(col("__occ") > 1)
      .select(col("__fp"), lit(1L).as("__isdup"))
    val per = grams.join(dupFps, Seq("__fp"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(coalesce(col("__isdup"), lit(0L))).as("n_dup_spans"))
    df.select(col(idCol)).join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"))
      .withColumn("dup_span_fraction",
        when(col("n_spans") > 0,
          col("n_dup_spans").cast("double") / col("n_spans"))
          .otherwise(lit(0.0)))
  }
}
