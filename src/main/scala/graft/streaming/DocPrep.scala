package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.operators.Splits

/** The training-data prep pipeline (batch form: q64) as a plan that is
  * valid in BOTH batch and streaming: optional C4 line-level cleaning
  * ([[graft.operators.LineFilter]]), fingerprint dedup, quality filter,
  * optional Gopher rule gate ([[graft.operators.Quality.gopherFlags]]),
  * content-addressed split, over a continuously arriving document
  * stream.
  *
  * Streaming semantics: the only stateful stage is the dedup —
  * `dropDuplicatesWithinWatermark` holds one fingerprint per horizon, so
  * state is bounded by the watermark delay (ingest rate × delay), not
  * stream history; everything downstream is stateless row-at-a-time
  * codegen. An at-least-once ingest (the re-delivery shape of a scroll
  * retry) becomes effectively-once. In batch the same code degenerates
  * to plain dropDuplicates + filters; DocPrepSpec pins batch == stream
  * on the same data.
  *
  * The near-dup cluster stage of q64 is not inlined here: its streaming
  * twin is [[NearDupGate]] (band-keyed bucket state, one long per
  * distinct signature), which emits a per-doc admitted verdict stream —
  * run it beside this pipeline and join verdicts onto the output
  * (batch-side or via the id key downstream). Full transitive
  * CLUSTERING — as opposed to gating — still has no bounded-state
  * streaming form; when cluster labels are required, that remains a
  * periodic batch compaction over the stream's output.
  */
object DocPrep {

  def prep(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
           tsCol: String = "ingest_ts", watermarkDelay: String = "1 hour",
           minTokens: Int = 10, minTtr: Double = 0.2,
           maxDupFraction: Double = 0.75, maxTopFraction: Double = 0.5,
           classifierWeights: Option[Map[Int, Double]] = None,
           classifierBias: Double = 0.0, classifierDim: Int = 32,
           classifierTau: Double = 0.5,
           lineClean: Boolean = false, gopher: Boolean = false): DataFrame = {
    // optional C4 line-level cleaning FIRST (it rewrites the text the
    // fingerprint dedups on): stateless split/filter/reassemble, so the
    // same call is valid in batch and streaming plans
    val cleaned =
      if (lineClean)
        graft.operators.LineFilter.cleanDocs(docs, textCol).drop("n_lines_kept")
      else docs
    val fingerprinted = cleaned.withColumn("__fp", Text.fingerprint(col(textCol)))
    // dropDuplicatesWithinWatermark exists only in streaming plans; the
    // batch twin keeps the earliest-tsCol row per fingerprint — the same
    // winner a stream picks when ingest order follows tsCol
    val deduped =
      if (docs.isStreaming)
        fingerprinted
          .withWatermark(tsCol, watermarkDelay)
          .dropDuplicatesWithinWatermark("__fp")
      else graft.operators.Dedup.exactByKey(fingerprinted, Seq("__fp"), tsCol)
    val scored = graft.operators.Quality.filter(deduped, textCol, minTokens, minTtr)
    // repetition gate: a zero-shuffle per-row fold (operators.Repetition),
    // so it is valid mid-stream — same single definition as the batch form
    val unrepetitive = graft.operators.Repetition.filter(
      scored, textCol, maxDupFraction = maxDupFraction,
      maxTopFraction = maxTopFraction)
    // optional trained-quality gate: Classifier.gate is a narrow filter
    // on the score column (no join, no state), so the same call is valid
    // here in BOTH batch and streaming plans
    // optional Gopher rule gate: one narrow integer-exact projection +
    // filter (operators.Quality.gopherFlags), stateless in any plan
    val ruled =
      if (gopher)
        graft.operators.Quality.gopherFlags(unrepetitive, textCol)
          .where(col("keep"))
          .drop("n_words", "mean_word_len", "symbol_ratio", "alpha_frac",
            "n_stop", "keep")
      else unrepetitive
    val gated = classifierWeights match {
      case Some(w) => graft.operators.Classifier.gate(ruled, textCol,
        idCol, w, classifierBias, classifierDim, classifierTau)
      case None => ruled
    }
    Splits.assign(gated, idCol)
      .select(col(idCol), col(tsCol), col("n_tokens"), col("split"))
  }
}
