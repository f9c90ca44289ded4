package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{QuantileSketch, Text}

/** Streaming twin of the corpus data card ([[graft.operators.CorpusReport]],
  * q194): per event-time window corpus telemetry — doc count, emptiness,
  * token mass/mean, token-length quantiles, duplicate-mass estimate —
  * built ONLY from mergeable bounded-state aggregates, so the same code
  * is valid as a batch plan and as a watermarked streaming aggregation.
  *
  * The batch card pins EXACT numbers (interpolated quantiles via the
  * distributed sort/histogram, exact distinct on fingerprints) — the
  * right form when a run publishes a card next to its output. A live
  * ingest can afford neither a full sort nor per-key distinct state, so
  * this twin swaps exactly the two unbounded pieces for their sketch
  * family members and keeps everything else exact:
  *
  *  - token quantiles → [[QuantileSketch]] (`graft_quantile_sketch`,
  *    q193): O(k·log(n/k)) state, deterministic error budget, NEAREST-
  *    RANK answers (smallest value whose rank reaches ⌈q·n⌉) rather than
  *    the batch card's interpolated `quantile_cont` — exact while a
  *    window holds ≤ k values (CardStreamSpec pins that case);
  *  - exact-dup mass → HLL distinct estimate (`approx_count_distinct`
  *    over the 16-byte text fingerprint; order-insensitive register
  *    maxes, so batch == stream on identical rows), clamped at 0 since
  *    an HLL over-estimate would otherwise read as negative dup mass.
  *
  * State per open window is a fixed struct (counters + HLL registers +
  * one k-bounded sketch) — ingest-rate and history independent; the
  * watermark closes windows and frees it. Late documents beyond the
  * delay are dropped by the watermark, the standard trade.
  */
object CardStream {

  /** One telemetry row per tumbling `windowDur` event-time window:
    * `(w_start, w_end, n_docs, n_empty, tok_total, tok_mean, tok_p50,
    * tok_p90, dup_est)`. Null/whitespace-only texts count as 0-token
    * documents (`n_empty`), matching the batch card. In a batch plan
    * the same call is a plain window group-by (CardStreamSpec pins
    * batch == stream on the same rows). */
  def perWindow(docs: DataFrame, tsCol: String = "ingest_ts",
                textCol: String = "text",
                windowDur: String = "1 hour",
                watermarkDelay: String = "1 hour",
                sketchK: Int = 256): DataFrame = {
    val nTok = when(col(textCol).isNotNull,
      size(Text.tokens(col(textCol))).cast("double")).otherwise(lit(0.0))
    val src =
      if (docs.isStreaming) docs.withWatermark(tsCol, watermarkDelay)
      else docs
    src.select(col(tsCol), col(textCol).as("__t"), nTok.as("__n"))
      .groupBy(window(col(tsCol), windowDur))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("__n") === 0.0, 1L).otherwise(0L)).as("n_empty"),
        sum(col("__n")).as("tok_total"),
        count(col("__t")).as("__n_text"),
        approx_count_distinct(md5(col("__t"))).as("__distinct_est"),
        QuantileSketch.sketch(col("__n"), sketchK).as("__sk"))
      .select(
        col("window.start").as("w_start"),
        col("window.end").as("w_end"),
        col("n_docs"), col("n_empty"), col("tok_total"),
        (col("tok_total") / col("n_docs")).as("tok_mean"),
        QuantileSketch.quantile(col("__sk"), 0.5).as("tok_p50"),
        QuantileSketch.quantile(col("__sk"), 0.9).as("tok_p90"),
        greatest(col("__n_text") - col("__distinct_est"), lit(0L))
          .as("dup_est"))
  }

  /** [[perWindow]] telemetry rows re-shaped as CARDS — one
    * `(snapshot, section, key, value)` row per cell per window, with
    * the window start as a path-safe snapshot label
    * (`yyyy-MM-dd_HH.mm.ss`, UTC) — so a stream's `foreachBatch` can
    * publish each closed window into the same
    * [[graft.operators.CorpusReport.writeCard]] store a batch run
    * publishes to, and [[graft.operators.CorpusReport.diffSnapshots]]
    * reads both without caring which engine wrote which:
    *
    * {{{
    * CardStream.asCards(batchDf).select("snapshot").distinct.collect()
    *   .foreach { r => CorpusReport.writeCard(
    *     CardStream.asCards(batchDf).filter($"snapshot" === r.getString(0))
    *       .drop("snapshot"), storePath, r.getString(0)) }
    * }}}
    *
    * (windows per micro-batch are report-sized, so the driver loop is
    * bounded). Cells reuse the batch card's (section, key) names so a
    * batch-vs-stream diff aligns rows; the values of `tokens/p50`,
    * `tokens/p90`, and `corpus/exact_dup_docs` are the documented
    * sketch-family estimates of those cells (nearest-rank sketch
    * quantiles, clamped HLL dup mass — see the object doc), not the
    * batch card's exact forms. `tokens/mean` over an all-empty window
    * divides 0 tokens by n_docs — finite, matching the batch card. */
  def asCards(telemetry: DataFrame): DataFrame = {
    def cell(section: String, key: String, v: Column): Column =
      struct(lit(section).as("section"), lit(key).as("key"),
        v.cast("double").as("value"))
    telemetry.select(
        date_format(col("w_start"), "yyyy-MM-dd_HH.mm.ss").as("snapshot"),
        explode(array(
          cell("corpus", "n_docs", col("n_docs")),
          cell("corpus", "n_empty", col("n_empty")),
          cell("corpus", "exact_dup_docs", col("dup_est")),
          cell("tokens", "total", col("tok_total")),
          cell("tokens", "mean", col("tok_mean")),
          cell("tokens", "p50", col("tok_p50")),
          cell("tokens", "p90", col("tok_p90"))
        )).as("__c"))
      .select(col("snapshot"), col("__c.*"))
  }
}
