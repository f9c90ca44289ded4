package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation that is valid in BOTH batch and
  * streaming plans. In a stream, the watermark lets Spark emit a window
  * once it can no longer receive late data and evict its state — so
  * memory is bounded by open windows × group keys, independent of stream
  * length. In batch the same code degenerates to a plain window group-by.
  * (The batch q13 uses date_trunc for DuckDB-oracle parity; for hour-
  * aligned tumbling windows `window('1 hour').start == date_trunc('hour')`.)
  */
object EventStream {

  def hourlyTypeCounts(events: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("total"))

  /** Windowed trending items: per event-time window, the top items by
    * the [[graft.functions.HeavyHitters]] Misra–Gries aggregate — the
    * streaming "what's hot right now" query with O(k) state per open
    * window (the native aggregate's partial buffers merge across
    * micro-batches through the state store exactly as they do across
    * batch partitions). With `k` at or above the item cardinality the
    * counts are exact and batch == stream bit-for-bit (the spec's
    * differential); below it, the n/(k+1) guarantee applies per window
    * but estimates become merge-order-sensitive — fine for trending,
    * not for billing. */
  def trendingTypes(events: DataFrame, k: Int = 8,
                    watermarkDelay: String = "1 hour"): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(events.sparkSession)
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.functions.HeavyHitters.heavyHitters(col("event_type"), k).as("__hh"))
      .select(col("window.start").as("hour"), posexplode(col("__hh")))
      .select(col("hour"), (col("pos") + 1).cast("int").as("rank"),
        col("col.item").as("event_type"), col("col.cnt").as("cnt"))
  }

  /** Streaming exact dedup: drops re-deliveries of the same key whose
    * event times fall within the watermark horizon — at-least-once
    * ingestion becomes effectively-once, and state for a key is evicted
    * once the watermark passes it, so the dedup store is bounded by the
    * delay window, not the stream's history. The streaming member of the
    * dedup family (batch forms: Dedup.exactByKey / q20). */
  def dedupStream(events: DataFrame, keyCols: Seq[String], tsCol: String = "ts",
                  watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
}
