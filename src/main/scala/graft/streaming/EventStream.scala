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
