package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-sessionization as a library operator (the packaged q12
  * shape; the incremental streaming form is
  * graft.streaming.Sessionize). One shuffle on the user key; both window
  * passes reuse the same (user, time) sort order. */
object Sessions {

  /** Assign a session id to every event: a session breaks after `gapMs`
    * of inactivity. Adds `session` (0-based per user). */
  def assign(df: DataFrame, userCol: String, tsCol: String,
             tieBreak: String, gapMs: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieBreak))
    // The running sum is pinned to an explicit ROWS frame: the default
    // ORDER-BY frame is RANGE, which lumps order-key ties into one frame
    // and would diverge from the oracle's row-at-a-time prefix sum the day
    // a fixture gains (ts, tieBreak) ties.
    val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ms = unix_millis(col(tsCol))
    val gap = ms - lag(ms, 1).over(w)
    df.withColumn("__new_session",
        when(gap.isNull || gap > gapMs, 1L).otherwise(0L))
      .withColumn("session", sum(col("__new_session")).over(wRows))
      .drop("__new_session")
  }

  /** Per-session aggregates: event count, span, summed `valueCol`. */
  def aggregate(df: DataFrame, userCol: String, tsCol: String,
                tieBreak: String, gapMs: Long, valueCol: String): DataFrame =
    assign(df, userCol, tsCol, tieBreak, gapMs)
      .groupBy(col(userCol), col("session"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_millis(col(tsCol))).as("start_ms"),
        max(unix_millis(col(tsCol))).as("end_ms"),
        round(sum(col(valueCol)), 2).as("total_value"))
}
