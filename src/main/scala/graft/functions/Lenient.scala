package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Lenient scalar coercions reproducing the reference's `map_source`
  * semantics (reference dump-es-parquet:112-183, SURVEY.md §1.4). All are
  * pure `Column` combinators so they stay inside whole-stage codegen; every
  * failure is non-fatal (null), matching the reference's log-and-null rule.
  *
  * IMPORTANT: these rely on non-ANSI cast semantics (bad parse -> null),
  * so every session must pin spark.sql.ansi.enabled=false (Spark 4 flipped
  * the default). GraftSession does this.
  */
object Lenient {

  /** Epoch-magnitude heuristic (reference dump-es-parquet:149-160): an
    * integer below 20_000_000_000 is epoch-seconds, otherwise epoch-millis.
    * 2e10 seconds is year 2603, 2e10 millis is mid-1970 — no realistic
    * overlap, per the reference's comment at :152-157.
    */
  val EpochBoundary: Long = 20000000000L

  /** Python datetime's representable range (year 1..9999): fromtimestamp
    * outside it raises (reference catches -> warn/null at :161-162). Spark's
    * timestamp_seconds/millis would instead throw on long overflow — gate
    * the range so out-of-range epochs null like the reference.
    */
  val MinEpochSeconds: Long = -62135596800L    // 0001-01-01T00:00:00Z
  val MaxEpochMillis: Long = 253402300799999L  // 9999-12-31T23:59:59.999Z

  def epochToTimestamp(v: Column): Column =
    when(v < EpochBoundary, when(v >= MinEpochSeconds, timestamp_seconds(v)))
      .otherwise(when(v <= MaxEpochMillis, timestamp_millis(v.cast("long"))))

  /** Full lenient timestamp: digits-only strings go through the epoch
    * heuristic FIRST (the reference's `fromisoformat` rejects bare numbers
    * like "2024", falling through to the epoch branch at :149-160, whereas
    * Spark's try_to_timestamp would accept "2024" as year-2024); everything
    * else tries ISO-8601 (:145-148), else null (:161-162).
    */
  def lenientTimestamp(c: Column): Column = {
    // trimmed, like the reader path (MapSource.timestampMicros): the two
    // coercion paths must agree on padded inputs
    val s = trim(c.cast("string"))
    when(s.rlike("^-?\\d+$"), epochToTimestamp(s.cast("long")))
      .otherwise(call_function("try_to_timestamp", s))
  }

  /** Python `int(v)` falling back to `int(float(v))` (reference :163-170):
    * "3" -> 3 directly; "3.7" -> 3 by parsing as double then truncating
    * toward zero (Spark cast(double as long) truncates, matching Python).
    * Unparseable -> null.
    */
  def lenientLong(c: Column): Column = {
    val s = c.cast("string")
    coalesce(s.cast("long"), s.cast("double").cast("long"))
  }

  /** Python `float(v)` else null (reference :171-175). */
  def lenientDouble(c: Column): Column = c.cast("string").cast("double")

  /** Python `str(v)` (reference :176-180); for object-typed fields the raw
    * JSON must be preserved as a string — use to_json on struct inputs.
    */
  def lenientString(c: Column): Column = c.cast("string")

  /** First-of-list scalarization (T2, reference :129-137): multi-valued
    * field -> first element; empty list -> null, with non-ANSI element_at.
    */
  def firstOfList(c: Column): Column =
    when(size(c) > 0, element_at(c, 1))
}
