package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded time-range join: pairs every left row with the right rows whose
  * timestamp lies within ±tolerance — the "range join" Spark's optimizer
  * has no efficient plan for (a naive theta-join degenerates to a per-key
  * cross product; Catalyst plans BroadcastNestedLoop or worse).
  *
  * The banding trick: pick bucket width = 2×tolerance. Every right row
  * lands in exactly one bucket; every left row's ±tolerance window spans
  * at most two buckets, so the left side explodes to ≤2 bucket keys and
  * the match becomes an equi-join on the bucket followed by the exact
  * band filter. Cost: one shuffle on the bucket key, join fan-out bounded
  * by actual temporal density — the same shape Flink uses for interval
  * joins.
  *
  * Timestamps compare at micros precision (matching engines that store
  * timestamps as micros); epochs are assumed non-negative (integer `div`
  * truncation == floor).
  */
object RangeJoin {

  /** All (left, right) pairs with |right.rightTs - left.leftTs| <= tolUs.
    * Column sets of the two sides must be disjoint. */
  def bandPairs(left: DataFrame, right: DataFrame,
                leftTs: String, rightTs: String, tolUs: Long): DataFrame = {
    require(tolUs > 0)
    val collisions = left.columns.toSet.intersect(right.columns.toSet)
    require(collisions.isEmpty,
      s"left/right column sets must be disjoint, both have: $collisions")
    val w = 2 * tolUs
    val l = left.withColumn("__band", explode(array_distinct(array(
      expr(s"(unix_micros($leftTs) - $tolUs) div $w"),
      expr(s"(unix_micros($leftTs) + $tolUs) div $w")))))
    val r = right.withColumn("__band", expr(s"unix_micros($rightTs) div $w"))
    l.join(r, "__band")
      .filter(abs(expr(s"unix_micros($rightTs) - unix_micros($leftTs)")) <= tolUs)
      .drop("__band")
  }
}
