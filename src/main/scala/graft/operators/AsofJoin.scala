package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-event) join — the time-series join Spark has no
  * built-in for: each left row picks the most recent right row with
  * `right.ts <= left.ts` per key.
  *
  * Implemented by composition (the preferred extension tier): tag both
  * sides, union, and carry the right side's values forward with
  * `last(_, ignoreNulls)` over a (key, time)-ordered running window, then
  * keep left rows. Cost: ONE shuffle on the key and a per-partition sort
  * — compare a range-join, whose naive plan explodes to per-key cross
  * products, or per-row subqueries. Scales exactly like sessionization:
  * partition by key, sort by time, single pass.
  */
object AsofJoin {

  /** Backward as-of join (right.ts <= left.ts, inclusive).
    *
    * @param rightCols right-side value columns to attach (null when no
    *                  right row precedes the left row)
    * @param tieBreak  column ordering rows at equal (key, ts) so the
    *                  carried value is deterministic
    */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               tsCol: String, tieBreak: String, rightCols: Seq[String]): DataFrame = {
    require(rightCols.nonEmpty)
    val collisions = rightCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"rightCols collide with left columns: $collisions — rename before joining")
    val carried = rightCols.map(c => s"__asof_$c")
    val l = left.withColumn("__side", lit(1))
    val r = right.select(
      (keyCols :+ tsCol :+ tieBreak).map(col) ++
        rightCols.zip(carried).map { case (c, a) => col(c).as(a) }: _*)
      .withColumn("__side", lit(0))
    // right rows sort before left at equal ts => inclusive match
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc, col(tieBreak).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(r, allowMissingColumns = true)
    val withCarried = carried.foldLeft(joined) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    val renames = rightCols.zip(carried).map { case (c, a) => col(a).as(c) }
    withCarried.filter(col("__side") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++ renames: _*)
  }
}
