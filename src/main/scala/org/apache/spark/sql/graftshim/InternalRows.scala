package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** The `private[sql]` door for a BATCH partition-local kernel over
  * InternalRows: execute `df`'s plan, transform each partition's row
  * iterator, and re-enter the planner as a plain batch frame — the
  * device for per-partition folds whose Dataset form
  * (`mapPartitions[Row]`) pays a full RowEncoder
  * serialize/deserialize per row (measured r19 on the prefix-scan
  * interior fold: 12.6 s of GC inside 37.5 s of CPU at 60 M rows —
  * a third of the kernel was garbage collection of boxed Row copies).
  *
  * Contract for `f`: input rows are the usual reused unsafe-row
  * buffers — read fields before pulling the next row, `copy()`
  * anything retained; output rows may themselves be reused views
  * (JoinedRow over the input), because the re-entry scan
  * (`RDDScanExec`) re-projects every row to a fresh unsafe row before
  * anything downstream can buffer it — Spark's own internal operators
  * rely on exactly this. */
object InternalRows {
  def mapPartitions(df: DataFrame, outSchema: StructType)(
      f: Iterator[InternalRow] => Iterator[InternalRow]): DataFrame = {
    val rdd: RDD[InternalRow] = df.queryExecution.toRdd.mapPartitions(f)
    df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, outSchema, isStreaming = false)
  }
}
