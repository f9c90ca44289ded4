package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` door a V1 streaming source needs: wrap a
  * batch plan's RDD as the `isStreaming = true` frame `Source.getBatch`
  * must return. Spark's own FileStreamSource does exactly this
  * (`sparkSession.internalCreateDataFrame(rdd, schema, isStreaming =
  * true)`); third-party V1 sources conventionally reach it through a
  * shim object in the `org.apache.spark.sql` namespace — this file is
  * that shim and nothing else lives here. */
object StreamingFrame {
  def asStreaming(df: DataFrame, schema: StructType): DataFrame =
    df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(
        df.queryExecution.toRdd, schema, isStreaming = true)

  /** The inverse door, for a V1 streaming SINK's `addBatch`: the frame
    * the engine hands in carries the trigger's incremental plan and
    * must not be re-executed as-is by batch writers — re-plan its rows
    * as a plain batch frame (rows copied out of the unsafe-row reuse
    * buffer), Spark's own ForeachBatchSink device. */
  def asBatch(df: DataFrame): DataFrame = {
    val rdd = df.queryExecution.toRdd.map(_.copy())
    df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, df.schema, isStreaming = false)
  }
}
