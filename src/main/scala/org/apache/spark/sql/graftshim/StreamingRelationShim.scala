package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.DataSource
import org.apache.spark.sql.execution.streaming.runtime.StreamingRelation

/** Build the V1 streaming relation for a registered
  * `StreamSourceProvider` format — what `spark.readStream.format(f)`
  * constructs internally. [[graft.sql.SnapshotStreamRule]] swaps this
  * in for a `StreamingRelationV2` over a snapshot-catalog table, so
  * `spark.readStream.table("graft.t")` runs the same `graft-cdc`
  * source as `Snapshots.readChangesStream` — the Delta approach
  * (DeltaAnalysis routes streaming reads of its DSv2 tables to the V1
  * DeltaSource the same way): the CDC micro-batch is an arbitrary
  * distributed plan (exceptAll over touched files), which only the V1
  * `Source.getBatch: DataFrame` contract can hand to the engine.
  * Constructor access to `DataSource`/`StreamingRelation` is
  * `private[sql]` — hence this shim. */
object StreamingRelationShim {
  def v1Relation(spark: SparkSession, format: String,
                 options: Map[String, String]): LogicalPlan = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    StreamingRelation(
      DataSource(cs, className = format, options = options))
  }
}
