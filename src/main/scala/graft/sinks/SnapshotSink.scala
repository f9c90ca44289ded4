package graft.sinks

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Sink => SinkV1}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

/** STREAMING SINK into a [[Snapshots]] table (format `graft-snapshot`)
  * — the write half of the log's streaming symmetry: with the
  * `graft-cdc` source as the read half, table-to-table replication is
  * two format names and zero user code:
  *
  * {{{
  *   // continuous INGEST: every micro-batch commits one log version,
  *   // exactly-once via the batch id (a crash replay lands nothing)
  *   df.writeStream.format("graft-snapshot").option("path", dir)
  *     .option("checkpointLocation", ckpt).start()
  *
  *   // declarative REPLICATION: consume a table's change feed and
  *   // apply it net-effect by key (Snapshots.applyChanges semantics)
  *   spark.readStream.format("graft-cdc").option("path", src).load()
  *     .writeStream.format("graft-snapshot")
  *     .option("path", replica).option("keyCol", "id")
  *     .option("checkpointLocation", ckpt).start()
  * }}}
  *
  * Without `keyCol` every batch APPENDS through
  * [[Snapshots.writeAppendBatch]] (op = `append-batch-N`), so the
  * exactly-once story is the log's own: replayed ids commit nothing,
  * and downstream [[Snapshots.addedSince]]/`graft-cdc` consumers see
  * whole micro-batches or nothing. The idempotency token is the batch
  * id — GLOBAL to the table unless a `queryId` option namespaces it:
  * multi-stream ingest into one table MUST set a distinct stable
  * `queryId` per query (else the second stream's batch 0 collides
  * with the first's and is silently skipped — the
  * [[Snapshots.writeAppendBatch]] contract). With `keyCol` every
  * batch routes through [[Snapshots.applyChanges]] — the CDC-apply
  * contract (ONE commit per batch, net-effect per key,
  * batch-id-exact replay skip, first batch bootstraps the replica).
  *
  * V1 `StreamSinkProvider` deliberately, matching the `graft-cdc`
  * source: `addBatch` receives a DataFrame and hands it to the same
  * batch commit paths every batch writer uses — one code path to trust,
  * re-planned as a batch frame first (the engine's incremental plan
  * must not be re-executed; Spark's ForeachBatchSink device via
  * [[org.apache.spark.sql.graftshim.StreamingFrame.asBatch]]). */
class SnapshotSink extends StreamSinkProvider with DataSourceRegister {
  override def shortName(): String = "graft-snapshot"

  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): SinkV1 = {
    val dir = parameters.get("path").orElse(parameters.get("dir")).getOrElse(
      throw new IllegalArgumentException(
        "graft-snapshot needs option path=<snapshot table dir>"))
    require(partitionColumns.isEmpty,
      "graft-snapshot: partitionBy is not supported — the log replaces " +
        "hive partitioning with clustering (optimizeZorder) + file skipping")
    require(outputMode == OutputMode.Append() || outputMode == OutputMode.Update(),
      s"graft-snapshot supports Append (ingest) and Update (keyCol " +
        s"apply) output modes, got $outputMode")
    // queryId: REQUIRED for multi-stream ingest into one table — it
    // namespaces the exactly-once batch-id token per query (see
    // Snapshots.writeAppendBatch's contract); without it the table
    // admits exactly one batch-id-writing stream, ever
    new SnapshotBatchSink(dir, parameters.get("keyCol"),
      parameters.get("queryId"))
  }
}

private[sinks] class SnapshotBatchSink(dir: String, keyCol: Option[String],
                                       queryId: Option[String] = None)
    extends SinkV1 {
  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val batch = org.apache.spark.sql.graftshim.StreamingFrame.asBatch(data)
    keyCol match {
      case Some(k) =>
        // applyChanges runs SEVERAL actions over the batch (net-effect
        // join, touched-file scans, landing) — persist so the trigger's
        // incremental source plan executes once, not once per action
        // (the documented foreachBatch discipline; correctness would
        // otherwise also lean on every upstream source re-reading
        // deterministically)
        batch.persist()
        try Snapshots.applyChanges(batch, dir, k, batchId = Some(batchId),
          queryId = queryId)
        finally { batch.unpersist(); () }
      case None => Snapshots.writeAppendBatch(batch, dir, batchId, queryId); ()
    }
  }
  override def toString: String = s"SnapshotSink[$dir]"
}
