package graft.sources.cdc

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{IntegerType, StringType, StructType}

import graft.sinks.Snapshots

/** STREAMING change-data-feed over a [[graft.sinks.Snapshots]] log —
  * the missing member of the tail-source family (EsTailStream follows
  * an ES index, WarcTailStream a crawl directory; this follows a
  * versioned TABLE): a downstream index/card/replica subscribes to the
  * table instead of poll-and-cursoring [[Snapshots.changes]] by hand.
  *
  * {{{
  *   spark.readStream.format("graft-cdc")
  *     .option("path", tableDir)
  *     .option("startingVersion", "0")          // 0 = from the beginning
  *     .option("maxVersionsPerTrigger", "10")   // admission control
  *     .load()
  * }}}
  *
  * Offset = the LOG VERSION (the same cursor batch consumers persist),
  * so checkpoint recovery replays exactly the commits of the
  * unfinished trigger and nothing else. Each micro-batch IS the batch
  * algebra: `getBatch(since, upTo)` delegates to
  * [[Snapshots.changes]] — op-aware (appends are pure inserts, CoW
  * commits the exceptAll delete+insert pairs, compact/zorder silent),
  * horizon-checked (a cursor behind the vacuum horizon fails at plan
  * time naming the retained range), bounded to touched files. That
  * delegation is WHY this is a V1 `Source` and not a DSv2
  * `MicroBatchStream` like the other two tails: the CoW algebra is a
  * distributed plan (exceptAll over the touched files), and V1's
  * `getBatch: DataFrame` is the one streaming API that lets a source
  * hand the engine an arbitrary batch plan per trigger — a DSv2
  * partition reader could only ship rows it can produce itself, which
  * would force re-implementing the parquet scan AND the set algebra
  * inside a reader. Batch==stream equality is pinned by
  * CdcStreamSpec's differential row (the 14-suite discipline).
  *
  * Admission control: `maxVersionsPerTrigger` caps how many commits one
  * trigger drains (the EsTailStream/WarcTailStream discipline) so a
  * catch-up from version 0 on a long log lands as bounded micro-batches
  * instead of one giant one.
  *
  * Scale posture: per trigger the source does two log listings
  * (latest + horizon guard) and O(versions-in-trigger) entry reads;
  * rows read are exactly the trigger's touched files. The schema is
  * pinned at stream start (the standard streaming-source contract);
  * a mid-stream type-changing overwrite fails loudly rather than
  * misreading rows. */
class CdcSource extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-cdc"

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(
      CdcSource.feedSchema(sqlContext, CdcSource.dirOf(parameters))))

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source = {
    val dir = CdcSource.dirOf(parameters)
    new CdcStream(sqlContext, dir,
      schema.getOrElse(CdcSource.feedSchema(sqlContext, dir)),
      parameters.getOrElse("startingVersion", "0").toInt,
      parameters.getOrElse("maxVersionsPerTrigger",
        Int.MaxValue.toString).toInt)
  }
}

private[cdc] object CdcSource {
  def dirOf(parameters: Map[String, String]): String =
    parameters.get("path").orElse(parameters.get("dir")).getOrElse(
      throw new IllegalArgumentException(
        "graft-cdc needs option path=<snapshot table dir>"))

  /** Table schema (from the log) + the two CDC tag columns. */
  def feedSchema(sqlContext: SQLContext, dir: String): StructType =
    Snapshots.read(sqlContext.sparkSession, dir).schema
      .add("_change_type", StringType, nullable = false)
      .add("_commit_version", IntegerType, nullable = false)
}

private[cdc] class CdcStream(sqlContext: SQLContext, dir: String,
                             declared: StructType, startingVersion: Int,
                             maxVersionsPerTrigger: Int)
    extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  require(startingVersion >= 0, s"startingVersion must be >= 0: $startingVersion")
  require(maxVersionsPerTrigger >= 1,
    s"maxVersionsPerTrigger must be >= 1: $maxVersionsPerTrigger")

  import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit}

  private val spark = sqlContext.sparkSession
  // highest version this source has handed to the engine — advanced by
  // getBatch (including the checkpoint-recovery replay, so a restart
  // never re-offers an already-committed range); admission meter for
  // the legacy getOffset path
  private val floor = new java.util.concurrent.atomic.AtomicLong(startingVersion)
  // Trigger.AvailableNow pins its end target at stream start: the run
  // drains commits ≤ target in metered micro-batches, then terminates
  // even while writers keep committing
  @volatile private var availableTarget: Option[Long] = None

  override def schema: StructType = declared

  override def prepareForTriggerAvailableNow(): Unit =
    availableTarget = Some(
      Snapshots.latestVersion(spark, dir).getOrElse(0).toLong)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def initialOffset(): OffsetV2 = CdcOffset(startingVersion.toLong)

  override def reportLatestOffset(): OffsetV2 =
    CdcOffset(Snapshots.latestVersion(spark, dir).getOrElse(startingVersion).toLong)

  /** The admission-control path MicroBatchExecution actually drives
    * (any source implementing SupportsAdmissionControl is offered
    * through here, V1 or not): cap the end of the next micro-batch at
    * `start + maxVersionsPerTrigger`, bounded by the AvailableNow
    * target when one is pinned. */
  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val base = Option(startOffset).map(CdcOffset.version)
      .getOrElse(startingVersion.toLong)
    val latest = availableTarget.getOrElse(
      Snapshots.latestVersion(spark, dir).getOrElse(0).toLong)
    CdcOffset(math.max(base, math.min(latest, base + maxVersionsPerTrigger)))
  }

  override def getOffset: Option[OffsetV1] = {
    val latest = Snapshots.latestVersion(spark, dir).getOrElse(0)
    val base = floor.get()
    val cap = math.min(latest.toLong, base + maxVersionsPerTrigger)
    if (cap > base) Some(CdcOffset(cap))
    else if (base > startingVersion) Some(CdcOffset(base))
    else None // nothing committed past the start yet
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val since = start.map(CdcOffset.version).getOrElse(startingVersion.toLong)
    val upTo = CdcOffset.version(end)
    floor.getAndUpdate(f => math.max(f, upTo))
    val batch =
      if (upTo <= since) emptyBatch()
      else {
        val feed = Snapshots.changes(spark, dir, since.toInt, Some(upTo.toInt))
        // pin to the declared schema: a widening after stream start only
        // ADDS columns (dropped here — the stream's schema is fixed, the
        // standard source contract); a TYPE change (overwrite) would
        // corrupt the row interpretation, so it fails loudly instead
        val names = declared.fieldNames.toSeq
        require(names.forall(feed.columns.contains),
          s"graft-cdc: table at $dir no longer has the stream's columns " +
            s"(stream: ${names.mkString(",")}; feed: ${feed.columns.mkString(",")})" +
            " — an overwrite changed the schema; restart the stream")
        val aligned = feed.select(names.map(col): _*)
        val got = aligned.schema.fields.map(f => f.name -> f.dataType)
        val want = declared.fields.map(f => f.name -> f.dataType)
        require(got.sameElements(want),
          s"graft-cdc: table at $dir changed column TYPES under the stream " +
            s"(stream: ${want.mkString(",")}; now: ${got.mkString(",")})" +
            " — restart the stream to pick up the new schema")
        aligned
      }
    CdcStream.asStreaming(batch, declared)
  }

  private def emptyBatch(): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      declared)

  override def stop(): Unit = ()
}

private[cdc] object CdcStream {
  /** Wrap a batch plan as the streaming frame `getBatch` must return
    * (the engine asserts `isStreaming`); same device as Spark's own
    * FileStreamSource, reached through the
    * [[org.apache.spark.sql.graftshim.StreamingFrame]] shim. */
  def asStreaming(df: DataFrame, schema: StructType): DataFrame =
    org.apache.spark.sql.graftshim.StreamingFrame.asStreaming(df, schema)
}

/** Offset = log version. `json` is just the number, so any serialized
  * form round-trips without caring which Offset class carried it. */
private[cdc] case class CdcOffset(v: Long) extends OffsetV1 {
  override def json: String = v.toString
}

private[cdc] object CdcOffset {
  def version(o: org.apache.spark.sql.connector.read.streaming.Offset): Long =
    o.json.trim.toLong
}
