package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.Text

/** Streaming NEAR-duplicate gate — the stage [[DocPrep]] could not have
  * until now: its watermark dedup stops exact re-deliveries, but a
  * slightly-reworded re-crawl sails through. This is the incremental
  * twin of the batch LSH prune ([[graft.operators.Dedup.pruneNearDups]]):
  * each document's MinHash band signatures become (band, sig) bucket
  * keys, a `flatMapGroupsWithState` keyed on the bucket holds ONE long —
  * the bucket's first occupant id, the [[DomainCap]] never-evict state
  * discipline, because a bucket's claim on "I have seen this shape of
  * document" is corpus-curation memory, not window state — and a
  * document is ADMITTED iff no bucket it lands in was already occupied
  * by someone else. Output: (doc_id, admitted) per document.
  *
  * Semantics contract (public): this is the SINGLE-PASS online gate —
  * a document is rejected exactly when it collides with an EARLIER
  * document through some band. It matches the batch prune wherever
  * near-dup groups are band-coherent (identical or tightly-templated
  * docs — the exact regime, differentially pinned against
  * `pruneNearDups` by NearDupGateSpec); it does NOT compute transitive
  * closure across buckets the way [[graft.operators.Dedup.clusters]]
  * does, which is the standard price of an online gate (a chain A–B–C
  * where B arrives between A and C can admit B yet reject C). Arrival
  * order is admission order: feed id-ordered batches for the
  * min-id-wins batch answer. Re-delivery of an ADMITTED id is admitted
  * again (its buckets hold its own id) — downstream exact dedup keeps
  * effectively-once, the [[DocPrep]] composition. Token-less documents
  * produce no signatures and no verdict: gate them on quality, not
  * similarity.
  *
  * State — TWO stores in the streaming plan, size both: (1) the gate
  * proper holds one long per DISTINCT bucket ever seen (bands ×
  * distinct band-signatures — the same cardinality the batch LSH
  * shuffle keys on); (2) the downstream per-doc verdict aggregation is
  * a streaming groupBy, which retains one row per document ever gated
  * (standard unbounded-aggregation state). A bucket group's FIRST
  * micro-batch buffers its ids to find the minimum (the batch-twin
  * winner); every later delivery streams one-pass against the stored
  * occupant with no buffering — the boilerplate-bucket hot path. In
  * batch the same call degenerates to a window minimum over buckets +
  * a per-doc aggregate. Callers who cannot afford store (2) should use
  * [[bucketVerdicts]] inside `foreachBatch` instead: a document's
  * signatures are all generated from its one input row, so its
  * per-bucket verdicts always land in the SAME micro-batch and a
  * batch-LOCAL groupBy(doc_id) reproduces [[gate]]'s answer with zero
  * aggregation state.
  *
  * For UNBOUNDED ingest, pass a [[Horizon]]: the gate then suppresses a
  * shape only within `ttl` of its last sighting and EVICTS the bucket's
  * state row via an event-time timeout after that — state bounded by
  * distinct shapes per ttl window, not ever. Semantics switch from
  * min-id-wins to first-arrival-wins ((ts, id) order — the
  * gaps-and-islands occupant), pinned against an independent SQL
  * formulation by q123's oracle and batch==stream by NearDupGateSpec. */
object NearDupGate {

  case class Verdict(doc_id: Long, collided: Boolean)

  /** Horizon-mode bucket state: the occupant id and the event time of
    * the bucket's last sighting (sliding expiry base). */
  case class BucketState(occ: Long, lastSeen: Long)

  /** The horizon fold, shared verbatim by the batch and streaming paths
    * (stream == batch parity by construction): rows sorted by (ts, id)
    * against a sliding-expiry occupant. A row within `ttlMs` of the
    * bucket's last sighting collides (unless it IS the occupant) and
    * refreshes the expiry; a row past it re-seeds the bucket and is
    * admitted — the gaps-and-islands semantics (islands split where the
    * sighting gap exceeds ttl; each island's first row is its occupant),
    * which is exactly what q123's SQL oracle computes independently. */
  private[streaming] def ttlFold(state: Option[BucketState],
                                 rows: Array[(Long, Long)],
                                 ttlMs: Long): (Option[BucketState], Seq[(Long, Boolean)]) = {
    var occ = state
    val out = rows.sortBy(identity).map { case (ts, id) =>
      occ match {
        case Some(BucketState(o, seen)) if ts - seen <= ttlMs =>
          occ = Some(BucketState(o, math.max(seen, ts)))
          (id, id != o)
        case _ =>
          occ = Some(BucketState(id, ts))
          (id, false)
      }
    }
    (occ, out.toSeq)
  }

  /** [[gate]] without the per-doc aggregation: the raw (doc_id,
    * collided) verdict stream, one row per (document, landed bucket).
    * A document is admitted iff none of its rows collided; all of a
    * document's rows share its micro-batch (they come from one input
    * row), so the fold can run batch-locally in `foreachBatch` —
    * the zero-aggregation-state form of the gate. */
  def bucketVerdicts(docs: DataFrame, textCol: String, idCol: String,
                     shingle: Int = 5, bands: Int = 4,
                     horizon: Option[Horizon] = None): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    docs.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => // ok
      case other => throw new IllegalArgumentException(
        s"NearDupGate id column '$idCol' must be an integral type, got " +
          s"${other.simpleString}")
    }
    val spark = docs.sparkSession
    graft.functions.GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    horizon.foreach { h => docs.schema(h.tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampType => // ok
      case other => throw new IllegalArgumentException(
        s"NearDupGate horizon ts column '${h.tsCol}' must be a timestamp, " +
          s"got ${other.simpleString}")
    }}
    // the watermark must ride the source relation (before the explode)
    // so the engine can both drop too-late rows and fire the gate's
    // event-time timeouts
    val input = horizon match {
      case Some(h) if docs.isStreaming => docs.withWatermark(h.tsCol, h.watermarkDelay)
      case _ => docs
    }
    // NB: the ts column rides through as a plain alias (not a computed
    // expression) so its watermark metadata survives to the stateful op —
    // event-time timeouts refuse to plan without it
    val idAndTs = col(idCol).cast("long").as("doc_id") +:
      horizon.map(h => col(h.tsCol).as("__ts")).toSeq
    val sigs = input
      .select(idAndTs :+ posexplode(Text.minhashBandsNative(
        Text.tokens(col(textCol)), shingle, bands)): _*)
      .filter(col("col").isNotNull)
      .select(col("doc_id") +: horizon.map(_ => col("__ts")).toSeq :+
        concat_ws(":", col("pos"), col("col")).as("bucket"): _*)
    horizon match {
      case Some(h) => ttlBucketVerdicts(sigs, h)
      case None => plainBucketVerdicts(sigs, docs.isStreaming)
    }
  }

  /** Horizon-mode verdicts: the same `ttlFold` drives a per-bucket
    * groupByKey in batch and an event-time-timeout
    * `flatMapGroupsWithState` in streaming — a bucket's state row is
    * physically REMOVED once the watermark passes lastSeen + ttl, so
    * gate state is bounded by the distinct shapes per ttl window. */
  private def ttlBucketVerdicts(sigs: DataFrame, h: Horizon): DataFrame = {
    val spark = sigs.sparkSession
    import spark.implicits._
    implicit val verdictEnc = Encoders.product[Verdict]
    implicit val stateEnc = Encoders.product[BucketState]
    val keyed = sigs.select(col("bucket"), col("__ts"), col("doc_id"))
      .as[(String, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
    if (!sigs.isStreaming)
      keyed.flatMapGroups { (_, it) =>
        ttlFold(None, it.map(r => (r._2.getTime, r._3)).toArray, h.ttlMs)
          ._2.iterator.map { case (id, c) => Verdict(id, c) }
      }.toDF()
    else
      keyed.flatMapGroupsWithState[BucketState, Verdict](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[(String, java.sql.Timestamp, Long)],
         state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val (next, vs) = ttlFold(state.getOption,
              rows.map(r => (r._2.getTime, r._3)).toArray, h.ttlMs)
            next.foreach { s =>
              val expireAt = s.lastSeen + h.ttlMs
              if (expireAt <= state.getCurrentWatermarkMs()) state.remove()
              else { state.update(s); state.setTimeoutTimestamp(expireAt) }
            }
            vs.iterator.map { case (id, c) => Verdict(id, c) }
          }
      }.toDF()
  }

  private def plainBucketVerdicts(sigs: DataFrame, streaming: Boolean): DataFrame = {
    val spark = sigs.sparkSession
    import spark.implicits._
    val verdicts =
      if (!streaming) {
        val w = Window.partitionBy(col("bucket"))
        sigs.withColumn("__mn", min(col("doc_id")).over(w))
          .select(col("doc_id"), (col("doc_id") =!= col("__mn")).as("collided"))
      } else {
        implicit val enc = Encoders.product[Verdict]
        sigs.as[(Long, String)]
          .groupByKey(_._2)
          .flatMapGroupsWithState[Long, Verdict](
            OutputMode.Append, GroupStateTimeout.NoTimeout) {
            (_: String, rows: Iterator[(Long, String)], state: GroupState[Long]) =>
              state.getOption match {
                case Some(occ) =>
                  // occupied bucket: verdicts stream one row at a time —
                  // no buffering on the boilerplate hot path
                  rows.map(r => Verdict(r._1, r._1 != occ))
                case None =>
                  // first sighting of this bucket: the micro-batch group
                  // must buffer to crown its minimum (the batch-twin
                  // winner), a one-time cost per distinct bucket
                  val ids = rows.map(_._1).toArray
                  if (ids.isEmpty) Iterator.empty
                  else {
                    val mn = ids.min
                    state.update(mn)
                    ids.iterator.map(id => Verdict(id, id != mn))
                  }
              }
          }.toDF()
      }
    verdicts
  }

  def gate(docs: DataFrame, textCol: String, idCol: String,
           shingle: Int = 5, bands: Int = 4,
           horizon: Option[Horizon] = None): DataFrame = {
    // Spark's global-watermark correctness check rejects a streaming
    // aggregation above an event-time-timeout stateful operator (the
    // gate could emit verdicts the downstream agg would see as late).
    // The composition callers want there is the documented zero-state
    // recipe — which is also strictly cheaper — so point at it instead
    // of letting the engine's config-waving analysis error surface.
    if (horizon.isDefined && docs.isStreaming)
      throw new IllegalArgumentException(
        "horizon gate over a stream: run bucketVerdicts(...) inside " +
          "foreachBatch and fold batch-locally — " +
          "df.groupBy(\"doc_id\").agg(!max(\"collided\")) — a document's " +
          "bucket verdicts all share its micro-batch, so the local fold " +
          "reproduces gate() exactly with zero aggregation state " +
          "(NearDupGateSpec pins it)")
    bucketVerdicts(docs, textCol, idCol, shingle, bands, horizon)
      .groupBy(col("doc_id"))
      .agg((!max(col("collided"))).as("admitted"))
  }
}
