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
  * aggregation state. */
object NearDupGate {

  case class Verdict(doc_id: Long, collided: Boolean)

  /** [[gate]] without the per-doc aggregation: the raw (doc_id,
    * collided) verdict stream, one row per (document, landed bucket).
    * A document is admitted iff none of its rows collided; all of a
    * document's rows share its micro-batch (they come from one input
    * row), so the fold can run batch-locally in `foreachBatch` —
    * the zero-aggregation-state form of the gate. */
  def bucketVerdicts(docs: DataFrame, textCol: String, idCol: String,
                     shingle: Int = 5, bands: Int = 4): DataFrame = {
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
    val sigs = docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(Text.minhashBandsNative(
          Text.tokens(col(textCol)), shingle, bands)))
      .filter(col("col").isNotNull)
      .select(col("doc_id"), concat_ws(":", col("pos"), col("col")).as("bucket"))
    val verdicts =
      if (!docs.isStreaming) {
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
           shingle: Int = 5, bands: Int = 4): DataFrame =
    bucketVerdicts(docs, textCol, idCol, shingle, bands)
      .groupBy(col("doc_id"))
      .agg((!max(col("collided"))).as("admitted"))
}
