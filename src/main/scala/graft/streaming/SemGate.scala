package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, KeyValueGroupedDataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Similarity

/** Streaming SEMANTIC gate — the embedding twin of [[NearDupGate]],
  * closing the one modality the streaming family didn't cover: meaning.
  * [[DocPrep]] stops exact re-deliveries, [[NearDupGate]] stops reworded
  * shapes, but a paraphrase RE-ENCODING (new words, same embedding
  * neighborhood) sailed through both; the batch path drops it
  * ([[graft.operators.SemDedup.againstCorpus]]), so a streaming ingest
  * admitted documents its own batch twin would reject. Each document is
  * assigned to its nearest centroid (the narrow
  * [[Similarity.ivfAssignAll]] fold — zero shuffles before the gate), a
  * `flatMapGroupsWithState` keyed on the CLUSTER holds the cluster's
  * admitted (id, vector) rows, and a document is ADMITTED iff no
  * already-admitted vector in its cluster sits within cosine ≥ `tau`.
  * A document lands in exactly ONE cluster, so verdicts need no
  * downstream aggregation — one stateful operator, Append mode, one row
  * (doc_id, admitted) per document.
  *
  * Semantics contract (public, the [[NearDupGate]] discipline): this is
  * the SINGLE-PASS online gate — arrival order is admission order, and
  * there is no transitive closure: in a chain a–b–c (consecutive within
  * tau, ends apart) the batch [[graft.operators.SemDedup.mark]] drops
  * b AND c (any smaller-id twin loses, even a dropped one) while the
  * gate admits c once b is rejected. The two agree wherever near-dup
  * groups are mutually-within-tau blobs — the exact regime,
  * differentially pinned by SemGateSpec. Feed id-ordered batches for
  * the min-id-wins batch answer (within a micro-batch each cluster
  * group is folded in id order). Re-delivery of an already-admitted id
  * is admitted again (its own vector is in state; identity is checked
  * before similarity), keeping re-delivery idempotent — downstream
  * exact dedup keeps effectively-once. Null embeddings produce no
  * verdict: gate them on quality, not similarity.
  *
  * Seeding: pass the shipped corpus's semantic store
  * ([[graft.operators.SemDedup.semanticStore]] rows — (cluster, id,
  * embedding) under the SAME centroids; open checked tables via
  * [[graft.operators.SemDedup.openSemanticStore]]) as `store` and the
  * gate starts with every cluster's corpus vectors pre-admitted — the
  * streaming continuation of an incremental ingest.
  *
  * State — size it honestly: one (id, vector) per admitted document
  * ever seen, grouped by cluster, plus the seeded store. This is
  * curation memory, not window state (the [[DomainCap]] never-evict
  * discipline): "what has the corpus admitted" has no expiry. At
  * corpus scale that is the semantic store ITSELF held in the state
  * store — use the gate for bounded streams/windows or seeded bounded
  * clusters, and the batch [[graft.operators.SemDedup.againstCorpus]]
  * against the persisted bucketed store for unbounded ingest. In batch
  * the same call degenerates to per-cluster folds over sorted groups
  * with no state store at all.
  *
  * For UNBOUNDED ingest, pass a [[Horizon]]: an admitted vector then
  * suppresses its neighborhood only within `ttl` of its last sighting
  * (every identity re-delivery or tau-match refreshes it), after which
  * the entry is dropped — lazily by the fold, eagerly by
  * watermark-driven compaction, and whole-cluster state is removed by
  * an event-time timeout once every entry ages out. State becomes
  * "admitted vectors per ttl window", not ever. Seeded store vectors
  * are [[Permanent]] — the persisted corpus doesn't expire from the
  * gate; manage it via the batch store lifecycle. SemGateSpec pins
  * stream == batch and the eviction itself. */
object SemGate {

  case class Verdict(doc_id: Long, admitted: Boolean)

  /** Per-cluster admitted vectors (parallel arrays: ids(i) owns embs(i),
    * last sighted at lastSeen(i) — event-time millis, only meaningful
    * under a [[Horizon]]; [[Permanent]] marks entries that never expire
    * (seeded store vectors, and everything in no-horizon mode). */
  case class GateState(ids: Array[Long], embs: Array[Array[Double]],
                       lastSeen: Array[Long])

  /** No-horizon streaming state — the ORIGINAL two-field shape, kept as
    * its own encoder so pre-horizon checkpoints restore: Spark's
    * state-schema check compares field structure, and a no-horizon gate
    * never needs lastSeen (every entry is [[Permanent]] by definition).
    * Horizon mode uses [[GateState]] and is a NEW operator shape — it
    * has no pre-existing checkpoints to break. */
  case class GateStateV1(ids: Array[Long], embs: Array[Array[Double]])

  /** lastSeen sentinel for never-expiring entries: far enough in the
    * future that `sentinel + ttl` cannot overflow. */
  val Permanent: Long = Long.MaxValue / 4

  private def emptyState: GateState =
    GateState(Array.empty, Array.empty, Array.empty)

  /** Scala twin of the SQL `Vectors.cosine` INCLUDING its ragged-array
    * contract: the dot folds over the min length while each norm runs
    * over its own full length (VecDot's documented behavior), so a
    * dimension-mismatched pair scores the same deflated prefix-cosine
    * in the gate as in the batch operators — stream == batch parity
    * holds for malformed data too (pinned by SemGateSpec's
    * dimension-mismatch differential). 0-norm -> NaN: never >= tau. */
  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var na = 0.0; var i = 0
    while (i < a.length) { na += a(i) * a(i); i += 1 }
    var nb = 0.0; i = 0
    while (i < b.length) { nb += b(i) * b(i); i += 1 }
    val n = math.min(a.length, b.length)
    var dot = 0.0; i = 0
    while (i < n) { dot += a(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** The per-cluster online fold (shared verbatim by the batch and
    * streaming paths): (ts, id)-sorted rows against the running admitted
    * set. Without a ttl ((ttlMs = None, all ts 0) every entry is live
    * forever — the original never-evict semantics, unchanged. With one,
    * an entry suppresses near-dups only while `ts <= lastSeen + ttl`
    * (every sighting — identity re-delivery or tau-match — refreshes
    * lastSeen, the sliding-expiry [[NearDupGate]] discipline); a dead
    * entry is dropped the moment the fold walks past it, and an expired
    * identity re-arrival is a FRESH document (the gate has forgotten
    * it — it may now fall to a different live twin). */
  private def fold(seed: GateState, rows: Array[(Long, Array[Double], Long)],
                   tau: Double, ttlMs: Option[Long]): (GateState, Seq[Verdict]) = {
    val ids = scala.collection.mutable.ArrayBuffer.from(seed.ids)
    val embs = scala.collection.mutable.ArrayBuffer.from(seed.embs)
    val seen = scala.collection.mutable.ArrayBuffer.from(
      if (seed.lastSeen.length == seed.ids.length) seed.lastSeen
      else Array.fill(seed.ids.length)(Permanent))
    // expired entries can never suppress again (time only moves forward
    // within the sorted fold), but sweeping them per row is
    // O(rows x entries) in exactly the unbounded-ingest regime the
    // horizon targets — instead track the EARLIEST expiry among live
    // entries (a conservative lower bound: refreshing lastSeen only
    // pushes real expiries later) and compact with one filtered pass
    // only when a row's ts actually crosses it. After a compaction every
    // surviving entry satisfies seen(i) + ttl >= ts, so the cosine scan
    // below never consults a dead entry.
    var minExpiry = Long.MaxValue
    ttlMs.foreach { t =>
      var i = 0
      while (i < seen.length) {
        val e = seen(i) + t; if (e < minExpiry) minExpiry = e; i += 1
      }
    }
    def compact(ts: Long, t: Long): Unit = {
      var w = 0; var i = 0; var newMin = Long.MaxValue
      while (i < seen.length) {
        val e = seen(i) + t
        if (e >= ts) {
          if (w != i) { ids(w) = ids(i); embs(w) = embs(i); seen(w) = seen(i) }
          if (e < newMin) newMin = e
          w += 1
        }
        i += 1
      }
      ids.takeInPlace(w); embs.takeInPlace(w); seen.takeInPlace(w)
      minExpiry = newMin
    }
    val verdicts = rows.sortBy(r => (r._3, r._1)).map { case (id, e, ts) =>
      ttlMs.foreach { t => if (ts > minExpiry) compact(ts, t) }
      val idx = ids.indexOf(id)
      if (idx >= 0) { // re-delivery of a still-remembered admitted id
        seen(idx) = math.max(seen(idx), ts)
        Verdict(id, admitted = true)
      } else {
        var hit = false
        var i = 0
        while (i < embs.length) {
          if (cosine(embs(i), e) >= tau) { hit = true; seen(i) = math.max(seen(i), ts) }
          i += 1
        }
        if (hit) Verdict(id, admitted = false)
        else {
          ids += id; embs += e; seen += ts
          ttlMs.foreach { t => if (ts + t < minExpiry) minExpiry = ts + t }
          Verdict(id, admitted = true)
        }
      }
    }
    (GateState(ids.toArray, embs.toArray, seen.toArray), verdicts.toSeq)
  }

  def gate(docs: DataFrame, centroids: DataFrame, idCol: String,
           embCol: String, centroidIdCol: String, tau: Double,
           store: Option[DataFrame] = None,
           horizon: Option[Horizon] = None): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must be in (0,1]: $tau")
    // the [[NearDupGate]] discipline: a non-integral id would cast to
    // null row by row and die (or silently collapse ids) deep inside
    // the running streaming query — fail at plan time instead
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    docs.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => // ok
      case other => throw new IllegalArgumentException(
        s"SemGate id column '$idCol' must be an integral type, got " +
          s"${other.simpleString}")
    }
    horizon.foreach { h => docs.schema(h.tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampType => // ok
      case other => throw new IllegalArgumentException(
        s"SemGate horizon ts column '${h.tsCol}' must be a timestamp, got " +
          s"${other.simpleString}")
    }}
    val spark = docs.sparkSession
    import spark.implicits._
    implicit val verdictEnc = Encoders.product[Verdict]
    implicit val stateEnc = Encoders.product[GateState]
    implicit val stateV1Enc = Encoders.product[GateStateV1]
    val ttlMs = horizon.map(_.ttlMs)
    // the watermark rides the source relation and the ts column passes
    // through as a plain alias (watermark metadata intact) — event-time
    // timeouts refuse to plan otherwise; no-horizon mode carries a
    // constant epoch so both modes share one row shape and one fold
    val input = horizon match {
      case Some(h) if docs.isStreaming =>
        docs.withWatermark(h.tsCol, h.watermarkDelay)
      case _ => docs
    }
    val tsField = horizon.map(h => col(h.tsCol).as("__ts"))
      .getOrElse(lit(new java.sql.Timestamp(0L)).as("__ts"))
    val cents = centroids.select(col(centroidIdCol), col(embCol).as("__emb"))
    val assigned = Similarity.ivfAssignAll(
        input.select(col(idCol).cast("long").as("doc_id"),
          col(embCol).cast("array<double>").as("__emb"), tsField)
          .filter(col("__emb").isNotNull),
        cents, "__emb", centroidIdCol)
      .select(col("centroid"), col("doc_id"), col("__emb"), col("__ts"))
      .as[(Int, Long, Array[Double], java.sql.Timestamp)]
    val grouped = assigned.groupByKey(_._1)
    def toRows(it: Iterator[(Int, Long, Array[Double], java.sql.Timestamp)]) =
      it.map(r => (r._2, r._3, r._4.getTime)).toArray
    // seeded store vectors are the persisted corpus — they never expire
    // from the gate; evict them via the batch store lifecycle instead.
    // The base shape is the two-field V1 (checkpoint-stable for the
    // no-horizon gate); horizon mode widens it with Permanent stamps.
    val seedStatesV1: Option[KeyValueGroupedDataset[Int, GateStateV1]] =
      store.map { s =>
        s.select(col("cluster").cast("int"), col(idCol).cast("long"),
            col(embCol).cast("array<double>"))
          .as[(Int, Long, Array[Double])]
          .groupByKey(_._1)
          .mapGroups { (k, it) =>
            val rows = it.map(r => (r._2, r._3)).toArray.sortBy(_._1)
            (k, GateStateV1(rows.map(_._1), rows.map(_._2)))
          }
          .groupByKey(_._1).mapValues(_._2)
      }
    def widen(v1: GateStateV1): GateState =
      GateState(v1.ids, v1.embs, Array.fill(v1.ids.length)(Permanent))
    val verdicts: Dataset[Verdict] =
      if (!docs.isStreaming) {
        // batch degenerate form: no state store — seed each cluster's
        // fold from the store frame via cogroup, then run the same fold
        store match {
          case None =>
            grouped.flatMapGroups { (_, it) =>
              fold(emptyState, toRows(it), tau, ttlMs)._2.iterator
            }
          case Some(_) =>
            val seeds = seedStatesV1.get
            grouped.cogroup(seeds) { (_, rows, seedIt) =>
              val seed = seedIt.nextOption().map(widen).getOrElse(emptyState)
              fold(seed, toRows(rows), tau, ttlMs)._2.iterator
            }
        }
      } else horizon match {
        case None =>
          // the no-horizon gate stores the ORIGINAL two-field state
          // shape: nothing expires, so lastSeen carries no information,
          // and keeping V1 means checkpoints written before horizon mode
          // existed restore cleanly (a three-field GateState here would
          // fail Spark's state-schema compatibility check)
          val func = (_: Int, rows: Iterator[(Int, Long, Array[Double], java.sql.Timestamp)],
                      state: GroupState[GateStateV1]) => {
            val seed = state.getOption.map(widen).getOrElse(emptyState)
            val (next, vs) = fold(seed, toRows(rows), tau, ttlMs)
            state.update(GateStateV1(next.ids, next.embs))
            vs.iterator
          }
          seedStatesV1 match {
            case Some(init) => grouped.flatMapGroupsWithState(
              OutputMode.Append, GroupStateTimeout.NoTimeout, init)(func)
            case None => grouped.flatMapGroupsWithState(
              OutputMode.Append, GroupStateTimeout.NoTimeout)(func)
          }
        case Some(h) =>
          // horizon mode: per-entry sliding expiry inside the fold, plus
          // watermark-driven compaction and an event-time timeout at the
          // cluster's farthest live expiry — so an idle cluster's state
          // is REMOVED once every entry ages out (seeded Permanent
          // entries keep their cluster resident by design)
          val t = h.ttlMs
          val func = (_: Int, rows: Iterator[(Int, Long, Array[Double], java.sql.Timestamp)],
                      state: GroupState[GateState]) => {
            val wm = state.getCurrentWatermarkMs()
            def retain(s: GateState): Iterator[Verdict] = {
              val keep = s.ids.indices.filter(i => s.lastSeen(i) + t >= wm)
              if (keep.isEmpty) { if (state.exists) state.remove() }
              else {
                val ns = GateState(keep.map(s.ids).toArray,
                  keep.map(s.embs).toArray, keep.map(s.lastSeen).toArray)
                state.update(ns)
                state.setTimeoutTimestamp(math.max(ns.lastSeen.max + t, wm + 1))
              }
              Iterator.empty
            }
            if (state.hasTimedOut) retain(state.get)
            else {
              val seed = state.getOption.getOrElse(emptyState)
              val (next, vs) = fold(seed, toRows(rows), tau, ttlMs)
              retain(next)
              vs.iterator
            }
          }
          seedStatesV1.map(_.mapValues(widen)) match {
            case Some(init) => grouped.flatMapGroupsWithState(
              OutputMode.Append, GroupStateTimeout.EventTimeTimeout, init)(func)
            case None => grouped.flatMapGroupsWithState(
              OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(func)
          }
      }
    verdicts.toDF()
  }
}
