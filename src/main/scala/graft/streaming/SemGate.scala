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
  * with no state store at all. */
object SemGate {

  case class Verdict(doc_id: Long, admitted: Boolean)

  /** Per-cluster admitted vectors (parallel arrays: ids(i) owns
    * embs(i)). */
  case class GateState(ids: Array[Long], embs: Array[Array[Double]])

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
    * streaming paths): id-sorted rows against the running admitted set. */
  private def fold(seed: GateState, rows: Array[(Long, Array[Double])],
                   tau: Double): (GateState, Seq[Verdict]) = {
    val ids = scala.collection.mutable.ArrayBuffer.from(seed.ids)
    val embs = scala.collection.mutable.ArrayBuffer.from(seed.embs)
    val verdicts = rows.sortBy(_._1).map { case (id, e) =>
      if (ids.contains(id)) Verdict(id, admitted = true) // re-delivery
      else if (embs.exists(s => cosine(s, e) >= tau)) Verdict(id, admitted = false)
      else { ids += id; embs += e; Verdict(id, admitted = true) }
    }
    (GateState(ids.toArray, embs.toArray), verdicts.toSeq)
  }

  def gate(docs: DataFrame, centroids: DataFrame, idCol: String,
           embCol: String, centroidIdCol: String, tau: Double,
           store: Option[DataFrame] = None): DataFrame = {
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
    val spark = docs.sparkSession
    import spark.implicits._
    implicit val verdictEnc = Encoders.product[Verdict]
    implicit val stateEnc = Encoders.product[GateState]
    val cents = centroids.select(col(centroidIdCol), col(embCol).as("__emb"))
    val assigned = Similarity.ivfAssignAll(
        docs.select(col(idCol).cast("long").as("doc_id"),
          col(embCol).cast("array<double>").as("__emb"))
          .filter(col("__emb").isNotNull),
        cents, "__emb", centroidIdCol)
      .select(col("centroid"), col("doc_id"), col("__emb"))
      .as[(Int, Long, Array[Double])]
    val grouped = assigned.groupByKey(_._1)
    val seedStates: Option[KeyValueGroupedDataset[Int, GateState]] =
      store.map { s =>
        s.select(col("cluster").cast("int"), col(idCol).cast("long"),
            col(embCol).cast("array<double>"))
          .as[(Int, Long, Array[Double])]
          .groupByKey(_._1)
          .mapGroups { (k, it) =>
            val rows = it.map(r => (r._2, r._3)).toArray.sortBy(_._1)
            (k, GateState(rows.map(_._1), rows.map(_._2)))
          }
          .groupByKey(_._1).mapValues(_._2)
      }
    val verdicts: Dataset[Verdict] =
      if (!docs.isStreaming) {
        // batch degenerate form: no state store — seed each cluster's
        // fold from the store frame via cogroup, then run the same fold
        store match {
          case None =>
            grouped.flatMapGroups { (_, it) =>
              fold(GateState(Array.empty, Array.empty),
                it.map(r => (r._2, r._3)).toArray, tau)._2.iterator
            }
          case Some(_) =>
            val seeds = seedStates.get
            grouped.cogroup(seeds) { (_, rows, seedIt) =>
              val seed = seedIt.nextOption()
                .getOrElse(GateState(Array.empty, Array.empty))
              fold(seed, rows.map(r => (r._2, r._3)).toArray, tau)._2.iterator
            }
        }
      } else {
        val func = (_: Int, rows: Iterator[(Int, Long, Array[Double])],
                    state: GroupState[GateState]) => {
          val seed = state.getOption
            .getOrElse(GateState(Array.empty, Array.empty))
          val (next, vs) = fold(seed, rows.map(r => (r._2, r._3)).toArray, tau)
          state.update(next)
          vs.iterator
        }
        seedStates match {
          case Some(init) => grouped.flatMapGroupsWithState(
            OutputMode.Append, GroupStateTimeout.NoTimeout, init)(func)
          case None => grouped.flatMapGroupsWithState(
            OutputMode.Append, GroupStateTimeout.NoTimeout)(func)
        }
      }
    verdicts.toDF()
  }
}
