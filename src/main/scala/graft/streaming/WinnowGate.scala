package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Winnow

/** Streaming SPAN-granular dedup gate — the winnowing member of the
  * gate family ([[DocPrep]] exact, [[NearDupGate]] shape, [[SemGate]]
  * meaning, [[DomainCap]] provenance): each document's winnow
  * fingerprints (Schleimer–Wilkerson–Aiken selection, the q155/q167
  * kernel) become state keys, and the gate reports PER DOCUMENT how
  * much of it was already claimed — by a seeded fingerprint STORE (a
  * prior corpus's `Winnow.fingerprints` distinct-fp frame, the q167
  * probe made incremental) or by earlier documents in the stream. The
  * w+k−1 guarantee carries over: any re-used run of at least w+k−1
  * tokens shares at least one fingerprint with its source, so a
  * re-crawl that edits the tail still hits on its unchanged interior —
  * the span-level signal whole-document gates cannot see.
  *
  * Semantics contract (public): single-pass online, like
  * [[NearDupGate]] — a fingerprint's first claimant owns it (seeded
  * fps are owned by the store); later documents sharing it count a
  * duplicated fingerprint. `dup_frac = n_dup / n_fps`, and
  * `admitted = dup_frac <= maxDupFrac`. Arrival order is claim order;
  * feed id-ordered batches for the batch twin's min-id answer (the
  * differential WinnowGateSpec pins batch == stream). Documents with
  * fewer than w k-grams emit no verdict — gate those on quality, not
  * overlap. Re-delivered fingerprints of an admitted doc stay its own
  * (no self-collision).
  *
  * State: one long per DISTINCT fingerprint ever claimed — the same
  * cardinality the batch fp-store shuffle keys on, seeded WITHOUT a
  * scan-and-replay (the store frame loads as `initialState`, so
  * checkpoint restores and store growth stay decoupled). A fp group's
  * first micro-batch buffers to crown its minimum claimant; occupied
  * fps stream one-pass — the boilerplate hot path. The per-doc
  * verdict aggregation is a streaming groupBy (one row per gated doc);
  * callers who cannot afford it run [[fpVerdicts]] inside
  * `foreachBatch` and fold batch-locally — a document's fp verdicts
  * all come from its one input row, so they share its micro-batch and
  * the local fold is exact (spec-pinned). */
object WinnowGate {

  /** Owner id a seeded (store-held) fingerprint carries: collides with
    * every stream document, including a re-delivery of the very doc
    * that put it in the store — the store has no notion of "self". */
  val SeedOwner: Long = Long.MinValue

  case class FpVerdict(doc_id: Long, fp: String, collided: Boolean)

  /** Raw per-(document, fingerprint) verdicts: `doc_id, fp, collided`.
    * `seed`: optional distinct-fp frame (column `fp`) — the persisted
    * winnow store. Batch form: window-min claimant over the union,
    * seeded fps pre-claimed; streaming form: fp-keyed
    * `flatMapGroupsWithState` with the seed as initial state.
    *
    * `horizon`: sliding-TTL mode, the [[NearDupGate]] discipline on
    * span granularity — an fp claim suppresses only within `ttl` of its
    * last sighting and the state row is EVICTED past it (state bounded
    * by live fps per window, first-arrival-wins by (ts, id)). Mutually
    * exclusive with `seed`: a TTL gate's memory IS the window; an
    * untimestamped store has no place on its timeline. */
  def fpVerdicts(docs: DataFrame, textCol: String, idCol: String,
                 k: Int = 4, w: Int = 4,
                 seed: Option[DataFrame] = None,
                 horizon: Option[Horizon] = None): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    docs.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => // ok
      case other => throw new IllegalArgumentException(
        s"WinnowGate id column '$idCol' must be an integral type, got " +
          s"${other.simpleString}")
    }
    require(seed.isEmpty || horizon.isEmpty,
      "WinnowGate: seed and horizon are mutually exclusive — a TTL " +
        "gate's memory is its window; probe untimestamped stores with " +
        "the plain (un-horizoned) gate")
    val spark = docs.sparkSession
    graft.functions.GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    horizon.foreach { h => docs.schema(h.tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampType => // ok
      case other => throw new IllegalArgumentException(
        s"WinnowGate horizon ts column '${h.tsCol}' must be a timestamp, " +
          s"got ${other.simpleString}")
    }}
    val input = horizon match {
      case Some(h) if docs.isStreaming => docs.withWatermark(h.tsCol, h.watermarkDelay)
      case _ => docs
    }
    val sigs = Winnow.fpSets(input, textCol, idCol, k, w,
        keep = horizon.map(_.tsCol).toSeq)
      .select(col(idCol).cast("long").as("doc_id") +:
        horizon.map(h => col(h.tsCol).as("__ts")).toSeq :+
        explode_outer(col("fps")).as("fp"): _*)
      .filter(col("fp").isNotNull)
    horizon match {
      case Some(h) => return ttlFpVerdicts(sigs, h)
      case None =>
    }
    if (!docs.isStreaming) {
      val wn = Window.partitionBy(col("fp"))
      val seeded = seed match {
        case Some(s) => sigs.join(
          s.select(col("fp")).distinct().withColumn("__seeded", lit(true)),
          Seq("fp"), "left")
        case None => sigs.withColumn("__seeded", lit(false))
      }
      seeded.withColumn("__mn", min(col("doc_id")).over(wn))
        .select(col("doc_id"), col("fp"),
          (coalesce(col("__seeded"), lit(false)) ||
            col("doc_id") =!= col("__mn")).as("collided"))
    } else {
      implicit val enc = Encoders.product[FpVerdict]
      val keyed = sigs.as[(Long, String)].groupByKey(_._2)
      def fold(fp: String, rows: Iterator[(Long, String)],
               state: GroupState[Long]): Iterator[FpVerdict] =
        state.getOption match {
          case Some(occ) =>
            rows.map(r => FpVerdict(r._1, fp, r._1 != occ))
          case None =>
            val ids = rows.map(_._1).toArray
            if (ids.isEmpty) Iterator.empty
            else {
              val mn = ids.min
              state.update(mn)
              ids.iterator.map(id => FpVerdict(id, fp, id != mn))
            }
        }
      seed match {
        case Some(s) =>
          val init = s.select(col("fp")).distinct().as[String]
            .groupByKey(identity).mapValues(_ => SeedOwner)
          keyed.flatMapGroupsWithState[Long, FpVerdict](
            OutputMode.Append, GroupStateTimeout.NoTimeout, init)(fold)
        case None =>
          keyed.flatMapGroupsWithState[Long, FpVerdict](
            OutputMode.Append, GroupStateTimeout.NoTimeout)(fold)
      }
    }.toDF()
  }

  /** Horizon-mode fp verdicts: [[NearDupGate.ttlFold]] (the shared
    * gaps-and-islands occupant fold) keyed on the fingerprint — batch
    * via flatMapGroups, streaming via an event-time-timeout
    * `flatMapGroupsWithState` whose state rows are physically removed
    * once the watermark passes lastSeen + ttl. */
  private def ttlFpVerdicts(sigs: DataFrame, h: Horizon): DataFrame = {
    val spark = sigs.sparkSession
    import spark.implicits._
    implicit val verdictEnc = Encoders.product[FpVerdict]
    implicit val stateEnc = Encoders.product[NearDupGate.BucketState]
    val keyed = sigs.select(col("fp"), col("__ts"), col("doc_id"))
      .as[(String, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
    if (!sigs.isStreaming)
      keyed.flatMapGroups { (fp, it) =>
        NearDupGate.ttlFold(None, it.map(r => (r._2.getTime, r._3)).toArray,
          h.ttlMs)._2.iterator.map { case (id, c) => FpVerdict(id, fp, c) }
      }.toDF()
    else
      keyed.flatMapGroupsWithState[NearDupGate.BucketState, FpVerdict](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (fp: String, rows: Iterator[(String, java.sql.Timestamp, Long)],
         state: GroupState[NearDupGate.BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val (next, vs) = NearDupGate.ttlFold(state.getOption,
              rows.map(r => (r._2.getTime, r._3)).toArray, h.ttlMs)
            next.foreach { s =>
              val expireAt = s.lastSeen + h.ttlMs
              if (expireAt <= state.getCurrentWatermarkMs()) state.remove()
              else { state.update(s); state.setTimeoutTimestamp(expireAt) }
            }
            vs.iterator.map { case (id, c) => FpVerdict(id, fp, c) }
          }
      }.toDF()
  }

  /** Per-document verdict: `doc_id, n_fps, n_dup, admitted` with
    * `admitted = n_dup / n_fps <= maxDupFrac`. */
  def gate(docs: DataFrame, textCol: String, idCol: String,
           k: Int = 4, w: Int = 4, seed: Option[DataFrame] = None,
           maxDupFrac: Double = 0.5,
           horizon: Option[Horizon] = None): DataFrame = {
    require(maxDupFrac >= 0.0 && maxDupFrac <= 1.0,
      s"maxDupFrac must be in [0, 1]: $maxDupFrac")
    // same engine restriction as NearDupGate.gate: no streaming agg
    // above an event-time-timeout stateful op — the zero-state
    // foreachBatch fold is the documented (and cheaper) composition
    if (horizon.isDefined && docs.isStreaming)
      throw new IllegalArgumentException(
        "horizon gate over a stream: run fpVerdicts(...) inside " +
          "foreachBatch and fold batch-locally (a document's fp " +
          "verdicts all share its micro-batch — WinnowGateSpec pins it)")
    fpVerdicts(docs, textCol, idCol, k, w, seed, horizon)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fps"),
        sum(when(col("collided"), 1L).otherwise(0L)).as("n_dup"))
      .withColumn("admitted",
        col("n_dup").cast("double") / col("n_fps") <= maxDupFrac)
  }
}
