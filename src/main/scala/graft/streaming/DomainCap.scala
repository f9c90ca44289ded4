package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.UrlOps

/** Streaming twin of [[graft.operators.UrlOps.capPerDomain]] — the one
  * prep stage that previously had no incremental form: admit at most `n`
  * documents per domain over the life of the stream, first-come by
  * (event time, id).
  *
  * State is ONE counter per domain (`flatMapGroupsWithState`, the
  * Sessionize primitive): ~16 bytes per distinct domain in the state
  * store, i.e. bounded by the domain universe, not by stream length —
  * 10^8 crawl domains is ~gigabytes across a cluster's state stores.
  * The counter deliberately does NOT expire on a watermark: a domain's
  * quota is a corpus-curation budget, and evicting an idle domain's
  * counter would silently re-admit `n` more documents the next time it
  * appears — the cap must remember every domain it has ever admitted,
  * and a long's worth of memory per domain is the honest price of that
  * contract. (The dedup stage in [[DocPrep]] differs: a re-delivered
  * fingerprint stops mattering once its horizon passes, so THERE the
  * watermark bound is the right semantics.)
  *
  * In batch the same call degenerates to the deterministic window cap
  * (first `n` per domain by (ts, id)); UrlStreamSpec pins batch ==
  * stream on the same data. Output: (doc_id, domain) — the admitted
  * ids; join payloads back on the id, which stays a narrow key join.
  *
  * Equivalence contract (public, not just an inline note): stream ==
  * batch holds when micro-batches arrive in EVENT-TIME order — within a
  * micro-batch admission is (event time, id)-ordered, but a row arriving
  * in a LATER micro-batch than a larger-timestamp rival cannot reclaim an
  * already-spent admission, so late data diverges from the batch window's
  * answer (by design: an admission is an irrevocable budget spend, and
  * there is no watermark that could buy reordering without evicting the
  * cap state — see the no-expiry note above). `idCol` must already be an
  * integral column: the cast to long is validated up front and non-castable
  * id TYPES fail fast (the InvertedIndex discipline) instead of silently
  * becoming null doc_ids. Per-group memory is O(cap): admission runs a
  * bounded selection (size-`room` heap), never a whole-micro-batch sort.
  */
object DomainCap {

  case class Kept(doc_id: Long, domain: String)
  case class KeptW(doc_id: Long, domain: String, win_start: Long)

  def cap(docs: DataFrame, urlCol: String, idCol: String, tsCol: String,
          n: Int): DataFrame = {
    require(n >= 1, s"cap must be positive: $n")
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    docs.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => // ok
      case other => throw new IllegalArgumentException(
        s"DomainCap id column '$idCol' must be an integral type, got " +
          s"${other.simpleString} — a lossy cast would silently null doc_ids")
    }
    val spark = docs.sparkSession
    import spark.implicits._
    val keyed = docs.select(
      UrlOps.domainOf(col(urlCol)).as("domain"),
      col(idCol).cast("long").as("doc_id"),
      col(tsCol).cast("timestamp").as("ts"))
    if (!docs.isStreaming) {
      val w = Window.partitionBy(col("domain")).orderBy(col("ts"), col("doc_id"))
      keyed.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= n)
        .select(col("doc_id"), col("domain"))
    } else {
      implicit val keptEnc = Encoders.product[Kept]
      keyed.as[(String, Long, java.sql.Timestamp)]
        .groupByKey(_._1)
        .flatMapGroupsWithState[Long, Kept](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          (domain: String, rows: Iterator[(String, Long, java.sql.Timestamp)],
           state: GroupState[Long]) =>
            val kept = state.getOption.getOrElse(0L)
            val room = math.max(0L, n - kept).toInt
            // within a micro-batch, admission order is (event time, id) —
            // the same order the batch window uses, so a stream fed in
            // event-time order converges to the batch answer. The `room`
            // smallest rows come from a bounded max-heap (O(cap) memory),
            // not a whole-group sort: one domain's micro-batch group can
            // be arbitrarily large, the cap never is.
            val heap = new scala.collection.mutable.PriorityQueue[(Long, Long)]()(
              Ordering.Tuple2[Long, Long])
            if (room > 0) rows.foreach { r =>
              val k = (r._3.getTime, r._2)
              if (heap.size < room) heap.enqueue(k)
              else if (Ordering.Tuple2[Long, Long].lt(k, heap.head)) {
                heap.dequeue(); heap.enqueue(k)
              }
            } else rows.foreach(_ => ()) // drain: quota already spent
            val admitted = heap.toSeq
            state.update(kept + admitted.length)
            admitted.map(k => Kept(k._2, domain)).iterator
        }.toDF()
    }
  }

  /** Windowed budget — at most `n` documents per domain per TUMBLING
    * event-time window of `every`: the bounded-state twin of [[cap]].
    * Where the lifetime cap's counter must never evict (expiry would
    * silently re-admit), a windowed budget EXPIRES BY DEFINITION: once
    * the watermark passes a window's end plus the late allowance, its
    * counter is removed via event-time timeout, so state is live
    * windows × active domains — independent of both stream length and
    * the historical domain universe. This is the rate-limit /
    * freshness-balancing semantics ("n per domain per day"), not a
    * corpus-lifetime quota; compose with [[cap]] when both are wanted.
    *
    * Late rows (arriving after their window's budget closed) are
    * DROPPED, not re-admitted: the counter is gone, and conservatively
    * refusing is the only answer that can't overspend the budget. In
    * batch the same call degenerates to a window cap partitioned by
    * (domain, window), first n by (ts, id) — UrlStreamSpec pins batch ==
    * stream on event-time-ordered feeds, and that expired windows'
    * counters leave the state store. Output: (doc_id, domain, win_start)
    * with win_start in epoch millis. */
  def capPerWindow(docs: DataFrame, urlCol: String, idCol: String,
                   tsCol: String, n: Int, every: String,
                   watermarkDelay: String = "0 seconds"): DataFrame = {
    require(n >= 1, s"cap must be positive: $n")
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    docs.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => // ok
      case other => throw new IllegalArgumentException(
        s"DomainCap id column '$idCol' must be an integral type, got " +
          s"${other.simpleString} — a lossy cast would silently null doc_ids")
    }
    val everyMs = scala.concurrent.duration.Duration(every).toMillis
    require(everyMs > 0, s"window length must be positive: $every")
    val delayMs = scala.concurrent.duration.Duration(watermarkDelay).toMillis
    val spark = docs.sparkSession
    import spark.implicits._
    val input =
      if (docs.isStreaming) docs.withWatermark(tsCol, watermarkDelay) else docs
    // win_start stays integral (pmod, not fractional division); the raw
    // ts column rides along as a plain alias so its watermark metadata
    // reaches the stateful operator
    val tsMs = unix_millis(col(tsCol).cast("timestamp"))
    val keyed = input.select(
      UrlOps.domainOf(col(urlCol)).as("domain"),
      col(idCol).cast("long").as("doc_id"),
      col(tsCol).as("ts"),
      (tsMs - pmod(tsMs, lit(everyMs))).as("win_start"))
    if (!docs.isStreaming) {
      val w = Window.partitionBy(col("domain"), col("win_start"))
        .orderBy(col("ts"), col("doc_id"))
      keyed.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= n)
        .select(col("doc_id"), col("domain"), col("win_start"))
    } else {
      implicit val keptEnc = Encoders.product[KeptW]
      keyed.as[(String, Long, java.sql.Timestamp, Long)]
        .groupByKey(r => (r._1, r._4))
        .flatMapGroupsWithState[Long, KeptW](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
          (key: (String, Long), rows: Iterator[(String, Long, java.sql.Timestamp, Long)],
           state: GroupState[Long]) =>
            if (state.hasTimedOut) { state.remove(); Iterator.empty }
            else {
              val wm = state.getCurrentWatermarkMs()
              val closesAt = key._2 + everyMs + delayMs
              if (closesAt <= wm) {
                // the window's budget already closed (its counter may be
                // long gone) — refusing late rows is the only answer
                // that cannot overspend it
                rows.foreach(_ => ())
                if (state.exists) state.remove()
                Iterator.empty
              } else {
                val kept = state.getOption.getOrElse(0L)
                val room = math.max(0L, n - kept).toInt
                val heap = new scala.collection.mutable.PriorityQueue[(Long, Long)]()(
                  Ordering.Tuple2[Long, Long])
                if (room > 0) rows.foreach { r =>
                  val k = (r._3.getTime, r._2)
                  if (heap.size < room) heap.enqueue(k)
                  else if (Ordering.Tuple2[Long, Long].lt(k, heap.head)) {
                    heap.dequeue(); heap.enqueue(k)
                  }
                } else rows.foreach(_ => ())
                val admitted = heap.toSeq
                state.update(kept + admitted.length)
                state.setTimeoutTimestamp(math.max(closesAt, wm + 1))
                admitted.map(k => KeptW(k._2, key._1, key._2)).iterator
              }
            }
        }.toDF()
    }
  }
}
