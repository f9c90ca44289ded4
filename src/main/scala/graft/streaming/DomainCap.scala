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
  */
object DomainCap {

  case class Kept(doc_id: Long, domain: String)

  def cap(docs: DataFrame, urlCol: String, idCol: String, tsCol: String,
          n: Int): DataFrame = {
    require(n >= 1, s"cap must be positive: $n")
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
            // event-time order converges to the batch answer
            val admitted = rows.toSeq.sortBy(r => (r._3.getTime, r._2)).take(room)
            state.update(kept + admitted.length)
            admitted.map(r => Kept(r._2, domain)).iterator
        }.toDF()
    }
  }
}
