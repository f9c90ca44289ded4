package graft.streaming

/** Bounded-state contract for the streaming gates ([[NearDupGate]],
  * [[SemGate]]): dedup against the last `ttl` of admitted content
  * instead of against everything ever admitted.
  *
  * The unbounded gates hold corpus-curation memory — state that by
  * definition never expires and therefore grows with the corpus (their
  * documented never-evict contract). That is correct for bounded streams
  * and seeded clusters, but it is also the one streaming family that
  * does not survive an unbounded 100× ingest by itself. A horizon makes
  * the trade explicit: a re-delivered shape is suppressed only while it
  * keeps re-appearing within `ttl` of its last sighting (sliding
  * expiry, the crawler-cache semantics); after `ttl` of silence its
  * state row is EVICTED via an event-time timeout and the shape would
  * be admitted again. Full-history dedup remains the batch path's job
  * against the persisted store ([[graft.operators.Dedup.againstCorpus]]
  * / [[graft.operators.SemDedup.againstCorpus]]) — the horizon gate is
  * the stream-side recency filter in front of it, with state bounded by
  * the distinct shapes seen per `ttl` window instead of ever.
  *
  * @param tsCol event-time column (TimestampType) of the document stream
  * @param ttl   suppression window, e.g. "24 hours" (Scala Duration
  *              syntax); state for a shape is dropped after this much
  *              event time passes without a sighting
  * @param watermarkDelay how late data may arrive (standard Structured
  *              Streaming watermark delay applied to `tsCol`); rows
  *              later than this are dropped by the engine before the
  *              gate sees them
  */
final case class Horizon(tsCol: String, ttl: String,
                         watermarkDelay: String = "0 seconds") {
  val ttlMs: Long = scala.concurrent.duration.Duration(ttl).toMillis
  require(ttlMs > 0, s"horizon ttl must be positive: $ttl")
}
