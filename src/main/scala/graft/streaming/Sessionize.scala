package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful gap-sessionization for continuous event streams
  * (`flatMapGroupsWithState` — the custom-state primitive the batch
  * window form in q12 cannot express incrementally).
  *
  * Semantics match q12_sessionize: a session is a maximal run of a user's
  * events with inter-event gaps <= `gapMs`. Sessions close two ways:
  *  - data-driven: a new event arrives past the gap -> the previous
  *    session is emitted immediately;
  *  - time-driven: the event-time watermark passes last_event + gap ->
  *    the open session times out and is emitted (EventTimeTimeout), which
  *    bounds state size: each user holds exactly one open session, and
  *    idle users are evicted by the watermark. At 100 TB/day of events
  *    the state store holds O(active users), not O(events).
  */
object Sessionize {

  case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class OpenSession(start: Long, last: Long, n: Long, total: Double)
  case class Session(user_id: Long, start_ms: Long, end_ms: Long,
                     n_events: Long, total_value: Double)

  def apply(events: Dataset[Event], gapMs: Long,
            watermarkDelay: String = "10 seconds"): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val longEnc = Encoders.scalaLong
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(user, s.start, s.last, s.n, s.total))
          } else {
            var closed = List.empty[Session]
            var cur = state.getOption
            batch.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last > gapMs =>
                  closed ::= Session(user, s.start, s.last, s.n, s.total)
                  cur = Some(OpenSession(t, t, 1, e.value))
                case Some(s) =>
                  cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1,
                    total = s.total + e.value))
                case None =>
                  cur = Some(OpenSession(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
