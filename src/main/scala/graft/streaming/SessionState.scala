package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Exact-parity session semantics with the reference (reference:
  * pspf/stream.py:415-451 and docs/state.md:34-45): one ACTIVE session
  * record per key `{start, last, agg}`; an event within `gap` of `last`
  * extends it, otherwise the old session is silently replaced by a fresh
  * one (the reference never emits closed sessions — divergent from
  * Spark's `session_window`, which emits finalized sessions and is the
  * better default, used by SessionWindow/w3_session_window).
  */
object SessionState {

  case class ActiveSession(start: Double, last: Double, agg: Double)
  implicit val activeSessionEncoder: Encoder[ActiveSession] = Encoders.product[ActiveSession]

  /** Per-key active-session fold, emitting the updated active session
    * each trigger. Events within a batch are folded in event-time order
    * (the reference processes one message at a time; batch order must be
    * normalized to match). */
  def activeSessions[K: Encoder](
      ds: Dataset[(K, Double, Double)], // (key, tsSec, value)
      gapSec: Double)(
      implicit out: Encoder[(K, ActiveSession)]): Dataset[(K, ActiveSession)] =
    ds.groupByKey(_._1)
      .mapGroupsWithState[ActiveSession, (K, ActiveSession)](GroupStateTimeout.NoTimeout()) {
        (k: K, events: Iterator[(K, Double, Double)], state: GroupState[ActiveSession]) =>
          val sorted = events.toSeq.sortBy(_._2)
          val next = sorted.foldLeft(state.getOption) {
            case (None, (_, ts, v)) => Some(ActiveSession(ts, ts, v))
            case (Some(s), (_, ts, v)) =>
              if (ts - s.last <= gapSec) Some(ActiveSession(s.start, math.max(s.last, ts), s.agg + v))
              else Some(ActiveSession(ts, ts, v)) // stale session replaced, never emitted
          }.get
          state.update(next)
          (k, next)
      }
}
