package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state sessionization over the events stream: gap-based user
  * sessions via `flatMapGroupsWithState` — the operator shape for state
  * Spark's built-in windows can't express (variable-length sessions
  * emitted on close, explicit timeout handling).
  *
  * State design for unbounded runs: one small [[SessionState]] per
  * active user, closed and emitted either by an in-stream gap or by an
  * event-time timeout once the watermark passes `last + gap` — so state
  * size is bounded by concurrently-active users, not history. (The
  * built-in `session_window` covers the common aggregate case; this
  * operator exists for custom per-session payloads and demonstrates the
  * `GroupState` API on event-time timeouts.)
  */
object Sessionize {

  /** Session gap: a new event more than this after the previous one
    * starts a new session.
    */
  val GapMinutes = 30L
  private val GapUs = GapMinutes * 60 * 1000000L

  // Microsecond precision throughout: the event fixtures carry
  // sub-millisecond timestamps, and `Timestamp.getTime` (ms) would both
  // truncate emitted session bounds and misjudge gaps within 1 ms of
  // the boundary. DateTimeUtils is Spark's own Timestamp↔micros codec.
  private def us(t: Timestamp): Long =
    org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t)
  private def ts(us: Long): Timestamp =
    org.apache.spark.sql.catalyst.util.DateTimeUtils.toJavaTimestamp(us)

  final case class Event(
      user_id: Long, ts: Timestamp, value: Double, event_id: Long)

  final case class SessionState(
      start: Long, last: Long, n_events: Int, sum_value: Double)

  final case class UserSession(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Int, sum_value: Double)

  /** Flat-map one user's new events (plus state) to zero or more closed
    * sessions. Events inside a batch are sorted by time — Spark does not
    * guarantee per-group iterator order.
    */
  def step(userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[UserSession] = {
    def close(s: SessionState): UserSession =
      UserSession(userId, ts(s.start), ts(s.last),
        s.n_events, math.round(s.sum_value * 100).toDouble / 100)

    if (events.isEmpty && state.hasTimedOut) {
      val out = state.getOption.map(close).toList
      state.remove()
      return out.iterator
    }

    // (ts, event_id) — equal-timestamp events otherwise keep Spark's
    // nondeterministic per-group iterator order, and sum_value's float
    // accumulation order would vary run-to-run. Micros are computed once
    // per event and compared primitively: `sortBy` would re-run the
    // Timestamp→micros conversion and allocate a tuple key on every
    // comparison — measurable across millions of groups.
    val keyed = events.map(e => (us(e.ts), e)).toArray
    java.util.Arrays.sort(keyed, new java.util.Comparator[(Long, Event)] {
      def compare(a: (Long, Event), b: (Long, Event)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(a._2.event_id, b._2.event_id)
      }
    })
    var cur = state.getOption.orNull
    val closed = List.newBuilder[UserSession]
    keyed.foreach { case (t, e) =>
      if (cur == null) {
        cur = SessionState(t, t, 1, e.value)
      } else if (t - cur.last > GapUs) {
        closed += close(cur)
        cur = SessionState(t, t, 1, e.value)
      } else {
        cur = SessionState(cur.start, math.max(cur.last, t),
          cur.n_events + 1, cur.sum_value + e.value)
      }
    }
    if (cur != null) {
      state.update(cur)
      // event-time timeout: fire once the watermark passes last + gap
      // (GroupState timeouts are millisecond-granular)
      state.setTimeoutTimestamp((cur.last + GapUs) / 1000)
    }
    closed.result().iterator
  }

  /** Sessionize a (possibly streaming) events relation. Input needs
    * `user_id`, `ts`, `value`; `event_id` (when present) breaks
    * equal-timestamp ties deterministically. A streaming input must
    * already carry a watermark on `ts`.
    */
  def sessions(events: DataFrame): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val eid =
      if (events.columns.contains("event_id")) col("event_id")
      else lit(0L).as("event_id")
    events.select(col("user_id"), col("ts"), col("value"), eid).as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(step)
  }
}
