package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twin of the batch sessionizer (SURVEY.md §2.8
  * q_session_windows — "streaming variant non-oracled"): gap-based session
  * windows over the events stream with a watermark for state eviction.
  *
  * The reference is batch-only MR (SURVEY.md §2.6 — no streaming
  * analogue); this is north-star capability. Uses the built-in
  * `session_window` (dynamic gap close) rather than custom
  * `flatMapGroupsWithState` — Catalyst manages the session-merge state
  * store, which scales with active users only (bounded by the watermark),
  * not total history.
  */
object StreamingSessions {

  /** `events` must carry (user_id, ts: timestamp, value). Emits one row
    * per closed session: user_id, session_start/end, n_events, value_sum.
    * Watermark = how late events may arrive before a session seals. */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
                 watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("value_sum"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("value_sum"))

  final case class Ev(user_id: Long, tsMs: Long, value: Double)
  final case class SessionState(startMs: Long, endMs: Long, n: Long, sum: Double)
  final case class ClosedSession(user_id: Long, session_start_ms: Long,
                                 session_end_ms: Long, n_events: Long, value_sum: Double)

  /** Custom-state sessionizer via `flatMapGroupsWithState` — the
    * hand-rolled alternative to [[sessionize]] for semantics
    * `session_window` can't express (e.g. emitting on event-count caps,
    * custom merge rules). State per active user only; sessions close by
    * event-time gap within a batch or by processing-time timeout for
    * stragglers. Kept alongside the declarative form to cover the full
    * Structured Streaming state surface (Dataset API, GroupState). */
  def sessionizeWithState(events: Dataset[Ev], gapMs: Long,
                          maxEvents: Int = Int.MaxValue,
                          stragglerTimeout: Boolean = false): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    // ProcessingTimeTimeout (stragglerTimeout=true) seals idle users'
    // sessions in production; left off by default because timeout checks
    // keep triggering micro-batches, which spins test harnesses that
    // drain with processAllAvailable().
    val timeoutConf =
      if (stragglerTimeout) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, timeoutConf) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              ClosedSession(user, s.startMs, s.endMs, s.n, s.sum)).toList
            state.remove()
            out.iterator
          } else {
            val sorted = evs.toVector.sortBy(_.tsMs)
            val closed = Vector.newBuilder[ClosedSession]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.tsMs - s.endMs <= gapMs && s.n < maxEvents =>
                  cur = Some(SessionState(s.startMs, e.tsMs, s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed += ClosedSession(user, s.startMs, s.endMs, s.n, s.sum)
                  cur = Some(SessionState(e.tsMs, e.tsMs, 1, e.value))
                case None =>
                  cur = Some(SessionState(e.tsMs, e.tsMs, 1, e.value))
              }
            }
            cur.foreach(state.update)
            if (stragglerTimeout) state.setTimeoutDuration(gapMs)
            closed.result().iterator
          }
      }
  }

  /** Tumbling-window event counts with watermark — the second streaming
    * shape the harness exercises (SURVEY.md §2.6 note). */
  def windowedCounts(events: DataFrame, window: String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("value_sum"))
      .select(col("event_type"), col("window.start").as("window_start"),
        col("n"), col("value_sum"))
}
