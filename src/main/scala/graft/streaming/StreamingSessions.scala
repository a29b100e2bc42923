package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
