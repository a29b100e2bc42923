package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Params._

/** Gap-based sessionization of the events stream (batch SQL form; the
  * Structured Streaming twin with watermark + session_window lives in
  * graft.streaming and is asserted via tests, not the oracle — SURVEY.md
  * §2.8 q_session_windows).
  *
  * Reuses [[WideRowOps.gapBuckets]] partitioned by user — one shuffle on
  * user_id, per-partition window sort; no global ordering, so it scales
  * with user cardinality.
  */
object SessionQueries {

  def sessionize(events: DataFrame, gapMs: Long): DataFrame =
    WideRowOps.gapBuckets(events, "ts_ms", gapMs, Seq("user_id"))
      .groupBy("user_id", "bucket")
      .agg(min("ts_ms").as("session_start_ms"), max("ts_ms").as("session_end_ms"),
        count(lit(1)).as("n_events"), e4(sum("value")).as("value_sum_e4"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_session_windows" -> ((s, d) => {
      sessionize(Tables.events(s, d).select("user_id", "ts_ms", "value"), SessionGapMs)
        .select("user_id", "session_start_ms", "session_end_ms", "n_events", "value_sum_e4")
        .orderBy("user_id", "session_start_ms")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_session_windows" ->
      s"""SELECT user_id, min(ts_ms) AS session_start_ms, max(ts_ms) AS session_end_ms,
                 CAST(count(*) AS BIGINT) AS n_events, ${Params.e4Sql("sum(value)")} AS value_sum_e4
          FROM (SELECT user_id, ts_ms, value,
                       CAST(sum(CASE WHEN gap > $SessionGapMs THEN 1 ELSE 0 END)
                         OVER (PARTITION BY user_id ORDER BY ts_ms) AS BIGINT) AS bucket
                FROM (SELECT user_id, ts_ms, value,
                             ts_ms - lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms) AS gap
                      FROM ${Params.EventsSql}))
          GROUP BY user_id, bucket
          ORDER BY user_id, session_start_ms"""
  )
}
