package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream temporal joins — the streaming twin of
  * [[graft.operators.TemporalJoins]], built on Spark's native watermarked
  * stream-stream join (no custom state): each side carries a watermark
  * and the join condition bounds event-time distance, so Spark can drop
  * state older than the horizon. This is exactly the shape Structured
  * Streaming was designed to optimize — declarative range condition in,
  * bounded state management out.
  *
  * Scale notes: state per side is bounded by (watermark horizon ×
  * arrival rate); the join itself shuffles both streams on the key —
  * one exchange per side, same as the batch equi-join. Without the
  * time-range condition Spark would have to keep ALL past rows; the
  * `BETWEEN` bound is what makes the state finite, so it is required
  * here (enforced by the watermarks being mandatory for append mode).
  */
object StreamingJoins {

  /** Join each left event to right events with the same `key` whose
    * `rightTs` lies within `[leftTs - windowMs, leftTs]` — "attribute
    * each conversion to the clicks at most windowMs before it".
    * Timestamp columns must be TIMESTAMP-typed and distinctly named
    * across the two sides; both watermarks are set to `delay`. Inner
    * join: unmatched left rows drop (append-mode emittable once both
    * watermarks pass). */
  def withinWindow(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   windowMs: Long, delay: String): DataFrame = {
    val l = left.withWatermark(leftTs, delay)
    val r = right.withWatermark(rightTs, delay).withColumnRenamed(key, s"_r_$key")
    // millisecond-granular bound: `INTERVAL ${ms/1000} SECOND` would
    // silently truncate a non-multiple-of-1000 window (ADVICE r2 low)
    l.join(r,
      col(key) === col(s"_r_$key") &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $windowMs MILLISECOND") &&
        col(rightTs) <= col(leftTs))
      .drop(s"_r_$key")
  }
}
