package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming last-writer-wins merge — the reference's core batch
  * semantics (A1/A2: `SSTableDataReducer` / `MsgPackSSTableDataReducer`,
  * mapred/SSTableData.scala:45-119) applied to a live stream of column
  * writes instead of a finished SSTable set. Cassandra's read path *is*
  * this merge; running it streaming turns the engine into a continuously
  * materialized view of the newest cell versions.
  */
object StreamingLww {

  /** Latest version of each cell `(key, name)`, continuously updated —
    * Update output mode emits a cell's row whenever a newer write lands;
    * stale/out-of-order writes (ts older than current state) change
    * nothing. State is one row per live cell, Catalyst-managed — the
    * streaming twin of `SSTableOps.compactRows`. */
  def latestPerCell(writes: DataFrame): DataFrame =
    writes
      .groupBy(col("key"), col("name"))
      .agg(max_by(struct(col("value"), col("ts")), struct(col("ts"), col("value")))
        .as("_newest"))
      .select(col("key"), col("name"),
        col("_newest.value").as("value"), col("_newest.ts").as("ts"))

  final case class CellWrite(key: String, name: String, value: String, ts: Long)
  final case class CellState(value: String, ts: Long)
  final case class CellOut(key: String, name: String, value: String, ts: Long,
                           superseded: Long)

  /** Custom-state variant via `mapGroupsWithState`: same LWW rule, plus
    * semantics the declarative agg can't express — counts how many
    * writes each cell discarded (`superseded`, a compaction-debt signal)
    * and evicts idle cells by processing-time timeout (`ttlMs` > 0) the
    * way Cassandra expires gc_grace state; the built-in agg would hold
    * every cell forever. */
  def latestPerCellWithState(writes: Dataset[CellWrite], ttlMs: Long = 0L)
      : Dataset[CellOut] = {
    import writes.sparkSession.implicits._
    val timeoutConf =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    writes
      .groupByKey(w => (w.key, w.name))
      .mapGroupsWithState[(CellState, Long), CellOut](timeoutConf) {
        case ((key, name), ws, state) =>
          if (state.hasTimedOut) {
            val (s, n) = state.get
            state.remove()
            CellOut(key, name, s.value, s.ts, n)
          } else {
            var (cur, dropped) = state.getOption.getOrElse((null: CellState, 0L))
            ws.foreach { w =>
              if (cur == null) cur = CellState(w.value, w.ts)
              else if (w.ts > cur.ts || (w.ts == cur.ts && w.value > cur.value)) {
                cur = CellState(w.value, w.ts); dropped += 1
              } else dropped += 1
            }
            state.update((cur, dropped))
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            CellOut(key, name, cur.value, cur.ts, dropped)
          }
      }
  }
}
