package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming LWW merge asserted via MemoryStream + memory sink: newest
  * write wins, out-of-order stale writes are ignored — the reference's
  * batch merge semantics (SSTableData.scala:45-119) held continuously. */
class StreamingLwwSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("update-mode LWW: newer write supersedes, stale write is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String, String, Long)]
    val writes = input.toDF().toDF("key", "name", "value", "ts")

    val q = StreamingLww.latestPerCell(writes)
      .writeStream.outputMode("update").format("memory").queryName("lww")
      .option("checkpointLocation", Files.createTempDirectory("lww-ck").toString)
      .start()

    input.addData(("r1", "email", "old@x", 100L), ("r1", "city", "aa", 10L))
    q.processAllAvailable()
    input.addData(("r1", "email", "new@x", 200L)) // newer -> supersedes
    q.processAllAvailable()
    input.addData(("r1", "email", "stale@x", 50L)) // older -> no-op
    q.processAllAvailable()
    q.stop()

    // memory sink in update mode appends each batch's updated rows; the
    // LAST row per cell is the current state
    val hist = spark.table("lww").as[(String, String, String, Long)].collect()
    val current = hist.zipWithIndex
      .groupBy { case ((k, n, _, _), _) => (k, n) }
      .map { case (cell, rows) => cell -> rows.maxBy(_._2)._1 }
    assert(current(("r1", "email"))._3 == "new@x")
    assert(current(("r1", "email"))._4 == 200L)
    assert(current(("r1", "city"))._3 == "aa")
    // the stale write re-emits the cell (update mode emits touched
    // groups) but its state must still be the newer version — no emitted
    // row ever carries the stale value
    assert(!hist.exists { case (_, _, v, _) => v == "stale@x" })
  }

  test("mapGroupsWithState LWW tracks superseded write count") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingLww.{CellOut, CellWrite}
    val input = MemoryStream[CellWrite]
    val q = StreamingLww.latestPerCellWithState(input.toDS())
      .writeStream.outputMode("update").format("memory").queryName("lww_state")
      .option("checkpointLocation", Files.createTempDirectory("lws-ck").toString)
      .start()

    input.addData(CellWrite("r1", "email", "v1", 100L))
    q.processAllAvailable()
    input.addData(CellWrite("r1", "email", "v2", 200L),
      CellWrite("r1", "email", "stale", 50L))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("lww_state").as[CellOut].collect()
    val last = out.last
    assert(last.value == "v2" && last.ts == 200L)
    assert(last.superseded == 2L) // the stale write AND the replaced v1
  }

  test("streaming latestPerCell equals the batch LWW merge on sf0.001 (oracle twin)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, d)
      .select(col("user_id").cast("string").as("key"),
        col("event_type").as("name"),
        col("value").cast("string").as("value"),
        col("ts_ms").as("ts"))
    val batch = graft.operators.WideRowOps
      .latestPerCell(ev, Seq("key"), "name", "ts")
      .select("key", "name", "value", "ts")
      .as[(String, String, String, Long)].collect().toSet

    val rows = ev.as[(String, String, String, Long)].collect()
    val input = MemoryStream[(String, String, String, Long)]
    val q = StreamingLww.latestPerCell(input.toDF().toDF("key", "name", "value", "ts"))
      .writeStream.outputMode("update").format("memory").queryName("lww_twin")
      .option("checkpointLocation", Files.createTempDirectory("lwt-ck").toString)
      .start()
    // three arrival chunks (update mode re-emits a cell whenever a newer
    // write lands); arrival order must not matter, so feed ts-descending
    rows.sortBy(-_._4).grouped(math.max(1, rows.length / 3 + 1)).foreach { chunk =>
      input.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()

    // final state per cell = the newest emission = max (ts, value)
    val got = spark.table("lww_twin")
      .groupBy("key", "name")
      .agg(max_by(struct(col("value"), col("ts")), struct(col("ts"), col("value")))
        .as("w"))
      .select(col("key"), col("name"), col("w.value"), col("w.ts"))
      .as[(String, String, String, Long)].collect().toSet
    assert(got == batch,
      s"streaming != batch: only-streaming=${(got -- batch).take(3)} only-batch=${(batch -- got).take(3)}")
  }
}
