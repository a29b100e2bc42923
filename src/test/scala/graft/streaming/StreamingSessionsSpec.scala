package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming sessionization asserted via MemoryStream + memory sink
  * (SURVEY.md §2.8: streaming variant non-oracled, asserted via sink
  * counts). */
class StreamingSessionsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("gap sessions close after watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")

    val q = StreamingSessions.sessionize(events, gap = "10 minutes", watermark = "5 minutes")
      .writeStream.outputMode("append").format("memory").queryName("sessions")
      .option("checkpointLocation", Files.createTempDirectory("ss-ck").toString)
      .start()

    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    // user 1: two events 3 min apart (one session), then a 30-min gap
    input.addData((1L, t(0), 1.0), (1L, t(3), 2.0))
    q.processAllAvailable()
    input.addData((1L, t(40), 5.0)) // advances watermark past session 1
    q.processAllAvailable()
    input.addData((1L, t(59), 1.0)) // push watermark further
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sessions")
      .select("user_id", "n_events", "value_sum").as[(Long, Long, Double)].collect()
    // first session (10:00–10:03, 2 events, sum 3.0) must have sealed
    assert(out.contains((1L, 2L, 3.0)), s"got ${out.mkString(", ")}")
  }

  test("streaming sessionization equals batch q_session_windows on sf0.001 (oracle twin)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Params
    val gapMs = Params.SessionGapMs
    val d = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, d).select("user_id", "ts_ms", "value")
      .as[(Long, Long, Double)].collect()
    // verified: the dataset has no intra-user gap EXACTLY == gapMs (batch
    // gapBuckets merges a boundary gap, session_window starts a new
    // session there — the one semantic the two forms disagree on)
    val batch = graft.operators.SessionQueries
      .sessionize(graft.Tables.events(spark, d).select("user_id", "ts_ms", "value"), gapMs)
      .select(col("user_id"), col("session_start_ms"), col("session_end_ms"),
        col("n_events"), col("value_sum_e4"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet

    val input = MemoryStream[(Long, Long, Double)]
    val events = input.toDF().toDF("user_id", "ts_ms", "value")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val q = StreamingSessions.sessionize(events,
        gap = s"$gapMs milliseconds", watermark = "0 seconds")
      .writeStream.outputMode("append").format("memory").queryName("sess_twin")
      .option("checkpointLocation", Files.createTempDirectory("twin-ck").toString)
      .start()
    input.addData(ev.toSeq)
    q.processAllAvailable()
    // sentinel batches (excluded user -1) push the watermark beyond every
    // real session's end so append mode seals them all
    val far = ev.map(_._2).max + 86400000L
    input.addData((-1L, far, 0.0))
    q.processAllAvailable()
    input.addData((-1L, far + 86400000L, 0.0))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sess_twin").filter(col("user_id") >= 0)
      .select(col("user_id"), unix_millis(col("session_start")),
        // session_window.end = last event + gap; batch reports last event
        unix_millis(col("session_end")) - gapMs,
        col("n_events"), Params.e4(col("value_sum")))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == batch,
      s"streaming != batch: only-streaming=${(got -- batch).take(3)} only-batch=${(batch -- got).take(3)}")
  }

  test("flatMapGroupsWithState sessionizer closes sessions on gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingSessions.{ClosedSession, Ev}
    val input = MemoryStream[Ev]
    val q = StreamingSessions.sessionizeWithState(input.toDS(), gapMs = 10 * 60 * 1000)
      .writeStream.outputMode("append").format("memory").queryName("fmgs")
      .option("checkpointLocation", Files.createTempDirectory("fmgs-ck").toString)
      .start()

    val t0 = 1700000000000L
    input.addData(Ev(1, t0, 1.0), Ev(1, t0 + 60000, 2.0))
    q.processAllAvailable()
    // a 30-min-later event closes the first session within the batch
    input.addData(Ev(1, t0 + 30 * 60 * 1000, 5.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("fmgs").as[ClosedSession].collect()
    assert(out.contains(ClosedSession(1L, t0, t0 + 60000, 2L, 3.0)),
      s"got ${out.mkString(", ")}")
  }

  test("windowed counts aggregate per window and type") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")

    val q = StreamingSessions.windowedCounts(events, window = "1 hour", watermark = "1 minute")
      .writeStream.outputMode("append").format("memory").queryName("wc")
      .option("checkpointLocation", Files.createTempDirectory("wc-ck").toString)
      .start()

    def t(h: Int, min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$min%02d:00")
    input.addData((t(10, 0), "click", 1.0), (t(10, 30), "click", 2.0), (t(10, 45), "view", 1.0))
    q.processAllAvailable()
    input.addData((t(12, 0), "click", 1.0)) // seal the 10:00 window
    q.processAllAvailable()
    q.stop()

    val out = spark.table("wc").select("event_type", "n").as[(String, Long)].collect().toSet
    assert(out.contains(("click", 2L)), s"got $out")
    assert(out.contains(("view", 1L)), s"got $out")
  }
}
