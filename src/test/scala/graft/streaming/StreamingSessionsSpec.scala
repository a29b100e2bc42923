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
