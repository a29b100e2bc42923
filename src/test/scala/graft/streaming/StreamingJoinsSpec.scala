package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Watermarked stream-stream interval join: conversions attribute to
  * clicks within the window; clicks outside it don't match. */
class StreamingJoinsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("conversions join clicks within the attribution window only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val convs = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = StreamingJoins.withinWindow(
      convs.toDF().toDF("user_id", "conv_id", "conv_ts"),
      clicks.toDF().toDF("user_id", "click_id", "click_ts"),
      key = "user_id", leftTs = "conv_ts", rightTs = "click_ts",
      windowMs = 10L * 60 * 1000, delay = "5 minutes")

    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("attribution")
      .option("checkpointLocation", Files.createTempDirectory("sj-ck").toString)
      .start()

    // user 1: click at 10:00, conversions at 10:05 (in window) and 10:20
    // (outside); user 2: conversion with no prior click
    clicks.addData((1L, 100L, t(0)), (3L, 300L, t(1)))
    convs.addData((1L, 500L, t(5)), (1L, 501L, t(20)), (2L, 502L, t(6)))
    q.processAllAvailable()
    // advance both watermarks past the horizon so results finalize
    clicks.addData((8L, 999L, t(59)))
    convs.addData((9L, 998L, t(59)))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("attribution")
      .select("user_id", "conv_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(rows.toSeq == Seq((1L, 500L, 100L)),
      s"only the in-window conversion matches, got ${rows.mkString(", ")}")
  }
}
