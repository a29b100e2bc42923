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

  test("streaming withinWindow equals the batch interval join on sf0.001 (oracle twin)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val windowMs = 600000L // 10 min attribution
    val ev = graft.Tables.events(spark, d)
      .select(col("user_id"), col("event_id"), col("ts_ms"))
    val convs = ev.filter(col("event_id") % 2 === 0)
      .select(col("user_id"), col("event_id").as("conv_id"),
        timestamp_millis(col("ts_ms")).as("conv_ts"))
    val clicks = ev.filter(col("event_id") % 2 === 1)
      .select(col("user_id"), col("event_id").as("click_id"),
        timestamp_millis(col("ts_ms")).as("click_ts"))

    // batch twin: the identical range condition as a plain batch join
    val batch = convs.join(clicks.withColumnRenamed("user_id", "u2"),
        col("user_id") === col("u2") &&
          col("click_ts") >= col("conv_ts") - expr(s"INTERVAL $windowMs MILLISECOND") &&
          col("click_ts") <= col("conv_ts"))
      .select(col("conv_id"), col("click_id"))
      .as[(Long, Long)].collect().toSet

    val convIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val clickIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val q = StreamingJoins.withinWindow(
        convIn.toDF().toDF("user_id", "conv_id", "conv_ts"),
        clickIn.toDF().toDF("user_id", "click_id", "click_ts"),
        "user_id", "conv_ts", "click_ts", windowMs, delay = "0 seconds")
      .writeStream.outputMode("append").format("memory").queryName("join_twin")
      .option("checkpointLocation", Files.createTempDirectory("sjt-ck").toString)
      .start()
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, java.sql.Timestamp)].collect().toIndexedSeq
    convIn.addData(rowsOf(convs))
    clickIn.addData(rowsOf(clicks))
    q.processAllAvailable()
    // far-future sentinels (key -1 matches nothing) seal both watermarks
    val far = new java.sql.Timestamp(
      ev.agg(max(col("ts_ms"))).as[Long].head() + 86400000L)
    convIn.addData((-1L, -1L, far))
    clickIn.addData((-1L, -1L, far))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("join_twin").filter(col("user_id") >= 0)
      .select(col("conv_id"), col("click_id"))
      .as[(Long, Long)].collect().toSet
    assert(got == batch,
      s"streaming != batch: sizes ${got.size}/${batch.size}, " +
        s"only-streaming=${(got -- batch).take(3)} only-batch=${(batch -- got).take(3)}")
  }
}
