package graft.sources.sstable.spark

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.Tables
import graft.operators.{SSTableOps, WideRowOps}

/** End-to-end semantic equivalence: the events table pushed through the
  * real SSTable path (write 4-file sets → DSv2 scan → SSTableOps LWW
  * compaction) must agree with the flat-relational path (WideRowOps over
  * parquet) — the two implementations of Cassandra merge semantics
  * cross-check each other on real harness data.
  */
class SSTableIntegrationSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("events → sstable → compact == events → flat LWW merge") {
    val dir = Files.createTempDirectory("sst-int").toString
    val events = Tables.events(spark, sfDir)

    // model: user_id = row key, event_type = column name, ts_ms = write ts,
    // value = column payload; one wide row per user per input partition
    val asRows = events.select(
      col("user_id").cast("string").cast("binary").as("key"),
      array(struct(
        col("event_type").cast("binary").as("name"),
        lit("NORMAL").as("state"),
        col("value").cast("string").cast("binary").as("value"),
        col("ts_ms").as("timestamp"),
        lit(0L).as("ttlSecs"), lit(0L).as("expiresMillis"))).as("columns"))
    asRows.write.format("sstable").mode("overwrite").save(dir)

    val viaSSTable = SSTableOps.latestColumnPerKey(
        spark.read.format("sstable").load(dir))
      .select(col("key").cast("string").cast("long").as("user_id"),
        col("c.name").cast("string").as("event_type"),
        col("c.timestamp").as("ts_ms"),
        col("c.value").cast("string").cast("double").as("value"))

    val viaFlat = WideRowOps.latestPerKey(
        events.select("user_id", "event_type", "ts_ms", "value"),
        Seq("user_id"), "ts_ms", Seq("event_type"))

    val a = viaSSTable.orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val b = viaFlat.select("user_id", "event_type", "ts_ms", "value").orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(a.length == b.length && a.length > 0)
    assert(a.toSeq == b.toSeq)
  }

  test("ttlAsOfMs reader option drops expired EXPIRING columns at scan time") {
    val dir = Files.createTempDirectory("sst-ttl").toString
    import spark.implicits._
    val src = spark.range(100).select(
      concat(lit("k"), lpad(col("id").cast("string"), 4, "0")).cast("binary").as("key"),
      array(
        struct(lit("live".getBytes).as("name"), lit("EXPIRING").as("state"),
          lit("v".getBytes).as("value"), col("id").as("timestamp"),
          lit(60L).as("ttlSecs"), lit(2000L).as("expiresMillis")),
        struct(lit("dead".getBytes).as("name"), lit("EXPIRING").as("state"),
          lit("v".getBytes).as("value"), col("id").as("timestamp"),
          lit(60L).as("ttlSecs"), lit(500L).as("expiresMillis")),
        struct(lit("norm".getBytes).as("name"), lit("NORMAL").as("state"),
          lit("v".getBytes).as("value"), col("id").as("timestamp"),
          lit(0L).as("ttlSecs"), lit(0L).as("expiresMillis"))).as("columns"))
    src.write.format("sstable").mode("overwrite").save(dir)

    // default: TTL fields surface raw, nothing filtered (reference behavior)
    val raw = spark.read.format("sstable").load(dir)
      .select(explode(col("columns")).as("c")).count()
    assert(raw == 300)

    val filtered = spark.read.format("sstable").option("ttlAsOfMs", "1000").load(dir)
      .select(explode(col("columns")).as("c"))
      .select(col("c.name").cast("string")).as[String].collect()
    assert(filtered.length == 200)
    assert(filtered.toSet == Set("live", "norm"))
  }
}
