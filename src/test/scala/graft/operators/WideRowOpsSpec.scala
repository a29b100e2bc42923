package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.Tables

/** WideRowOps unit tests — in particular the salted two-phase merge must
  * agree exactly with the plain aggregation (associativity of max_by). */
class WideRowOpsSpec extends AnyFunSuite {

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

  test("latestPerKeySalted == latestPerKey on real events (any bucket count)") {
    val e = Tables.events(spark, sfDir).select("user_id", "event_type", "ts_ms", "value")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "event_type", "ts_ms", "value")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2))
    val plain = canon(WideRowOps.latestPerKey(e, Seq("user_id"), "ts_ms", Seq("event_type")))
    for (buckets <- Seq(1, 7, 32)) {
      val salted = canon(WideRowOps.latestPerKeySalted(
        e, Seq("user_id"), "ts_ms", Seq("event_type"), buckets))
      assert(salted.toSeq == plain.toSeq, s"divergence at buckets=$buckets")
    }
  }

  test("gapBuckets partitions independently per partition column") {
    val e = Tables.events(spark, sfDir).select("user_id", "ts_ms")
    val bucketed = WideRowOps.gapBuckets(e, "ts_ms", 30L * 60 * 1000, Seq("user_id"))
    // buckets are contiguous 0..n per user
    val perUser = bucketed.groupBy("user_id")
      .agg(min("bucket").as("lo"), countDistinct("bucket").as("n"), max("bucket").as("hi"))
      .collect()
    perUser.foreach { r =>
      assert(r.getLong(1) == 0L, "buckets must start at 0")
      assert(r.getLong(3) == r.getLong(2) - 1, "buckets must be contiguous")
    }
  }
}
