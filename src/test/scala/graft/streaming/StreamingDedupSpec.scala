package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming dedup asserted via MemoryStream + memory sink (non-oracled,
  * like the other streaming surfaces). */
class StreamingDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("exact streaming dedup drops re-arriving content within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")

    val q = StreamingDedup.exactDedup(docs, watermark = "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("dedup_exact")
      .option("checkpointLocation", Files.createTempDirectory("sd-ck").toString)
      .start()

    input.addData((1L, "the quick brown fox", t(0)), (2L, "some other text", t(1)))
    q.processAllAvailable()
    // doc 3 duplicates doc 1's content within the watermark -> dropped
    input.addData((3L, "the quick brown fox", t(5)), (4L, "fresh content here", t(6)))
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("dedup_exact").select("doc_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 4L), s"got ${ids.mkString(", ")}")
  }

  test("near-dup streaming dedup collapses shingle-fingerprint collisions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")

    val q = StreamingDedup.nearDedup(docs, shingleN = 3, watermark = "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("dedup_near")
      .option("checkpointLocation", Files.createTempDirectory("sdn-ck").toString)
      .start()

    input.addData((1L, "alpha beta gamma delta", t(0)))
    q.processAllAvailable()
    // same min-shingle fingerprint class (identical shingle set) -> dropped;
    // a genuinely different text survives; a short (<3 tokens) text takes
    // the exact-content fallback and survives
    input.addData((2L, "alpha beta gamma delta", t(2)),
      (3L, "completely different words entirely", t(3)),
      (4L, "tiny text", t(4)))
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("dedup_near").select("doc_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 3L, 4L), s"got ${ids.mkString(", ")}")
  }

  test("streaming exact dedup equals batch exact dedup on sf0.001 (oracle twin)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    // batch twin = q_dedup_docs' grouping: one survivor per content digest
    val batchDigests = graft.Tables.documents(spark, d)
      .select(md5(col("text")).as("h")).distinct().as[String].collect().toSet

    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .sortBy(_._1)
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val stream = input.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingDedup.exactDedup(stream, watermark = "1 day")
      .writeStream.outputMode("append").format("memory").queryName("dedup_twin")
      .option("checkpointLocation", Files.createTempDirectory("sdt-ck").toString)
      .start()
    // all docs share one event-time instant: every duplicate is inside the
    // horizon, so the streaming survivors must be exactly one per digest
    val at = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    input.addData(docs.map { case (id, tx) => (id, tx, at) }.toIndexedSeq)
    q.processAllAvailable()
    // replaying the first 100 docs is all-duplicate content: zero new rows
    input.addData(docs.take(100).map { case (id, tx) => (id, tx, at) }.toIndexedSeq)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("dedup_twin")
      .select(md5(col("text")).as("h")).as[String].collect()
    assert(got.length == batchDigests.size,
      s"one survivor per digest: got ${got.length}, want ${batchDigests.size}")
    assert(got.toSet == batchDigests, "survivor content must cover every batch digest")
  }
}
