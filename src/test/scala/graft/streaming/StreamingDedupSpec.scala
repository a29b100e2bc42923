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
}
