package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal._

/** Multimodal binary-column plumbing: schema, per-partition batch decode
  * shape, and expression/mapPartitions agreement (the decode itself is the
  * documented deterministic stub). */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("withMeta expression and decodePartitions stub agree") {
    import spark.implicits._
    val rows = (0 until 100).map(i => MediaRow(i.toLong, Array.fill(i + 1)(i.toByte)))
    val ds = spark.createDataset(rows)

    val viaExpr = withMeta(ds.toDF("doc_id", "payload"))
      .select(col("doc_id"), col("meta.byte_len"), col("meta.width"),
        col("meta.height"), col("meta.frames"))
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)

    val viaPartitions = decodePartitions(ds).collect().sortBy(_.doc_id)
      .map(r => (r.doc_id, r.meta.byte_len.toLong, r.meta.width.toLong,
        r.meta.height.toLong, r.meta.frames.toLong))

    assert(viaExpr.toSeq == viaPartitions.toSeq)
  }

  test("sampleFrames: every-Nth-frame fan-out matches the stub frame count") {
    import spark.implicits._
    // 25-byte payload -> frames = 1 + 25 % 30 = 26 -> sampled idx 0,10,20
    val ds = spark.createDataset(Seq(MediaRow(1L, Array.fill(25)(1.toByte))))
    val got = sampleFrames(ds.toDF("doc_id", "payload"), every = 10)
      .select("frame_idx", "frame_ts_ms").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((0L, 0L), (10L, 400L), (20L, 800L)))
  }

  test("extractFeatures: deterministic batch shape, partitioning preserved") {
    import spark.implicits._
    val ds = spark.createDataset((0 until 32).map(i =>
      MediaRow(i.toLong, Array.fill(i + 1)(0.toByte)))).repartition(4)
    val feats = extractFeatures(ds)
    assert(feats.rdd.getNumPartitions == 4)
    val r = feats.collect().find(_.doc_id == 9L).get // payload length 10
    assert(r.features.length == 8)
    assert(r.features(0) == ((10L * 3) % 997).toFloat / 997f)
  }

  test("decodePartitions preserves partitioning (no shuffle)") {
    import spark.implicits._
    val ds = spark.createDataset((0 until 64).map(i => MediaRow(i.toLong, Array(i.toByte))))
      .repartition(8)
    val decoded = decodePartitions(ds)
    assert(decoded.rdd.getNumPartitions == 8)
    assert(decoded.count() == 64)
  }
}
