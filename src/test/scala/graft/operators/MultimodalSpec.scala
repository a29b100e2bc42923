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

  test("decodePartitions preserves partitioning (no shuffle)") {
    import spark.implicits._
    val ds = spark.createDataset((0 until 64).map(i => MediaRow(i.toLong, Array(i.toByte))))
      .repartition(8)
    val decoded = decodePartitions(ds)
    assert(decoded.rdd.getNumPartitions == 8)
    assert(decoded.count() == 64)
  }
}
