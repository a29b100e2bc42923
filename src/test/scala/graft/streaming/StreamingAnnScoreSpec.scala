package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming routing against the persisted ANN index: each streamed
  * vector lands in the SAME cell batch encoding assigns (the fold
  * reproduces training's max-cosine/lowest-cell-tie rule), statelessly —
  * no aggregation, no watermark, append mode. */
class StreamingAnnScoreSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val warehouse = Files.createTempDirectory("sann-wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s.conf.set("spark.sql.catalog.graft_sann",
      classOf[graft.sources.sstable.spark.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_sann.warehouse", warehouse)
    s.sql("CREATE NAMESPACE graft_sann.ann")
    s.sql("CALL graft_sann.system.build_ann_index(table => 'ann.ix', " +
      s"source_dir => '$sfDir', kind => 'ivf', k => 4, iters => 2)")
    s
  }

  test("streamed vectors route to exactly the cells batch assignment " +
    "gives them; the stream is stateless (append mode, no watermark)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = s"$warehouse/ann/ix"
    val e = graft.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 40)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(graft.functions.VectorExpressions
        .vector_dot(col("v"), col("v"))))
    val expected = graft.operators.AnnIndex
      .assignCoarse(e, graft.operators.AnnIndex.loadCoarseCentroids(spark, idx))
      .collect().map(r => r.getLong(0) -> r.getAs[Number](1).intValue()).toMap
    val vecs = e.select(col("vec_id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    val input = MemoryStream[(Long, Seq[Double])]
    val queries = input.toDF().toDF("q_id", "qv")
    val routed = StreamingAnnScore.nearestCell(queries, idx,
      expectEpoch = Map("kind" -> "ivf", "k" -> "4"))
    val q = routed.select(col("q_id"), col("cell"))
      .writeStream.outputMode("append").format("memory").queryName("sann")
      .option("checkpointLocation", Files.createTempDirectory("sann-ck").toString)
      .start()
    // two micro-batches, out of order — routing is per-row, no state
    input.addData(vecs.take(25).toSeq)
    q.processAllAvailable()
    input.addData(vecs.drop(25).toSeq)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sann").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.size == vecs.length)
    assert(got == expected,
      "streamed routing diverged from batch assignment under the same index")
  }

  test("a drifted index epoch refuses at stream SETUP, before any batch") {
    val idx = s"$warehouse/ann/ix"
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Double])]
    val e = intercept[IllegalArgumentException](
      StreamingAnnScore.nearestCell(input.toDF().toDF("q_id", "qv"), idx,
        expectEpoch = Map("kind" -> "ivfpq")))
    assert(e.getMessage.contains("different epoch"), e.getMessage)
  }
}
