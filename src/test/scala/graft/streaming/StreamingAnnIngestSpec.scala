package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AnnIndex

/** Streaming ANN ingest — the maintainer symmetry table's last cell
  * (VERDICT r14 #5). Pinned: streamed encoding is BIT-IDENTICAL to the
  * batch CALL's over the same delta (same persisted quantizers, same
  * assignment rule), historical and in-batch duplicates are dropped,
  * an epoch replay is idempotent, self-maintenance bounds generations,
  * and the epoch-pin/dimension/id-range refusals fire BEFORE anything
  * lands. */
class StreamingAnnIngestSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val warehouse: String =
    Files.createTempDirectory("graft-annin").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s.conf.set("spark.sql.catalog.graft_ai",
      classOf[graft.sources.sstable.spark.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_ai.warehouse", warehouse)
    s.sql("CREATE NAMESPACE graft_ai.ann")
    s
  }

  private def build(table: String): Unit =
    // store_vectors: the parity pin below then also proves streamed
    // ingest persists the raw vector bits identically to the batch CALL
    // (the covering property follows the stream, round 15)
    spark.sql(s"CALL graft_ai.system.build_ann_index(table => '$table', " +
      s"source_dir => '$sfDir', kind => 'ivfpq', k => 4, iters => 1, " +
      "m => 4, pq_k => 4, pq_iters => 1, where => 'vec_id % 2 = 0', " +
      "store_vectors => true)")

  private def vecsDf(where: String): DataFrame =
    graft.Tables.embeddings(spark, sfDir).filter(expr(where))
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))

  /** The served state of an index dir: (vec_id, cell, code0..3, v)
    * rows — v point-read via the covering index, so the parity compare
    * pins the raw vector bits too. */
  private def served(idx: String): Seq[String] =
    AnnIndex.loadVectorCells(spark, idx)
      .join(AnnIndex.loadVectorCodes(spark, idx, 4), "vec_id")
      .join(AnnIndex.loadVectorsFor(spark, idx,
        AnnIndex.indexedVecIds(spark, idx))
        .select(col("vec_id"), col("v")), "vec_id")
      .orderBy("vec_id").collect().map(_.toString).toSeq

  test("streamed ingest == the batch CALL, bit for bit: same persisted " +
    "quantizers, same assignment rule, same end state — with in-batch " +
    "dups, historical dups, AND an epoch replay folded in") {
    build("ann.stream")
    build("ann.batch")
    val streamIdx = s"$warehouse/ann/stream"
    val batchIdx = s"$warehouse/ann/batch"
    // batch twin: one CALL ingests everything absent
    spark.sql("CALL graft_ai.system.update_ann_index(table => " +
      s"'ann.batch', source_dir => '$sfDir')")
    // streaming twin: two epochs with an in-batch dup (union self) and
    // a historical dup (vec_id%4=1 rides both), plus already-indexed
    // even ids in the second batch
    val b1 = vecsDf("vec_id % 4 = 1")
    StreamingAnnIngest.processBatch(b1.unionAll(b1), streamIdx, 0L)
    StreamingAnnIngest.processBatch(vecsDf("vec_id % 2 = 1"), streamIdx, 1L)
    assert(served(streamIdx).nonEmpty && served(streamIdx) == served(batchIdx),
      "streamed encoding diverged from the batch CALL's")
    // replay epoch 1 (the retry shape): unpublish-then-redo lands on
    // the identical end state
    StreamingAnnIngest.processBatch(vecsDf("vec_id % 2 = 1"), streamIdx, 1L)
    assert(served(streamIdx) == served(batchIdx),
      "an epoch replay changed the served state")
  }

  test("self-maintenance bounds generations across many tiny epochs; " +
    "the served state still equals the batch twin's") {
    build("ann.maint")
    val idx = s"$warehouse/ann/maint"
    (0 until 8).foreach { i =>
      StreamingAnnIngest.processBatch(
        vecsDf(s"vec_id % 16 = ${2 * i + 1}"), idx, i.toLong,
        maintainAboveGenerations = 3)
    }
    val gens = graft.sources.sstable.LocalStorage.listDataFiles(idx).length
    assert(gens <= 3 + 2,
      s"streaming ingest left $gens generations (maintain above 3)")
    assert(served(idx) == served(s"$warehouse/ann/batch"),
      "maintenance folds changed the served state")
  }

  test("ADVICE r15 (medium): a micro-batch serializes with a lease " +
    "holder — it WAITS OUT a retraction CALL holding the index's lease " +
    "(instead of racing it into the lost-re-add interleave, or dying " +
    "on a refusal), then registers its epoch strictly ABOVE the " +
    "retraction's so its re-added vectors rise above the tombstone") {
    build("ann.leased")
    val idx = s"$warehouse/ann/leased"
    // the retraction, paused mid-flight: hold the lease the way
    // retract_ann_vectors does, with its epoch + tombstones already
    // registered (the exact state the doomed interleave read around)
    spark.sql("CALL graft_ai.system.update_ann_index(table => " +
      s"'ann.leased', source_dir => '$sfDir')")
    val r = spark.sql("CALL graft_ai.system.retract_ann_vectors(table => " +
      "'ann.leased', where => 'vec_id % 4 = 1')").head()
    assert(r.getAs[Long]("retracted") > 0, r.toString)
    val lease = graft.sources.sstable.MaintenanceLease.acquire(
      idx, graft.sources.sstable.LocalStorage, "paused-retraction")
    val done = new java.util.concurrent.atomic.AtomicLong(0L)
    val t = new Thread(() => {
      // the re-admission batch: re-streams the retracted ids
      StreamingAnnIngest.processBatch(vecsDf("vec_id % 4 = 1"), idx, 7L)
      done.set(System.currentTimeMillis())
    }, "annin-waiter")
    t.start()
    Thread.sleep(1500)
    assert(done.get() == 0L,
      "the micro-batch must BLOCK while the lease is held")
    val releasedAt = System.currentTimeMillis()
    lease.release()
    t.join(120000)
    assert(done.get() >= releasedAt,
      "the micro-batch must complete after the holder releases")
    // the re-added vectors serve again: epoch ordering put their cells
    // above the retraction's tombstone
    val ids = AnnIndex.indexedVecIds(spark, idx)
      .collect().map(_.getLong(0)).toSet
    val want = graft.Tables.embeddings(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids == want,
      s"re-admitted ids missing: ${(want -- ids).take(5)}")
  }

  test("refusals fire BEFORE anything lands: a meta-less directory, a " +
    "dimension drift, an out-of-range vec_id, and a foreign epoch pin") {
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    val sp = spark
    import sp.implicits._
    // meta-less: an empty sstable dir is not an index
    val bare = Files.createTempDirectory("annin-bare").toString
    spark.range(1).select(lit("x").cast("binary").as("key"),
      array(struct(lit("c").cast("binary").as("name"), lit("NORMAL").as("state"),
        lit("1").cast("binary").as("value"), lit(1L).as("timestamp"),
        lit(0L).as("ttlSecs"), lit(0L).as("expiresMillis"))).as("columns"))
      .write.format("sstable").mode("append").save(bare)
    val e1 = intercept[Exception](StreamingAnnIngest.processBatch(
      vecsDf("vec_id % 2 = 1"), bare, 0L))
    assert(chain(e1).exists(_.contains("build_ann_index")), chain(e1))

    build("ann.refuse")
    val idx = s"$warehouse/ann/refuse"
    val e2 = intercept[Exception](StreamingAnnIngest.processBatch(
      Seq((999L, Seq(1.0, 2.0))).toDF("vec_id", "v"), idx, 0L))
    assert(chain(e2).exists(_.contains("dimension")), chain(e2))
    val e3 = intercept[Exception](StreamingAnnIngest.processBatch(
      Seq((1000000000000L, Seq.fill(8)(1.0))).toDF("vec_id", "v"), idx, 0L))
    assert(chain(e3).exists(_.contains("[0, 1e12)")), chain(e3))
    val e4 = intercept[Exception](StreamingAnnIngest.processBatch(
      vecsDf("vec_id % 2 = 1"), idx, 0L,
      expectEpoch = Map("k" -> "999")))
    assert(chain(e4).exists(_.contains("different epoch")), chain(e4))
    // nothing landed: the index still serves only the built slice
    assert(AnnIndex.loadVectorCells(spark, idx).count() ==
      graft.Tables.embeddings(spark, sfDir).filter("vec_id % 2 = 0").count())
  }
}
