package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.sstable.SSTableReader

/** Incremental (historical) dedup against the SSTable signature store:
  * novelty decisions span ALL prior epochs — not a watermark horizon —
  * with point-read probes and one appended generation per epoch. */
class StreamingIncrementalDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("novelty spans epochs; replay is idempotent; compaction keeps the store probeable") {
    val store = Files.createTempDirectory("sig-store").toString
    var emitted = Map.empty[Long, Seq[Long]]
    def emit(df: DataFrame, epoch: Long): Unit = {
      import spark.implicits._
      emitted += epoch -> df.select("doc_id").as[Long].collect().toSeq.sorted
    }

    // epoch 0: two distinct texts + an in-batch duplicate (first id wins)
    StreamingIncrementalDedup.processBatch(
      docs((1L, "alpha bravo charlie"), (2L, "delta echo foxtrot"),
        (3L, "alpha bravo charlie")), store, 0L, emit)
    assert(emitted(0L) == Seq(1L, 2L))
    assert(SSTableReader.listDataFiles(store).size == 1)

    // epoch 1: a HISTORICAL duplicate (same text as doc 1, seen one
    // epoch ago — far beyond any watermark) and one novel doc
    StreamingIncrementalDedup.processBatch(
      docs((10L, "alpha bravo charlie"), (11L, "golf hotel india")),
      store, 1L, emit)
    assert(emitted(1L) == Seq(11L))
    assert(SSTableReader.listDataFiles(store).size == 2)

    // replay of epoch 1 (failed-commit retry): same decisions, store
    // unchanged in content AND generation count
    StreamingIncrementalDedup.processBatch(
      docs((10L, "alpha bravo charlie"), (11L, "golf hotel india")),
      store, 1L, emit)
    assert(emitted(1L) == Seq(11L))
    assert(SSTableReader.listDataFiles(store).size == 2)

    // maintenance fold, then the store still answers probes
    assert(StreamingIncrementalDedup.compactStore(spark, store,
      minThreshold = 2) == 1)
    assert(SSTableReader.listDataFiles(store).size == 1)
    StreamingIncrementalDedup.processBatch(
      docs((20L, "golf hotel india"), (21L, "juliet kilo lima")),
      store, 2L, emit)
    assert(emitted(2L) == Seq(21L))

    // the store holds exactly one fingerprint per distinct text
    assert(spark.read.format("sstable").load(store).count() == 4)
  }

  test("epoch-boundary maintenance bounds store generations, novelty unchanged (VERDICT r6 #4)") {
    val auto = Files.createTempDirectory("sig-auto").toString
    val manual = Files.createTempDirectory("sig-manual").toString
    var autoEmits = Map.empty[Long, Seq[Long]]
    var manualEmits = Map.empty[Long, Seq[Long]]
    import spark.implicits._
    for (e <- 0 until 12) {
      // one text novel in this epoch, one historical duplicate from epoch 0
      val b = docs((e * 10L, s"unique text epoch $e"),
        (e * 10L + 1L, "the repeated duplicate text"))
      StreamingIncrementalDedup.processBatch(b, auto, e.toLong,
        (df, ep) => autoEmits += ep -> df.select("doc_id").as[Long].collect().toSeq.sorted,
        maintainAboveGenerations = 3)
      StreamingIncrementalDedup.processBatch(b, manual, e.toLong,
        (df, ep) => manualEmits += ep -> df.select("doc_id").as[Long].collect().toSeq.sorted,
        maintainAboveGenerations = 0)
    }
    // identical decisions every epoch: dedup semantics don't depend on
    // whether (or when) the store folded
    assert(autoEmits == manualEmits)
    assert(autoEmits(0L) == Seq(0L, 1L) && autoEmits(5L) == Seq(50L))
    // the maintained store stays bounded; the unmaintained one grows
    // one generation per epoch
    assert(SSTableReader.listDataFiles(manual).size == 12)
    assert(SSTableReader.listDataFiles(auto).size <= 4,
      s"auto-maintained store has ${SSTableReader.listDataFiles(auto).size} generations")
    // both stores hold the same signature set
    assert(spark.read.format("sstable").load(auto).count() ==
      spark.read.format("sstable").load(manual).count())
  }

  test("the streaming entry point wires foreachBatch end-to-end") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val store = Files.createTempDirectory("sig-store-s").toString
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val input = MemoryStream[(Long, String)]
    val q = StreamingIncrementalDedup.start(
      input.toDF().toDF("doc_id", "text"), store,
      Files.createTempDirectory("sid-ck").toString,
      (df, epoch) => seen.synchronized {
        df.select("doc_id").as[Long].collect().foreach(id => seen += ((epoch, id)))
      })
    try {
      input.addData((1L, "mike november oscar"), (2L, "papa quebec romeo"))
      q.processAllAvailable()
      input.addData((3L, "mike november oscar"), (4L, "sierra tango uniform"))
      q.processAllAvailable()
    } finally q.stop()
    assert(seen.map(_._2).toSet == Set(1L, 2L, 4L),
      s"historical dup must be dropped in batch 2: $seen")
    assert(SSTableReader.listDataFiles(store).size == 2)
  }
}
