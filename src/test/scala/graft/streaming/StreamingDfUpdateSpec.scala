package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.sstable.SSTableReader

/** Streaming df-store maintenance — the streaming twin of `CALL
  * update_doc_freqs`. Pinned: disjoint micro-batch partials sum to the
  * exact corpus statistic (historical dups dropped via point-read
  * probes), replay of an epoch is idempotent, epoch-boundary
  * self-maintenance folds losslessly, and the foreachBatch entry wires
  * end to end. */
class StreamingDfUpdateSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def docsDf(rows: (Long, String)*) = {
    val sp = spark
    import sp.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  /** Exact direct recompute over a doc set: (term -> df, nDocs). */
  private def direct(rows: (Long, String)*): (Map[String, Long], Long) = {
    val df = docsDf(rows: _*)
      .select(col("doc_id"),
        explode(array_distinct(graft.operators.Params.toks(col("text")))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (df, rows.map(_._1).distinct.size.toLong)
  }

  private def stored(store: String): (Map[String, Long], Long) =
    (StreamingDfUpdate.docFreqs(spark, store)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap,
      StreamingDfUpdate.nDocs(spark, store))

  test("disjoint epoch partials sum exactly; historical dups count " +
    "once; replay is idempotent") {
    val store = Files.createTempDirectory("df-stream").toString
    val b1 = Seq(1L -> "alpha beta gamma", 2L -> "alpha delta")
    val b2 = Seq(2L -> "alpha delta", // historical dup: already counted
      3L -> "beta beta epsilon") // in-doc repeat: df counts docs, not tf
    StreamingDfUpdate.processBatch(docsDf(b1: _*), store, 0L)
    StreamingDfUpdate.processBatch(docsDf(b2: _*), store, 1L)
    val want = direct((b1 ++ b2).distinct: _*)
    assert(stored(store) == want,
      s"streamed partials diverge: ${stored(store)} vs $want")
    // cf partials too: 'beta' appears twice in doc 3 and once in doc 1
    val cf = StreamingDfUpdate.collFreqs(spark, store)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cf("beta") == 3L && cf("alpha") == 2L, cf)
    // replay epoch 1 (the retry shape): unpublish-then-redo must land
    // on the identical end state
    StreamingDfUpdate.processBatch(docsDf(b2: _*), store, 1L)
    assert(stored(store) == want, "an epoch replay changed the totals")
  }

  test("epoch-boundary self-maintenance bounds generations; totals " +
    "unchanged across the folds; the CURRENT epoch's tagged generation " +
    "is never inside a fold (r14 review find: an end-of-batch fold " +
    "could absorb part of a still-replayable epoch — the replay's " +
    "tag-unpublish then split it and collided df:s cells silently)") {
    val store = Files.createTempDirectory("df-stream-m").toString
    val all = (0L until 12L).map(i => i -> s"tok$i common word")
    all.grouped(2).zipWithIndex.foreach { case (batch, e) =>
      StreamingDfUpdate.processBatch(docsDf(batch: _*), store, e.toLong,
        maintainAboveGenerations = 2)
      // the order pin: maintenance ran BEFORE the append, so this
      // epoch's tag must survive the batch as its own fileset — a
      // replay's unpublish always removes the WHOLE epoch or nothing
      val tag = f"dfs${e.toLong}%09d"
      assert(SSTableReader.listDataFiles(store)
        .exists(_.endsWith(s"-$tag-Data.db")),
        s"epoch $e's tagged generation was folded within its own batch " +
          "— a crash now would make its replay split the epoch")
    }
    assert(SSTableReader.listDataFiles(store).size <= 3,
      "self-maintenance must bound the generation count")
    assert(stored(store) == direct(all: _*),
      "a fold lost a partial — compaction must be lossless")
  }

  test("the streaming entry point wires foreachBatch end-to-end") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = spark.sqlContext
    val store = Files.createTempDirectory("df-stream-e2e").toString
    val input = MemoryStream[(Long, String)]
    val q = StreamingDfUpdate.start(
      input.toDF().toDF("doc_id", "text"), store,
      Files.createTempDirectory("dfs-ck").toString)
    try {
      input.addData((1L, "mike november oscar"), (2L, "papa quebec"))
      q.processAllAvailable()
      input.addData((1L, "mike november oscar"), (3L, "mike zulu"))
      q.processAllAvailable()
    } finally q.stop()
    assert(stored(store) == direct(
      1L -> "mike november oscar", 2L -> "papa quebec", 3L -> "mike zulu"),
      "streamed end state must equal the dedup'd direct recompute")
  }

  test("pre-append consolidation bounds per-row cell growth (round 15): " +
    "a hot term's row folds to one cell per prefix instead of one per " +
    "micro-batch; totals stay exact across folds AND across an epoch " +
    "replay landing after a fold") {
    val store = Files.createTempDirectory("df-stream-cons").toString
    val batches = (0 until 8).map(i => Seq((10L + i) -> s"alpha common$i"))
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingDfUpdate.processBatch(docsDf(b: _*), store, i.toLong,
        maintainAboveGenerations = 3, consolidateAboveEpochs = 2)
    }
    val all = batches.flatten
    assert(stored(store) == direct(all: _*),
      "totals diverged across in-stream folds")
    // 'alpha' rode every epoch; its LIVE row must be a fold cell plus at
    // most the epochs still under the gate — never 8 accumulated cells
    val alphaCells = graft.operators.SSTableOps.suppressTombstones(
        spark.read.format("sstable").load(store))
      .filter(col("key").cast("string") === "t:alpha")
      .select(explode(col("columns")).as("c"))
      .select(col("c.name").cast("string")).collect().map(_.getString(0))
    assert(alphaCells.exists(_.startsWith("df:F")),
      s"no fold cell on the hot term's row: ${alphaCells.toSeq}")
    assert(alphaCells.count(_.startsWith("df:")) <= 3,
      s"consolidation must bound the hot row's width: ${alphaCells.toSeq}")
    // replay the LAST epoch after folds happened (the retry shape): the
    // tag-unpublish plus the d:-markers (which folds never touch) make
    // the replay land on the identical end state
    StreamingDfUpdate.processBatch(docsDf(batches.last: _*), store, 7L,
      maintainAboveGenerations = 3, consolidateAboveEpochs = 2)
    assert(stored(store) == direct(all: _*),
      "an epoch replay after a fold changed the totals")
  }

  private def scratchCorpus(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("dfs-corpus").toString
    val sp = spark
    import sp.implicits._
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def chain(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)

  test("stream-domain retraction (round 16, VERDICT r15 #2): ingest " +
    "epochs -> retract -> more stream epochs -> consolidation, and the " +
    "served stats equal the remaining-corpus recompute bit-for-bit; the " +
    "retraction tag lives in the stream's own domain (s<base>r<seq>), a " +
    "re-run matches nothing, and a later epoch RE-ADMITS the doc") {
    val rows = Seq(1L -> "alpha beta gamma", 2L -> "alpha delta",
      3L -> "beta epsilon zeta", 4L -> "alpha beta", 5L -> "eta theta alpha")
    val corpus = scratchCorpus(rows)
    val store = Files.createTempDirectory("df-stream-ret").toString
    StreamingDfUpdate.processBatch(docsDf(rows(0), rows(1)), store, 0L)
    StreamingDfUpdate.processBatch(docsDf(rows(2)), store, 1L)
    // the takedown, against the live stream store
    val r = graft.operators.DfStore.retractStream(
      spark, store, corpus, "doc_id = 2")
    assert(r == (1L, 1L, 0L, "s000000001r000001", 2L), r.toString)
    assert(stored(store) == direct(rows(0), rows(2)),
      "post-retraction stats != the remaining-doc recompute")
    // idempotent: the doc is no longer a member
    val r2 = graft.operators.DfStore.retractStream(
      spark, store, corpus, "doc_id = 2")
    assert(r2 == (1L, 0L, 1L, "", 0L), r2.toString)
    // more stream epochs land ON TOP of the retraction (their tags sort
    // after the r-tag)
    StreamingDfUpdate.processBatch(docsDf(rows(3), rows(4)), store, 2L)
    assert(stored(store) == direct(rows(0), rows(2), rows(3), rows(4)))
    // consolidation folds the signed history — negatives included —
    // into one exact cell per prefix
    val (folded, _, _) = graft.operators.DfStore.consolidate(
      spark, store, graft.sources.sstable.LocalStorage)
    assert(folded > 0, "the fold must touch the multi-epoch rows")
    assert(stored(store) == direct(rows(0), rows(2), rows(3), rows(4)),
      "consolidation over the signed history diverged")
    // re-admission: the doc streams in again, reads as novel (its
    // marker is tombstone-shadowed), and counts exactly once
    StreamingDfUpdate.processBatch(docsDf(rows(1)), store, 3L)
    assert(stored(store) == direct(rows: _*),
      "re-admission after retraction diverged from the full recompute")
    // a second retraction AFTER the fold (base now s...003, seq restarts)
    val r3 = graft.operators.DfStore.retractStream(
      spark, store, corpus, "doc_id IN (1, 4)")
    assert(r3._2 == 2L && r3._4 == "s000000003r000001", r3.toString)
    assert(stored(store) == direct(rows(1), rows(2), rows(4)),
      "post-fold retraction != the remaining-doc recompute")
  }

  test("CALL retract_doc_freqs_stream: the SQL surface of the stream " +
    "retraction (review find — the batch CALL's refusal pointed at an " +
    "API unreachable from SQL)") {
    spark.conf.set("spark.sql.catalog.graft_sdfs",
      classOf[graft.sources.sstable.spark.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_sdfs.warehouse",
      Files.createTempDirectory("df-stream-call-wh").toString)
    val rows = Seq(11L -> "alpha beta", 12L -> "alpha gamma", 13L -> "beta")
    val corpus = scratchCorpus(rows)
    val store = Files.createTempDirectory("df-stream-call").toString
    StreamingDfUpdate.processBatch(docsDf(rows: _*), store, 0L)
    val r = spark.sql(
      s"CALL graft_sdfs.system.retract_doc_freqs_stream(store_dir => " +
        s"'$store', source_dir => '$corpus', where => 'doc_id = 12')").head()
    assert(r.getAs[Long]("retracted") == 1L &&
      r.getAs[String]("retractionTag") == "s000000000r000001" &&
      r.getAs[Long]("docsInSlice") == 1L, r.toString)
    assert(stored(store) == direct(rows(0), rows(2)),
      "CALL-surface retraction != the remaining-doc recompute")
  }

  test("stream-domain retraction guards: wrong unit refuses against the " +
    "creating epoch's _meta pin; content drift refuses naming the doc; " +
    "and a replay of an epoch a retraction already counted refuses " +
    "LOUDLY instead of unpublishing the positives out from under the " +
    "negatives") {
    val rows = Seq(11L -> "alpha beta", 12L -> "gamma delta")
    val corpus = scratchCorpus(rows)
    val store = Files.createTempDirectory("df-stream-retg").toString
    StreamingDfUpdate.processBatch(docsDf(rows(0)), store, 0L)
    StreamingDfUpdate.processBatch(docsDf(rows(1)), store, 1L)
    // wrong unit vs the pin the creating epoch wrote
    val e1 = intercept[Exception](graft.operators.DfStore.retractStream(
      spark, store, corpus, "doc_id = 11", unit = "para"))
    assert(chain(e1).exists(_.contains("counts unit 'term'")), chain(e1))
    // drifted text refuses naming the doc
    val drifted = scratchCorpus(Seq(11L -> "alpha CHANGED"))
    val e2 = intercept[Exception](graft.operators.DfStore.retractStream(
      spark, store, drifted, "doc_id = 11"))
    assert(chain(e2).exists(m => m.contains("content-hash mismatch") &&
      m.contains("doc_id(s) 11")), chain(e2))
    // the replay guard: epoch 1's files are published; a retraction
    // counts doc 12; replaying epoch 1 (crash-before-commit shape)
    // must refuse — its unpublish would remove the positives the
    // retraction's negatives stand on
    val r = graft.operators.DfStore.retractStream(
      spark, store, corpus, "doc_id = 12")
    assert(r._2 == 1L, r.toString)
    val e3 = intercept[Exception](StreamingDfUpdate.processBatch(
      docsDf(rows(1)), store, 1L))
    assert(chain(e3).exists(_.contains("forked")), chain(e3))
    // a FRESH epoch (no replay) keeps working on top
    StreamingDfUpdate.processBatch(docsDf(rows(1)), store, 2L)
    assert(stored(store) == direct(rows: _*))
  }

  test("ADVICE r14: doc_id outside [0, 1e12) refuses BEFORE any marker " +
    "is written — an out-of-range id round-trips wrongly through the " +
    "12-digit marker key and would be re-counted every epoch, poisoning " +
    "the additivity sentinel permanently") {
    val store = Files.createTempDirectory("df-stream-range").toString
    StreamingDfUpdate.processBatch(docsDf(1L -> "alpha beta"), store, 0L)
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    for ((badId, ep) <- Seq(-5L -> 1L, 1000000000000L -> 2L)) {
      val e = intercept[Exception](StreamingDfUpdate.processBatch(
        docsDf(badId -> "omega", 9L -> "kappa"), store, ep))
      assert(chain(e).exists(_.contains("[0, 1e12)")), chain(e))
    }
    // the refused epochs wrote nothing: totals are epoch 0's, exactly,
    // and the store keeps working for legal ids (incl. the boundaries)
    assert(stored(store) == direct(1L -> "alpha beta"))
    StreamingDfUpdate.processBatch(
      docsDf(0L -> "omega", 999999999999L -> "kappa"), store, 3L)
    assert(stored(store) == direct(1L -> "alpha beta", 0L -> "omega",
      999999999999L -> "kappa"))
  }
}
