package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persistent takedown ledger (round 17, VERDICT r16 missing #1):
  * a takedown must survive a REBUILD. Pinned here: the rebuild-refusal
  * (a fresh build_ann_index / update_doc_freqs / update_signatures from
  * a corpus still containing ledgered ids refuses naming them), the
  * clean-corpus path (a slice without ledgered ids builds fine), the
  * explicit readmit override, epoch ordering (takedown → readmit →
  * takedown again), the streaming maintainers' consult (auto-wired
  * under a warehouse, explicit At() anywhere, Off opt-out — round 18),
  * corpus scoping (round 18), and the write-ahead property (the
  * intent survives a refused takedown). */
class TakedownLedgerSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val warehouse: String =
    Files.createTempDirectory("graft-ledger").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s.conf.set("spark.sql.catalog.graft_lg",
      classOf[graft.sources.sstable.spark.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_lg.warehouse", warehouse)
    s.sql("CREATE NAMESPACE graft_lg.lg")
    s
  }

  private def chain(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)

  private val Where = "doc_id % 4 = 1"

  test("a REBUILD from the uncleaned corpus refuses naming the ledgered " +
    "ids; the same rebuild over the CLEANED slice succeeds; readmit " +
    "re-opens the ids; a LATER takedown shadows the readmission " +
    "(epoch order)") {
    // stores + takedown
    spark.sql("CALL graft_lg.system.update_doc_freqs(table => 'lg.df', " +
      s"source_dir => '$sfDir', autocompact => 3)")
    spark.sql("CALL graft_lg.system.update_signatures(table => 'lg.sig', " +
      s"source_dir => '$sfDir', autocompact => 3)")
    spark.sql("CALL graft_lg.system.build_ann_index(table => 'lg.ann', " +
      s"source_dir => '$sfDir', kind => 'ivf', k => 4, iters => 1)")
    spark.sql("CALL graft_lg.system.takedown(df_table => 'lg.df', " +
      "sig_table => 'lg.sig', ann_table => 'lg.ann', " +
      s"source_dir => '$sfDir', where => '$Where')")
    val ledgered = graft.Tables.documents(spark, sfDir)
      .filter(expr(Where)).select("doc_id")
      .collect().map(_.getLong(0)).toSet

    // the REBUILD case: brand-new stores (new tables — the old ones'
    // retraction state is irrelevant) from the SAME uncleaned corpus.
    // Every maintainer refuses, naming sample ids and the override.
    Seq(
      "CALL graft_lg.system.build_ann_index(table => 'lg.ann_v2', " +
        s"source_dir => '$sfDir', kind => 'pq', k => 4, iters => 1)",
      "CALL graft_lg.system.update_doc_freqs(table => 'lg.df_v2', " +
        s"source_dir => '$sfDir', autocompact => 3)",
      "CALL graft_lg.system.update_signatures(table => 'lg.sig_v2', " +
        s"source_dir => '$sfDir', autocompact => 3)").foreach { sql =>
      val e = intercept[Exception](spark.sql(sql))
      val msgs = chain(e)
      assert(msgs.exists(_.contains("taken-down")), s"$sql: $msgs")
      assert(msgs.exists(_.contains("readmit")), s"$sql: $msgs")
      assert(msgs.exists(m => ledgered.take(1).forall(id =>
        m.contains("e.g. ids"))), s"$sql must sample ids: $msgs")
    }

    // the CLEANED slice (corpus minus the ledgered ids) builds fine —
    // the refusal is precise, not a blanket lock (the ANN where clause
    // is in vec_id terms — same id domain)
    spark.sql("CALL graft_lg.system.build_ann_index(table => 'lg.ann_v2', " +
      s"source_dir => '$sfDir', kind => 'pq', k => 4, iters => 1, " +
      s"where => 'NOT (vec_id % 4 = 1)')")
    spark.sql("CALL graft_lg.system.update_doc_freqs(table => 'lg.df_v2', " +
      s"source_dir => '$sfDir', where => 'NOT ($Where)', autocompact => 3)")
    assert(AnnIndex.indexedVecIds(spark, s"$warehouse/lg/ann_v2")
      .collect().map(_.getLong(0)).toSet.intersect(ledgered).isEmpty)

    // the audit surface lists the live entries with their predicate
    val audit = spark.sql(
      "CALL graft_lg.system.takedown_ledger()").collect()
    assert(audit.map(_.getLong(0)).toSet == ledgered)
    assert(audit.forall(_.getString(1) == Where))

    // readmit re-opens the ids: the previously-refused df rebuild runs
    val rm = spark.sql(
      s"CALL graft_lg.system.readmit(where => '$Where')").head()
    assert(rm.getAs[Long]("readmitted") == ledgered.size)
    spark.sql("CALL graft_lg.system.update_doc_freqs(table => 'lg.df_v3', " +
      s"source_dir => '$sfDir', autocompact => 3)")
    assert(DfStore.nDocs(spark, "graft_lg.lg.df_v3") ==
      graft.Tables.documents(spark, sfDir).count())

    // epoch order: a LATER takedown of the same ids rises above the
    // readmission — the ledger refuses again
    spark.sql("CALL graft_lg.system.takedown(df_table => 'lg.df_v3', " +
      "sig_table => 'lg.sig', ann_table => 'lg.ann', " +
      s"source_dir => '$sfDir', where => '$Where')")
    val e2 = intercept[Exception](spark.sql(
      "CALL graft_lg.system.update_doc_freqs(table => 'lg.df_v4', " +
        s"source_dir => '$sfDir', autocompact => 3)"))
    assert(chain(e2).exists(_.contains("taken-down")), chain(e2))
    spark.sql("CALL graft_lg.system.readmit(where => 'true')")
  }

  test("the streaming maintainers' consult on BARE-path stores (no " +
    "warehouse above): explicit At(dir) refuses a micro-batch carrying " +
    "ledgered ids LOUDLY; with nothing discoverable the batch is " +
    "unguarded (r17's opt-in contract, preserved); readmit unblocks") {
    val ledgerDir = TakedownLedger.dirUnder(warehouse)
    // a clean slate regardless of earlier tests' ledger state (the
    // warehouse — and so the ledger — is shared by this suite)
    if (graft.sources.sstable.LocalStorage.exists(ledgerDir) &&
        graft.sources.sstable.LocalStorage.listDataFiles(ledgerDir).nonEmpty)
      TakedownLedger.readmit(spark, ledgerDir, "true")
    // seed the ledger directly through the operator API (no catalog
    // needed — the streaming maintainers are dir-addressed)
    val (n, _) = TakedownLedger.record(spark, ledgerDir, sfDir,
      "doc_id % 10 = 3")
    assert(n > 0)
    val storeDir = Files.createTempDirectory("lg-stream-df").toString
    val batch = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    val e = intercept[Exception](
      graft.streaming.StreamingDfUpdate.processBatch(
        batch, storeDir, 0L, ledger = TakedownLedger.At(ledgerDir)))
    assert(chain(e).exists(_.contains("taken-down")), chain(e))
    // nothing landed: the refusal fired before any write
    assert(graft.sources.sstable.LocalStorage.listDataFiles(storeDir).isEmpty)
    // unguarded (ledgerDir omitted) ingests — the opt-in contract
    graft.streaming.StreamingDfUpdate.processBatch(batch, storeDir, 0L)
    assert(graft.streaming.StreamingDfUpdate.nDocs(spark, storeDir) ==
      batch.count())
    // a CLEAN batch passes the guard even with the ledger present
    val storeDir2 = Files.createTempDirectory("lg-stream-df2").toString
    graft.streaming.StreamingDfUpdate.processBatch(
      batch.filter("doc_id % 10 != 3"), storeDir2, 0L,
      ledger = TakedownLedger.At(ledgerDir))
    // readmit unblocks the full batch
    TakedownLedger.readmit(spark, ledgerDir, "true")
    val storeDir3 = Files.createTempDirectory("lg-stream-df3").toString
    graft.streaming.StreamingDfUpdate.processBatch(
      batch, storeDir3, 0L, ledger = TakedownLedger.At(ledgerDir))
    assert(graft.streaming.StreamingDfUpdate.nDocs(spark, storeDir3) ==
      batch.count())
  }

  test("takedown RACING a looping maintainer ingest never silently " +
    "re-admits (the review-find interleave, driven for real): every " +
    "ingest outcome is legal (success before the record, ledger " +
    "refusal, lease refusal), the takedown converges by re-issue, and " +
    "the end state is always clean membership + a refusing ingest") {
    spark.sql("CREATE NAMESPACE graft_lg.race")
    spark.sql("CALL graft_lg.system.update_signatures(table => " +
      s"'race.sig', source_dir => '$sfDir', autocompact => 3)")
    spark.sql("CALL graft_lg.system.build_ann_index(table => 'race.ann', " +
      s"source_dir => '$sfDir', kind => 'ivf', k => 4, iters => 1)")
    spark.sql("CALL graft_lg.system.update_doc_freqs(table => 'race.df', " +
      s"source_dir => '$sfDir', autocompact => 3)")
    val where = "doc_id % 3 = 1"
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val illegal = new java.util.concurrent.atomic.AtomicReference[String]()
    val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    // the maintainer: loops full-corpus re-ingests (post-retraction,
    // the removed docs are novel again — the silent re-admission shape)
    val ingester = new Thread(() => while (!stop.get()) {
      try {
        spark.sql("CALL graft_lg.system.update_doc_freqs(table => " +
          s"'race.df', source_dir => '$sfDir', autocompact => 3)")
        outcomes.add("ok")
      } catch { case e: Throwable =>
        val msgs = chain(e).mkString(" | ")
        if (msgs.contains("taken-down")) outcomes.add("ledger-refusal")
        else if (msgs.contains("lease") || msgs.contains("holds"))
          outcomes.add("lease-refusal")
        else illegal.compareAndSet(null, msgs)
      }
    })
    ingester.start()
    try {
      // the takedown, re-issued through lease refusals until it lands
      var done = false
      var attempts = 0
      while (!done && attempts < 50) {
        attempts += 1
        try {
          spark.sql("CALL graft_lg.system.takedown(df_table => 'race.df', " +
            "sig_table => 'race.sig', ann_table => 'race.ann', " +
            s"source_dir => '$sfDir', where => '$where')")
          done = true
        } catch { case e: Throwable =>
          val msgs = chain(e).mkString(" | ")
          assert(msgs.contains("lease") || msgs.contains("holds"),
            s"takedown died on a non-lease error: $msgs")
          Thread.sleep(50)
        }
      }
      assert(done, s"takedown never landed in $attempts attempts")
      // let the ingester observe the post-takedown world a few times
      Thread.sleep(500)
    } finally { stop.set(true); ingester.join() }
    assert(illegal.get() == null, s"illegal ingest outcome: ${illegal.get()}")
    // convergence: one idempotent re-issue (an ingest BETWEEN the
    // record and a leg may have re-admitted — the legs are epoch-
    // ordered, so the re-issue retracts those too)
    spark.sql("CALL graft_lg.system.takedown(df_table => 'race.df', " +
      "sig_table => 'race.sig', ann_table => 'race.ann', " +
      s"source_dir => '$sfDir', where => '$where')")
    val st = spark.sql("CALL graft_lg.system.takedown_status(" +
      "df_table => 'race.df', sig_table => 'race.sig', " +
      s"ann_table => 'race.ann', where => '$where')").collect()
      .map(r => r.getAs[String]("store") -> r.getAs[Long]("members")).toMap
    assert(st.values.forall(_ == 0L), s"membership not clean: $st")
    // and the ledger now refuses the very ingest that was racing
    val e = intercept[Exception](spark.sql(
      "CALL graft_lg.system.update_doc_freqs(table => 'race.df', " +
        s"source_dir => '$sfDir', autocompact => 3)"))
    assert(chain(e).exists(_.contains("taken-down")), chain(e))
    spark.sql("CALL graft_lg.system.readmit(where => 'true')")
  }

  test("record is idempotent and write-ahead: a re-record of the same " +
    "slice no-ops; a record for a DIFFERENT slice appends; entries " +
    "survive (and name) a refused takedown attempt") {
    val dir = s"${Files.createTempDirectory("lg-raw").toString}/ledger"
    val (n1, e1) = TakedownLedger.record(spark, dir, sfDir, "doc_id < 20")
    assert(n1 == 20 && e1 == 2)
    val (n2, e2) = TakedownLedger.record(spark, dir, sfDir, "doc_id < 20")
    assert(n2 == 0L && e2 == 0, "a re-record must no-op")
    val (n3, _) = TakedownLedger.record(spark, dir, sfDir,
      "doc_id >= 20 AND doc_id < 25")
    assert(n3 == 5)
    assert(TakedownLedger.ledgeredIds(spark, dir).count() == 25)
    // partial overlap: only the new ids are recorded
    val (n4, _) = TakedownLedger.record(spark, dir, sfDir, "doc_id < 30")
    assert(n4 == 5, "overlapping record must add only the novel ids")
    // readmit a sub-slice; the rest stays ledgered
    val (rm, _) = TakedownLedger.readmit(spark, dir, "doc_id < 10")
    assert(rm == 10)
    assert(TakedownLedger.ledgeredIds(spark, dir).count() == 20)
    // consult: a slice overlapping the remaining entries refuses
    val e = intercept[IllegalStateException](TakedownLedger.consult(
      spark, Some(dir),
      spark.range(5, 15).select(col("id").as("doc_id")),
      "test_op", "test_target"))
    assert(e.getMessage.contains("5 taken-down document(s)"), e.getMessage)
    // ...and a disjoint slice passes
    TakedownLedger.consult(spark, Some(dir),
      spark.range(0, 10).select(col("id").as("doc_id")),
      "test_op", "test_target")

    // CONTENT predicates (the df-leg primitives accept them) must not
    // abort the record against the id-only embeddings relation (review
    // find): the embeddings side falls back to the documents slice —
    // content can only ever select document-bearing ids
    val dir2 = s"${Files.createTempDirectory("lg-raw2").toString}/ledger"
    val (nc, _) = TakedownLedger.record(spark, dir2, sfDir,
      "length(text) >= 0 AND doc_id < 35")
    assert(nc == 35, s"content-predicate record must fall back, got $nc")

    // write-triggered self-maintenance: a long takedown/readmit history
    // must not tax every future consult — generations stay bounded and
    // the live entry set stays exact through the folds
    val cycles = 10
    (0 until cycles).foreach { i =>
      TakedownLedger.record(spark, dir2,  sfDir,
        s"doc_id >= ${100 + 10 * i} AND doc_id < ${110 + 10 * i}")
      TakedownLedger.readmit(spark, dir2, s"doc_id >= ${105 + 10 * i}")
    }
    // each cycle appends 3 generations (1 record + flag + tombstones);
    // the write-triggered STCS fold keeps the count WELL below the
    // append total (size-tiered: a residue of unlike-sized files is
    // normal, linear growth is the defect)
    val appends = 1 + 3 * cycles
    val gens = graft.sources.sstable.LocalStorage.listDataFiles(dir2).length
    assert(gens <= appends / 2,
      s"the ledger left $gens generations after $appends appends — " +
        "write-triggered compaction is not bounding the history")
    assert(TakedownLedger.ledgeredIds(spark, dir2).count() == 35 + cycles * 5,
      "a fold lost or resurrected ledger entries")
  }

  test("AUTO ledger wiring (round 18, VERDICT r17 #3): a streaming " +
    "store under a catalog warehouse discovers the warehouse ledger " +
    "with NO argument and refuses ledgered ids; Off is the explicit " +
    "opt-out; the auto-wired df stream self-registers in the " +
    "derived-store registry; bare paths stay unguarded (prior test)") {
    val ledgerDir = TakedownLedger.dirUnder(warehouse)
    if (graft.sources.sstable.LocalStorage.exists(ledgerDir) &&
        graft.sources.sstable.LocalStorage.listDataFiles(ledgerDir).nonEmpty)
      TakedownLedger.readmit(spark, ledgerDir, "true")
    val (n, _) = TakedownLedger.record(spark, ledgerDir, sfDir,
      "doc_id % 10 = 7")
    assert(n > 0)
    val batch = graft.Tables.documents(spark, sfDir).select("doc_id", "text")

    // df stream under the warehouse: NO ledger argument — Auto
    // discovers the warehouse ledger and refuses
    val storeDir = s"$warehouse/lg/auto_stream_df"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(storeDir))
    val e = intercept[Exception](
      graft.streaming.StreamingDfUpdate.processBatch(batch, storeDir, 0L))
    assert(chain(e).exists(_.contains("taken-down")), chain(e))
    // ...and it already self-registered as a stream-maintained df store
    // (registration is the intent to maintain — it precedes the consult)
    val reg = DerivedRegistry.list(spark, DerivedRegistry.dirUnder(warehouse))
    assert(reg.exists(r => r.kind == DerivedRegistry.DocFreqs &&
      r.table == storeDir && r.mode == "stream" &&
      r.corpus == DerivedRegistry.AnyCorpus), reg)

    // the incremental-dedup stream auto-discovers too (advisory guard)
    val sigDir = s"$warehouse/lg/auto_sig"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(sigDir))
    val e2 = intercept[Exception](
      graft.streaming.StreamingIncrementalDedup.processBatch(
        batch, sigDir, 0L, (_, _) => ()))
    assert(chain(e2).exists(_.contains("taken-down")), chain(e2))

    // Off is the explicit opt-out: the same batch ingests unguarded
    graft.streaming.StreamingDfUpdate.processBatch(batch, storeDir, 0L,
      ledger = TakedownLedger.Off)
    assert(graft.streaming.StreamingDfUpdate.nDocs(spark, storeDir) ==
      batch.count())
    TakedownLedger.readmit(spark, ledgerDir, "true")
  }

  test("CORPUS SCOPE (round 18): entries match (corpus, doc_id) — a " +
    "takedown in corpus A does not refuse corpus B's unrelated ids; " +
    "readmit scoped to B cannot clear A's record; global entries " +
    "refuse everywhere and only an unscoped readmit clears them") {
    val dir = s"${Files.createTempDirectory("lg-scope").toString}/ledger"
    val corpusB = "/some/other/corpus"
    val slice = spark.range(0, 15).select(col("id").as("doc_id"))

    // takedown EXPLICITLY scoped to corpus A (the default is global —
    // scoping is an opt-in declaration, never inferred from the
    // payload dir)
    val (nA, _) = TakedownLedger.record(spark, dir, sfDir, "doc_id < 15",
      corpus = Some(sfDir))
    assert(nA == 15)

    // corpus B's ingest of the same id VALUES passes — its id domain is
    // unrelated (the r17 false-positive refusal, closed)
    TakedownLedger.consult(spark, Some(dir), slice, "op", "t",
      corpus = Some(corpusB))
    // corpus A refuses — and under any trailing-slash spelling
    intercept[IllegalStateException](TakedownLedger.consult(
      spark, Some(dir), slice, "op", "t", corpus = Some(sfDir)))
    intercept[IllegalStateException](TakedownLedger.consult(
      spark, Some(dir), slice, "op", "t", corpus = Some(sfDir + "/")))
    // a consult that cannot name its corpus is refused by every entry
    // (the conservative direction — streaming sources)
    intercept[IllegalStateException](TakedownLedger.consult(
      spark, Some(dir), slice, "op", "t"))

    // corpus B's OWN takedown of the same id values is its own record —
    // per-scope idempotence, not a global anti-join
    val (nB, _) = TakedownLedger.record(spark, dir, sfDir, "doc_id < 15",
      corpus = Some(corpusB))
    assert(nB == 15, s"B's takedown must record its own entries, got $nB")
    assert(TakedownLedger.entries(spark, dir).count() == 30)
    assert(TakedownLedger.ledgeredIds(spark, dir).count() == 15)

    // readmit scoped to B clears ONLY B's entries: B ingests again, A's
    // record (and refusal) stays live — the r17 compliance hole, closed
    val (rmB, _) = TakedownLedger.readmit(spark, dir, "true",
      corpus = Some(corpusB))
    assert(rmB == 15)
    TakedownLedger.consult(spark, Some(dir), slice, "op", "t",
      corpus = Some(corpusB))
    intercept[IllegalStateException](TakedownLedger.consult(
      spark, Some(dir), slice, "op", "t", corpus = Some(sfDir)))
    val after = TakedownLedger.entries(spark, dir).collect()
    assert(after.length == 15 &&
      after.forall(r => r.getString(3) == sfDir),
      "B's readmission must leave A's entries (and only A's) live")

    // a GLOBAL entry ('*') refuses under every corpus; a SCOPED readmit
    // does not touch it; the unscoped readmit clears everything
    val (nG, _) = TakedownLedger.record(spark, dir, sfDir,
      "doc_id >= 20 AND doc_id < 25", corpus = Some(TakedownLedger.GlobalScope))
    assert(nG == 5)
    val gSlice = spark.range(20, 25).select(col("id").as("doc_id"))
    intercept[IllegalStateException](TakedownLedger.consult(
      spark, Some(dir), gSlice, "op", "t", corpus = Some(corpusB)))
    val (rmScoped, _) = TakedownLedger.readmit(spark, dir,
      "doc_id >= 20", corpus = Some(corpusB))
    assert(rmScoped == 0, "a scoped readmit must not clear global entries")
    intercept[IllegalStateException](TakedownLedger.consult(
      spark, Some(dir), gSlice, "op", "t", corpus = Some(corpusB)))
    val (rmAll, _) = TakedownLedger.readmit(spark, dir, "true")
    assert(rmAll == 20)
    TakedownLedger.consult(spark, Some(dir),
      slice.unionAll(gSlice), "op", "t")
  }
}
