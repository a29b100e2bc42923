package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-store takedown orchestration (round 16, VERDICT r15 #1):
  * `CALL takedown` drives the three per-store retraction legs with one
  * receipt; `CALL takedown_status` is the spanning membership audit.
  * Pinned here: end-state equality with never-ingested stores, the
  * crash-between-legs model (any prefix of legs + re-issue converges;
  * the audit names every lagging store in between), predicate
  * spanning (one doc_id predicate covers the vec_id-keyed index), and
  * the refusal passthrough (a guard firing in one leg surfaces loudly
  * and the re-issue still converges). */
class TakedownSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val warehouse: String =
    Files.createTempDirectory("graft-takedown").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s.conf.set("spark.sql.catalog.graft_td",
      classOf[graft.sources.sstable.spark.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_td.warehouse", warehouse)
    s.sql("CREATE NAMESPACE graft_td.td")
    s
  }

  /** Build the three stores of one namespace over the full corpus. */
  private def buildStores(ns: String): Unit = {
    spark.sql(s"CREATE NAMESPACE graft_td.$ns")
    spark.sql(s"CALL graft_td.system.update_doc_freqs(table => '$ns.df', " +
      s"source_dir => '$sfDir', autocompact => 3)")
    spark.sql(s"CALL graft_td.system.update_signatures(table => '$ns.sig', " +
      s"source_dir => '$sfDir', autocompact => 3)")
    spark.sql(s"CALL graft_td.system.build_ann_index(table => '$ns.ann', " +
      s"source_dir => '$sfDir', kind => 'ivf', k => 4, iters => 1)")
  }

  private def takedown(ns: String, where: String) = spark.sql(
    s"CALL graft_td.system.takedown(df_table => '$ns.df', " +
      s"sig_table => '$ns.sig', ann_table => '$ns.ann', " +
      s"source_dir => '$sfDir', where => '$where')").collect()
    .map(r => r.getString(0) -> (r.getLong(1), r.getString(3))).toMap

  private def status(ns: String, where: String) = spark.sql(
    s"CALL graft_td.system.takedown_status(df_table => '$ns.df', " +
      s"sig_table => '$ns.sig', ann_table => '$ns.ann', " +
      s"where => '$where')").collect()
    .map(r => r.getString(0) -> r.getLong(1)).toMap

  private def members(ns: String): Map[String, Set[Long]] =
    Takedown.memberships(spark, s"$warehouse/$ns/df",
        s"$warehouse/$ns/sig", s"$warehouse/$ns/ann")
      .map { case (store, m) =>
        store -> m.collect().map(_.getLong(0)).toSet
      }.toMap

  private def chain(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)

  /** The ledger is warehouse-global BY DESIGN (round 17) — a takedown
    * in one namespace refuses re-ingest of those ids everywhere in the
    * catalog. These tests share one catalog, so each test that issues
    * a takedown clears its entries afterwards (the explicit override),
    * keeping later tests' store builds un-refused. */
  private def readmitAll(): Unit =
    spark.sql("CALL graft_td.system.readmit(where => 'true')")

  test("one CALL takedown retracts the slice from ALL THREE stores; " +
    "the end state equals never-ingested stores; a re-issue no-ops " +
    "every leg; the audit reads zero") {
    buildStores("full")
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val r = takedown("full", "doc_id % 5 = 2")
    assert(r("doc_freqs")._2 == "retracted" &&
      r("signatures")._2 == "retracted" &&
      r("ann_vectors")._2 == "retracted", r.toString)
    assert(r("doc_freqs")._1 == docs.count(_ % 5 == 2), r.toString)
    assert(r("ann_vectors")._1 == vecs.count(_ % 5 == 2), r.toString)
    val m = members("full")
    assert(m("doc_freqs") == docs.filterNot(_ % 5 == 2))
    assert(m("signatures") == docs.filterNot(_ % 5 == 2))
    assert(m("ann_vectors") == vecs.filterNot(_ % 5 == 2))
    // the df statistics equal a remaining-corpus recompute (the serving
    // face; q_takedown hash-gates membership, DfStoreSpec gates stats)
    assert(DfStore.nDocs(spark, "graft_td.full.df") ==
      docs.count(_ % 5 != 2))
    val again = takedown("full", "doc_id % 5 = 2")
    assert(again.values.forall(_._2 == "noop"), again.toString)
    assert(status("full", "doc_id % 5 = 2").values.forall(_ == 0L))
    // the ledger recorded the removal durably (audited, then cleared
    // so later tests' store builds are not refused)
    assert(spark.sql("CALL graft_td.system.takedown_ledger()").count() ==
      docs.count(_ % 5 == 2))
    readmitAll()
    assert(spark.sql("CALL graft_td.system.takedown_ledger()").count() == 0L)
  }

  test("crash-between-legs: EVERY prefix of completed legs converges by " +
    "re-issuing the same CALL, and takedown_status names exactly the " +
    "lagging stores at each stage") {
    buildStores("crash")
    val where = "doc_id % 7 = 3"
    // stage 1: the orchestration died after the df leg
    spark.sql("CALL graft_td.system.retract_doc_freqs(table => " +
      s"'crash.df', source_dir => '$sfDir', where => '$where')")
    val s1 = status("crash", where)
    assert(s1("doc_freqs") == 0L && s1("signatures") > 0L &&
      s1("ann_vectors") > 0L, s1.toString)
    // stage 2: died after the signature leg too
    spark.sql("CALL graft_td.system.retract_signatures(table => " +
      s"'crash.sig', where => '$where')")
    val s2 = status("crash", where)
    assert(s2("doc_freqs") == 0L && s2("signatures") == 0L &&
      s2("ann_vectors") > 0L, s2.toString)
    // convergence: the full CALL no-ops the done legs, runs the rest
    val r = takedown("crash", where)
    assert(r("doc_freqs")._2 == "noop" && r("signatures")._2 == "noop" &&
      r("ann_vectors")._2 == "retracted", r.toString)
    assert(status("crash", where).values.forall(_ == 0L))
    readmitAll()
  }

  test("a refusing leg surfaces loudly and earlier legs stand; fixing " +
    "the cause and re-issuing converges (the resume story for a " +
    "mid-takedown guard)") {
    buildStores("refuse")
    val where = "doc_id % 9 = 4"
    // poison the df leg only: a drifted copy of the slice's text
    val drifted = Files.createTempDirectory("td-drift").toString
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        when(expr(where), concat(col("text"), lit(" TAMPERED")))
          .otherwise(col("text")).as("text"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$drifted/documents.parquet")
    val e = intercept[Exception](spark.sql(
      "CALL graft_td.system.takedown(df_table => 'refuse.df', " +
        "sig_table => 'refuse.sig', ann_table => 'refuse.ann', " +
        s"source_dir => '$drifted', where => '$where')"))
    assert(chain(e).exists(_.contains("content-hash mismatch")), chain(e))
    // nothing landed anywhere: the df leg refused first, later legs
    // never ran
    assert(status("refuse", where).values.forall(_ > 0L))
    // fixed payload -> full convergence; the ledger leg no-ops (the
    // intent was recorded BEFORE the refused attempt's df guard fired —
    // write-ahead: the removal request is durable through a refusal)
    val r = takedown("refuse", where)
    assert(r("ledger")._2 == "noop", r.toString)
    assert((r - "ledger").values.forall(_._2 == "retracted"), r.toString)
    assert(status("refuse", where).values.forall(_ == 0L))
    readmitAll()
  }

  test("re-admission after a takedown needs the EXPLICIT readmit " +
    "override (round 17, the ledger): re-running the maintainers from " +
    "the uncleaned corpus REFUSES naming the ledgered ids; after CALL " +
    "readmit the stores re-ingest the removed docs exactly once each " +
    "and serve the full corpus again — membership flips, in epoch " +
    "order, across ALL THREE stores") {
    buildStores("readmit")
    val where = "doc_id % 11 = 5"
    takedown("readmit", where)
    // the corpus still holds the docs; WITHOUT the override every
    // maintainer refuses — this is the durability the ledger adds (a
    // rebuild/re-ingest can no longer silently undo the takedown)
    Seq(
      "CALL graft_td.system.update_doc_freqs(table => 'readmit.df', " +
        s"source_dir => '$sfDir', autocompact => 3)",
      "CALL graft_td.system.update_signatures(table => 'readmit.sig', " +
        s"source_dir => '$sfDir', autocompact => 3)",
      "CALL graft_td.system.update_ann_index(table => 'readmit.ann', " +
        s"source_dir => '$sfDir')").foreach { sql =>
      val e = intercept[Exception](spark.sql(sql))
      assert(chain(e).exists(m => m.contains("taken-down") &&
        m.contains("readmit")), s"$sql must refuse via the ledger: ${chain(e)}")
    }
    // ...and membership is still the post-takedown state
    val docsAll = graft.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(members("readmit")("doc_freqs") == docsAll.filterNot(_ % 11 == 5))
    // the explicit override clears the ledger entries (receipt-visible)
    val rm = spark.sql(
      s"CALL graft_td.system.readmit(where => '$where')").head()
    assert(rm.getAs[Long]("readmitted") == docsAll.count(_ % 11 == 5), rm)
    // idempotent: a second readmit matches nothing
    assert(spark.sql(s"CALL graft_td.system.readmit(where => '$where')")
      .head().getAs[Long]("readmitted") == 0L)
    // now the maintainers re-admit
    spark.sql("CALL graft_td.system.update_doc_freqs(table => " +
      s"'readmit.df', source_dir => '$sfDir', autocompact => 3)")
    spark.sql("CALL graft_td.system.update_signatures(table => " +
      s"'readmit.sig', source_dir => '$sfDir', autocompact => 3)")
    spark.sql("CALL graft_td.system.update_ann_index(table => " +
      s"'readmit.ann', source_dir => '$sfDir')")
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val m = members("readmit")
    assert(m("doc_freqs") == docsAll && m("signatures") == docsAll &&
      m("ann_vectors") == vecs,
      "re-admission must restore full membership in every store")
  }

  test("takedown spans a STREAM-maintained df store (round 16): " +
    "df_stream_dir routes the df leg through the stream's epoch-tag " +
    "domain — one CALL, one receipt, clean spanning audit, idempotent " +
    "re-issue; df_table and df_stream_dir are exactly-one-of") {
    spark.sql("CREATE NAMESPACE graft_td.strm")
    spark.sql("CALL graft_td.system.update_signatures(table => " +
      s"'strm.sig', source_dir => '$sfDir', autocompact => 3)")
    spark.sql("CALL graft_td.system.build_ann_index(table => 'strm.ann', " +
      s"source_dir => '$sfDir', kind => 'ivf', k => 4, iters => 1)")
    val dfDir = Files.createTempDirectory("td-stream-df").toString
    graft.streaming.StreamingDfUpdate.processBatch(
      graft.Tables.documents(spark, sfDir).select("doc_id", "text"),
      dfDir, 0L)
    val where = "doc_id % 13 = 6"
    def call() = spark.sql(
      "CALL graft_td.system.takedown(sig_table => 'strm.sig', " +
        s"ann_table => 'strm.ann', source_dir => '$sfDir', " +
        s"where => '$where', df_stream_dir => '$dfDir')").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2),
        r.getString(3)))).toMap
    val r1 = call()
    assert(r1("doc_freqs")._3 == "retracted" &&
      r1("doc_freqs")._2 == "s000000000r000001",
      s"the df leg must retract in the stream's tag domain: $r1")
    assert(r1("signatures")._3 == "retracted" &&
      r1("ann_vectors")._3 == "retracted", r1)
    val st = spark.sql(
      "CALL graft_td.system.takedown_status(sig_table => 'strm.sig', " +
        s"ann_table => 'strm.ann', where => '$where', " +
        s"df_stream_dir => '$dfDir')").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st.values.forall(_ == 0L), s"audit must be clean: $st")
    // the stream store serves the remaining corpus exactly
    val remaining = graft.Tables.documents(spark, sfDir)
      .filter(expr(s"NOT ($where)")).count()
    assert(graft.streaming.StreamingDfUpdate.nDocs(spark, dfDir) == remaining)
    // idempotent re-issue
    assert(call().values.forall(_._3 == "noop"))
    // at-most-one df_table/df_stream_dir, at-least-one df leg: both
    // and neither refuse loudly (the reworded r18 messages)
    val both = intercept[Exception](spark.sql(
      "CALL graft_td.system.takedown(df_table => 'strm.df', " +
        "sig_table => 'strm.sig', ann_table => 'strm.ann', " +
        s"source_dir => '$sfDir', where => 'true', " +
        s"df_stream_dir => '$dfDir')"))
    assert(chain(both).exists(_.contains("mutually exclusive")), chain(both))
    val neither = intercept[Exception](spark.sql(
      "CALL graft_td.system.takedown(sig_table => 'strm.sig', " +
        "ann_table => 'strm.ann', " +
        s"source_dir => '$sfDir', where => 'true')"))
    assert(chain(neither).exists(_.contains("at least one df leg")),
      chain(neither))
    readmitAll()
  }

  test("array-valued legs (round 17, VERDICT r16 #4): TWO ANN indexes + " +
    "one df + one sig in ONE CALL — a receipt row per (store, table); " +
    "a crash between TABLE legs of the same kind converges on re-issue " +
    "and the audit names the lagging TABLE, not just the store kind") {
    buildStores("multi")
    // a second ANN index over the same corpus (another 'embedding
    // version'), plus a second signature store
    spark.sql("CALL graft_td.system.build_ann_index(table => 'multi.ann2', " +
      s"source_dir => '$sfDir', kind => 'pq', k => 4, iters => 1)")
    spark.sql("CALL graft_td.system.update_signatures(table => " +
      s"'multi.sig2', source_dir => '$sfDir', autocompact => 3)")
    val where = "doc_id % 6 = 1"
    // the crash model BETWEEN TABLE LEGS of one kind: the first ANN
    // table's leg completed (primitive retraction), the second never ran
    spark.sql("CALL graft_td.system.retract_ann_vectors(table => " +
      s"'multi.ann', where => '$where')")
    // the spanning audit names the lagging TABLE — ann is half-done
    def statusMulti() = spark.sql(
      "CALL graft_td.system.takedown_status(df_table => 'multi.df', " +
        "sig_table => 'multi.sig', ann_table => 'multi.ann', " +
        "ann_tables => array('multi.ann2'), " +
        "sig_tables => array('multi.sig2'), " +
        s"where => '$where')").collect()
      .map(r => r.getAs[String]("table") -> r.getAs[Long]("members")).toMap
    val mid = statusMulti()
    assert(mid("`graft_td`.`multi`.`ann`") == 0L &&
      mid("`graft_td`.`multi`.`ann2`") > 0L,
      s"the audit must name the lagging TABLE: $mid")
    // one CALL spans all six legs (ledger + df + 2 sigs + 2 anns):
    // done tables no-op, lagging tables retract
    def call() = spark.sql(
      "CALL graft_td.system.takedown(df_table => 'multi.df', " +
        "sig_table => 'multi.sig', sig_tables => array('multi.sig2'), " +
        "ann_table => 'multi.ann', ann_tables => array('multi.ann2'), " +
        s"source_dir => '$sfDir', where => '$where')").collect()
      .map(r => (r.getAs[String]("store"), r.getAs[String]("table")) ->
        r.getAs[String]("status")).toMap
    val r1 = call()
    assert(r1.size == 6, s"want 6 receipt rows (ledger+df+2sig+2ann): $r1")
    assert(r1(("ann_vectors", "`graft_td`.`multi`.`ann`")) == "noop" &&
      r1(("ann_vectors", "`graft_td`.`multi`.`ann2`")) == "retracted" &&
      r1(("signatures", "`graft_td`.`multi`.`sig`")) == "retracted" &&
      r1(("signatures", "`graft_td`.`multi`.`sig2`")) == "retracted" &&
      r1(("doc_freqs", "`graft_td`.`multi`.`df`")) == "retracted", r1)
    // converged: every table's members read 0, and a re-issue no-ops
    assert(statusMulti().values.forall(_ == 0L))
    assert(call().values.forall(_ == "noop"))
    readmitAll()
  }

  test("the OPT-IN corpus leg (round 16): corpus_table DELETEs the " +
    "removed rows LAST — after the df leg read their text — with an " +
    "idempotent receipt; absent corpus_table leaves the corpus alone") {
    buildStores("corpus")
    // the corpus as a catalog table: key = doc_id (decimal string),
    // one 'text' cell — the shape a catalog-managed corpus has
    spark.sql("CREATE TABLE graft_td.corpus.docs")
    val view = "graft_td_corpus_rows"
    graft.Tables.documents(spark, sfDir).select(
        col("doc_id").cast("string").cast("binary").as("key"),
        array(struct(lit("text").cast("binary").as("name"),
          lit("NORMAL").as("state"),
          col("text").cast("binary").as("value"),
          lit(1L).as("timestamp"), lit(0L).as("ttlSecs"),
          lit(0L).as("expiresMillis"))).as("columns"),
        lit(null).cast("struct<localDeletionTime: int, " +
          "markedForDeleteAt: bigint>").as("rowTombstone"))
      .createOrReplaceTempView(view)
    spark.sql(s"INSERT INTO graft_td.corpus.docs SELECT * FROM $view")
    val total = spark.table("graft_td.corpus.docs").count()
    val where = "doc_id % 9 = 4"
    val corpusWhere = "CAST(CAST(key AS STRING) AS BIGINT) % 9 = 4"
    val removed = graft.Tables.documents(spark, sfDir)
      .filter(expr(where)).count()
    def call() = spark.sql(
      "CALL graft_td.system.takedown(df_table => 'corpus.df', " +
        "sig_table => 'corpus.sig', ann_table => 'corpus.ann', " +
        s"source_dir => '$sfDir', where => '$where', " +
        "corpus_table => 'corpus.docs', " +
        s"corpus_where => '$corpusWhere')").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(3))).toMap
    // the audit's optional corpus row surfaces the pre-takedown state
    // (a crash BEFORE the corpus DELETE must be visible, like any leg)
    def statusWithCorpus() = spark.sql(
      "CALL graft_td.system.takedown_status(df_table => 'corpus.df', " +
        "sig_table => 'corpus.sig', ann_table => 'corpus.ann', " +
        s"where => '$where', corpus_table => 'corpus.docs', " +
        s"corpus_where => '$corpusWhere')").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(statusWithCorpus()("corpus") == removed,
      "the audit must count the corpus rows before the takedown")
    val r1 = call()
    assert(r1("corpus") == ((removed, "deleted")), r1)
    assert(r1("doc_freqs")._2 == "retracted", r1)
    // the corpus rows are gone (merge-on-read tombstones), everything
    // else survives
    assert(spark.table("graft_td.corpus.docs").count() == total - removed)
    assert(spark.table("graft_td.corpus.docs")
      .filter(expr(corpusWhere)).count() == 0L)
    // all four legs converged in the same call — the audit's corpus
    // row included
    assert(statusWithCorpus().values.forall(_ == 0L))
    // idempotent: the re-issue no-ops every leg including the corpus
    val r2 = call()
    assert(r2.values.forall(_._2 == "noop"), r2)
    readmitAll()
  }
}
