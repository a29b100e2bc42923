package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The persistent TAKEDOWN LEDGER (round 17, VERDICT r16 missing #1) —
  * what makes a takedown durable across REBUILDS.
  *
  * The per-store retraction primitives deliberately let membership flip
  * in epoch order (an incremental maintainer re-admits a doc whose cells
  * rise above the retraction tombstone — correct for statistics
  * maintenance). But a COMPLIANCE takedown must survive the one
  * operation that used to defeat it silently: a full rebuild, or an
  * incremental ingest, from a corpus that still contains the removed
  * documents — which re-admitted every taken-down id into all derived
  * stores under a success receipt, with nothing persistent recording
  * "these ids were removed on purpose".
  *
  * The ledger is that record. It lives at a WELL-KNOWN location under
  * the catalog warehouse ([[dirUnder]]) as an ordinary SSTable
  * directory — one row per taken-down doc_id, carrying the takedown's
  * predicate — and is consulted by every maintainer that could
  * re-admit: `update_doc_freqs`, `update_signatures`,
  * `build_ann_index`, `update_ann_index`, and (opt-in via their
  * `ledgerDir` parameter) the streaming maintainers. An ingest slice
  * that still contains ledgered ids REFUSES, naming a bounded sample —
  * the same loud-guard pattern as the df store's content-hash refusal,
  * one level up.
  *
  * Lifecycle:
  *  - `CALL takedown` records the slice's ids FIRST, before any leg —
  *    a write-ahead intent: a crash anywhere later leaves the intent
  *    durable and the re-issued CALL converges (the record is
  *    anti-joined, so a re-issue no-ops). A takedown that then REFUSES
  *    in a leg (e.g. the df content-hash guard) leaves its intent
  *    ledgered — deliberate: the removal was requested; either fix the
  *    payload and re-issue, or explicitly [[readmit]] to abandon it.
  *  - `CALL readmit` is the explicit override: it row-tombstones the
  *    matching ledger entries (epoch-ordered, so a LATER takedown of
  *    the same ids rises above the readmission), after which the
  *    maintainers ingest those ids again.
  *  - the PRIMITIVE retraction CALLs (`retract_doc_freqs`,
  *    `retract_signatures`, `retract_ann_vectors`) stay ledger-free on
  *    purpose: they are statistics operations whose membership-flip
  *    semantics incremental pipelines rely on. `CALL takedown` is the
  *    compliance surface; only it writes the ledger.
  *
  * Scale: the ledger is O(taken-down ids) — tiny against the corpus.
  * [[consult]] is one existence check when no ledger exists (zero jobs,
  * the common case), and otherwise one size-gated semi-join (the ledger
  * side broadcasts below [[Params.BroadcastIdMaxRows]]) — the same
  * bounded shape as the maintainers' novelty probe. The ledger read is
  * key-only (Index.db sidecars, no Data.db IO) until a readmission
  * exists, then switches to the delete-aware reconciled scan —
  * identical gating to [[SignatureStore.storedIds]]. */
object TakedownLedger {

  /** The ledger's reserved directory name under a catalog warehouse.
    * The leading underscore keeps it out of namespace listings and out
    * of reach of table DDL (catalog name segments refuse '_' prefixes),
    * so DROP TABLE cannot remove the compliance record. */
  val DirName = "_takedown_ledger"

  def dirUnder(warehouseRoot: String): String =
    s"${warehouseRoot.stripSuffix("/")}/$DirName"

  private val MetaKey = "_meta"

  /** Same 12-digit zero-pad as the signature store's keys: ids sort
    * numerically and parse back by position. */
  private def keyOf(docId: org.apache.spark.sql.Column) =
    lpad(docId.cast("string"), 12, "0").cast("binary")

  private def storageFor(s: SparkSession, dir: String) =
    graft.sources.sstable.Storage.forPath(dir, s.sessionState.newHadoopConf())

  /** Newest registered write epoch — the single-LWW-`emax`-cell pattern
    * of [[SignatureStore]] (readmission tombstones and re-takedown
    * cells shadow each other in write order). */
  private def maxEpochOf(dir: String,
                         storage: graft.sources.sstable.Storage): Int =
    graft.sources.sstable.SSTableReader.liveCellMap(dir, storage, MetaKey)
      .get("emax").map(_.toInt).getOrElse(1)

  /** Whether any [[readmit]] epoch ever landed — switches [[entries]]
    * to the delete-aware scan (before that, key-only/indexOnly). */
  private def hasReadmissions(dir: String,
                              storage: graft.sources.sstable.Storage): Boolean =
    graft.sources.sstable.SSTableReader.liveCellMap(dir, storage, MetaKey)
      .contains("readmitted")

  private def exists(s: SparkSession, dir: String): Boolean = {
    val storage = storageFor(s, dir)
    storage.exists(dir) && storage.listDataFiles(dir).nonEmpty
  }

  /** Live ledger entries: (doc_id, predicate, epoch). */
  def entries(s: SparkSession, dir: String): DataFrame = {
    val storage = storageFor(s, dir)
    val raw = s.read.format("sstable").load(dir)
      .filter(col("key") =!= lit(MetaKey.getBytes))
    val live = if (hasReadmissions(dir, storage))
      SSTableOps.suppressTombstones(raw) else raw
    live.select(col("key").cast("string").cast("bigint").as("doc_id"),
      explode(col("columns")).as("c"))
      .filter(col("c.name").cast("string") === "pred")
      .select(col("doc_id"), col("c.value").cast("string").as("predicate"),
        col("c.timestamp").cast("int").as("epoch"))
  }

  /** Live ledgered doc_ids — [[consult]]'s relation. Key-only until a
    * readmission exists (the same one-way switch as
    * [[SignatureStore.storedIds]]). */
  def ledgeredIds(s: SparkSession, dir: String): DataFrame = {
    val storage = storageFor(s, dir)
    val raw = s.read.format("sstable").load(dir)
      .filter(col("key") =!= lit(MetaKey.getBytes))
    (if (hasReadmissions(dir, storage))
      SSTableOps.suppressTombstones(raw) else raw)
      .select(col("key").cast("string").cast("bigint").as("doc_id"))
  }

  private def metaRow(s: SparkSession, epoch: Int,
                      extra: Seq[(String, String)] = Nil): DataFrame = {
    def cell(name: String, v: String) =
      struct(lit(name).cast("binary").as("name"), lit("NORMAL").as("state"),
        lit(v).cast("binary").as("value"), lit(epoch.toLong).as("timestamp"),
        lit(0L).as("ttlSecs"), lit(0L).as("expiresMillis"))
    s.range(1).select(lit(MetaKey).cast("binary").as("key"),
      array((("emax" -> epoch.toString) +: extra).map {
        case (n, v) => cell(n, v)
      }: _*).as("columns"),
      lit(null).cast("struct<localDeletionTime: int, " +
        "markedForDeleteAt: bigint>").as("rowTombstone"))
  }

  /** Record a takedown's ids (the source slice matching the predicate)
    * as ledger entries. Idempotent: already-ledgered ids are anti-joined
    * away, so a re-issued takedown records nothing. Returns
    * (newly ledgered, epoch); epoch 0 = nothing new. */
  /** Write-triggered self-maintenance (the df/signature stores'
    * shape): every [[record]]/[[readmit]] appends a generation, and
    * [[consult]]'s ledger read costs O(generations) — without a fold
    * a long takedown history would slowly tax every maintenance
    * ingest. Runs AFTER the writer's lease released (autoCompact takes
    * the lease itself; a concurrent holder makes it yield — the
    * volunteer contract). */
  private val AutoCompactAbove = 8
  private def runAutocompact(s: SparkSession, dir: String,
                             storage: graft.sources.sstable.Storage): Unit =
    if (storage.listDataFiles(dir).length > AutoCompactAbove)
      // full STCS, not the data-generation-only autoCompact shape:
      // readmissions append DELETE-ONLY generations which that path
      // deliberately withholds (and whose keys overlap live entries, so
      // the isolated-tombstone compactor never picks them either) — a
      // readmit-heavy ledger folds its whole history the way the
      // catalog's DELETE + CALL compact pair does. Volunteer semantics:
      // a held lease yields rather than failing the write that merely
      // volunteered.
      graft.sources.sstable.MaintenanceLease.volunteer(
        SSTableOps.compactInPlace(s, dir, minThreshold = 4))

  def record(s: SparkSession, dir: String, sourceDir: String,
             whereSql: String): (Long, Int) = {
    val storage = storageFor(s, dir)
    // the removal set spans BOTH id-bearing relations of the source
    // (review find): the ANN legs retract by the same predicate over
    // vec_id, and a corpus can hold vectors whose ids have no documents
    // row (a purged-text modality) — ledgering only the documents slice
    // would let a later ANN rebuild silently re-admit exactly the ids
    // only the index held. doc_id and vec_id share one id domain.
    val srcStorage = graft.sources.sstable.Storage.forPath(sourceDir,
      s.sessionState.newHadoopConf())
    val docIds = if (srcStorage.exists(s"$sourceDir/documents.parquet"))
      Some(graft.Tables.documents(s, sourceDir)
        .filter(expr(whereSql)).select(col("doc_id"))) else None
    val vecIds = if (srcStorage.exists(s"$sourceDir/embeddings.parquet")) {
      val rel = graft.Tables.embeddings(s, sourceDir)
        .select(col("vec_id").as("doc_id"))
      // the takedown contract writes the predicate over doc_id (the
      // sig/ANN legs filter id-only relations), but the df-leg
      // primitives also accept CONTENT predicates over the documents
      // relation — such a predicate cannot resolve against this id-only
      // relation (review find: a hard throw here would abort the whole
      // takedown before any intent was recorded). Content predicates
      // can only ever select document-bearing ids, so fall back to the
      // documents slice semi-joined onto the embeddings ids; a
      // vector-only corpus (no documents relation) has nothing to fall
      // back to and the unresolved-column refusal stands.
      Some(try rel.filter(expr(whereSql)).select(col("doc_id"))
        catch {
          case e: org.apache.spark.sql.AnalysisException =>
            docIds.map(d => rel.join(d, Seq("doc_id"), "left_semi"))
              .getOrElse(throw e)
        })
    } else None
    require(docIds.nonEmpty || vecIds.nonEmpty,
      s"the takedown payload at $sourceDir holds neither " +
        "documents.parquet nor embeddings.parquet — nothing identifies " +
        "the removed ids")
    val ids = (docIds.toSeq ++ vecIds.toSeq).reduce(_ unionAll _)
      .dropDuplicates("doc_id")
    val stats = ids.agg(count(lit(1)), min(col("doc_id")),
      max(col("doc_id"))).head()
    if (stats.getLong(0) == 0) return (0L, 0)
    DfStore.requireDocIdRange(stats.getLong(1), stats.getLong(2),
      s"the takedown slice for the ledger at $dir")
    storage.mkdirs(dir)
    val receipt = graft.sources.sstable.MaintenanceLease.withLease(dir, storage,
      "takedown_ledger") { _ =>
      val fresh = storage.listDataFiles(dir).isEmpty
      val novel = (if (fresh) ids
        else ids.join(ledgeredIds(s, dir), Seq("doc_id"), "left_anti"))
        .persist()
      try {
        val n = novel.count()
        if (n == 0) (0L, 0)
        else {
          val epoch = maxEpochOf(dir, storage) + 1
          val before = storage.listDataFiles(dir)
          novel.select(keyOf(col("doc_id")).as("key"),
              array(struct(lit("pred").cast("binary").as("name"),
                lit("NORMAL").as("state"),
                lit(whereSql).cast("binary").as("value"),
                lit(epoch.toLong).as("timestamp"),
                lit(0L).as("ttlSecs"), lit(0L).as("expiresMillis")))
                .as("columns"),
              lit(null).cast("struct<localDeletionTime: int, " +
                "markedForDeleteAt: bigint>").as("rowTombstone"))
            .unionAll(metaRow(s, epoch))
            .write.format("sstable")
            .option(graft.sources.sstable.spark.SSTableSource.JobTagOption,
              f"tdl$epoch%06d")
            .mode("append").save(dir)
          graft.sources.sstable.History.record(storage, dir,
            "takedown_ledger_record",
            added = storage.listDataFiles(dir).diff(before),
            removed = Nil,
            detail = s"ids=$n epoch=$epoch pred=$whereSql")
          (n, epoch)
        }
      } finally novel.unpersist()
    }
    if (receipt._1 > 0) runAutocompact(s, dir, storage)
    receipt
  }

  /** The explicit override: row-tombstone the ledger entries matching
    * `whereSql` (over doc_id), re-opening those ids to the maintainers.
    * Epoch-ordered like every store: a LATER takedown of the same ids
    * rises above this readmission. Returns (readmitted, epoch); epoch
    * 0 = nothing matched. */
  def readmit(s: SparkSession, dir: String, whereSql: String): (Long, Int) = {
    require(exists(s, dir),
      s"no takedown ledger at $dir — nothing to readmit")
    val storage = storageFor(s, dir)
    val receipt = graft.sources.sstable.MaintenanceLease.withLease(dir, storage,
      "readmit") { _ =>
      val victims = ledgeredIds(s, dir).filter(expr(whereSql)).persist()
      try {
        val matched = victims.count()
        if (matched == 0) (0L, 0)
        else {
          val epoch = maxEpochOf(dir, storage) + 1
          val before = storage.listDataFiles(dir)
          // flag-first, two appends (the SignatureStore.retract shape):
          // a crash between them leaves a flagged ledger with no
          // tombstones — the slower delete-aware read, never a wrong
          // answer; the tombstone generation stays PURE so the
          // DeleteShadow hoist applies
          metaRow(s, epoch, Seq("readmitted" -> epoch.toString))
            .write.format("sstable")
            .option(graft.sources.sstable.spark.SSTableSource.JobTagOption,
              f"tdlrm$epoch%06d")
            .mode("append").save(dir)
          victims.select(keyOf(col("doc_id")).as("key"),
              array().cast("array<struct<name: binary, state: string, " +
                "value: binary, timestamp: bigint, ttlSecs: bigint, " +
                "expiresMillis: bigint>>").as("columns"),
              struct(lit(epoch).as("localDeletionTime"),
                lit(epoch.toLong).as("markedForDeleteAt")).as("rowTombstone"))
            .write.format("sstable")
            .option(graft.sources.sstable.spark.SSTableSource.JobTagOption,
              f"tdlr$epoch%06d")
            .mode("append").save(dir)
          graft.sources.sstable.History.record(storage, dir, "readmit",
            added = storage.listDataFiles(dir).diff(before),
            removed = Nil,
            detail = s"ids=$matched epoch=$epoch pred=$whereSql")
          (matched, epoch)
        }
      } finally victims.unpersist()
    }
    if (receipt._1 > 0) runAutocompact(s, dir, storage)
    receipt
  }

  /** The maintainers' guard: refuse when the ingest slice still
    * contains ledgered ids. `sliceIds` needs one `doc_id` column (ANN
    * maintainers alias vec_id — same id domain, vectors are keyed by
    * their document). No ledger directory, or an empty one, is ZERO
    * jobs — one driver-side existence check. */
  def consult(s: SparkSession, ledgerDir: Option[String],
              sliceIds: DataFrame, operation: String,
              target: String): Unit =
    ledgerDir.filter(exists(s, _)).foreach { dir =>
      val led = ledgeredIds(s, dir).persist()
      try {
        val ln = led.count()
        if (ln > 0) {
          val fetch = if (ln <= Params.BroadcastIdMaxRows) broadcast(led)
            else led
          val hits = sliceIds.select(col("doc_id"))
            .join(fetch, Seq("doc_id"), "left_semi").persist()
          try {
            val n = hits.count()
            if (n > 0) {
              val sample = hits.orderBy("doc_id").limit(5).collect()
                .map(_.getLong(0)).mkString(", ")
              throw new IllegalStateException(
                s"$operation on $target: the ingest slice contains $n " +
                  s"taken-down document(s) (e.g. ids $sample) recorded " +
                  s"in the takedown ledger at $dir — ingesting them " +
                  "would silently re-admit removed content under a " +
                  "success receipt. Remove them from the source (or " +
                  "narrow the where clause), or CALL readmit(...) to " +
                  "deliberately clear their ledger entries first")
            }
          } finally hits.unpersist()
        }
      } finally led.unpersist()
    }
}
