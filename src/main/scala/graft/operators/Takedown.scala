package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-store takedown orchestration (round 16, VERDICT r15 missing
  * #1) — the operation a real removal request runs. A document that
  * must leave a 100 TB pipeline lives in (at least) three derived
  * stores: the df/IDF store's additive statistics, the MinHash
  * signature store's fingerprints, and the ANN index's encoded
  * vectors. The per-store retraction primitives (round 15) are each
  * atomic and idempotent — but issued by hand they are three CALLs,
  * and a crash between them leaves the stores silently disagreeing
  * about the document's membership with nothing reporting the skew.
  *
  * [[takedown]] drives all the legs in one call and returns ONE receipt
  * (a row per (store kind, table)); [[status]] is the spanning
  * membership audit — for a given id predicate it reports how many
  * members each store still has, so a crash between legs is VISIBLE
  * (the lagging table names itself with a non-zero count) instead of
  * silent.
  *
  * A corpus typically backs SEVERAL derived stores per kind (one ANN
  * index per modality or embedding version, several df stores) — the
  * legs are therefore LISTS (round 17, VERDICT r16 missing #4): one
  * CALL spans every (df, signature, ANN) table of the pipeline, one
  * receipt row per table, and the audit names the lagging TABLE, not
  * just the lagging store kind.
  *
  * Durability (round 17, VERDICT r16 missing #1): before any leg runs,
  * the takedown records its ids in the persistent [[TakedownLedger]] —
  * a write-ahead intent that the ingest maintainers consult, so a
  * REBUILD from a corpus that still contains the removed documents
  * refuses loudly instead of silently re-admitting them. `CALL
  * readmit` is the explicit override.
  *
  * Composition rules, all inherited from the legs:
  *  - each leg runs under ITS OWN store's maintenance lease — there is
  *    deliberately no global lock (stores on distinct storage roots
  *    cannot be atomically fenced anyway); the unit of atomicity is the
  *    leg, exactly like the crash model;
  *  - every leg is IDEMPOTENT (an already-retracted id reports
  *    matched=0), so crash recovery is RE-ISSUING THE SAME CALL: legs
  *    that completed no-op, legs that didn't complete run — the
  *    orchestration converges without tracking which leg died;
  *  - the predicate is written over `doc_id`; the ANN legs see the same
  *    ids under the `doc_id` alias of their `vec_id` relation (vectors
  *    are keyed by their document), so ONE predicate spans all legs;
  *  - leg order is ledger -> df -> signatures -> ann: the df legs carry
  *    the strictest guards (content hash, sufficiency) and read the
  *    takedown payload's text, so anything refusable refuses before
  *    any DERIVED store changed... with one deliberate exception: a leg
  *    failure does NOT roll back earlier legs (there is nothing to
  *    roll back to — retraction is the goal), it surfaces in the
  *    receipt-turned-exception and the re-issue converges. The ledger
  *    deliberately records BEFORE the refusable legs: the removal
  *    intent is durable even through a refused first attempt (fix the
  *    payload and re-issue, or readmit to abandon).
  *
  * The CORPUS table itself is an OPT-IN final leg (`corpusTable`,
  * round 16): when the corpus lives in a session-visible table, one
  * takedown can DELETE its rows too — run LAST, because the df legs
  * read the removed docs' text from `sourceDir`, which is often the
  * corpus itself. By default there is no corpus leg: corpora are
  * deleted by their own owners' mechanics (DELETE FROM a catalog
  * table, partition drops on parquet), and every leg here tolerates
  * the doc being ALREADY gone from the corpus — the df legs read
  * (doc_id, text) from ANY directory holding the removed docs' rows
  * (the takedown payload), verified by content hash. Delete the
  * corpus rows before or after; the legs compose either way. */
object Takedown {

  /** One leg's receipt: which store kind, which table (qualified name,
    * or the store directory for dir-addressed legs), how many members
    * the predicate matched (0 = the leg was already done — the
    * convergence signal), the registered retraction epoch ("" when
    * nothing was written), and the leg's status. */
  final case class Leg(store: String, matched: Long, epochTag: String,
                       status: String, table: String)

  /** Run the retraction legs in order. `sigTables`/`annTables` are
    * (qualifiedSqlName, directory) pairs resolved by the caller (the
    * CALL surface passes the catalog's own resolution); each entry in
    * `dfStores` is a df leg's target — a catalog table (Left of the
    * same pair, retracted via [[DfStore.retract]]) or a
    * STREAM-maintained store directory (Right, retracted via
    * [[DfStore.retractStream]] in the stream's own epoch-tag domain),
    * so one takedown spans pipelines whose statistics are maintained by
    * a live stream without falling back to hand-issued CALLs (the
    * orchestration's whole point); `sourceDir` is wherever the removed
    * docs' (doc_id, text) rows can be read NOW — the pinned corpus or
    * the takedown payload. `ledgerDir` (Some on the CALL surface)
    * records the removal intent durably before any leg. */
  def takedown(s: SparkSession,
               dfStores: Seq[Either[(String, String), String]],
               sigTables: Seq[(String, String)],
               annTables: Seq[(String, String)],
               sourceDir: String, whereSql: String,
               unit: String = "term",
               corpusTable: Option[String] = None,
               corpusWhere: Option[String] = None,
               ledgerDir: Option[String] = None,
               ledgerScope: Option[String] = None): Seq[Leg] = {
    val ledgerLeg = ledgerDir.map { dir =>
      val (n, epoch) =
        TakedownLedger.record(s, dir, sourceDir, whereSql, ledgerScope)
      Leg("ledger", n, if (epoch == 0) "" else f"$epoch%06d",
        if (n == 0) "noop" else "recorded", dir)
    }
    val dfLegs = dfStores.map {
      case Left((dfName, dfDir)) =>
        val (_, matched, _, epoch, _) =
          DfStore.retract(s, dfName, () => dfDir, sourceDir, whereSql, unit)
        Leg("doc_freqs", matched,
          if (epoch == 0) "" else f"$epoch%06d",
          if (matched == 0) "noop" else "retracted", dfName)
      case Right(dir) =>
        val storage = graft.sources.sstable.Storage.forPath(dir,
          s.sessionState.newHadoopConf())
        val (_, matched, _, rtag, _) =
          DfStore.retractStream(s, dir, sourceDir, whereSql, unit, storage)
        Leg("doc_freqs", matched, rtag,
          if (matched == 0) "noop" else "retracted", dir)
    }
    val sigLegs = sigTables.map { case (sigName, sigDir) =>
      val (sigMatched, sigEpoch) =
        SignatureStore.retract(s, sigName, () => sigDir, whereSql)
      Leg("signatures", sigMatched,
        if (sigEpoch == 0) "" else f"$sigEpoch%06d",
        if (sigMatched == 0) "noop" else "retracted", sigName)
    }
    val annLegs = annTables.map { case (annName, annDir) =>
      val (annMatched, annEpoch) =
        AnnIndex.retractVectors(s, annName, annDir, whereSql)
      Leg("ann_vectors", annMatched,
        if (annEpoch == 0) "" else f"$annEpoch%06d",
        if (annMatched == 0) "noop" else "retracted", annName)
    }
    // the OPTIONAL corpus leg (round 16): when the corpus lives in a
    // catalog table, one takedown can remove its rows too — DELETE FROM
    // in the table's own predicate terms (`corpusWhere`; defaults to
    // the id predicate, which works when the table exposes doc_id).
    // Deliberately LAST: the df legs read the removed docs' text from
    // `sourceDir`, which is often the corpus itself — deleting first
    // would empty the retraction slice and the statistics would
    // silently keep counting the removed docs. (A corpus deleted by
    // its own mechanics BEFORE the takedown still composes: point
    // sourceDir at the takedown payload.) Idempotent like every leg.
    val corpusLeg = corpusTable.map { t =>
      val pred = corpusWhere.getOrElse(whereSql)
      val before = s.table(t).filter(expr(pred)).count()
      if (before == 0) Leg("corpus", 0, "", "noop", t)
      else {
        s.sql(s"DELETE FROM $t WHERE $pred")
        // receipt = rows ACTUALLY removed (before - after), not the
        // pre-DELETE count: a concurrent insert/delete between the two
        // jobs would otherwise make `matched` disagree with what
        // happened, and a racing insert could even leave rows behind
        // under a confident receipt (ADVICE r16). The re-count also
        // means a non-zero `after` — rows inserted DURING the DELETE —
        // surfaces on the next idempotent re-issue rather than hiding.
        val after = s.table(t).filter(expr(pred)).count()
        Leg("corpus", math.max(0L, before - after), "",
          if (after == 0) "deleted" else "partial", t)
      }
    }
    ledgerLeg.toSeq ++ dfLegs ++ sigLegs ++ annLegs ++ corpusLeg
  }

  /** Per-store live members matching the predicate — the spanning
    * audit's relations. Shared by [[status]] and the takedown serving
    * queries (the hash gate reads these exact relations). */
  def memberships(s: SparkSession, dfDir: String, sigDir: String,
                  annDir: String, whereSql: String = "true")
      : Seq[(String, DataFrame)] = Seq(
    "doc_freqs" -> DfStore.storedDocIds(s, dfDir)
      .filter(expr(whereSql)).select(col("doc_id").as("id")),
    "signatures" -> SignatureStore.storedIds(s, sigDir)
      .filter(expr(whereSql)).select(col("doc_id").as("id")),
    "ann_vectors" -> AnnIndex.indexedVecIds(s, annDir)
      .withColumn("doc_id", col("vec_id"))
      .filter(expr(whereSql)).select(col("vec_id").as("id")))

  /** One store kind's membership relation by directory — [[status]]'s
    * per-table building block (and the spanning serving queries'). */
  private[operators] def membershipOf(s: SparkSession, kind: String,
                                      dir: String, whereSql: String): DataFrame =
    kind match {
      case "doc_freqs" => DfStore.storedDocIds(s, dir)
        .filter(expr(whereSql)).select(col("doc_id").as("id"))
      case "signatures" => SignatureStore.storedIds(s, dir)
        .filter(expr(whereSql)).select(col("doc_id").as("id"))
      case "ann_vectors" => AnnIndex.indexedVecIds(s, dir)
        .withColumn("doc_id", col("vec_id"))
        .filter(expr(whereSql)).select(col("vec_id").as("id"))
    }

  /** The spanning membership audit: for each (store kind, table), how
    * many live members match the predicate, with a bounded id sample.
    * After a completed takedown every count is 0; after a crash between
    * legs the lagging table(s) carry non-zero counts and name
    * themselves. Read-only — safe against live maintainers (each
    * relation is a consistent published-fileset read). Each leg list is
    * (label, directory) — the label is what the receipt names (the
    * qualified table, or the directory for dir-addressed stores). */
  def status(s: SparkSession,
             dfDirs: Seq[(String, String)],
             sigDirs: Seq[(String, String)],
             annDirs: Seq[(String, String)], whereSql: String)
      : Seq[(String, String, Long, Seq[Long])] = {
    val all = dfDirs.map(("doc_freqs", _)) ++
      sigDirs.map(("signatures", _)) ++ annDirs.map(("ann_vectors", _))
    all.map { case (kind, (label, dir)) =>
      val m = membershipOf(s, kind, dir, whereSql).persist()
      try {
        val n = m.count()
        val sample = m.orderBy("id").limit(5).collect()
          .map(_.getLong(0)).toSeq
        (kind, label, n, sample)
      } finally m.unpersist()
    }
  }
}
