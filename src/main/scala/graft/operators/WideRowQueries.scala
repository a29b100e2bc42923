package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Params._

/** Declared queries for the SSTable merge-semantics surface (SURVEY.md §2.8,
  * rows q_lww_* / q_tombstone_filter / q_ttl_expiry / q_range_splits /
  * q_export_b64). The `events` table models the wide-row world: `user_id` ≈
  * row key, `event_type` ≈ column name, `ts` ≈ write timestamp; the newest
  * `error` event per user stands in for a tombstone (the harness data has
  * no literal `delete` type).
  */
object WideRowQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1 — SSTableDataReducer: latest column per row key.
    "q_lww_latest_per_key" -> ((s, d) => {
      val e = Tables.events(s, d).select("user_id", "event_type", "ts_ms", "value")
      WideRowOps.latestPerKey(e, Seq("user_id"), "ts_ms", Seq("event_type"))
        .select(col("user_id"), col("ts_ms"), col("event_type"),
          e4(col("value")).as("value_e4"))
        .orderBy("user_id")
    }),
    // A2 — MsgPackSSTableDataReducer: latest version of each (row, column).
    "q_lww_merge_columns" -> ((s, d) => {
      val e = Tables.events(s, d).select("user_id", "event_type", "ts_ms", "value")
      WideRowOps.latestPerCell(e, Seq("user_id"), "event_type", "ts_ms")
        .select(col("user_id"), col("event_type"), col("ts_ms"),
          e4(col("value")).as("value_e4"))
        .orderBy("user_id", "event_type")
    }),
    // A2 through the REAL merge operator: events lifted into the nested
    // SSTable scan schema (user_id ≈ row key, event_type ≈ column name,
    // e4-scaled value as bytes), folded by SSTableOps.compactRows, and
    // exploded back — same LWW winners as q_lww_merge_columns, but the
    // oracle now drives the exact operator the compaction/probe paths
    // run, not a relational twin.
    "q_compact_rows" -> ((s, d) =>
      compactedEvents(s, d, WideRowOps.CompactPlain)),
    // the skew-safe salted variant must be indistinguishable end-to-end
    "q_compact_salted" -> ((s, d) =>
      compactedEvents(s, d, WideRowOps.CompactSalted(8))),
    // P7 — tombstone suppression (DELETED state dispatch).
    "q_tombstone_filter" -> ((s, d) => {
      val e = Tables.events(s, d)
      WideRowOps.suppressTombstoned(e, Seq("user_id"), "ts_ms",
          col("event_type") === "error")
        .select("event_id", "user_id", "event_type", "ts_ms")
        .orderBy("event_id")
    }),
    // P8 — TTL expiry as an explicit opt-in filter.
    "q_ttl_expiry" -> ((s, d) => {
      val e = Tables.events(s, d)
      e.filter(WideRowOps.ttlLive(e, "ts_ms", TtlMs, AsOfMs))
        .select("event_id", "user_id", "event_type", "ts_ms")
        .orderBy("event_id")
    }),
    // A4 — boundary-threshold split planning as window aggregation; the
    // stitched form keeps row-level windows partitioned (by coarse day
    // range), with the one ordered pass over the per-range summary only.
    "q_range_splits" -> ((s, d) => {
      val e = Tables.events(s, d).select("ts_ms")
      WideRowOps.gapBucketsStitched(e, "ts_ms", SplitGapMs, coarseMs = 86400000L)
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), min("ts_ms").as("ts_min_ms"),
          max("ts_ms").as("ts_max_ms"))
        .orderBy("bucket")
    }),
    // P5/K2 — Base64 text-transport export (msgpack sink's oracle-able half).
    "q_export_b64" -> ((s, d) => {
      Tables.events(s, d)
        .select(base64(concat_ws("|", col("user_id"), col("event_type"),
          col("ts_ms")).cast("binary")).as("line"))
        .orderBy("line")
    }),
    // S1-S7 through the REAL physical path: events lifted into the scan
    // schema, written ONCE through the DSv2 sstable writer (staged
    // commit, real Cassandra 1.2 codec, blooms, Statistics), read back
    // through the cells view (one row per cell), and hash-compared to
    // DuckDB over the source parquet — the correctness gate now drives
    // writer + reader + codec end-to-end, not just relational twins.
    "q_sstable_cells" -> ((s, d) => {
      val dir = sstableFixture(s, d)
      s.read.format("sstable").option("view", "cells").load(dir)
        .select(col("key").cast("string").cast("long").as("user_id"),
          col("name").cast("string").as("event_type"),
          col("value").cast("string").cast("long").as("value_e4"),
          col("timestamp").as("ts_ms"))
        .orderBy("user_id", "event_type", "ts_ms", "value_e4")
    }),
    // A2 over the REAL files: scan the physical fixture (every event its
    // own single-cell row version), fold through compactRows — the exact
    // operator compaction and the probe path run — and explode back; the
    // oracle is the same per-(user, event) LWW winner the in-memory
    // q_compact_rows proves, now derived from bytes the codec wrote.
    "q_sstable_compact" -> ((s, d) => {
      val dir = sstableFixture(s, d)
      SSTableOps.compactRows(s.read.format("sstable").load(dir))
        .select(col("key"), explode(col("columns")).as("c"))
        .select(col("key").cast("string").cast("long").as("user_id"),
          col("c.name").cast("string").as("event_type"),
          col("c.timestamp").as("ts_ms"),
          col("c.value").cast("string").cast("long").as("value_e4"))
        .orderBy("user_id", "event_type")
    }),
    // The pushed top-n, oracled over REAL written bytes: ORDER BY key
    // LIMIT k on the physical fixture rides SupportsPushDownTopN (each
    // split decodes at most k head rows — generations are key-sorted),
    // and the oracle re-derives the same multiset from the parquet
    // source. Binary key order == UTF-8 string order of the decimal
    // user_id, matched by DuckDB's binary VARCHAR collation; equal-key
    // row versions are interchangeable because only the key is projected,
    // so the smallest-k multiset is unique.
    "q_sstable_topk" -> ((s, d) => {
      val dir = sstableFixture(s, d)
      s.read.format("sstable").load(dir)
        .orderBy("key").limit(SstableTopK)
        .select(col("key").cast("string").as("user_key"))
        .orderBy("user_key")
    }),
    // Incremental epoch-diff over the REAL files: the fixture is built
    // as two write epochs split on the asof cut — epoch 1 written, then
    // hardlink-snapshotted as the floor tag, then epoch 2 appended. The
    // sincesnapshot read plans ONLY the generations outside the pin
    // (exclusion at file listing), so the cells view yields exactly the
    // post-cut events; the oracle re-derives them with a WHERE on the
    // same cut. This is the 100 TB re-processing loop under the hash
    // gate: read since the previous epoch's tag, touch only the delta.
    "q_sstable_since" -> ((s, d) => {
      val dir = sstableSinceFixture(s, d)
      s.read.format("sstable").option("sincesnapshot", SinceFloorTag)
        .option("view", "cells").load(dir)
        .select(col("key").cast("string").cast("long").as("user_id"),
          col("name").cast("string").as("event_type"),
          col("value").cast("string").cast("long").as("value_e4"),
          col("timestamp").as("ts_ms"))
        .orderBy("user_id", "event_type", "ts_ms", "value_e4")
    }),
    // Row-level DELETE over the REAL files: a deterministic user subset
    // (user_id % 10 == DeleteUserMod) is deleted through the table's
    // SupportsDelete path — ONE appended tombstone generation, mark
    // pinned via the deletemarkmicros property for rerun determinism —
    // and the delete-aware cells view must show exactly the complement;
    // the oracle keeps the same complement with a WHERE. Exercises
    // tombstone write + sidecar classification + shadow map + reader
    // shadowing under the hash gate.
    "q_sstable_delete" -> ((s, d) => {
      val dir = sstableDeleteFixture(s, d)
      s.read.format("sstable").option("applydeletes", "true")
        .option("view", "cells").load(dir)
        .select(col("key").cast("string").cast("long").as("user_id"),
          col("name").cast("string").as("event_type"),
          col("value").cast("string").cast("long").as("value_e4"),
          col("timestamp").as("ts_ms"))
        .orderBy("user_id", "event_type", "ts_ms", "value_e4")
    }),
    // SQL MERGE INTO over the REAL files through the catalog: the
    // compacted corpus becomes a catalog table, one MERGE statement
    // updates every MergeUserMod user to a single 'merged' cell and
    // inserts a synthetic twin user (not-matched branch) — the
    // delta-based row-level path (tombstone generation + stamped
    // re-inserts, nothing rewritten). The delete-aware cells view must
    // show the untouched complement cell-for-cell plus the merged/new
    // rows at the statement's write timestamp (max corpus ts + 2,
    // deterministic), which the oracle recomputes relationally.
    "q_sstable_merge" -> ((s, d) => {
      val dir = sstableMergeFixture(s, d)
      s.read.format("sstable").option("applydeletes", "true")
        .option("view", "cells").load(dir)
        .select(col("key").cast("string").cast("long").as("user_id"),
          col("name").cast("string").as("event_type"),
          col("value").cast("string").cast("long").as("value_e4"),
          col("timestamp").as("ts_ms"))
        .orderBy("user_id", "event_type", "ts_ms", "value_e4")
    }),
    // The full-sync MERGE over the REAL files (the third branch family
    // under the hash gate): the LWW-compacted corpus becomes a catalog
    // table, the source holds ONLY the kept users (user_id % 10 <>
    // SyncDropMod) each with one 'synced' cell, and a single statement
    // updates every matched user while WHEN NOT MATCHED BY SOURCE THEN
    // DELETE tombstones everyone the source no longer lists — the
    // classic dimension-sync shape. The delete-aware cells view must
    // show exactly one synced cell per kept user at the statement
    // timestamp (max corpus ts + 2), which the oracle recomputes.
    "q_sstable_sync" -> ((s, d) => {
      val dir = sstableSyncFixture(s, d)
      s.read.format("sstable").option("applydeletes", "true")
        .option("view", "cells").load(dir)
        .select(col("key").cast("string").cast("long").as("user_id"),
          col("name").cast("string").as("event_type"),
          col("value").cast("string").cast("long").as("value_e4"),
          col("timestamp").as("ts_ms"))
        .orderBy("user_id", "event_type", "ts_ms", "value_e4")
    }),
    // The SQL bucketed-table lifecycle over REAL files: CREATE TABLE
    // with TBLPROPERTIES('buckets'=8), INSERT INTO through the
    // FunctionCatalog-resolved bucket-clustered write (one rolling
    // bucket-NNNNN generation per bucket), the deterministic user
    // subset deleted through the bucketed metadata-delete path (one
    // tombstone generation per AFFECTED bucket, same stems), read back
    // delete-aware through the cells view. Same logical complement as
    // q_sstable_delete — proving the bucketed write path preserves
    // content cell-for-cell while laying the zero-exchange layout.
    "q_sstable_bucketed" -> ((s, d) => {
      val dir = sstableBucketedFixture(s, d)
      s.read.format("sstable").option("applydeletes", "true")
        .option("view", "cells").load(dir)
        .select(col("key").cast("string").cast("long").as("user_id"),
          col("name").cast("string").as("event_type"),
          col("value").cast("string").cast("long").as("value_e4"),
          col("timestamp").as("ts_ms"))
        .orderBy("user_id", "event_type", "ts_ms", "value_e4")
    }),
    // The atomic SQL build lifecycle over REAL files, every step's
    // failure observable in the final state: CTAS materializes the full
    // corpus (stage → one-rename commit), TRUNCATE empties the scratch
    // copy (leftovers would surface as duplicate cells), INSERT refills
    // it with the WRONG subset (the doomed users), and one REPLACE
    // TABLE … AS SELECT atomically swaps in the right complement from a
    // BUCKETED CTAS (hash-routed layout read back through the catalog).
    // The delete-aware cells view of the end state must equal the
    // complement cell-for-cell — a broken stage commit, non-emptying
    // truncate, or non-swapping replace each leaves extra/missing cells.
    "q_sstable_ctas" -> ((s, d) => {
      val dir = sstableCtasFixture(s, d)
      s.read.format("sstable").option("applydeletes", "true")
        .option("view", "cells").load(dir)
        .select(col("key").cast("string").cast("long").as("user_id"),
          col("name").cast("string").as("event_type"),
          col("value").cast("string").cast("long").as("value_e4"),
          col("timestamp").as("ts_ms"))
        .orderBy("user_id", "event_type", "ts_ms", "value_e4")
    }),
    // Rollback over the REAL files: epoch 1 (pre-cut events) pinned as
    // a snapshot, then WRONGED twice — the post-cut epoch appended AND a
    // deterministic user subset tombstoned — and restored with one
    // rollbackToSnapshot. The cells view of the end state must equal
    // epoch 1 cell-for-cell: a rollback that misses an appended
    // generation leaves post-cut cells, one that fails to relink a
    // pinned fileset loses pre-cut cells, and one that leaves the
    // tombstone generation keeps shadowing the deleted users (the read
    // is delete-AWARE, so a surviving tombstone is observable).
    "q_sstable_rollback" -> ((s, d) => {
      val dir = sstableRollbackFixture(s, d)
      s.read.format("sstable").option("applydeletes", "true")
        .option("view", "cells").load(dir)
        .select(col("key").cast("string").cast("long").as("user_id"),
          col("name").cast("string").as("event_type"),
          col("value").cast("string").cast("long").as("value_e4"),
          col("timestamp").as("ts_ms"))
        .orderBy("user_id", "event_type", "ts_ms", "value_e4")
    }),
    // Write-triggered auto-compaction over the REAL files: the corpus
    // arrives in six epoch writes with `autocompact = 3`, so the
    // committing writers themselves fold the directory back to the
    // bound (the fixture REQUIRES <= 3 generations — a broken trigger
    // fails loudly, not as a slow directory). Folds LWW-merge cell
    // versions, so the gated invariant is the RECONCILED state: the
    // compacted read of the self-maintained directory must equal the
    // q_sstable_compact winners exactly — a fold that drops a
    // generation, resurrects a shadowed version, or re-stamps a cell
    // is a hash mismatch.
    "q_sstable_autocompact" -> ((s, d) => {
      val (dir, _) = sstableAutoCompactFixture(s, d)
      SSTableOps.compactRows(s.read.format("sstable").load(dir))
        .select(col("key"), explode(col("columns")).as("c"))
        .select(col("key").cast("string").cast("long").as("user_id"),
          col("c.name").cast("string").as("event_type"),
          col("c.timestamp").as("ts_ms"),
          col("c.value").cast("string").cast("long").as("value_e4"))
        .orderBy("user_id", "event_type")
    }),
    // The operation history of that same fixture, under the hash gate:
    // six single-generation epoch commits with threshold 3 must produce
    // EXACTLY the event sequence insert x4, then (autocompact, insert)
    // alternating — the write-triggered fold fires on commits 4, 5 and
    // 6 and nowhere else, and the log's lexical id order is the true
    // order (a commit and its fold can share a millisecond). The
    // oracle is the spec sequence as a VALUES relation.
    "q_sstable_history" -> ((s, d) => {
      val (_, cat) = sstableAutoCompactFixture(s, d)
      s.sql(s"""SELECT seq, op FROM (
          SELECT row_number() OVER (ORDER BY id) AS seq, op
          FROM $cat.fx.t.history) ORDER BY seq""")
    }),
    // The managed re-layout over REAL files: the corpus lands in a
    // 4-bucket SQL table, CALL rebucket re-lays it to 8 (the
    // self-referential CREATE OR REPLACE under the maintenance lease),
    // and the doomed users are THEN deleted through the bucketed
    // metadata-delete path AT THE NEW COUNT — a rebucket that
    // mis-groups keys, loses rows, or leaves the old layout behind
    // makes either the delete route or the cells complement wrong.
    "q_sstable_rebucket" -> ((s, d) => {
      val dir = sstableRebucketFixture(s, d)
      s.read.format("sstable").option("applydeletes", "true")
        .option("view", "cells").load(dir)
        .select(col("key").cast("string").cast("long").as("user_id"),
          col("name").cast("string").as("event_type"),
          col("value").cast("string").cast("long").as("value_e4"),
          col("timestamp").as("ts_ms"))
        .orderBy("user_id", "event_type", "ts_ms", "value_e4")
    }),
    // The SQL point-lookup surface over REAL files (the engine's marquee
    // 100 TB access path, now reachable without Scala): CALL
    // graft.system.lookup probes a deterministic user subset (plus one
    // absent key, which must yield nothing) through bloom → Summary →
    // bounded Index window → one Data.db seek per candidate generation,
    // against the MULTI-generation autocompact fixture — so the probes
    // really reconcile across generations. The result is the probed
    // users' LWW winners, which the oracle recomputes relationally; a
    // probe that misses a generation, skips reconcile, or scans past
    // its key would change the cell set.
    "q_sstable_lookup" -> ((s, d) => {
      val (_, cat) = sstableAutoCompactFixture(s, d)
      val probes = Tables.events(s, d).select("user_id").distinct()
        .filter(col("user_id") % 100 === LookupUserMod)
        .collect().map(_.getLong(0)).sorted
      val keyLits = (probes.map(u => s"CAST('$u' AS BINARY)") :+
        "CAST('no-such-user' AS BINARY)").mkString(", ")
      s.sql(s"CALL $cat.system.lookup(table => 'fx.t', " +
          s"keys => array($keyLits))")
        .select(col("key"), explode(col("columns")).as("c"))
        .select(col("key").cast("string").cast("long").as("user_id"),
          col("c.name").cast("string").as("event_type"),
          col("c.timestamp").as("ts_ms"),
          col("c.value").cast("string").cast("long").as("value_e4"))
        .orderBy("user_id", "event_type")
    }),
    // The SQL probe-JOIN surface over REAL files (the relational
    // completion of CALL lookup, VERDICT r10 #1): a small probe relation
    // equi-joined on `key` against the catalog table plans as
    // index-nested-loop probes (SSTableLookupJoinStrategy) — zero table
    // scan, zero shuffle, IO ∝ probes × generations. The fixture is
    // multi-generation (two epoch INSERT commits, overlapping keys) with
    // a pending DELETE, so the probes must emit raw per-generation row
    // versions (NOT the reconciled view) and apply the delete shadow
    // exactly like the scan: a probe that reconciles, misses a
    // generation, or resurrects a tombstoned user is a hash mismatch.
    // The probe-side column (probe_user) riding through pins that join
    // output carries both sides. The plan is REQUIRED to take the probe
    // path — a silent fallback to scan+join would pass the content hash
    // and hide a dead strategy.
    "q_sstable_lookup_join" -> ((s, d) => {
      val cat = sstableLookupJoinFixture(s, d)
      graft.GraftExtensions.register(s) // idempotent; installs the strategy
      val probeUsers = Tables.events(s, d).select("user_id").distinct()
        .filter(col("user_id") % 5 === LookupJoinUserMod)
        .collect().map(_.getLong(0)).sorted
      import s.implicits._
      val probes = (probeUsers.map(u => (u.toString.getBytes("UTF-8"), u))
        :+ (("no-such-user".getBytes("UTF-8"), -1L))).toSeq
        .toDF("k", "probe_user")
      val view = s"${cat}_probe"
      probes.createOrReplaceTempView(view)
      val out = s.sql(s"SELECT p.probe_user, t.columns FROM $view p " +
        s"JOIN $cat.fx.t t ON p.k = t.key")
      require(out.queryExecution.executedPlan.toString
          .contains("SSTableLookupJoin"),
        "q_sstable_lookup_join must plan as the index-nested-loop probe " +
          s"path, got:\n${out.queryExecution.executedPlan}")
      out.select(col("probe_user"), explode(col("columns")).as("c"))
        .select(col("probe_user"),
          col("c.name").cast("string").as("event_type"),
          col("c.timestamp").as("ts_ms"),
          col("c.value").cast("string").cast("long").as("value_e4"))
        .orderBy("probe_user", "event_type", "ts_ms", "value_e4")
    }),
    // The OBJECT-STORE gate: the identical catalog lifecycle (two epoch
    // INSERT commits, pending DELETE, DROP + undrop) but over the
    // `objsim://` Hadoop backend — no hardlinks, client-side tree
    // renames, synthetic directory mtimes, conditional-PUT file renames.
    // The delete-aware cells view of the restored table must equal the
    // surviving corpus cell-for-cell: a staged commit, trash swap, or
    // shadow application that silently depended on a POSIX capability
    // (atomic dir rename, real dir mtimes, link(2)) is a hash mismatch
    // here while the POSIX-backed queries stay green.
    "q_sstable_objsim" -> ((s, d) => {
      val dir = sstableObjsimFixture(s, d)
      s.read.format("sstable").option("applydeletes", "true")
        .option("view", "cells").load(dir)
        .select(col("key").cast("string").cast("long").as("user_id"),
          col("name").cast("string").as("event_type"),
          col("value").cast("string").cast("long").as("value_e4"),
          col("timestamp").as("ts_ms"))
        .orderBy("user_id", "event_type", "ts_ms", "value_e4")
    }),
    // The recoverable-DROP lifecycle over REAL files: the corpus lands
    // through a catalog INSERT (the swap-resilient link-publish commit
    // path), the table is DROPPED (lease-guarded trash swap — one
    // rename, heartbeat-stamped) and restored with CALL undrop_table.
    // The delete-aware cells view of the RESTORED table must equal the
    // corpus cell-for-cell: a swap that loses a generation, a restore
    // that picks the wrong trash entry, or a link-publish that dropped
    // a sibling file is a hash mismatch (missing cells or a decode
    // failure), not a silent data loss.
    "q_sstable_undrop" -> ((s, d) => {
      val dir = sstableUndropFixture(s, d)
      s.read.format("sstable").option("applydeletes", "true")
        .option("view", "cells").load(dir)
        .select(col("key").cast("string").cast("long").as("user_id"),
          col("name").cast("string").as("event_type"),
          col("value").cast("string").cast("long").as("value_e4"),
          col("timestamp").as("ts_ms"))
        .orderBy("user_id", "event_type", "ts_ms", "value_e4")
    }),
    // Time travel over the REAL files: the asofmicros read option drops
    // post-cut cell versions at decode (and whole post-cut generations
    // at plan time via Statistics minTimestamp), so compactRows yields
    // exactly the LWW state a reader at the cut would have reconciled —
    // the oracle recomputes it as "winners among events at ts <= cut".
    // Rows born after the cut vanish entirely (the reader skips
    // anchor-less rows), which the oracle's WHERE mirrors.
    "q_sstable_asof" -> ((s, d) => {
      val dir = sstableFixture(s, d)
      SSTableOps.compactRows(s.read.format("sstable")
          .option("asofmicros", SstableAsOfCutMs).load(dir))
        .select(col("key"), explode(col("columns")).as("c"))
        .select(col("key").cast("string").cast("long").as("user_id"),
          col("c.name").cast("string").as("event_type"),
          col("c.timestamp").as("ts_ms"),
          col("c.value").cast("string").cast("long").as("value_e4"))
        .orderBy("user_id", "event_type")
    })
  )

  /** One physical sstable copy of the events table per (session, corpus):
    * the lifted relation written through the real DSv2 writer into a
    * deterministic temp directory (overwrite = truncate + staged commit),
    * shared by every fixture-driven query and across the bench's repeat
    * runs. Content is a pure function of the corpus, so a stale directory
    * from a previous process is simply rewritten. */
  private val fixtureCache = new SessionCache[String]
  private def sstableFixture(s: SparkSession, d: String): String =
    fixtureCache.getOrCompute(s, d) {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-fixture-" +
        java.security.MessageDigest.getInstance("MD5").digest(d.getBytes)
          .map("%02x".format(_)).mkString.take(16)
      val e = Tables.events(s, d).select("user_id", "event_type", "ts_ms", "value")
      liftedEvents(e).write.format("sstable").mode("overwrite").save(dir)
      dir
    }

  /** Two-epoch physical fixture for the sincesnapshot query: epoch 1
    * (events at/before the asof cut) written fresh, snapshotted as
    * [[Params.SinceFloorTag]], epoch 2 (post-cut events) appended. The
    * directory is rebuilt from scratch each session (stale trees from a
    * dead process deleted wholesale) — content is a pure function of the
    * corpus, so the rebuild is deterministic. */
  /** Deterministic per-corpus fixture directory under java.io.tmpdir,
    * wiped if a previous process left it (content is a pure function of
    * the corpus, so rebuilds are deterministic) — the shared preamble of
    * every physical fixture (review r8: was copy-pasted per fixture). */
  private def freshFixtureDir(prefix: String, d: String): String = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/$prefix-" +
      java.security.MessageDigest.getInstance("MD5").digest(d.getBytes)
        .map("%02x".format(_)).mkString.take(16)
    val root = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    dir
  }

  /** Lift an events projection into the nested scan schema — one cell
    * per event, e4-scaled value. The ONE home of the fixture cell shape
    * (the DuckDB twins mirror it relationally). */
  private def liftedEvents(df: DataFrame): DataFrame =
    df.select(col("user_id").cast("string").cast("binary").as("key"),
      array(struct(col("event_type").cast("binary").as("name"),
        lit("NORMAL").as("state"),
        e4(col("value")).cast("string").cast("binary").as("value"),
        col("ts_ms").as("timestamp"),
        lit(0L).as("ttlSecs"), lit(0L).as("expiresMillis"))).as("columns"))

  /** Tombstone every `user_id % 10 == mod` user in `dir` through the
    * real SupportsDelete path, mark pinned at max event ts + 1 so
    * rebuilds and the DuckDB twins agree bit-for-bit. */
  private def tombstoneUsers(dir: String, e: DataFrame, mod: Int,
                             buckets: Option[Int] = None): Unit = {
    val doomed = e.select(col("user_id")).distinct()
      .filter(col("user_id") % 10 === mod)
      .collect().map(_.getLong(0).toString.getBytes: Any)
    val mark = e.agg(max(col("ts_ms"))).head().getLong(0) + 1
    new graft.sources.sstable.spark.SSTableTable(Map(
        graft.sources.sstable.spark.SSTableSource.PathOption -> dir,
        graft.sources.sstable.spark.SSTableSource.DeleteMarkMicrosOption ->
          mark.toString) ++
      buckets.map(n =>
        graft.sources.sstable.spark.SSTableSource.WriteBucketsOption -> n.toString))
      .deleteWhere(Array[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.In("key", doomed)))
  }

  private val sinceFixtureCache = new SessionCache[String]
  private def sstableSinceFixture(s: SparkSession, d: String): String =
    sinceFixtureCache.getOrCompute(s, d) {
      val dir = freshFixtureDir("graft-since", d)
      val e = Tables.events(s, d).select("user_id", "event_type", "ts_ms", "value")
      liftedEvents(e.filter(col("ts_ms") <= SstableAsOfCutMs))
        .write.format("sstable").mode("overwrite").save(dir)
      SSTableOps.snapshot(dir, SinceFloorTag)
      liftedEvents(e.filter(col("ts_ms") > SstableAsOfCutMs))
        .write.format("sstable").mode("append").save(dir)
      dir
    }

  /** Physical fixture for the row-level DELETE query: the events corpus
    * written once, then every user with `user_id % 10 == DeleteUserMod`
    * deleted through [[graft.sources.sstable.spark.SSTableTable]]'s
    * `SupportsDelete` (the real tombstone-append path, one generation).
    * The delete mark is pinned (max event ts_ms + 1, deterministic)
    * so rebuilds and the DuckDB twin agree bit-for-bit. */
  private val deleteFixtureCache = new SessionCache[String]
  /** Physical fixture for the rollback query: pre-cut events written and
    * pinned as 'good', then two post-pin wrongs — the post-cut epoch
    * appended and the [[Params.DeleteUserMod]] users tombstoned (its own
    * directory, so sharing the mod with the delete fixture is inert) —
    * then ONE rollbackToSnapshot. Rebuilt from scratch each session. */
  private val rollbackFixtureCache = new SessionCache[String]
  private def sstableRollbackFixture(s: SparkSession, d: String): String =
    rollbackFixtureCache.getOrCompute(s, d) {
      val dir = freshFixtureDir("graft-rb", d)
      val e = Tables.events(s, d).select("user_id", "event_type", "ts_ms", "value")
      liftedEvents(e.filter(col("ts_ms") <= SstableAsOfCutMs))
        .write.format("sstable").mode("overwrite").save(dir)
      SSTableOps.snapshot(dir, "good")
      liftedEvents(e.filter(col("ts_ms") > SstableAsOfCutMs))
        .write.format("sstable").mode("append").save(dir)
      tombstoneUsers(dir, e, DeleteUserMod)
      SSTableOps.rollbackToSnapshot(dir, "good")
      dir
    }

  private def sstableDeleteFixture(s: SparkSession, d: String): String =
    deleteFixtureCache.getOrCompute(s, d) {
      val dir = freshFixtureDir("graft-del", d)
      val e = Tables.events(s, d).select("user_id", "event_type", "ts_ms", "value")
      liftedEvents(e).write.format("sstable").mode("overwrite").save(dir)
      tombstoneUsers(dir, e, DeleteUserMod)
      dir
    }

  /** Physical fixture for the SQL MERGE query: the LWW-compacted events
    * corpus (ONE row version per user — MERGE's cardinality contract)
    * written as a catalog-resolvable table, then mutated by one real
    * `MERGE INTO` through [[graft.sources.sstable.spark.GraftCatalog]]:
    * matched users collapse to a single 'merged' cell, synthetic
    * not-matched twins insert fresh rows. The statement's write
    * timestamp is max(corpus ts) + 2 by the row-level mark rule
    * (max sidecar ts + 1, stamped at mark + 1) — deterministic, so the
    * DuckDB twin reproduces it from the relation alone. */
  private val mergeFixtureCache = new SessionCache[String]
  private def sstableMergeFixture(s: SparkSession, d: String): String =
    mergeFixtureCache.getOrCompute(s, d) {
      val corpusTag = java.security.MessageDigest.getInstance("MD5")
        .digest(d.getBytes).map("%02x".format(_)).mkString.take(16)
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-merge-$corpusTag"
      val root = java.nio.file.Paths.get(wh)
      if (java.nio.file.Files.exists(root)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
      val dir = s"$wh/fx/t"
      val e = Tables.events(s, d).select("user_id", "event_type", "ts_ms", "value")
      val wide = e.select(col("user_id").cast("string").cast("binary").as("key"),
        array(struct(col("event_type").cast("binary").as("name"),
          lit("NORMAL").as("state"),
          e4(col("value")).cast("string").cast("binary").as("value"),
          col("ts_ms").as("timestamp"),
          lit(0L).as("ttlSecs"), lit(0L).as("expiresMillis"))).as("columns"))
      SSTableOps.compactRows(wide)
        .write.format("sstable").mode("overwrite").save(dir)
      // per-CORPUS catalog name (self-review r8): Spark's CatalogManager
      // caches catalog instances by name after first load, so re-setting
      // one shared name's warehouse conf for a second corpus would be
      // ignored — the MERGE would silently mutate the first corpus'
      // warehouse while this corpus' fixture stayed pre-merge
      val cat = s"graft_fx_$corpusTag"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.sstable.spark.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      val touched = e.filter(col("user_id") % 10 === MergeUserMod)
        .select("user_id").distinct()
      touched.union(touched.select(col("user_id") + MergeNewUserOffset))
        .select(col("user_id").cast("string").cast("binary").as("key"),
          array(struct(lit("merged").cast("binary").as("name"),
            lit("NORMAL").as("state"),
            col("user_id").cast("string").cast("binary").as("value"),
            lit(0L).as("timestamp"),
            lit(0L).as("ttlSecs"), lit(0L).as("expiresMillis"))).as("columns"))
        .createOrReplaceTempView("graft_merge_src")
      s.sql(s"""
        MERGE INTO $cat.fx.t t USING graft_merge_src s ON t.key = s.key
        WHEN MATCHED THEN UPDATE SET columns = s.columns
        WHEN NOT MATCHED THEN INSERT (key, columns, rowTombstone)
          VALUES (s.key, s.columns, NULL)""")
      dir
    }

  /** Physical fixture for the full-sync MERGE query: the LWW-compacted
    * corpus as a catalog table (per-corpus catalog — the q_sstable_merge
    * rule), synced against a source that lists only the kept users: one
    * MERGE with a matched UPDATE and a NOT MATCHED BY SOURCE DELETE. */
  private val syncFixtureCache = new SessionCache[String]
  private def sstableSyncFixture(s: SparkSession, d: String): String =
    syncFixtureCache.getOrCompute(s, d) {
      val corpusTag = java.security.MessageDigest.getInstance("MD5")
        .digest(d.getBytes).map("%02x".format(_)).mkString.take(16)
      val wh = freshFixtureDir("graft-sync", d)
      val dir = s"$wh/fx/t"
      val e = Tables.events(s, d).select("user_id", "event_type", "ts_ms", "value")
      SSTableOps.compactRows(liftedEvents(e))
        .write.format("sstable").mode("overwrite").save(dir)
      val cat = s"graft_sync_$corpusTag"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.sstable.spark.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      e.filter(col("user_id") % 10 =!= SyncDropMod)
        .select("user_id").distinct()
        .select(col("user_id").cast("string").cast("binary").as("key"),
          array(struct(lit("synced").cast("binary").as("name"),
            lit("NORMAL").as("state"),
            col("user_id").cast("string").cast("binary").as("value"),
            lit(0L).as("timestamp"),
            lit(0L).as("ttlSecs"), lit(0L).as("expiresMillis"))).as("columns"))
        .createOrReplaceTempView("graft_sync_src")
      s.sql(s"""
        MERGE INTO $cat.fx.t t USING graft_sync_src s ON t.key = s.key
        WHEN MATCHED THEN UPDATE SET columns = s.columns
        WHEN NOT MATCHED BY SOURCE THEN DELETE""")
      dir
    }

  /** Physical fixture for the SQL bucketed-table query: a per-corpus
    * warehouse + catalog (CatalogManager caches instances by name — the
    * q_sstable_merge rule), `CREATE TABLE` with the buckets property,
    * one SQL `INSERT INTO … SELECT` through the bucket-clustered write
    * (≤ [[Params.BucketFixtureBuckets]] generations, every stem
    * `bucket-NNNNN-`), then the [[Params.DeleteUserMod]] users deleted
    * through the bucketed metadata-delete path (per-affected-bucket
    * tombstone generations; mark pinned to max ts + 1 for rerun
    * determinism, like the plain delete fixture). */
  private val bucketedFixtureCache = new SessionCache[String]
  private def sstableBucketedFixture(s: SparkSession, d: String): String =
    bucketedFixtureCache.getOrCompute(s, d) {
      val corpusTag = java.security.MessageDigest.getInstance("MD5")
        .digest(d.getBytes).map("%02x".format(_)).mkString.take(16)
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-bkt-$corpusTag"
      val root = java.nio.file.Paths.get(wh)
      if (java.nio.file.Files.exists(root)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
      val cat = s"graft_bq_$corpusTag"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.sstable.spark.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      s.sql(s"CREATE NAMESPACE $cat.fx")
      s.sql(s"CREATE TABLE $cat.fx.t " +
        s"TBLPROPERTIES('buckets'='$BucketFixtureBuckets')")
      val e = Tables.events(s, d).select("user_id", "event_type", "ts_ms", "value")
      val view = s"graft_bkt_src_$corpusTag"
      liftedEvents(e).createOrReplaceTempView(view)
      s.sql(s"""INSERT INTO $cat.fx.t
        SELECT key, columns,
          CAST(NULL AS STRUCT<localDeletionTime: INT, markedForDeleteAt: BIGINT>)
        FROM $view""")
      val dir = s"$wh/fx/t"
      tombstoneUsers(dir, e, DeleteUserMod,
        buckets = Some(BucketFixtureBuckets))
      dir
    }

  /** Physical fixture for the atomic-lifecycle query (per-corpus
    * warehouse + catalog, the q_sstable_merge rule): the events corpus
    * is materialized by a real `CREATE TABLE … AS SELECT` (atomic stage
    * commit), a bucketed complement by a second CTAS with
    * TBLPROPERTIES('buckets'), and the scratch end-state table is taken
    * through TRUNCATE → wrong-subset INSERT → atomic REPLACE so that
    * every lifecycle statement's failure would corrupt the final cells.
    * Pure SQL throughout — this is the surface a catalog user drives. */
  private val ctasFixtureCache = new SessionCache[String]
  private def sstableCtasFixture(s: SparkSession, d: String): String =
    ctasFixtureCache.getOrCompute(s, d) {
      val corpusTag = java.security.MessageDigest.getInstance("MD5")
        .digest(d.getBytes).map("%02x".format(_)).mkString.take(16)
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-ctas-$corpusTag"
      val root = java.nio.file.Paths.get(wh)
      if (java.nio.file.Files.exists(root)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
      val cat = s"graft_ca_$corpusTag"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.sstable.spark.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      s.sql(s"CREATE NAMESPACE $cat.fx")
      val e = Tables.events(s, d).select("user_id", "event_type", "ts_ms", "value")
      val view = s"graft_ctas_src_$corpusTag"
      liftedEvents(e).createOrReplaceTempView(view)
      s.sql(s"""CREATE TABLE $cat.fx.allevents AS
        SELECT key, columns,
          CAST(NULL AS STRUCT<localDeletionTime: INT, markedForDeleteAt: BIGINT>)
            AS rowTombstone
        FROM $view""")
      // the complement lands in a BUCKETED layout via CTAS — the staged
      // write is the bucket-clustered one, committed by the same rename
      s.sql(s"""CREATE TABLE $cat.fx.sub
        TBLPROPERTIES('buckets'='$BucketFixtureBuckets') AS
        SELECT * FROM $cat.fx.allevents
        WHERE CAST(CAST(key AS STRING) AS BIGINT) % 10 <> $CtasUserMod""")
      // scratch: full corpus → TRUNCATE (a non-emptying truncate leaves
      // duplicate cells) → the WRONG subset → one atomic REPLACE with
      // the right complement (a non-swapping replace leaves doomed cells)
      s.sql(s"CREATE TABLE $cat.fx.scratch AS SELECT * FROM $cat.fx.allevents")
      s.sql(s"TRUNCATE TABLE $cat.fx.scratch")
      s.sql(s"""INSERT INTO $cat.fx.scratch
        SELECT * FROM $cat.fx.allevents
        WHERE CAST(CAST(key AS STRING) AS BIGINT) % 10 = $CtasUserMod""")
      s.sql(s"REPLACE TABLE $cat.fx.scratch AS SELECT * FROM $cat.fx.sub")
      s"$wh/fx/scratch"
    }

  /** Physical fixture for the rebucket query: the corpus in a 4-bucket
    * SQL table, re-laid to 8 via `CALL rebucket` (lease-guarded
    * self-referential CREATE OR REPLACE; the fixture REQUIRES every
    * surviving stem bucketed), then the doomed users deleted through
    * the bucketed path at the NEW count. Per-corpus catalog, the
    * q_sstable_merge rule. */
  private val rebucketFixtureCache = new SessionCache[String]
  private def sstableRebucketFixture(s: SparkSession, d: String): String =
    rebucketFixtureCache.getOrCompute(s, d) {
      val corpusTag = java.security.MessageDigest.getInstance("MD5")
        .digest(d.getBytes).map("%02x".format(_)).mkString.take(16)
      val wh = freshFixtureDir("graft-rbk", d)
      val cat = s"graft_rb_$corpusTag"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.sstable.spark.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      s.sql(s"CREATE NAMESPACE $cat.fx")
      s.sql(s"CREATE TABLE $cat.fx.t TBLPROPERTIES('buckets'='4')")
      val e = Tables.events(s, d).select("user_id", "event_type", "ts_ms", "value")
      val view = s"graft_rbk_src_$corpusTag"
      liftedEvents(e).createOrReplaceTempView(view)
      s.sql(s"""INSERT INTO $cat.fx.t
        SELECT key, columns,
          CAST(NULL AS STRUCT<localDeletionTime: INT, markedForDeleteAt: BIGINT>)
        FROM $view""")
      val newBuckets = 8
      s.sql(s"CALL $cat.system.rebucket(table => 'fx.t', new_buckets => $newBuckets)")
      val dir = s"$wh/fx/t"
      val storage = graft.sources.sstable.LocalStorage
      require(storage.listDataFiles(dir).forall(f =>
        graft.sources.sstable.spark.SSTableSource.BucketNameRe.matches(
          graft.sources.sstable.SSTableFiles.generationStem(f))),
        s"rebucket must leave only bucket stems: $dir")
      tombstoneUsers(dir, e, RebucketUserMod, buckets = Some(newBuckets))
      dir
    }

  /** Physical fixture for the recoverable-DROP query: the corpus lands
    * via a catalog INSERT (the link-publish commit), then one real
    * `DROP TABLE` (trash swap) and one `CALL undrop_table` (restore).
    * The fixture REQUIRES the drop to actually unresolve the table —
    * a DROP that silently no-ops would leave the hash trivially green.
    * Per-corpus catalog, the q_sstable_merge rule. */
  private val undropFixtureCache = new SessionCache[String]
  private def sstableUndropFixture(s: SparkSession, d: String): String =
    undropFixtureCache.getOrCompute(s, d) {
      val corpusTag = java.security.MessageDigest.getInstance("MD5")
        .digest(d.getBytes).map("%02x".format(_)).mkString.take(16)
      val wh = freshFixtureDir("graft-ud", d)
      val cat = s"graft_ud_$corpusTag"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.sstable.spark.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      s.sql(s"CREATE NAMESPACE $cat.fx")
      s.sql(s"CREATE TABLE $cat.fx.t")
      val e = Tables.events(s, d).select("user_id", "event_type", "ts_ms", "value")
      val view = s"graft_ud_src_$corpusTag"
      liftedEvents(e).createOrReplaceTempView(view)
      s.sql(s"""INSERT INTO $cat.fx.t
        SELECT key, columns,
          CAST(NULL AS STRUCT<localDeletionTime: INT, markedForDeleteAt: BIGINT>)
        FROM $view""")
      s.sql(s"DROP TABLE $cat.fx.t")
      require(!s.catalog.tableExists(s"$cat.fx.t"),
        "the DROP must actually unresolve the table")
      s.sql(s"CALL $cat.system.undrop_table(table => 'fx.t')")
      s"$wh/fx/t"
    }

  /** Physical fixture for the SQL probe-join gate: the corpus split into
    * two ts-epochs at [[SstableAsOfCutMs]], each catalog-INSERTed as its
    * own commit (keys overlap across the two — and within each commit
    * every lifted event row is its own single-cell row version), plus a
    * pending DELETE of every `user_id % 10 == LookupJoinDeleteMod` user
    * through the real SupportsDelete path (mark above every event ts) —
    * so the raw delete-aware view has MANY row versions per surviving
    * user across multiple generations and NONE for doomed ones. Returns
    * the per-corpus catalog name. */
  private val lookupJoinFixtureCache = new SessionCache[String]
  private def sstableLookupJoinFixture(s: SparkSession, d: String): String =
    lookupJoinFixtureCache.getOrCompute(s, d) {
      val corpusTag = java.security.MessageDigest.getInstance("MD5")
        .digest(d.getBytes).map("%02x".format(_)).mkString.take(16)
      val wh = freshFixtureDir("graft-lj", d)
      val cat = s"graft_lj_$corpusTag"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.sstable.spark.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      s.sql(s"CREATE NAMESPACE $cat.fx")
      s.sql(s"CREATE TABLE $cat.fx.t")
      val e = Tables.events(s, d).select("user_id", "event_type", "ts_ms", "value")
      Seq(col("ts_ms") <= SstableAsOfCutMs, col("ts_ms") > SstableAsOfCutMs)
        .zipWithIndex.foreach { case (epoch, i) =>
          val view = s"graft_lj_src_${corpusTag}_$i"
          liftedEvents(e.filter(epoch)).createOrReplaceTempView(view)
          s.sql(s"""INSERT INTO $cat.fx.t
            SELECT key, columns,
              CAST(NULL AS STRUCT<localDeletionTime: INT, markedForDeleteAt: BIGINT>)
            FROM $view""")
        }
      tombstoneUsers(s"$wh/fx/t", e, LookupJoinDeleteMod)
      cat
    }

  /** Physical fixture for the OBJECT-STORE gate (q_sstable_objsim): the
    * full catalog lifecycle over `objsim://` semantics — the Hadoop
    * adapter bound to the object-store simulation backend (no hardlinks,
    * client-side tree renames, synthetic directory mtimes, conditional-
    * PUT file renames). Two epoch INSERT commits, a pending DELETE
    * through the SupportsDelete path, then a DROP + undrop round-trip
    * (trash swap = per-object tree copy on an object store). Returns the
    * objsim table URI for the delete-aware read. */
  private val objsimFixtureCache = new SessionCache[String]
  private def sstableObjsimFixture(s: SparkSession, d: String): String =
    objsimFixtureCache.getOrCompute(s, d) {
      graft.sources.sstable.ObjSimFileSystem.ConfEntries.foreach {
        case (k, v) => s.sparkContext.hadoopConfiguration.set(k, v) }
      val corpusTag = java.security.MessageDigest.getInstance("MD5")
        .digest(d.getBytes).map("%02x".format(_)).mkString.take(16)
      val wh = s"objsim://${freshFixtureDir("graft-osim", d)}"
      val cat = s"graft_os_$corpusTag"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.sstable.spark.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      s.sql(s"CREATE NAMESPACE $cat.fx")
      s.sql(s"CREATE TABLE $cat.fx.t")
      val e = Tables.events(s, d).select("user_id", "event_type", "ts_ms", "value")
      Seq(col("ts_ms") <= SstableAsOfCutMs, col("ts_ms") > SstableAsOfCutMs)
        .zipWithIndex.foreach { case (epoch, i) =>
          val view = s"graft_os_src_${corpusTag}_$i"
          liftedEvents(e.filter(epoch)).createOrReplaceTempView(view)
          s.sql(s"""INSERT INTO $cat.fx.t
            SELECT key, columns,
              CAST(NULL AS STRUCT<localDeletionTime: INT, markedForDeleteAt: BIGINT>)
            FROM $view""")
        }
      tombstoneUsers(s"$wh/fx/t", e, ObjsimDeleteMod)
      s.sql(s"DROP TABLE $cat.fx.t")
      require(!s.catalog.tableExists(s"$cat.fx.t"),
        "the DROP must unresolve the table over objsim")
      s.sql(s"CALL $cat.system.undrop_table(table => 'fx.t')")
      s"$wh/fx/t"
    }

  /** Physical fixture for the auto-compaction queries: the events
    * corpus split into six deterministic epochs (`user_id % 6`), each
    * written as ONE generation (`writepartitions=1`) with
    * `autocompact=3` — commits 4..6 each leave four generations and
    * must fold the smallest two back to the bound before returning.
    * The bound is REQUIRED here (loud fixture failure beats a passing
    * content hash over an unfolded directory), and a per-corpus catalog
    * is registered so the history query can read `fx.t.history` in SQL.
    * Returns (table dir, catalog name). */
  private val autoCompactFixtureCache = new SessionCache[(String, String)]
  private def sstableAutoCompactFixture(s: SparkSession, d: String): (String, String) =
    autoCompactFixtureCache.getOrCompute(s, d) {
      val corpusTag = java.security.MessageDigest.getInstance("MD5")
        .digest(d.getBytes).map("%02x".format(_)).mkString.take(16)
      val wh = freshFixtureDir("graft-ac", d)
      val dir = s"$wh/fx/t"
      val e = Tables.events(s, d).select("user_id", "event_type", "ts_ms", "value")
      (0 until 6).foreach { ep =>
        liftedEvents(e.filter(pmod(col("user_id"), lit(6)) === ep))
          .write.format("sstable")
          .option("writepartitions", "1")
          .option("autocompact", "3")
          .mode("append").save(dir)
      }
      val gens = graft.sources.sstable.LocalStorage.listDataFiles(dir).length
      require(gens <= 3,
        s"autocompact must hold the 3-generation bound, got $gens: $dir")
      val cat = s"graft_ac_$corpusTag"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.sstable.spark.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      (dir, cat)
    }

  /** Lift events into the nested scan schema, compact with the selected
    * merge variant, and explode back to a comparable relation. Each event
    * becomes a one-column row VERSION (multiple rows per key are exactly
    * what compaction merges) — no pre-nesting shuffle; the merge's own
    * hash-aggs do all the grouping. */
  private def compactedEvents(s: SparkSession, d: String,
                              variant: WideRowOps.CompactVariant): DataFrame = {
    val e = Tables.events(s, d).select("user_id", "event_type", "ts_ms", "value")
    val wide = e.select(col("user_id").cast("string").cast("binary").as("key"),
        array(struct(col("event_type").cast("binary").as("name"),
          lit("NORMAL").as("state"),
          e4(col("value")).cast("string").cast("binary").as("value"),
          col("ts_ms").as("timestamp"),
          lit(0L).as("ttlSecs"), lit(0L).as("expiresMillis"))).as("columns"))
    val merged = variant match {
      case WideRowOps.CompactPlain => SSTableOps.compactRows(wide)
      case WideRowOps.CompactSalted(b) => SSTableOps.compactRowsSalted(wide, b)
    }
    merged.select(col("key"), explode(col("columns")).as("c"))
      .select(col("key").cast("string").cast("long").as("user_id"),
        col("c.name").cast("string").as("event_type"),
        col("c.timestamp").as("ts_ms"),
        col("c.value").cast("string").cast("long").as("value_e4"))
      .orderBy("user_id", "event_type")
  }

  private val CompactOracle =
    s"""SELECT user_id, event_type, ts_ms, ${e4Sql("value")} AS value_e4
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts_ms DESC) AS rn
              FROM $EventsSql) WHERE rn = 1 ORDER BY user_id, event_type"""

  def oracles: Map[String, String] = Map(
    "q_compact_rows" -> CompactOracle,
    "q_compact_salted" -> CompactOracle,
    "q_lww_latest_per_key" ->
      s"""SELECT user_id, ts_ms, event_type, ${e4Sql("value")} AS value_e4
          FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts_ms DESC, event_type DESC) AS rn
                FROM $EventsSql) WHERE rn = 1 ORDER BY user_id""",
    "q_lww_merge_columns" ->
      s"""SELECT user_id, event_type, ts_ms, ${e4Sql("value")} AS value_e4
          FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts_ms DESC) AS rn
                FROM $EventsSql) WHERE rn = 1 ORDER BY user_id, event_type""",
    "q_tombstone_filter" ->
      s"""SELECT e.event_id, e.user_id, e.event_type, e.ts_ms
          FROM $EventsSql e
          LEFT JOIN (SELECT user_id, max(ts_ms) AS tomb_ts FROM $EventsSql
                     WHERE event_type = 'error' GROUP BY user_id) t
            ON e.user_id = t.user_id
          WHERE e.event_type <> 'error' AND (t.tomb_ts IS NULL OR e.ts_ms > t.tomb_ts)
          ORDER BY e.event_id""",
    "q_ttl_expiry" ->
      s"""SELECT event_id, user_id, event_type, ts_ms FROM $EventsSql
          WHERE ts_ms + $TtlMs > $AsOfMs ORDER BY event_id""",
    "q_range_splits" ->
      s"""SELECT bucket, CAST(count(*) AS BIGINT) AS n, min(ts_ms) AS ts_min_ms, max(ts_ms) AS ts_max_ms
          FROM (SELECT ts_ms, CAST(sum(CASE WHEN gap > $SplitGapMs THEN 1 ELSE 0 END)
                         OVER (ORDER BY ts_ms) AS BIGINT) AS bucket
                FROM (SELECT ts_ms, ts_ms - lag(ts_ms) OVER (ORDER BY ts_ms) AS gap
                      FROM $EventsSql))
          GROUP BY bucket ORDER BY bucket""",
    "q_export_b64" ->
      s"""SELECT to_base64(encode(concat_ws('|', user_id, event_type, ts_ms))) AS line
          FROM $EventsSql ORDER BY line""",
    // the physical round-trip preserves the events relation cell-for-cell
    "q_sstable_cells" ->
      s"""SELECT user_id, event_type, ${e4Sql("value")} AS value_e4, ts_ms
          FROM $EventsSql ORDER BY user_id, event_type, ts_ms, value_e4""",
    // same LWW winner as q_compact_rows, derived from real written bytes
    "q_sstable_compact" ->
      s"""SELECT user_id, event_type, ts_ms, ${e4Sql("value")} AS value_e4
          FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts_ms DESC) AS rn
                FROM $EventsSql) WHERE rn = 1 ORDER BY user_id, event_type""",
    // the LWW state at the cut: winners among pre-cut versions only
    "q_sstable_asof" ->
      s"""SELECT user_id, event_type, ts_ms, ${e4Sql("value")} AS value_e4
          FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts_ms DESC) AS rn
                FROM $EventsSql WHERE ts_ms <= $SstableAsOfCutMs)
          WHERE rn = 1 ORDER BY user_id, event_type""",
    // the epoch diff: exactly the events written after the floor snapshot
    "q_sstable_since" ->
      s"""SELECT user_id, event_type, ${e4Sql("value")} AS value_e4, ts_ms
          FROM $EventsSql WHERE ts_ms > $SstableAsOfCutMs
          ORDER BY user_id, event_type, ts_ms, value_e4""",
    // rollback restores epoch 1 exactly: the pre-cut cells, nothing else
    "q_sstable_rollback" ->
      s"""SELECT user_id, event_type, ${e4Sql("value")} AS value_e4, ts_ms
          FROM $EventsSql WHERE ts_ms <= $SstableAsOfCutMs
          ORDER BY user_id, event_type, ts_ms, value_e4""",
    // the complement of the deleted user set, cell-for-cell
    "q_sstable_delete" ->
      s"""SELECT user_id, event_type, ${e4Sql("value")} AS value_e4, ts_ms
          FROM $EventsSql WHERE user_id % 10 <> $DeleteUserMod
          ORDER BY user_id, event_type, ts_ms, value_e4""",
    // full sync: exactly one synced cell per kept user at the statement
    // timestamp; everyone absent from the source is tombstoned away
    "q_sstable_sync" ->
      s"""WITH wts AS (SELECT max(ts_ms) + 2 AS t FROM $EventsSql),
            kept AS (SELECT DISTINCT user_id FROM $EventsSql
                     WHERE user_id % 10 <> $SyncDropMod)
          SELECT user_id, 'synced' AS event_type, user_id AS value_e4,
                 (SELECT t FROM wts) AS ts_ms
          FROM kept ORDER BY user_id, event_type, ts_ms, value_e4""",
    // the bucketed lifecycle must land on the SAME logical complement —
    // bucketed INSERT + per-bucket DELETE preserve content cell-for-cell
    "q_sstable_bucketed" ->
      s"""SELECT user_id, event_type, ${e4Sql("value")} AS value_e4, ts_ms
          FROM $EventsSql WHERE user_id % 10 <> $DeleteUserMod
          ORDER BY user_id, event_type, ts_ms, value_e4""",
    // the CTAS → TRUNCATE → INSERT → REPLACE chain must land on the
    // complement of the doomed users, cell-for-cell
    "q_sstable_ctas" ->
      s"""SELECT user_id, event_type, ${e4Sql("value")} AS value_e4, ts_ms
          FROM $EventsSql WHERE user_id % 10 <> $CtasUserMod
          ORDER BY user_id, event_type, ts_ms, value_e4""",
    // MERGE = untouched winners + merged cells + inserted twins, all at
    // the statement's deterministic write timestamp (max ts + 2)
    "q_sstable_merge" ->
      s"""WITH winners AS (
            SELECT user_id, event_type, ts_ms, ${e4Sql("value")} AS value_e4
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts_ms DESC) AS rn
                  FROM $EventsSql) WHERE rn = 1),
          wts AS (SELECT max(ts_ms) + 2 AS t FROM $EventsSql),
          touched AS (SELECT DISTINCT user_id FROM $EventsSql WHERE user_id % 10 = $MergeUserMod)
          SELECT user_id, event_type, value_e4, ts_ms FROM (
            SELECT user_id, event_type, value_e4, ts_ms FROM winners
            WHERE user_id % 10 <> $MergeUserMod
            UNION ALL
            SELECT user_id, 'merged', user_id, (SELECT t FROM wts) FROM touched
            UNION ALL
            SELECT user_id + $MergeNewUserOffset, 'merged',
                   user_id + $MergeNewUserOffset, (SELECT t FROM wts) FROM touched)
          ORDER BY user_id, event_type, ts_ms, value_e4""",
    // auto-compaction is pure maintenance: the reconciled state of the
    // self-maintained directory is the same LWW winner set as
    // q_sstable_compact
    "q_sstable_autocompact" ->
      s"""SELECT user_id, event_type, ts_ms, ${e4Sql("value")} AS value_e4
          FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts_ms DESC) AS rn
                FROM $EventsSql) WHERE rn = 1 ORDER BY user_id, event_type""",
    // the history log's spec sequence: six single-generation commits at
    // threshold 3 fire the write-triggered fold on commits 4, 5, 6
    "q_sstable_history" ->
      """SELECT seq, op FROM (VALUES
            (1, 'insert'), (2, 'insert'), (3, 'insert'), (4, 'insert'),
            (5, 'autocompact'), (6, 'insert'), (7, 'autocompact'),
            (8, 'insert'), (9, 'autocompact')) AS t(seq, op)
          ORDER BY seq""",
    // the re-laid table must land on the same logical complement —
    // rebucket + new-count DELETE preserve content cell-for-cell
    "q_sstable_rebucket" ->
      s"""SELECT user_id, event_type, ${e4Sql("value")} AS value_e4, ts_ms
          FROM $EventsSql WHERE user_id % 10 <> $RebucketUserMod
          ORDER BY user_id, event_type, ts_ms, value_e4""",
    // the object-store lifecycle lands on the delete-aware complement,
    // cell for cell — catalog commits, tombstone shadow, and the trash
    // round-trip all over objsim semantics
    "q_sstable_objsim" ->
      s"""SELECT user_id, event_type, ${e4Sql("value")} AS value_e4, ts_ms
          FROM $EventsSql WHERE user_id % 10 <> $ObjsimDeleteMod
          ORDER BY user_id, event_type, ts_ms, value_e4""",
    // the restored table is the corpus, cell for cell — DROP + undrop
    // round-trip through one trash rename each way
    "q_sstable_undrop" ->
      s"""SELECT user_id, event_type, ${e4Sql("value")} AS value_e4, ts_ms
          FROM $EventsSql ORDER BY user_id, event_type, ts_ms, value_e4""",
    // the probe JOIN returns the probed users' RAW delete-aware cells —
    // every surviving event of every probed user exactly once (one cell
    // per lifted event row, across both epoch generations), tombstoned
    // users gone, the absent probe key matching nothing; probe_user is
    // the probe-side column (= user_id by the join's key equality)
    "q_sstable_lookup_join" ->
      s"""SELECT user_id AS probe_user, event_type, ts_ms,
                 ${e4Sql("value")} AS value_e4
          FROM $EventsSql
          WHERE user_id % 5 = $LookupJoinUserMod
            AND user_id % 10 <> $LookupJoinDeleteMod
          ORDER BY probe_user, event_type, ts_ms, value_e4""",
    // point lookups return exactly the probed users' LWW winners — the
    // same per-(user, cell) reconcile the compaction queries pin, here
    // produced by per-key probes instead of a scan
    "q_sstable_lookup" ->
      s"""SELECT user_id, event_type, ts_ms, ${e4Sql("value")} AS value_e4
          FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts_ms DESC) AS rn
                FROM $EventsSql) WHERE rn = 1 AND user_id % 100 = $LookupUserMod
          ORDER BY user_id, event_type""",
    // the same smallest-k key multiset the pushed top-n produces
    "q_sstable_topk" ->
      s"""SELECT user_key FROM (
            SELECT CAST(user_id AS VARCHAR) AS user_key FROM $EventsSql
            ORDER BY user_key LIMIT $SstableTopK)
          ORDER BY user_key"""
  )
}
