package graft.sources.sstable.spark

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.sstable.{HadoopStorage, LocalStorage, ObjSimFileSystem, Storage}

/** Pointer-committed DDL swaps (VERDICT r11 #3 + #4): REPLACE, DROP,
  * undrop and CTAS publish commit with ONE atomic `_table` replace, so
  * a concurrent catalog reader — even over object-store semantics,
  * where tree renames are long per-object copies — sees exactly the old
  * complete state or the new complete state, never a partial tree. The
  * crash cases inject failures at every step boundary and prove the
  * recovery procedures (undrop / vacuum / the next DDL) reach a
  * consistent state from each shape. */
class PointerCommitSpec extends AnyFunSuite {

  // ---- unit pins over LocalStorage ----

  private def tmp(): String = Files.createTempDirectory("ptr").toString

  test("state codec: live has no line; every other state round-trips " +
    "with its source and actor id; junk refuses loudly") {
    import TableState._
    assert(TableState.of(Map.empty) == Live)
    for (s <- Seq(Dropped(None, "aa11bb22"), Dropped(Some("_dropped-t-1a2b3c4d"),
        "aa11bb22"), Restoring("_dropped-t-1a2b3c4d", "ffee0011"),
        Redirect("_stage-t-deadbeef", "12345678"))) {
      val enc = TableState.encode(s).get
      assert(TableState.of(Map(TableState.Key -> enc)) == s, enc)
    }
    intercept[IllegalStateException](
      TableState.of(Map(TableState.Key -> "exploded")))
  }

  test("createState is conditional: of two racing claims on one name " +
    "exactly one wins, atomically (no-overwrite rename)") {
    val d = tmp()
    val a = PointerCommit.createState(LocalStorage, s"$d/t", Map.empty,
      TableState.Restoring("_dropped-t-11111111", "11111111"))
    val b = PointerCommit.createState(LocalStorage, s"$d/t", Map.empty,
      TableState.Restoring("_dropped-t-22222222", "22222222"))
    assert(a && !b, "first claim wins, second loses loudly-but-cleanly")
    PointerCommit.stateOf(LocalStorage, s"$d/t") match {
      case TableState.Restoring(src, id) =>
        assert(src == "_dropped-t-11111111" && id == "11111111")
      case other => fail(s"unexpected state $other")
    }
    // no tmp litter from the loser
    assert(LocalStorage.listFiles(s"$d/t").size == 1)
  }

  test("finalizeTombstone is id-fenced: a CREATE that reclaimed the " +
    "name keeps its _table; the dropper's own tombstone goes") {
    val d = tmp()
    val t = s"$d/t"
    // dropper's tombstone…
    PointerCommit.createState(LocalStorage, t, Map("buckets" -> "4"),
      TableState.Dropped(None, "dddddddd"))
    // …already replaced by a reclaiming CREATE's live props
    GraftCatalog.writeTableProps(LocalStorage, t, Map("buckets" -> "8"))
    PointerCommit.finalizeTombstone(LocalStorage, t, "dddddddd")
    assert(GraftCatalog.readTableProps(LocalStorage, t) == Map("buckets" -> "8"),
      "the new table's _table must survive the old dropper's finalize")
    // the dropper's own tombstone IS removed
    val t2 = s"$d/u"
    PointerCommit.createState(LocalStorage, t2, Map.empty,
      TableState.Dropped(None, "eeeeeeee"))
    PointerCommit.finalizeTombstone(LocalStorage, t2, "eeeeeeee")
    assert(!LocalStorage.exists(t2))
  }

  test("destroyResidue keeps the pointer authoritative: data and " +
    "internals go, _table and lease litter stay until finalize") {
    val d = tmp()
    val t = s"$d/t"
    LocalStorage.mkdirs(s"$t/_history")
    LocalStorage.create(s"$t/_history/00001-x").close()
    LocalStorage.create(s"$t/gen-1-Data.db").close()
    LocalStorage.create(s"$t/gen-1-Index.db").close()
    LocalStorage.create(s"$t/_commit-job1").close()
    LocalStorage.create(s"$t/_lease").close()
    PointerCommit.createState(LocalStorage, t, Map.empty,
      TableState.Dropped(None, "abcd1234"))
    PointerCommit.destroyResidue(LocalStorage, t)
    val names = LocalStorage.listFiles(t).map(p => p.substring(p.lastIndexOf('/') + 1))
    assert(names.toSet == Set(GraftCatalog.TablePropsFile, "_lease"), names)
    assert(LocalStorage.listSubdirs(t, "").isEmpty)
  }

  test("residueClearable: Dropped always; Restoring only once its " +
    "pointer stamp goes stale (a live undrop must not be cleared)") {
    val d = tmp()
    val drop = s"$d/t1"
    PointerCommit.createState(LocalStorage, drop, Map.empty,
      TableState.Dropped(None, "11111111"))
    assert(PointerCommit.residueClearable(LocalStorage, drop))
    val fresh = s"$d/t2"
    PointerCommit.createState(LocalStorage, fresh, Map.empty,
      TableState.Restoring("_dropped-t2-22222222", "22222222"))
    assert(!PointerCommit.residueClearable(LocalStorage, fresh),
      "a fresh restoring pointer is a LIVE undrop — hands off")
    // stale: backdate the pointer past the staged horizon
    new java.io.File(s"$fresh/${GraftCatalog.TablePropsFile}")
      .setLastModified(System.currentTimeMillis() -
        GraftCatalog.StageVacuumHorizonMs - 60000)
    assert(PointerCommit.residueClearable(LocalStorage, fresh))
  }

  test("copyTree copies content + internals, never transient litter; " +
    "the manifest it returns feeds the racer diff") {
    val d = tmp()
    val t = s"$d/t"
    LocalStorage.mkdirs(s"$t/_history")
    LocalStorage.create(s"$t/_history/00001-insert").close()
    LocalStorage.mkdirs(s"$t/_snapshot-v1")
    LocalStorage.create(s"$t/_snapshot-v1/gen-1-Data.db").close()
    LocalStorage.create(s"$t/gen-1-Data.db").close()
    LocalStorage.create(s"$t/_lease").close()
    LocalStorage.create(s"$t/_commit-j").close()
    LocalStorage.create(s"$t/${GraftCatalog.StageHeartbeatFile}").close()
    GraftCatalog.writeTableProps(LocalStorage, t, Map("buckets" -> "2"))
    val copied = PointerCommit.copyTree(LocalStorage, t, s"$d/trash")
    assert(copied == Set("gen-1-Data.db", GraftCatalog.TablePropsFile), copied)
    val names = LocalStorage.listFiles(s"$d/trash")
      .map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
    assert(names == Set("gen-1-Data.db", GraftCatalog.TablePropsFile), names)
    assert(LocalStorage.exists(s"$d/trash/_history/00001-insert"))
    assert(LocalStorage.exists(s"$d/trash/_snapshot-v1/gen-1-Data.db"))
  }

  // ---- the judge's DONE criterion: concurrent reader over objsim ----

  private lazy val objLocal: String =
    Files.createTempDirectory("ptr-objsim-wh").toString
  private lazy val warehouse: String = s"objsim://$objLocal"

  private lazy val spark: org.apache.spark.sql.SparkSession = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    ObjSimFileSystem.ConfEntries.foreach { case (k, v) =>
      s.sparkContext.hadoopConfiguration.set(k, v) }
    s.conf.set("spark.sql.catalog.graft_pc",
      classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_pc.warehouse", warehouse)
    s
  }

  private def objStorage: Storage = new HadoopStorage(ObjSimFileSystem.conf())

  private def ins(table: String, rows: Seq[(String, String, Long)]): Unit = {
    val values = rows.map { case (k, v, ts) =>
      s"(CAST('$k' AS BINARY), array(named_struct(" +
        s"'name', CAST('c' AS BINARY), 'state', 'NORMAL', " +
        s"'value', CAST('$v' AS BINARY), 'timestamp', CAST($ts AS BIGINT), " +
        s"'ttlSecs', CAST(0 AS BIGINT), 'expiresMillis', CAST(0 AS BIGINT))), " +
        "CAST(NULL AS STRUCT<localDeletionTime: INT, markedForDeleteAt: BIGINT>))"
    }.mkString(", ")
    spark.sql(s"INSERT INTO $table VALUES $values")
  }

  /** One observation of the table through the catalog: Some(sorted key
    * set) on a successful read, None when the table (correctly) does
    * not resolve. Any OTHER failure — and any partial key set — is the
    * bug this spec exists to catch. */
  private def observe(table: String): Option[Seq[String]] =
    try Some(spark.sql(s"SELECT CAST(key AS STRING) FROM $table")
      .collect().map(_.getString(0)).toSeq.sorted)
    catch {
      case e: Throwable
          if e.getMessage != null && (
            e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
              e.getMessage.contains("cannot be found")) => None
    }

  test("a concurrent reader during REPLACE and DROP over objsim sees " +
    "exactly old-state-or-new-state, never a partial tree " +
    "(judge r11 #3 DONE criterion)") {
    spark.sql("CREATE NAMESPACE graft_pc.rw")
    spark.sql("CREATE TABLE graft_pc.rw.t")
    // several generations: the old tree has many objects to mis-observe
    ins("graft_pc.rw.t", Seq(("a", "1", 10L), ("b", "2", 10L)))
    ins("graft_pc.rw.t", Seq(("c", "3", 20L)))
    ins("graft_pc.rw.t", Seq(("d", "4", 30L)))
    val oldState = Seq("a", "b", "c", "d")
    val newState = Seq("x", "y")
    assert(observe("graft_pc.rw.t").contains(oldState))

    // deterministic sampling at the exact commit boundaries: the flip
    // hooks observe the table the instant before and after every
    // pointer replace of this table
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def check(at: String, got: Option[Seq[String]]): Unit = got match {
      case None => ()
      case Some(s) if s == oldState || s == newState => ()
      case Some(s) => bad.add(s"$at: PARTIAL $s"); ()
    }
    val hooked = new java.util.concurrent.atomic.AtomicInteger
    PointerCommit.testBeforeFlip = (dir, st) =>
      if (dir.endsWith("/rw/t")) {
        hooked.incrementAndGet()
        check(s"before-$st", observe("graft_pc.rw.t"))
      }
    PointerCommit.testAfterFlip = (dir, st) =>
      if (dir.endsWith("/rw/t")) check(s"after-$st", observe("graft_pc.rw.t"))
    // plus a free-running reader for the whole swap window; any
    // exception it hits is legal loudness (planning re-check "rerun",
    // straggler-task FileNotFound on destroyed files) — only a
    // SUCCESSFUL partial read is the defect
    @volatile var stop = false
    val reader = new Thread(() => {
      while (!stop)
        try check("loop", observe("graft_pc.rw.t"))
        catch { case _: Throwable => () }
    }, "pc-reader")
    reader.start()
    try {
      spark.sql("CREATE OR REPLACE TABLE graft_pc.rw.t AS " +
        "SELECT CAST(key AS BINARY) key, columns, rowTombstone FROM (" +
        "SELECT CAST('x' AS STRING) key, array(named_struct(" +
        "'name', CAST('c' AS BINARY), 'state', 'NORMAL', " +
        "'value', CAST('9' AS BINARY), 'timestamp', CAST(99 AS BIGINT), " +
        "'ttlSecs', CAST(0 AS BIGINT), 'expiresMillis', CAST(0 AS BIGINT))) " +
        "columns, CAST(NULL AS STRUCT<localDeletionTime: INT, " +
        "markedForDeleteAt: BIGINT>) rowTombstone " +
        "UNION ALL SELECT 'y', array(named_struct(" +
        "'name', CAST('c' AS BINARY), 'state', 'NORMAL', " +
        "'value', CAST('8' AS BINARY), 'timestamp', CAST(99 AS BIGINT), " +
        "'ttlSecs', CAST(0 AS BIGINT), 'expiresMillis', CAST(0 AS BIGINT))), " +
        "CAST(NULL AS STRUCT<localDeletionTime: INT, markedForDeleteAt: BIGINT>))")
      assert(observe("graft_pc.rw.t").contains(newState), "REPLACE landed")
      spark.sql("DROP TABLE graft_pc.rw.t")
      assert(observe("graft_pc.rw.t").isEmpty, "DROP landed")
    } finally {
      stop = true
      reader.join(10000)
      PointerCommit.testBeforeFlip = (_, _) => ()
      PointerCommit.testAfterFlip = (_, _) => ()
    }
    assert(hooked.get() >= 2, "the flip hooks must actually have sampled")
    assert(bad.isEmpty, s"partial states observed: ${bad.toArray.mkString("; ")}")
    // the dropped table is restorable — the full round trip held together
    spark.sql("CALL graft_pc.system.undrop_table(table => 'rw.t')")
    assert(observe("graft_pc.rw.t").contains(newState))
  }

  // ---- crash shapes (judge r11 #4): every step boundary recovers ----

  private def crashAfterFiles(n: Int, matching: String): Unit = {
    val seen = new java.util.concurrent.atomic.AtomicInteger
    PointerCommit.testAfterCopyFile = dst =>
      if (dst.contains(matching) && seen.incrementAndGet() >= n)
        throw new RuntimeException(s"injected crash after $n copies")
  }
  private def resetSeams(): Unit = {
    PointerCommit.testAfterCopyFile = _ => ()
    PointerCommit.testBeforeFlip = (_, _) => ()
    PointerCommit.testAfterFlip = (_, _) => ()
  }

  test("failure DURING the DROP's trash copy: live table untouched and " +
    "the stale copy cleaned up; a HARD-crash half-copy is invalid " +
    "(complete=false, never an undrop candidate) and ages out") {
    spark.sql("CREATE NAMESPACE graft_pc.c1")
    spark.sql("CREATE TABLE graft_pc.c1.t")
    ins("graft_pc.c1.t", Seq(("a", "1", 10L), ("b", "2", 10L)))
    crashAfterFiles(1, "/_dropped-t-")
    try intercept[Exception](spark.sql("DROP TABLE graft_pc.c1.t"))
    finally resetSeams()
    // old state: complete and readable — and the failed attempt's stale
    // copy was removed (truth-on-disk: the flip never landed, so a later
    // undrop must never be able to restore the stale duplicate)
    assert(observe("graft_pc.c1.t").contains(Seq("a", "b")))
    assert(spark.sql("CALL graft_pc.system.list_trash(namespace => 'c1')")
      .collect().isEmpty, "uncommitted trash copy must be cleaned up")
    // HARD crash (process death — no cleanup ran): craft the half-copy
    // shape directly: content without the completeness marker
    val st = objStorage
    PointerCommit.copyTree(st, s"$warehouse/c1/t",
      s"$warehouse/c1/_dropped-t-deadbeef")
    st.create(s"$warehouse/c1/_dropped-t-deadbeef/" +
      GraftCatalog.StageHeartbeatFile).close()
    val rows = spark.sql("CALL graft_pc.system.list_trash(namespace => 'c1')")
      .collect()
    assert(rows.length == 1 && !rows(0).getAs[Boolean]("complete"), rows.toSeq)
    // not an undrop candidate even after the live table is dropped…
    spark.sql("DROP TABLE graft_pc.c1.t")
    spark.sql("CALL graft_pc.system.undrop_table(table => 'c1.t')")
    assert(observe("graft_pc.c1.t").contains(Seq("a", "b")),
      "undrop must restore the COMPLETE entry, never the half-copy")
    // …and the explicit vacuum reclaims it once aged (horizon 0 here)
    spark.sql("CALL graft_pc.system.vacuum_trash(namespace => 'c1', " +
      "older_than_ms => 0)")
    assert(spark.sql("CALL graft_pc.system.list_trash(namespace => 'c1')")
      .collect().isEmpty)
  }

  test("crash AFTER the DROP's pointer flip (tombstone + residue): " +
    "readers refuse, undrop restores the full table and clears the " +
    "residue") {
    spark.sql("CREATE NAMESPACE graft_pc.c2")
    spark.sql("CREATE TABLE graft_pc.c2.t")
    ins("graft_pc.c2.t", Seq(("a", "1", 10L), ("b", "2", 10L)))
    val d = s"$warehouse/c2/t"
    PointerCommit.testAfterFlip = (dir, st) =>
      if (dir.endsWith("/c2/t") && st.isInstanceOf[TableState.Dropped])
        throw new RuntimeException("injected crash right after the commit")
    try intercept[Exception](spark.sql("DROP TABLE graft_pc.c2.t"))
    finally resetSeams()
    // the DROP committed: tombstone refuses while residue still has data
    assert(observe("graft_pc.c2.t").isEmpty, "pointer flip = dropped")
    assert(objStorage.listDataFiles(d).nonEmpty,
      "crash shape: residue data still on disk behind the tombstone")
    // raw path reads refuse too (no phantom empty table)
    intercept[IllegalStateException](
      spark.read.format("sstable").load(d).collect())
    // undrop clears the residue and restores from the complete trash copy
    spark.sql("CALL graft_pc.system.undrop_table(table => 'c2.t')")
    assert(observe("graft_pc.c2.t").contains(Seq("a", "b")))
  }

  test("crash AFTER the REPLACE commit (redirect left behind): readers " +
    "see the complete NEW state through the pointer; the sweep protects " +
    "the stage; the next maintenance CALL completes the migration") {
    spark.sql("CREATE NAMESPACE graft_pc.c3")
    spark.sql("CREATE TABLE graft_pc.c3.t")
    ins("graft_pc.c3.t", Seq(("a", "1", 10L)))
    val nsD = s"$warehouse/c3"
    PointerCommit.testAfterFlip = (dir, st) =>
      if (dir.endsWith("/c3/t") && st.isInstanceOf[TableState.Redirect])
        throw new RuntimeException("injected crash right after the commit")
    try intercept[Exception](spark.sql(
      "CREATE OR REPLACE TABLE graft_pc.c3.t AS SELECT * FROM graft_pc.c3.t " +
        "WHERE key = CAST('a' AS BINARY)"))
    finally resetSeams()
    // committed: the new state reads through the redirect
    assert(observe("graft_pc.c3.t").contains(Seq("a")))
    val st = objStorage
    assert(st.listSubdirs(nsD, "_stage-").nonEmpty, "redirect target alive")
    // the sweep must NOT take the redirect target, even fully stale
    GraftCatalog.sweepNamespace(st, nsD, trashOlderThanMs = 0)
    assert(st.listSubdirs(nsD, "_stage-").nonEmpty,
      "sweeping a redirect target would destroy the committed new state")
    // any maintenance CALL settles the migration under its lease
    spark.sql("CALL graft_pc.system.compact(table => 'c3.t', " +
      "min_threshold => 2, min_size => 0)")
    assert(st.listSubdirs(nsD, "_stage-").isEmpty, "migration completed")
    assert(observe("graft_pc.c3.t").contains(Seq("a")))
    assert(PointerCommit.stateOf(st, s"$nsD/t") == TableState.Live)
  }

  test("DROP NAMESPACE CASCADE composes per-table pointer commits: a " +
    "reader of a table inside sees it whole or not at all; undrop " +
    "restores exactly the tables that were live (pre-existing trash " +
    "stays trash); a crashed cascade re-runs losslessly") {
    spark.sql("CREATE NAMESPACE graft_pc.ns1")
    spark.sql("CREATE NAMESPACE graft_pc.ns1.inner")
    spark.sql("CREATE TABLE graft_pc.ns1.a")
    spark.sql("CREATE TABLE graft_pc.ns1.b")
    spark.sql("CREATE TABLE graft_pc.ns1.inner.c")
    ins("graft_pc.ns1.a", Seq(("a1", "1", 10L), ("a2", "2", 10L)))
    ins("graft_pc.ns1.b", Seq(("b1", "1", 10L)))
    ins("graft_pc.ns1.inner.c", Seq(("c1", "1", 10L)))
    // a table dropped BEFORE the namespace drop: its trash must ride
    // along but NOT auto-restore (it was not live at drop time)
    spark.sql("CREATE TABLE graft_pc.ns1.old")
    ins("graft_pc.ns1.old", Seq(("o1", "1", 10L)))
    spark.sql("DROP TABLE graft_pc.ns1.old")

    // reader samples table `a` at every pointer flip during the cascade
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    PointerCommit.testAfterFlip = (dir, _) =>
      if (dir.contains("/ns1/")) observe("graft_pc.ns1.a") match {
        case None | Some(Seq("a1", "a2")) => ()
        case Some(other) => bad.add(s"partial: $other"); ()
      }
    // and the FIRST per-table drop crashes right after its commit: the
    // cascade dies midway (a tombstoned, trash-backed + the rest live)
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
    PointerCommit.testBeforeFlip = (dir, st) =>
      if (dir.endsWith("/ns1/a") && st.isInstanceOf[TableState.Dropped] &&
          !crashed.getAndSet(true))
        throw new RuntimeException("injected crash mid-cascade")
    try intercept[Exception](spark.sql("DROP NAMESPACE graft_pc.ns1 CASCADE"))
    finally PointerCommit.testBeforeFlip = (_, _) => ()
    // midway state: some tables may be gone, the rest read whole
    // (observe() above pinned no-partial); re-running completes
    try spark.sql("DROP NAMESPACE graft_pc.ns1 CASCADE")
    finally PointerCommit.testAfterFlip = (_, _) => ()
    assert(bad.isEmpty, bad.toArray.mkString("; "))
    assert(!spark.catalog.databaseExists("graft_pc.ns1"))

    // round trip: the shell returns, then exactly the live-at-drop
    // tables — nested included; `old` stays in trash (manual undrop)
    val res = spark.sql(
      "CALL graft_pc.system.undrop_namespace(namespace => 'ns1')").collect()
    assert(res(0).getAs[Int]("tablesRestored") == 3, res.toSeq)
    assert(observe("graft_pc.ns1.a").contains(Seq("a1", "a2")))
    assert(observe("graft_pc.ns1.b").contains(Seq("b1")))
    assert(observe("graft_pc.ns1.inner.c").contains(Seq("c1")))
    assert(observe("graft_pc.ns1.old").isEmpty, "pre-drop trash stays trash")
    val trash = spark.sql("CALL graft_pc.system.list_trash(namespace => 'ns1')")
      .collect().map(_.getAs[String]("name")).toSeq
    assert(trash == Seq("old"), trash)
    spark.sql("CALL graft_pc.system.undrop_table(table => 'ns1.old')")
    assert(observe("graft_pc.ns1.old").contains(Seq("o1")))
  }

  test("RENAME is pointer-committed: both names flip atomically " +
    "(complete states only), and a crash mid-copy leaves the source " +
    "live with the target claim cleaned up") {
    spark.sql("CREATE NAMESPACE graft_pc.rn")
    spark.sql("CREATE TABLE graft_pc.rn.t")
    ins("graft_pc.rn.t", Seq(("a", "1", 10L), ("b", "2", 10L)))
    // crash mid-copy: the target's restoring claim must not survive to
    // block the name for the liveness horizon
    crashAfterFiles(1, "/rn/t2/")
    try intercept[Exception](
      spark.sql("ALTER TABLE graft_pc.rn.t RENAME TO rn.t2"))
    finally resetSeams()
    assert(observe("graft_pc.rn.t").contains(Seq("a", "b")), "source intact")
    assert(!objStorage.exists(s"$warehouse/rn/t2"),
      "the failed target claim must be cleaned up, not strand the name")
    // the retry lands: old name gone (loudly), new name whole
    spark.sql("ALTER TABLE graft_pc.rn.t RENAME TO rn.t2")
    assert(observe("graft_pc.rn.t").isEmpty)
    assert(observe("graft_pc.rn.t2").contains(Seq("a", "b")))
  }

  test("lifecycle chaos: concurrent DROP/undrop/REPLACE + two readers " +
    "on one name — every read is a consistent state, every refusal is " +
    "loud, and the end state is always recoverable") {
    spark.sql("CREATE NAMESPACE graft_pc.chaos")
    spark.sql("CREATE TABLE graft_pc.chaos.t")
    ins("graft_pc.chaos.t", Seq(("a", "1", 10L)))
    ins("graft_pc.chaos.t", Seq(("b", "2", 20L)))
    val oldState = Seq("a", "b")
    val newState = Seq("x")
    val replaceSql = "CREATE OR REPLACE TABLE graft_pc.chaos.t AS " +
      "SELECT CAST('x' AS BINARY) key, array(named_struct(" +
      "'name', CAST('c' AS BINARY), 'state', 'NORMAL', " +
      "'value', CAST('9' AS BINARY), 'timestamp', CAST(99 AS BIGINT), " +
      "'ttlSecs', CAST(0 AS BIGINT), 'expiresMillis', CAST(0 AS BIGINT))) " +
      "columns, CAST(NULL AS STRUCT<localDeletionTime: INT, " +
      "markedForDeleteAt: BIGINT>) rowTombstone"
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val silent = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var ddlDone = false
    val rechecks = new java.util.concurrent.atomic.AtomicInteger
    // forensics for the ~1-in-10 empty-read observation (NOTES #104):
    // capture the directory's exact on-disk state the INSTANT a bad
    // read is seen, so the next occurrence carries its own diagnosis
    def forensics(): String = try {
      val d = s"$warehouse/chaos/t"
      val st = objStorage
      val files =
        try st.listFiles(d).map(p => p.substring(p.lastIndexOf('/') + 1)).sorted
        catch { case e: Exception => Seq(s"<list failed: ${e.getMessage}>") }
      val subdirs =
        try st.listSubdirs(d, "").map(p => p.substring(p.lastIndexOf('/') + 1))
        catch { case e: Exception => Seq(s"<subdirs failed: ${e.getMessage}>") }
      val props =
        try st.readString(s"$d/${GraftCatalog.TablePropsFile}").replace("\n", ";")
        catch { case e: Exception => s"<props read failed: ${e.getMessage}>" }
      val ns =
        try st.listSubdirs(s"$warehouse/chaos", "")
          .map(p => p.substring(p.lastIndexOf('/') + 1)).sorted
        catch { case e: Exception => Seq(s"<ns list failed: ${e.getMessage}>") }
      s"files=$files subdirs=$subdirs props=[$props] ns=$ns"
    } catch { case e: Exception => s"<forensics failed: $e>" }
    val readers = (1 to 2).map(i => new Thread(() => {
      while (!ddlDone) {
        // the post-list re-check's loud "rerun" refusal is a LEGAL
        // outcome for a reader straddling a swap (it is the alternative
        // to a silent partial read) — count it and keep sampling
        // ANY exception is a legal outcome: the contract is loud-or-
        // consistent — planning re-checks say "rerun", straggler tasks
        // hit FileNotFound on destroyed residue/stage files. The enemy
        // this loop exists to catch is a SUCCESSFUL partial read.
        val got =
          try Right(observe("graft_pc.chaos.t"))
          catch { case _: Throwable => rechecks.incrementAndGet(); Left(()) }
        got match {
          case Right(None | Some(`oldState`) | Some(`newState`)) | Left(()) => ()
          case Right(Some(other)) =>
            bad.add(s"reader$i: $other | ${forensics()}"); ()
        }
      }
    }, s"chaos-reader-$i"))
    readers.foreach(_.start())
    // a fixed DDL storm; every op either succeeds or refuses LOUDLY.
    // LEGAL loudness is any declared-refusal class (analysis errors,
    // IllegalState refusals, lease conflicts, vanished-file straggler
    // IO) anywhere in the cause chain — the defect classes this records
    // are the wrong-by-construction ones: NPEs, match errors, class
    // casts, assertion errors (a swap corrupting in-memory invariants).
    def attempt(tag: String)(op: => Unit): Unit =
      try op catch {
        case e: Throwable =>
          def classes(t: Throwable): Seq[Throwable] =
            if (t == null) Nil else t +: classes(t.getCause)
          val wrong = classes(e).exists {
            case _: NullPointerException | _: MatchError |
                 _: ClassCastException | _: AssertionError |
                 _: ArrayIndexOutOfBoundsException => true
            case _ => false
          }
          if (wrong) silent.add(s"$tag: ${classes(e).map(_.toString).mkString(" <- ")}")
      }
    (1 to 5).foreach { _ =>
      attempt("drop")(spark.sql("DROP TABLE graft_pc.chaos.t"))
      attempt("undrop")(
        spark.sql("CALL graft_pc.system.undrop_table(table => 'chaos.t')"))
      attempt("replace")(spark.sql(replaceSql))
      attempt("drop2")(spark.sql("DROP TABLE graft_pc.chaos.t"))
      attempt("undrop2")(
        spark.sql("CALL graft_pc.system.undrop_table(table => 'chaos.t')"))
    }
    ddlDone = true
    readers.foreach(_.join(15000))
    assert(bad.isEmpty, s"partial reads under chaos: ${bad.toArray.mkString("; ")}")
    assert(silent.isEmpty, silent.toArray.mkString("; "))
    // recoverability: whatever the storm left, reach a readable table
    if (observe("graft_pc.chaos.t").isEmpty)
      attempt("final-undrop")(
        spark.sql("CALL graft_pc.system.undrop_table(table => 'chaos.t')"))
    val fin = observe("graft_pc.chaos.t")
    assert(fin.contains(oldState) || fin.contains(newState),
      s"end state must be one of the two contents: $fin")
    // and the namespace is cleanly vacuumable
    spark.sql("CALL graft_pc.system.vacuum_trash(namespace => 'chaos', " +
      "older_than_ms => 0)")
    assert(observe("graft_pc.chaos.t") == fin, "vacuum must not touch the live table")
  }

  test("a running STREAM fails loudly when its table is dropped under " +
    "it — the residue listing must not read as 'quietly no new data'") {
    spark.sql("CREATE NAMESPACE graft_pc.sg")
    spark.sql("CREATE TABLE graft_pc.sg.t")
    ins("graft_pc.sg.t", Seq(("a", "1", 10L)))
    val dir = s"$warehouse/sg/t"
    val q = spark.readStream.format("sstable").load(dir)
      .writeStream.format("memory").queryName("pc_stream_guard")
      .option("checkpointLocation",
        Files.createTempDirectory("pc-sg-ck").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM pc_stream_guard").head().getLong(0) == 1)
      // a DROP commits under the stream: the pointer flips, residue stays
      PointerCommit.writeState(objStorage, dir,
        GraftCatalog.readTableProps(objStorage, dir),
        TableState.Dropped(None, "deadbeef"))
      val e = intercept[Exception] { q.processAllAvailable() }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else t.getMessage +: chain(t.getCause)
      assert(chain(e).exists(m => m != null &&
        m.contains("dropped/replaced under this running stream")), chain(e))
    } finally {
      try q.stop() catch { case _: Exception => () }
      PointerCommit.clearResidue(objStorage, dir)
    }
  }

  test("a catalog-managed stream refuses when the pointer VANISHES (a " +
    "finalized DROP) instead of idling forever on 'quietly no new " +
    "data' — the one-read stream guard (r13 chaos family)") {
    spark.sql("CREATE NAMESPACE graft_pc.sg2")
    spark.sql("CREATE TABLE graft_pc.sg2.t")
    ins("graft_pc.sg2.t", Seq(("a", "1", 10L)))
    val dir = s"$warehouse/sg2/t"
    val q = spark.readStream.table("graft_pc.sg2.t")
      .writeStream.format("memory").queryName("pc_stream_vanish")
      .option("checkpointLocation",
        Files.createTempDirectory("pc-sg2-ck").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM pc_stream_vanish")
        .head().getLong(0) == 1)
      // the finalize's terminal instant: data swept AND `_table` gone
      objStorage.listDataFiles(dir)
        .foreach(graft.sources.sstable.SSTableFiles.unpublish(objStorage, _))
      objStorage.delete(s"$dir/${GraftCatalog.TablePropsFile}")
      val e = intercept[Exception] { q.processAllAvailable() }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq :+
          String.valueOf(t.getCause)
      assert(chain(e).exists(m => m != null &&
        m.contains("pointer is gone under this running stream")), chain(e))
    } finally {
      try q.stop() catch { case _: Exception => () }
      // restore a live pointer so the catalog can DROP the husk cleanly
      GraftCatalog.writeTableProps(objStorage, dir, Map.empty)
      spark.sql("DROP TABLE graft_pc.sg2.t PURGE")
    }
  }

  test("a SECOND PROCESS observing the table through the on-disk " +
    "pointer contract during REPLACE + DROP + undrop sees only " +
    "old-state / new-state / none — never a partial generation set") {
    spark.sql("CREATE NAMESPACE graft_pc.xp")
    spark.sql("CREATE TABLE graft_pc.xp.t")
    ins("graft_pc.xp.t", Seq(("a", "1", 10L)))
    ins("graft_pc.xp.t", Seq(("b", "2", 20L)))
    ins("graft_pc.xp.t", Seq(("c", "3", 30L)))
    val st = objStorage
    val tDir = s"$warehouse/xp/t"
    val nsD = s"$warehouse/xp"
    def gensOf(d: String): String = st.listDataFiles(d)
      .map(p => p.substring(p.lastIndexOf('/') + 1)).sorted.mkString(",")
    val oldGens = gensOf(tDir)
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val child = new ProcessBuilder(javaBin, "-Xmx128m",
        "-cp", System.getProperty("java.class.path"),
        "graft.sources.sstable.LeaseChild", "observer", tDir, "60000")
      .inheritIO().start()
    try {
      // the swaps start only once the child demonstrably observes
      val readyDeadline = System.currentTimeMillis() + 20000
      while (!st.exists(s"$nsD/child-observing") &&
          System.currentTimeMillis() < readyDeadline) Thread.sleep(20)
      assert(st.exists(s"$nsD/child-observing"), "observer never came up")
      spark.sql("CREATE OR REPLACE TABLE graft_pc.xp.t AS " +
        "SELECT * FROM graft_pc.xp.t WHERE key = CAST('a' AS BINARY)")
      val newGens = gensOf(tDir)
      assert(newGens.nonEmpty && newGens != oldGens)
      spark.sql("DROP TABLE graft_pc.xp.t")
      spark.sql("CALL graft_pc.system.undrop_table(table => 'xp.t')")
      assert(gensOf(tDir) == newGens, "undrop restores the same fileset")
      st.create(s"$nsD/parent-done").close()
      assert(child.waitFor(30, java.util.concurrent.TimeUnit.SECONDS) &&
        child.exitValue() == 0, s"observer child failed: ${child.exitValue()}")
      val obs = st.readString(s"$nsD/child-observations")
        .split("\n").map(_.trim).filter(_.nonEmpty).toSeq
      val allowed = Set("none", oldGens, newGens)
      val bad = obs.filterNot(allowed)
      assert(bad.isEmpty,
        s"partial cross-process observations: $bad (old=$oldGens new=$newGens)")
      assert(obs.nonEmpty, "the observer must have sampled something")
    } finally {
      child.destroyForcibly()
      st.delete(s"$nsD/parent-done")
      st.delete(s"$nsD/child-observations")
      st.delete(s"$nsD/child-observing")
    }
  }

  test("a crashed undrop_namespace (shell back, tables still trash) " +
    "RESUMES instead of refusing over its own half-done work") {
    spark.sql("CREATE NAMESPACE graft_pc.ns2")
    spark.sql("CREATE TABLE graft_pc.ns2.t")
    ins("graft_pc.ns2.t", Seq(("k", "1", 10L)))
    spark.sql("DROP NAMESPACE graft_pc.ns2 CASCADE")
    // crash the per-table restore right after its restoring claim: the
    // shell is live again, `t` is a fresh restoring residue + intact
    // marked trash
    PointerCommit.testAfterCopyFile = dst =>
      if (dst.contains("/ns2/t/"))
        throw new RuntimeException("injected crash mid-table-restore")
    try intercept[Exception](spark.sql(
      "CALL graft_pc.system.undrop_namespace(namespace => 'ns2')"))
    finally resetSeams()
    assert(observe("graft_pc.ns2.t").isEmpty, "half-restored must refuse")
    // the residue is FRESH (could be a live restorer): back-date it the
    // way a later operator would find a crashed one
    new java.io.File(s"$objLocal/ns2/t/${GraftCatalog.TablePropsFile}")
      .setLastModified(System.currentTimeMillis() -
        GraftCatalog.StageVacuumHorizonMs - 60000)
    val res = spark.sql(
      "CALL graft_pc.system.undrop_namespace(namespace => 'ns2')").collect()
    assert(res(0).getAs[String]("restoredFrom") == "(resumed in place)" &&
      res(0).getAs[Int]("tablesRestored") == 1, res.toSeq)
    assert(observe("graft_pc.ns2.t").contains(Seq("k")))
  }

  test("crash DURING the undrop's restore copy: the name refuses " +
    "(restoring pointer), the trash stays authoritative, re-running " +
    "the undrop succeeds") {
    spark.sql("CREATE NAMESPACE graft_pc.c4")
    spark.sql("CREATE TABLE graft_pc.c4.t")
    ins("graft_pc.c4.t", Seq(("a", "1", 10L), ("b", "2", 10L)))
    spark.sql("DROP TABLE graft_pc.c4.t")
    crashAfterFiles(1, "/c4/t/")
    try intercept[Exception](
      spark.sql("CALL graft_pc.system.undrop_table(table => 'c4.t')"))
    finally resetSeams()
    assert(observe("graft_pc.c4.t").isEmpty,
      "a half-restored name must refuse, not read partially")
    // the residue is a FRESH restoring pointer: a blind retry refuses
    // (another undrop could be live) until it is cleared or goes stale —
    // backdate it to model the crashed restorer found later
    val t = s"$warehouse/c4/t"
    assert(TableState.isResidue(PointerCommit.stateOf(objStorage, t)))
    new java.io.File(s"$objLocal/c4/t/${GraftCatalog.TablePropsFile}")
      .setLastModified(System.currentTimeMillis() -
        GraftCatalog.StageVacuumHorizonMs - 60000)
    spark.sql("CALL graft_pc.system.undrop_table(table => 'c4.t')")
    assert(observe("graft_pc.c4.t").contains(Seq("a", "b")))
  }

  test("RENAME observer (VERDICT r12 Next #3): a free-running reader of " +
    "BOTH names sees complete states only — the one anomaly is the " +
    "documented both-visible overlap, and neither-name-visible never " +
    "happens while the data exists") {
    spark.sql("CREATE NAMESPACE graft_pc.rn2")
    spark.sql("CREATE TABLE graft_pc.rn2.t")
    ins("graft_pc.rn2.t", Seq(("a", "1", 10L), ("b", "2", 20L)))
    val content = Seq("a", "b")
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val sawBoth = new java.util.concurrent.atomic.AtomicBoolean(false)
    // sampling order matters for the neither-visible claim: `to` flips
    // Live BEFORE `from` tombstones, so reading `from` FIRST means a
    // None there implies `to` is already Live — (None, None) is
    // impossible in this order, and observing it is the data-loss bug
    def sample(at: String): Unit = {
      val a = try observe("graft_pc.rn2.t") catch { case _: Throwable => return }
      val b = try observe("graft_pc.rn2.t2") catch { case _: Throwable => return }
      (a, b) match {
        case (None, None) =>
          bad.add(s"$at: NEITHER name visible — a reader lost the table"); ()
        case (x, y) =>
          if (x.exists(_ != content)) { bad.add(s"$at: partial old name $x"); () }
          if (y.exists(_ != content)) { bad.add(s"$at: partial new name $y"); () }
          if (x.contains(content) && y.contains(content)) sawBoth.set(true)
      }
    }
    // deterministic boundary sampling: the instant before the old name's
    // tombstone flip is the documented both-visible overlap
    PointerCommit.testBeforeFlip = (dir, st) =>
      if (dir.endsWith("/rn2/t") && st.isInstanceOf[TableState.Dropped])
        sample("before-old-drop")
    PointerCommit.testAfterFlip = (dir, _) =>
      if (dir.contains("/rn2/")) sample("after-flip")
    @volatile var stop = false
    val reader = new Thread(() => { while (!stop) sample("loop") }, "rn2-reader")
    reader.start()
    try spark.sql("ALTER TABLE graft_pc.rn2.t RENAME TO rn2.t2")
    finally {
      stop = true
      reader.join(10000)
      resetSeams()
    }
    assert(bad.isEmpty, bad.toArray.mkString("; "))
    assert(sawBoth.get(),
      "the boundary sample must observe the documented both-visible overlap")
    assert(observe("graft_pc.rn2.t").isEmpty)
    assert(observe("graft_pc.rn2.t2").contains(content))
  }

  test("cascade observer (VERDICT r12 Next #3): free-running readers " +
    "during DROP NAMESPACE CASCADE see each table whole or not at all; " +
    "undrop restores everything") {
    spark.sql("CREATE NAMESPACE graft_pc.co")
    spark.sql("CREATE TABLE graft_pc.co.x")
    spark.sql("CREATE TABLE graft_pc.co.y")
    ins("graft_pc.co.x", Seq(("x1", "1", 10L), ("x2", "2", 20L)))
    ins("graft_pc.co.y", Seq(("y1", "1", 10L)))
    val want = Map("x" -> Seq("x1", "x2"), "y" -> Seq("y1"))
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var stop = false
    val readers = want.keys.map(t => new Thread(() => {
      while (!stop)
        try observe(s"graft_pc.co.$t") match {
          case None => ()
          case Some(s) if s == want(t) => ()
          case Some(other) => bad.add(s"$t: PARTIAL $other"); ()
        } catch { case _: Throwable => () } // loud refusals are legal
    }, s"co-reader-$t")).toSeq
    readers.foreach(_.start())
    try spark.sql("DROP NAMESPACE graft_pc.co CASCADE")
    finally { stop = true; readers.foreach(_.join(10000)) }
    assert(bad.isEmpty, bad.toArray.mkString("; "))
    assert(!spark.catalog.databaseExists("graft_pc.co"))
    val res = spark.sql(
      "CALL graft_pc.system.undrop_namespace(namespace => 'co')").collect()
    assert(res(0).getAs[Int]("tablesRestored") == 2, res.toSeq)
    assert(observe("graft_pc.co.x").contains(want("x")))
    assert(observe("graft_pc.co.y").contains(want("y")))
  }

  test("the post-list re-check judges pointer existence and state from " +
    "ONE read — the exists()-then-read vanish window can no longer " +
    "serve a successful EMPTY result (the r13 chaos find: a reader " +
    "listed zero data files, exists(_table) saw the tombstone, then " +
    "the state read found it deleted and empty props parsed as Live)") {
    val d = tmp()
    val t = s"$d/t"
    LocalStorage.mkdirs(t)
    import graft.sources.sstable.SeekableInput
    // the EXACT observed interleave: `_table` visible to exists() but
    // vanished by the read — the finalize deleted it in between
    val vanishing: Storage = new Storage {
      def open(path: String): SeekableInput =
        if (path.endsWith(s"/${GraftCatalog.TablePropsFile}"))
          throw new java.io.FileNotFoundException(path)
        else LocalStorage.open(path)
      def length(path: String): Long = LocalStorage.length(path)
      def mtime(path: String): Long = LocalStorage.mtime(path)
      def exists(path: String): Boolean =
        path.endsWith(s"/${GraftCatalog.TablePropsFile}") ||
          LocalStorage.exists(path)
      def create(path: String): java.io.DataOutputStream = LocalStorage.create(path)
      def delete(path: String): Unit = LocalStorage.delete(path)
      def rename(src: String, dst: String): Unit = LocalStorage.rename(src, dst)
      def replace(src: String, dst: String): Unit = LocalStorage.replace(src, dst)
      def listSubdirs(dir: String, prefix: String): Seq[String] =
        LocalStorage.listSubdirs(dir, prefix)
      def deleteRecursive(dir: String): Unit = LocalStorage.deleteRecursive(dir)
      def mkdirs(dir: String): Unit = LocalStorage.mkdirs(dir)
      def listDataFiles(dd: String): Seq[String] = Seq.empty
      def listFiles(dir: String): Seq[String] = LocalStorage.listFiles(dir)
    }
    val e = intercept[IllegalStateException](
      GraftCatalog.requirePostListState(vanishing, t, listedEmpty = true,
        catalogManaged = true, at = "planning"))
    assert(e.getMessage.contains("no data and no _table pointer"),
      e.getMessage)
    // a PRESENT but propless pointer (bare CREATE's) stays a legitimate
    // empty table — existence comes from the read, not a separate stat
    LocalStorage.create(s"$t/${GraftCatalog.TablePropsFile}").close()
    GraftCatalog.requirePostListState(LocalStorage, t, listedEmpty = true,
      catalogManaged = true, at = "planning") // must not throw
    // and residue states keep refusing through the same single read
    GraftCatalog.writeTableProps(LocalStorage, t,
      Map(TableState.Key -> "dropped::deadbeef"))
    val e2 = intercept[IllegalStateException](
      GraftCatalog.requirePostListState(LocalStorage, t, listedEmpty = true,
        catalogManaged = true, at = "planning"))
    assert(e2.getMessage.contains("dropped"), e2.getMessage)
  }

  // ---- ADVICE r12 closures ----

  test("absorbRacers copies each racer fileset in PUBLISH order — " +
    "siblings first, Data.db LAST (a Live RENAME destination being " +
    "listed, or a crash mid-absorb into already-stamped trash, must " +
    "never surface a Data.db without its complete fileset)") {
    val d = tmp()
    val t = s"$d/t"
    val trash = s"$d/trash"
    LocalStorage.mkdirs(t)
    LocalStorage.mkdirs(trash)
    graft.sources.sstable.SSTableFiles.AllSuffixes.foreach(s =>
      LocalStorage.create(s"$t/gen-9$s").close())
    val order = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    PointerCommit.testAfterCopyFile = dst =>
      if (dst.startsWith(trash)) {
        order.add(dst.substring(dst.lastIndexOf('/') + 1)); ()
      }
    try PointerCommit.absorbRacers(LocalStorage, t, Set.empty, Some(trash))
    finally resetSeams()
    val seq = order.toArray(Array.empty[String]).toSeq
    assert(seq.size == graft.sources.sstable.SSTableFiles.AllSuffixes.size, seq)
    assert(seq.last == "gen-9-Data.db", s"Data.db must land LAST: $seq")
  }

  test("completeMigration flips the stage to a refusing tombstone " +
    "BEFORE teardown: a straggler still holding the stage path fails " +
    "loudly instead of silently reading a partial listing (ADVICE r12)") {
    spark.sql("CREATE NAMESPACE graft_pc.m2")
    spark.sql("CREATE TABLE graft_pc.m2.t")
    ins("graft_pc.m2.t", Seq(("a", "1", 10L), ("b", "2", 20L)))
    // crash the REPLACE right after its redirect flip: redirect + stage
    PointerCommit.testAfterFlip = (dir, st) =>
      if (dir.endsWith("/m2/t") && st.isInstanceOf[TableState.Redirect])
        throw new RuntimeException("injected crash right after the commit")
    try intercept[Exception](spark.sql(
      "CREATE OR REPLACE TABLE graft_pc.m2.t AS SELECT * FROM graft_pc.m2.t " +
        "WHERE key = CAST('a' AS BINARY)"))
    finally resetSeams()
    val st = objStorage
    val nsD = s"$warehouse/m2"
    val stage = st.listSubdirs(nsD, "_stage-").head
    val stageName = stage.substring(stage.lastIndexOf('/') + 1)
    assert(st.listDataFiles(stage).nonEmpty, "stage holds the new state")
    // the straggler's window: at the instant the stage's pointer flips
    // to its refusing tombstone, ALL stage content must still be on
    // disk (the flip strictly precedes destruction) and a raw scan of
    // the stage path must refuse loudly — the silent-subset window a
    // bare deleteRecursive left open is closed
    val problems = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val sampled = new java.util.concurrent.atomic.AtomicBoolean(false)
    PointerCommit.testAfterFlip = (dir, s2) =>
      if (dir.endsWith(s"/$stageName") && s2.isInstanceOf[TableState.Dropped]) {
        sampled.set(true)
        if (st.listDataFiles(stage).isEmpty)
          problems.add("stage content destroyed before the refusing flip")
        try {
          spark.read.format("sstable").load(stage).collect()
          problems.add("a straggler read of the mid-teardown stage SUCCEEDED")
          ()
        } catch {
          // the loud refusal this fix exists to produce — either the
          // raw-path load guard ("mid-lifecycle") or the post-list
          // planning re-check ("dropped"), depending on where the
          // straggler is when the flip lands
          case e: IllegalStateException
              if e.getMessage.toLowerCase.contains("dropped") ||
                e.getMessage.contains("mid-lifecycle") => ()
          case e: Throwable =>
            problems.add(s"wrong refusal class: $e"); ()
        }
      }
    // any maintenance CALL settles the migration under its lease
    try spark.sql("CALL graft_pc.system.compact(table => 'm2.t', " +
      "min_threshold => 2, min_size => 0)")
    finally resetSeams()
    assert(sampled.get(), "the stage's refusing flip must have fired")
    assert(problems.isEmpty, problems.toArray.mkString("; "))
    assert(st.listSubdirs(nsD, "_stage-").isEmpty, "stage torn down")
    assert(observe("graft_pc.m2.t").contains(Seq("a")))
    assert(PointerCommit.stateOf(st, s"$nsD/t") == TableState.Live)
  }

  test("ALTER on a table left redirecting by a crashed REPLACE settles " +
    "the migration under ALTER's OWN lease and applies cleanly — no " +
    "misleading 'unsupported property' refusal (ADVICE r12)") {
    spark.sql("CREATE NAMESPACE graft_pc.m3")
    spark.sql("CREATE TABLE graft_pc.m3.t")
    ins("graft_pc.m3.t", Seq(("a", "1", 10L)))
    PointerCommit.testAfterFlip = (dir, st) =>
      if (dir.endsWith("/m3/t") && st.isInstanceOf[TableState.Redirect])
        throw new RuntimeException("injected crash right after the commit")
    try intercept[Exception](spark.sql(
      "CREATE OR REPLACE TABLE graft_pc.m3.t AS SELECT * FROM graft_pc.m3.t"))
    finally resetSeams()
    val st = objStorage
    assert(PointerCommit.stateOf(st, s"$warehouse/m3/t")
      .isInstanceOf[TableState.Redirect], "crash shape: redirect left behind")
    // the RMW reads props carrying the redirect line — the in-lease
    // settle must migrate first, never feed it to validation
    spark.sql("ALTER TABLE graft_pc.m3.t SET TBLPROPERTIES('compress'='false')")
    assert(PointerCommit.stateOf(st, s"$warehouse/m3/t") == TableState.Live,
      "ALTER settled the pending migration under its lease")
    assert(GraftCatalog.readTableProps(st, s"$warehouse/m3/t")
      .get("compress").contains("false"))
    assert(observe("graft_pc.m3.t").contains(Seq("a")))
  }

  test("finalizeTombstone re-reads the pointer AFTER its emptiness " +
    "listing: a CREATE reclaiming the name during the listing keeps " +
    "its fresh _table (ADVICE r12 narrowing)") {
    val base = tmp()
    val t = s"$base/t"
    PointerCommit.createState(LocalStorage, t, Map.empty,
      TableState.Dropped(None, "dddddddd"))
    import graft.sources.sstable.SeekableInput
    val spy: Storage = new Storage {
      def open(path: String): SeekableInput = LocalStorage.open(path)
      def length(path: String): Long = LocalStorage.length(path)
      def mtime(path: String): Long = LocalStorage.mtime(path)
      def exists(path: String): Boolean = LocalStorage.exists(path)
      def create(path: String): java.io.DataOutputStream = LocalStorage.create(path)
      def delete(path: String): Unit = LocalStorage.delete(path)
      def rename(src: String, dst: String): Unit = LocalStorage.rename(src, dst)
      def replace(src: String, dst: String): Unit = LocalStorage.replace(src, dst)
      def listSubdirs(dir: String, prefix: String): Seq[String] =
        LocalStorage.listSubdirs(dir, prefix)
      def deleteRecursive(dir: String): Unit = LocalStorage.deleteRecursive(dir)
      def mkdirs(dir: String): Unit = LocalStorage.mkdirs(dir)
      def listDataFiles(d: String): Seq[String] = LocalStorage.listDataFiles(d)
      def listFiles(dir: String): Seq[String] = {
        val out = LocalStorage.listFiles(dir)
        // the racing CREATE lands at the exact check-then-act instant:
        // clears the tombstone and claims the name with live props
        if (dir == t)
          GraftCatalog.writeTableProps(LocalStorage, t, Map("buckets" -> "8"))
        out
      }
    }
    PointerCommit.finalizeTombstone(spy, t, "dddddddd")
    assert(GraftCatalog.readTableProps(LocalStorage, t) == Map("buckets" -> "8"),
      "the reclaiming CREATE's _table must survive the finalize")
    assert(LocalStorage.exists(t), "the reclaimed dir must survive too")
  }
}
