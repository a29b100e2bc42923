package graft.sources.sstable.spark

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-8 SQL lifecycle additions: TRUNCATE TABLE, ALTER TABLE
  * SET/UNSET TBLPROPERTIES, and atomic CTAS / REPLACE TABLE … AS SELECT
  * through [[GraftCatalog]]'s StagingTableCatalog. The atomicity claims
  * are tested from the OUTSIDE: a failed CTAS leaves neither a table nor
  * staging garbage; a REPLACE either fully lands or leaves the original.
  */
class GraftLifecycleSpec extends AnyFunSuite {

  private lazy val warehouse: String = {
    val d = Files.createTempDirectory("graft-lifecycle").toFile
    d.deleteOnExit()
    d.getPath
  }

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.graft_lc", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_lc.warehouse", warehouse)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_lc.lc")
    s
  }

  private def insertRows(table: String, rows: Seq[(String, String, Long)]): Unit = {
    val values = rows.map { case (k, v, ts) =>
      s"(CAST('$k' AS BINARY), array(named_struct(" +
        s"'name', CAST('c' AS BINARY), 'state', 'NORMAL', " +
        s"'value', CAST('$v' AS BINARY), 'timestamp', CAST($ts AS BIGINT), " +
        s"'ttlSecs', CAST(0 AS BIGINT), 'expiresMillis', CAST(0 AS BIGINT))), " +
        "CAST(NULL AS STRUCT<localDeletionTime: INT, markedForDeleteAt: BIGINT>))"
    }.mkString(", ")
    spark.sql(s"INSERT INTO $table VALUES $values")
  }

  private def keysOf(table: String): Seq[String] =
    spark.sql(s"SELECT key FROM $table")
      .select(col("key").cast("string")).collect().map(_.getString(0)).toSeq.sorted

  /** Visible + hidden entries of a namespace directory, for staging- and
    * trash-garbage assertions. */
  private def dirEntries(ns: String): Seq[String] =
    Option(new java.io.File(s"$warehouse/$ns").list()).fold(Seq.empty[String])(_.toSeq)

  private def dataFiles(ns: String, t: String): Seq[String] =
    Option(new java.io.File(s"$warehouse/$ns/$t").list())
      .fold(Seq.empty[String])(_.toSeq).filter(_.endsWith("-Data.db"))

  test("TRUNCATE TABLE empties the table but keeps it (and its properties)") {
    spark.sql("CREATE TABLE graft_lc.lc.tr TBLPROPERTIES ('compress'='false')")
    insertRows("graft_lc.lc.tr", Seq(("a", "1", 10L), ("b", "2", 20L)))
    assert(keysOf("graft_lc.lc.tr") == Seq("a", "b"))
    spark.sql("TRUNCATE TABLE graft_lc.lc.tr")
    assert(spark.sql("SELECT * FROM graft_lc.lc.tr").count() == 0)
    // still a table, properties intact, writable again
    val props = spark.sql("SHOW TBLPROPERTIES graft_lc.lc.tr").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("compress").contains("false"))
    insertRows("graft_lc.lc.tr", Seq(("c", "3", 30L)))
    assert(keysOf("graft_lc.lc.tr") == Seq("c"))
  }

  test("TRUNCATE on a bucketed table preserves the declared layout") {
    spark.sql("CREATE TABLE graft_lc.lc.trb TBLPROPERTIES ('buckets'='4')")
    insertRows("graft_lc.lc.trb", Seq(("a", "1", 10L), ("b", "2", 20L)))
    spark.sql("TRUNCATE TABLE graft_lc.lc.trb")
    assert(dataFiles("lc", "trb").isEmpty)
    insertRows("graft_lc.lc.trb", Seq(("z", "9", 90L)))
    // refills still hash-route under bucket stems
    assert(dataFiles("lc", "trb").forall(_.startsWith("bucket-")))
    assert(keysOf("graft_lc.lc.trb") == Seq("z"))
  }

  test("ALTER TABLE SET/UNSET TBLPROPERTIES round-trips tuning knobs") {
    spark.sql("CREATE TABLE graft_lc.lc.al")
    spark.sql("ALTER TABLE graft_lc.lc.al SET TBLPROPERTIES ('compress'='false', 'summaryinterval'='64')")
    var props = spark.sql("SHOW TBLPROPERTIES graft_lc.lc.al").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("compress").contains("false") &&
      props.get("summaryinterval").contains("64"))
    spark.sql("ALTER TABLE graft_lc.lc.al UNSET TBLPROPERTIES ('compress')")
    props = spark.sql("SHOW TBLPROPERTIES graft_lc.lc.al").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(!props.contains("compress") && props.get("summaryinterval").contains("64"))
    // unknown properties are refused, not persisted
    val e = intercept[Exception](
      spark.sql("ALTER TABLE graft_lc.lc.al SET TBLPROPERTIES ('nope'='1')"))
    assert(e.getMessage.contains("unsupported table property"))
    // schema changes are refused — the format owns the schema
    intercept[Exception](
      spark.sql("ALTER TABLE graft_lc.lc.al ADD COLUMN extra INT"))
  }

  test("ALTER can set 'buckets' only while the table is empty") {
    spark.sql("CREATE TABLE graft_lc.lc.alb")
    spark.sql("ALTER TABLE graft_lc.lc.alb SET TBLPROPERTIES ('buckets'='2')")
    insertRows("graft_lc.lc.alb", Seq(("a", "1", 10L)))
    assert(dataFiles("lc", "alb").forall(_.startsWith("bucket-")))
    val e = intercept[Exception](
      spark.sql("ALTER TABLE graft_lc.lc.alb SET TBLPROPERTIES ('buckets'='8')"))
    assert(e.getMessage.contains("EMPTY table"))
    // and the refused change did not persist
    val props = spark.sql("SHOW TBLPROPERTIES graft_lc.lc.alb").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("buckets").contains("2"))
  }

  test("CTAS copies a table atomically, leaving no staging garbage") {
    spark.sql("CREATE TABLE graft_lc.lc.src")
    insertRows("graft_lc.lc.src", Seq(("a", "1", 10L), ("b", "2", 20L), ("c", "3", 30L)))
    spark.sql("CREATE TABLE graft_lc.lc.ct AS SELECT * FROM graft_lc.lc.src WHERE key <> CAST('b' AS BINARY)")
    assert(keysOf("graft_lc.lc.ct") == Seq("a", "c"))
    assert(!dirEntries("lc").exists(n => n.startsWith("_stage-") || n.startsWith("_dropped-")))
    // CTAS at an existing name fails and leaves the target untouched
    intercept[Exception](
      spark.sql("CREATE TABLE graft_lc.lc.ct AS SELECT * FROM graft_lc.lc.src"))
    assert(keysOf("graft_lc.lc.ct") == Seq("a", "c"))
  }

  test("CTAS into a declared bucketed layout hash-routes the query output") {
    spark.sql("CREATE TABLE graft_lc.lc.ctb TBLPROPERTIES ('buckets'='4') " +
      "AS SELECT * FROM graft_lc.lc.src")
    assert(keysOf("graft_lc.lc.ctb") == Seq("a", "b", "c"))
    val files = dataFiles("lc", "ctb")
    assert(files.nonEmpty && files.forall(_.startsWith("bucket-")))
    val props = spark.sql("SHOW TBLPROPERTIES graft_lc.lc.ctb").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("buckets").contains("4"))
  }

  test("a failing CTAS creates nothing: no table, no stage") {
    intercept[Exception](spark.sql(
      "CREATE TABLE graft_lc.lc.boom AS SELECT " +
        "CAST(raise_error('mid-query failure') AS BINARY) AS key, " +
        "columns, rowTombstone FROM graft_lc.lc.src"))
    assert(!spark.catalog.tableExists("graft_lc.lc.boom"))
    assert(!dirEntries("lc").exists(_.startsWith("_stage-")))
  }

  test("REPLACE TABLE AS SELECT swaps contents atomically; original survives a failed replace") {
    spark.sql("CREATE TABLE graft_lc.lc.rp AS SELECT * FROM graft_lc.lc.src")
    spark.sql("REPLACE TABLE graft_lc.lc.rp AS SELECT * FROM graft_lc.lc.src " +
      "WHERE key = CAST('a' AS BINARY)")
    assert(keysOf("graft_lc.lc.rp") == Seq("a"))
    // a failing replacing query must leave the ORIGINAL contents
    intercept[Exception](spark.sql(
      "REPLACE TABLE graft_lc.lc.rp AS SELECT " +
        "CAST(raise_error('replace fails') AS BINARY) AS key, " +
        "columns, rowTombstone FROM graft_lc.lc.src"))
    assert(keysOf("graft_lc.lc.rp") == Seq("a"))
    assert(!dirEntries("lc").exists(n => n.startsWith("_stage-") || n.startsWith("_dropped-")))
    // the failed replace's restore must not leave the trash stamp on
    // the live table (the stamp exists so a CRASHED replace's trash —
    // the only copy of the pre-replace table — survives the sweep)
    assert(Option(new java.io.File(s"$warehouse/lc/rp").list()).get
      .forall(_ != GraftCatalog.StageHeartbeatFile))
    // REPLACE of a missing table is loud; CREATE OR REPLACE is not
    intercept[Exception](
      spark.sql("REPLACE TABLE graft_lc.lc.missing AS SELECT * FROM graft_lc.lc.src"))
    spark.sql("CREATE OR REPLACE TABLE graft_lc.lc.cor AS SELECT * FROM graft_lc.lc.src")
    assert(keysOf("graft_lc.lc.cor") == Seq("a", "b", "c"))
    spark.sql("CREATE OR REPLACE TABLE graft_lc.lc.cor AS SELECT * FROM graft_lc.lc.rp")
    assert(keysOf("graft_lc.lc.cor") == Seq("a"))
  }

  test("self-referential REPLACE re-layouts a NON-empty table (the 'change buckets' path)") {
    // ALTER 'buckets' refuses on a non-empty table (the layout is
    // physical) and its message points here: CREATE OR REPLACE reading
    // the table it replaces. The stage materializes the SELECT against
    // the OLD table before the commit swap, so self-reference is safe.
    spark.sql("CREATE TABLE graft_lc.lc.rl TBLPROPERTIES('buckets'='2')")
    insertRows("graft_lc.lc.rl", Seq(("a", "1", 10L), ("b", "2", 20L), ("c", "3", 30L)))
    intercept[Exception](spark.sql(
      "ALTER TABLE graft_lc.lc.rl SET TBLPROPERTIES('buckets'='4')"))
    spark.sql("""CREATE OR REPLACE TABLE graft_lc.lc.rl
      TBLPROPERTIES('buckets'='4') AS SELECT * FROM graft_lc.lc.rl""")
    assert(keysOf("graft_lc.lc.rl") == Seq("a", "b", "c"))
    assert(spark.sql("SHOW CREATE TABLE graft_lc.lc.rl").head().getString(0)
      .contains("'buckets' = '4'"))
    // the rewritten data really is hash-routed under the NEW layout
    val stems = dataFiles("lc", "rl")
    assert(stems.nonEmpty && stems.forall(_.startsWith("bucket-")), stems.toString)
    // and the new layout's maintenance works
    insertRows("graft_lc.lc.rl", Seq(("a", "9", 90L)))
    assert(spark.sql(
        "CALL graft_lc.system.compact_bucketed(table => 'lc.rl')")
      .head().getInt(0) >= 1)
    assert(keysOf("graft_lc.lc.rl") == Seq("a", "b", "c"))
    spark.sql("DROP TABLE graft_lc.lc.rl")
  }

  test("a new CTAS sweeps dead stage/trash garbage past the horizon, keeps fresh ones") {
    val ns = new java.io.File(s"$warehouse/lc")
    val dead = new java.io.File(ns, "_stage-zombie-deadbeef")
    val freshStage = new java.io.File(ns, "_stage-young-cafebabe")
    val deadTrash = new java.io.File(ns, "_dropped-old-deadbeef")
    Seq(dead, freshStage, deadTrash).foreach(_.mkdirs())
    val past = System.currentTimeMillis() - GraftCatalog.StageVacuumHorizonMs - 60000
    assert(dead.setLastModified(past) && deadTrash.setLastModified(past))
    spark.sql("CREATE OR REPLACE TABLE graft_lc.lc.sweep AS SELECT * FROM graft_lc.lc.src")
    assert(!dead.exists() && !deadTrash.exists(), "past-horizon garbage swept")
    assert(freshStage.exists(), "a possibly-live stage is untouched")
    freshStage.delete()
  }

  test("CTAS/REPLACE cannot bury a namespace") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_lc.lcsub")
    val e = intercept[Exception](spark.sql(
      "CREATE OR REPLACE TABLE graft_lc.lcsub AS SELECT * FROM graft_lc.lc.src"))
    assert(e.getMessage.contains("namespace"))
    assert(spark.sql("SHOW NAMESPACES IN graft_lc").collect()
      .map(_.getString(0)).contains("lcsub"))
  }

  test("DROP TABLE is a recoverable trash swap: undrop_table restores " +
    "data, layout and history until the sweep horizon") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_lc.dr")
    spark.sql("CREATE TABLE graft_lc.dr.t TBLPROPERTIES ('buckets'='2')")
    insertRows("graft_lc.dr.t", Seq(("a", "1", 10L), ("b", "2", 20L)))
    spark.sql("DROP TABLE graft_lc.dr.t")
    assert(!spark.catalog.tableExists("graft_lc.dr.t"))
    // the directory was RENAMED, not deleted: one trash entry, data inside
    val trash = dirEntries("dr").filter(_.startsWith("_dropped-t-"))
    assert(trash.size == 1, s"expected one trash dir: $trash")
    assert(Option(new java.io.File(s"$warehouse/dr/${trash.head}").list())
      .get.exists(_.endsWith("-Data.db")), "data must ride into the trash")
    // the heartbeat stamp starts the restore window at the DROP, so the
    // next staged DDL's sweep must NOT reclaim a just-dropped table even
    // if the table's own mtime predates the horizon
    val trashDir = new java.io.File(s"$warehouse/dr/${trash.head}")
    trashDir.setLastModified(
      System.currentTimeMillis() - GraftCatalog.StageVacuumHorizonMs - 60000)
    spark.sql("CREATE OR REPLACE TABLE graft_lc.dr.unrelated AS " +
      "SELECT * FROM graft_lc.lc.src")
    assert(trashDir.exists(), "a just-dropped table must survive the sweep")
    // restore: data, bucketed layout and audit trail all come back
    val restored = spark.sql(
      "CALL graft_lc.system.undrop_table(table => 'dr.t')").head()
    assert(restored.getString(0) == trash.head)
    assert(keysOf("graft_lc.dr.t") == Seq("a", "b"))
    assert(dataFiles("dr", "t").forall(_.startsWith("bucket-")))
    val ops = spark.sql("SELECT op FROM graft_lc.dr.t.history")
      .collect().map(_.getString(0)).toSeq
    assert(ops.containsSlice(Seq("drop_table", "undrop_table")),
      s"history must show the drop AND the restore: $ops")
    // restoring over a live name refuses; a second undrop finds no trash
    val e1 = intercept[Exception](
      spark.sql("CALL graft_lc.system.undrop_table(table => 'dr.t')"))
    assert(e1.getMessage.contains("exists"), e1.getMessage)
    spark.sql("DROP TABLE graft_lc.dr.t")
    spark.sql("CALL graft_lc.system.undrop_table(table => 'dr.t')")
    spark.sql("DROP TABLE graft_lc.dr.t PURGE")
    val e2 = intercept[Exception](
      spark.sql("CALL graft_lc.system.undrop_table(table => 'dr.t')"))
    assert(e2.getMessage.contains("no dropped table"), e2.getMessage)
  }

  test("DROP TABLE refuses under a held maintenance lease and under " +
    "live snapshot pins; PURGE is the explicit pin escape") {
    import graft.sources.sstable.{LocalStorage, MaintenanceLease}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_lc.dg")
    spark.sql("CREATE TABLE graft_lc.dg.t")
    insertRows("graft_lc.dg.t", Seq(("a", "1", 10L)))
    // a running maintainer's lease refuses the DROP, naming the holder
    val lease = MaintenanceLease.acquire(
      s"$warehouse/dg/t", LocalStorage, "nightly-compactor")
    val e1 = intercept[Exception](spark.sql("DROP TABLE graft_lc.dg.t"))
    assert(e1.getMessage.contains("nightly-compactor@"), e1.getMessage)
    assert(spark.catalog.tableExists("graft_lc.dg.t"), "refused = untouched")
    lease.release()
    // a snapshot pin refuses the plain DROP…
    graft.operators.SSTableOps.snapshot(s"$warehouse/dg/t", "keepme")
    val e2 = intercept[Exception](spark.sql("DROP TABLE graft_lc.dg.t"))
    assert(e2.getMessage.contains("keepme") && e2.getMessage.contains("PURGE"),
      e2.getMessage)
    assert(keysOf("graft_lc.dg.t") == Seq("a"))
    // …and PURGE destroys table + pins permanently: no trash entry
    spark.sql("DROP TABLE graft_lc.dg.t PURGE")
    assert(!spark.catalog.tableExists("graft_lc.dg.t"))
    assert(!dirEntries("dg").exists(_.startsWith("_dropped-t-")),
      "PURGE must not leave a trash window")
    // exact-name trash matching: dropping 'other-t' never lets plain
    // 't' claim its trash (prefix-only matching would)
    spark.sql("CREATE TABLE graft_lc.dg.`t-v2`")
    insertRows("graft_lc.dg.`t-v2`", Seq(("z", "9", 90L)))
    spark.sql("DROP TABLE graft_lc.dg.`t-v2`")
    val e3 = intercept[Exception](
      spark.sql("CALL graft_lc.system.undrop_table(table => 'dg.t')"))
    assert(e3.getMessage.contains("no dropped table"), e3.getMessage)
    spark.sql("CALL graft_lc.system.undrop_table(table => 'dg.t-v2')")
    assert(keysOf("graft_lc.dg.`t-v2`") == Seq("z"))
    spark.sql("DROP TABLE graft_lc.dg.`t-v2` PURGE")
  }

  test("opt-in autosnapshot: TRUNCATE and unconditional DELETE pin the " +
    "live state first, so CALL rollback undoes the wipe") {
    import graft.operators.SSTableOps
    spark.sql("CREATE TABLE graft_lc.lc.asn TBLPROPERTIES ('autosnapshot'='true')")
    val dir = s"$warehouse/lc/asn"
    insertRows("graft_lc.lc.asn", Seq(("a", "1", 10L), ("b", "2", 20L)))
    spark.sql("TRUNCATE TABLE graft_lc.lc.asn")
    assert(spark.sql("SELECT * FROM graft_lc.lc.asn").count() == 0)
    val pins = SSTableOps.listSnapshots(dir)
    assert(pins.size == 1 && pins.head.startsWith("auto-"),
      s"TRUNCATE must pin first: $pins")
    spark.sql(s"CALL graft_lc.system.rollback(table => 'lc.asn', tag => '${pins.head}')")
    assert(keysOf("graft_lc.lc.asn") == Seq("a", "b"),
      "the typo'd TRUNCATE must be one rollback away from undone")
    // the unconditional DELETE is the same wipe and gets the same net
    spark.sql("DELETE FROM graft_lc.lc.asn")
    assert(spark.sql("SELECT * FROM graft_lc.lc.asn").count() == 0)
    assert(SSTableOps.listSnapshots(dir).size == 2)
    // a truncate of an ALREADY-EMPTY table pins nothing (no state to keep)
    spark.sql("TRUNCATE TABLE graft_lc.lc.asn")
    assert(SSTableOps.listSnapshots(dir).size == 2)
    // retention is the exit, SCOPED: tag_prefix 'auto-' retires only
    // the wipe-undo pins — a user pin's declared long-lived intent
    // survives the autosnapshot maintenance loop
    SSTableOps.snapshot(dir, "user-keepme")
    spark.sql("CALL graft_lc.system.expire_snapshots(table => 'lc.asn', " +
      "older_than_ms => -1, tag_prefix => 'auto-')")
    assert(SSTableOps.listSnapshots(dir) == Seq("user-keepme"),
      "scoped retention must never touch user pins")
    spark.sql("CALL graft_lc.system.expire_snapshots(table => 'lc.asn', " +
      "older_than_ms => -1)")
    spark.sql("DROP TABLE graft_lc.lc.asn")
    // default-off: a plain table's TRUNCATE stays pin-free
    spark.sql("CREATE TABLE graft_lc.lc.noasn")
    insertRows("graft_lc.lc.noasn", Seq(("x", "9", 90L)))
    spark.sql("TRUNCATE TABLE graft_lc.lc.noasn")
    assert(SSTableOps.listSnapshots(s"$warehouse/lc/noasn").isEmpty)
    // bad values refuse at CREATE, never at first TRUNCATE
    val e = intercept[Exception](spark.sql(
      "CREATE TABLE graft_lc.lc.badasn TBLPROPERTIES ('autosnapshot'='maybe')"))
    assert(e.getMessage.contains("true or false"), e.getMessage)
  }

  test("DROP NAMESPACE CASCADE is a recoverable trash swap; an active " +
    "maintainer inside refuses it; the two undrops never cross-restore") {
    import graft.sources.sstable.{LocalStorage, MaintenanceLease}
    spark.sql("CREATE NAMESPACE graft_lc.dn")
    spark.sql("CREATE TABLE graft_lc.dn.a")
    spark.sql("CREATE TABLE graft_lc.dn.b TBLPROPERTIES ('buckets'='2')")
    insertRows("graft_lc.dn.a", Seq(("x", "1", 10L)))
    insertRows("graft_lc.dn.b", Seq(("y", "2", 20L)))
    // a live lease on a CONTAINED table refuses the whole-tree drop
    val lease = MaintenanceLease.acquire(
      s"$warehouse/dn/b", LocalStorage, "tree-compactor")
    val e1 = intercept[Exception](spark.sql("DROP NAMESPACE graft_lc.dn CASCADE"))
    assert(e1.getMessage.contains("tree-compactor@"), e1.getMessage)
    assert(spark.catalog.tableExists("graft_lc.dn.a"), "refused = untouched")
    lease.release()
    // CASCADE: one rename, everything recoverable
    spark.sql("DROP NAMESPACE graft_lc.dn CASCADE")
    assert(!spark.sql("SHOW NAMESPACES IN graft_lc").collect()
      .map(_.getString(0)).contains("dn"))
    val trash = Option(new java.io.File(warehouse).list())
      .get.filter(_.startsWith("_dropped-dn-")).toSeq
    assert(trash.size == 1, s"one namespace trash entry: $trash")
    // a TABLE named like the namespace cannot claim the namespace's
    // trash (marker-filtered)…
    val e2 = intercept[Exception](
      spark.sql("CALL graft_lc.system.undrop_table(table => 'dn')"))
    assert(e2.getMessage.contains("no dropped table"), e2.getMessage)
    // …and undrop_namespace restores the WHOLE tree: tables, data, layout
    spark.sql("CALL graft_lc.system.undrop_namespace(namespace => 'dn')")
    assert(keysOf("graft_lc.dn.a") == Seq("x") && keysOf("graft_lc.dn.b") == Seq("y"))
    assert(dataFiles("dn", "b").forall(_.startsWith("bucket-")))
    // the inverse filter: a dropped TABLE's trash is invisible to
    // undrop_namespace
    spark.sql("DROP TABLE graft_lc.dn.a")
    val e3 = intercept[Exception](
      spark.sql("CALL graft_lc.system.undrop_namespace(namespace => 'dn.a')"))
    assert(e3.getMessage.contains("no dropped namespace"), e3.getMessage)
    spark.sql("CALL graft_lc.system.undrop_table(table => 'dn.a')")
    assert(keysOf("graft_lc.dn.a") == Seq("x"))
    // DROP NAMESPACE aimed at a data-holding TABLE refuses (symmetric
    // to DROP TABLE refusing namespaces)
    val e4 = intercept[Exception](spark.sql("DROP NAMESPACE graft_lc.dn.a CASCADE"))
    assert(e4.getMessage.contains("is a table"), e4.getMessage)
    assert(keysOf("graft_lc.dn.a") == Seq("x"))
    spark.sql("DROP NAMESPACE graft_lc.dn CASCADE")
  }

  test("namespace-grain audit: create/drop/undrop read back in the " +
    "parent's history; expire_history(namespace) retires it") {
    spark.sql("CREATE NAMESPACE graft_lc.aud")
    spark.sql("CREATE NAMESPACE graft_lc.aud.child")
    spark.sql("CREATE TABLE graft_lc.aud.child.t")
    insertRows("graft_lc.aud.child.t", Seq(("k", "v", 1L)))
    spark.sql("DROP NAMESPACE graft_lc.aud.child CASCADE")
    spark.sql("CALL graft_lc.system.undrop_namespace(namespace => 'aud.child')")
    // the PARENT namespace's log has the round-trip, in order — and it
    // survives even after the child is gone for good
    val ops = spark.sql(
      "SELECT op, detail FROM graft_lc.aud.history ORDER BY id")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(ops.map(_._1).toSeq == Seq(
      "create_namespace", "drop_namespace", "undrop_namespace"),
      ops.mkString(","))
    assert(ops.forall(_._2.startsWith("aud.child")), ops.mkString(","))
    // root-level log: the top-level namespace's own creation is there
    val rootOps = spark.sql(
      "SELECT op, detail FROM graft_lc.history ORDER BY id")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rootOps.exists(r => r._1 == "create_namespace" && r._2 == "aud"),
      rootOps.mkString(","))
    // a REAL table named history shadows the metadata name (documented)
    spark.sql("CREATE TABLE graft_lc.aud.history")
    insertRows("graft_lc.aud.history", Seq(("h", "1", 1L)))
    assert(keysOf("graft_lc.aud.history") == Seq("h"))
    spark.sql("DROP TABLE graft_lc.aud.history")
    // retention covers the namespace grain too
    val exp = spark.sql("CALL graft_lc.system.expire_history(" +
      "namespace => 'aud', older_than_ms => -1)").head()
    assert(exp.getInt(0) >= 3 && exp.getInt(1) == 0, exp.toString)
    assert(spark.sql("SELECT * FROM graft_lc.aud.history").count() == 0)
    intercept[Exception](spark.sql("CALL graft_lc.system.expire_history(" +
      "table => 'aud.child.t', namespace => 'aud', older_than_ms => -1)"))
    spark.sql("DROP NAMESPACE graft_lc.aud CASCADE")
  }

  test("CALL vacuum_trash reclaims aged trash explicitly; fresh trash " +
    "and live stages survive any caller horizon") {
    spark.sql("CREATE NAMESPACE graft_lc.vt")
    spark.sql("CREATE TABLE graft_lc.vt.t")
    insertRows("graft_lc.vt.t", Seq(("a", "1", 10L)))
    spark.sql("DROP TABLE graft_lc.vt.t")
    val nsDir = new java.io.File(s"$warehouse/vt")
    def entries(prefix: String): Seq[java.io.File] =
      Option(nsDir.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith(prefix)).toSeq
    assert(entries("_dropped-").size == 1)
    // default horizon: fresh trash is KEPT (the undrop window stands)
    assert(spark.sql("CALL graft_lc.system.vacuum_trash(namespace => 'vt')")
      .count() == 0)
    assert(entries("_dropped-").size == 1, "fresh trash must survive")
    // a live long-running stage: stale dir mtime, FRESH heartbeat —
    // survives even an aggressive caller horizon (fixed liveness floor)
    val liveStage = new java.io.File(nsDir, "_stage-x-aaaa1111")
    liveStage.mkdirs()
    new java.io.File(liveStage, GraftCatalog.StageHeartbeatFile).createNewFile()
    liveStage.setLastModified(System.currentTimeMillis() - 2L * 3600 * 1000)
    // a crashed stage: 48 h past any beat
    val deadStage = new java.io.File(nsDir, "_stage-y-bbbb2222")
    deadStage.mkdirs()
    deadStage.setLastModified(System.currentTimeMillis() - 48L * 3600 * 1000)
    // age the trash (dir + drop stamp) past a 1-minute horizon
    val trash = entries("_dropped-").head
    val aged = System.currentTimeMillis() - 10L * 60 * 1000
    trash.setLastModified(aged)
    new java.io.File(trash, GraftCatalog.StageHeartbeatFile).setLastModified(aged)
    val removed = spark.sql("CALL graft_lc.system.vacuum_trash(" +
        "namespace => 'vt', older_than_ms => 60000)")
      .collect().map(_.getString(0)).toSeq
    assert(removed.exists(_.startsWith("_dropped-t-")),
      s"aged trash must be reclaimed: $removed")
    assert(removed.contains("_stage-y-bbbb2222"),
      s"crashed staging goes with it: $removed")
    assert(entries("_dropped-").isEmpty && entries("_stage-") == Seq(liveStage),
      "the live stage must survive the short horizon (24h floor + heartbeat)")
    // the undrop window is forfeited — and says so
    val e = intercept[Exception](
      spark.sql("CALL graft_lc.system.undrop_table(table => 'vt.t')"))
    assert(e.getMessage.contains("no dropped table"), e.getMessage)
    assert(spark.sql("CALL graft_lc.system.list_trash(namespace => 'vt')")
      .count() == 0)
    liveStage.listFiles().foreach(_.delete()); liveStage.delete()
    spark.sql("DROP NAMESPACE graft_lc.vt CASCADE")
  }

  test("CALL list_trash shows what undrop can restore, with kind and age") {
    spark.sql("CREATE NAMESPACE graft_lc.lt")
    spark.sql("CREATE NAMESPACE graft_lc.lt.sub")
    spark.sql("CREATE TABLE graft_lc.lt.t")
    insertRows("graft_lc.lt.t", Seq(("a", "1", 10L)))
    spark.sql("DROP TABLE graft_lc.lt.t")
    spark.sql("DROP NAMESPACE graft_lc.lt.sub")
    val rows = spark.sql("CALL graft_lc.system.list_trash(namespace => 'lt')")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(t => (t._1, t._2)).toSet == Set("t" -> "table",
      "sub" -> "namespace"), rows.mkString(","))
    assert(rows.forall(t => t._3 >= 0 && t._3 < 60000),
      s"drop age must be fresh: ${rows.mkString(",")}")
    // sweepableInMs: the undrop window remaining under the default
    // horizon — fresh trash has nearly the whole 24 h left
    assert(rows.forall(t => t._4 > 23L * 3600 * 1000 &&
      t._4 <= 24L * 3600 * 1000), s"sweepableInMs: ${rows.mkString(",")}")
    // restore both; the trash listing then reads empty
    spark.sql("CALL graft_lc.system.undrop_table(table => 'lt.t')")
    spark.sql("CALL graft_lc.system.undrop_namespace(namespace => 'lt.sub')")
    assert(spark.sql("CALL graft_lc.system.list_trash(namespace => 'lt')")
      .count() == 0)
    assert(keysOf("graft_lc.lt.t") == Seq("a"))
    // unknown namespace refuses loudly; root ('') resolves
    intercept[Exception](spark.sql(
      "CALL graft_lc.system.list_trash(namespace => 'nope')"))
    spark.sql("CALL graft_lc.system.list_trash()").collect()
    spark.sql("DROP NAMESPACE graft_lc.lt CASCADE")
  }

  test("a write commit into a directory replaced mid-publish fails loudly") {
    // writers are lease-free, so a REPLACE/rebucket swap landing while
    // a commit publishes would silently trash the committed data with
    // the old directory — CommitIntegrity turns that into a loud
    // failure (the marker rides the old directory into the trash)
    import graft.sources.sstable.LocalStorage
    val dir = java.nio.file.Files.createTempDirectory("commit-integrity").toString
    val marker = CommitIntegrity.begin(LocalStorage, dir, "job1")
    // the swap: old directory (marker included) replaced wholesale
    LocalStorage.deleteRecursive(dir)
    LocalStorage.mkdirs(dir)
    val e = intercept[IllegalStateException] {
      CommitIntegrity.verifyAndEnd(LocalStorage, dir, marker)
    }
    assert(e.getMessage.contains("REPLACED"), e.getMessage)
    // the normal path is invisible: marker created, verified, removed
    val m2 = CommitIntegrity.begin(LocalStorage, dir, "job2")
    CommitIntegrity.verifyAndEnd(LocalStorage, dir, m2)
    assert(LocalStorage.listFiles(dir).isEmpty,
      "a clean commit must leave no integrity marker behind")
    // and a real INSERT through the catalog leaves none either
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_lc.ci")
    spark.sql("CREATE TABLE graft_lc.ci.t")
    insertRows("graft_lc.ci.t", Seq(("a", "1", 1L)))
    assert(LocalStorage.listFiles(s"$warehouse/ci/t")
      .map(p => p.substring(p.lastIndexOf('/') + 1))
      .forall(!_.startsWith("_commit-")))
    spark.sql("DROP TABLE graft_lc.ci.t")
  }

  test("CREATE over fresh mid-restore residue refuses with a SELF-" +
    "EXPLANATORY error — state, age, when it clears, the escape hatch " +
    "(VERDICT r12 Next #4); IF NOT EXISTS is loud too (residue is not " +
    "a table — a silent no-op would fake existence)") {
    import graft.sources.sstable.LocalStorage
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_lc.rr")
    // a crashed CTAS / live undrop shape: fresh restoring pointer
    val d = s"$warehouse/rr/t"
    assert(PointerCommit.createState(LocalStorage, d, Map.empty,
      TableState.Restoring("_dropped-t-11111111", "11111111")))
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    for (sql <- Seq("CREATE TABLE graft_lc.rr.t",
        "CREATE TABLE IF NOT EXISTS graft_lc.rr.t",
        "CREATE TABLE graft_lc.rr.t AS SELECT CAST('k' AS BINARY) key, " +
          "array(named_struct('name', CAST('c' AS BINARY), 'state', 'NORMAL', " +
          "'value', CAST('v' AS BINARY), 'timestamp', CAST(1 AS BIGINT), " +
          "'ttlSecs', CAST(0 AS BIGINT), 'expiresMillis', CAST(0 AS BIGINT))) " +
          "columns, CAST(NULL AS STRUCT<localDeletionTime: INT, " +
          "markedForDeleteAt: BIGINT>) rowTombstone")) {
      val e = intercept[Exception](spark.sql(sql))
      val msgs = chain(e)
      assert(msgs.exists(m => m.contains("mid-restore residue") &&
        m.contains("restoring from") && m.contains("liveness stamp") &&
        m.contains("min from now") && m.contains("vacuum_trash")),
        s"$sql refusal not self-explanatory: $msgs")
    }
    // once the stamp goes stale the name reclaims normally
    new java.io.File(s"$d/${GraftCatalog.TablePropsFile}")
      .setLastModified(System.currentTimeMillis() -
        GraftCatalog.StageVacuumHorizonMs - 60000)
    spark.sql("CREATE TABLE graft_lc.rr.t")
    assert(keysOf("graft_lc.rr.t").isEmpty)
    spark.sql("DROP TABLE graft_lc.rr.t PURGE")
  }

  test("SHOW TABLES may transiently list crash residue (DECIDED, " +
    "VERDICT r12 Next #5: the listing stays one LIST — filtering costs " +
    "a props read per name); the residue name is inert and clears with " +
    "the next claim") {
    import graft.sources.sstable.LocalStorage
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_lc.st")
    val d = s"$warehouse/st/ghost"
    assert(PointerCommit.createState(LocalStorage, d, Map.empty,
      TableState.Dropped(None, "22222222")))
    val listed = spark.sql("SHOW TABLES IN graft_lc.st")
      .collect().map(_.getString(1)).toSeq
    assert(listed.contains("ghost"),
      "the documented transient: residue lists until the next claim")
    // …but the name is INERT: reads refuse, it is not a table
    val e = intercept[Exception](spark.sql("SELECT * FROM graft_lc.st.ghost"))
    assert(e.getMessage != null)
    // the next CREATE reclaims (Dropped residue is terminal → clearable)
    spark.sql("CREATE TABLE graft_lc.st.ghost")
    assert(keysOf("graft_lc.st.ghost").isEmpty)
    spark.sql("DROP TABLE graft_lc.st.ghost PURGE")
    // after a completed PURGE + finalize the name is gone from listings
    assert(!spark.sql("SHOW TABLES IN graft_lc.st")
      .collect().map(_.getString(1)).contains("ghost"))
  }
}
