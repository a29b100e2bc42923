package graft.sources.sstable.spark

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.sstable.{LocalStorage, SSTableFiles}

/** SQL-native bucketed tables: `CREATE TABLE … TBLPROPERTIES
  * ('buckets'='n')` persists the layout, `INSERT INTO` keeps it through
  * a [[GraftBucketFunction]]-clustered write (the catalog's V2 `bucket`
  * transform resolved via `FunctionCatalog`), `DELETE` appends
  * per-bucket tombstone generations, and `CALL compact_bucketed` is the
  * layout-preserving maintenance — the full bucketed lifecycle in pure
  * SQL, interoperable with path-API bucketed reads. */
class GraftBucketedTableSpec extends AnyFunSuite {

  private lazy val warehouse: String = {
    val d = Files.createTempDirectory("graft-bucketed-wh").toFile
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
    // own catalog name: CatalogManager caches instances by name, so
    // sharing "graft" with GraftCatalogSpec would pin whichever suite's
    // warehouse loads first
    s.conf.set("spark.sql.catalog.graft_bkt", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_bkt.warehouse", warehouse)
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

  private def keysOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(col("key").cast("string")).collect().map(_.getString(0)).toSeq.sorted

  private def stems(dir: String): Seq[String] =
    LocalStorage.listDataFiles(dir).map(SSTableFiles.generationStem)

  test("bucket function == the writeBucketed routing expression, bit for bit") {
    val keys = (0 until 500).map(i => s"key-$i-${"x" * (i % 7)}")
    import spark.implicits._
    for (n <- Seq(1, 4, 32)) {
      val viaSql = keys.toDF("s").select(
        pmod(xxhash64(col("s").cast("binary")), lit(n.toLong)).cast("int"))
        .collect().map(_.getInt(0)).toSeq
      val viaFn = keys.map(k => GraftBucketFunction.bucketOf(n, k.getBytes("UTF-8")))
      assert(viaSql == viaFn, s"bucketOf diverges from pmod(xxhash64) at n=$n")
    }
  }

  test("INSERT INTO keeps the bucket layout: <= n bucket-stemmed generations") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_bkt.bk")
    spark.sql("CREATE TABLE graft_bkt.bk.t TBLPROPERTIES ('buckets'='4')")
    val dir = s"$warehouse/bk/t"
    val rows = (0 until 40).map(i => (f"k$i%03d", s"v$i", 100L + i))
    insertRows("graft_bkt.bk.t", rows)

    // every generation carries the bucket stem; one INSERT appends at
    // most `buckets` generations no matter how many tasks ran
    val gens = stems(dir)
    assert(gens.nonEmpty && gens.size <= 4, s"expected <=4 generations, got $gens")
    assert(gens.forall(SSTableSource.BucketNameRe.matches),
      s"non-bucket stems after INSERT: $gens")

    // SQL reads round-trip with the PLAIN schema (no _bucket column)
    assert(keysOf(spark.sql("SELECT * FROM graft_bkt.bk.t")) == rows.map(_._1).sorted)
    assert(!spark.table("graft_bkt.bk.t").columns.contains("_bucket"))

    // path-API bucketed read validates the layout and agrees on routing:
    // _bucket == bucketOf(key) for every row (SQL write ≡ writeBucketed)
    val bucketed = spark.read.format("sstable")
      .option("buckets", "4").load(dir)
      .select(col("_bucket"), col("key")).collect()
    assert(bucketed.length == 40)
    bucketed.foreach { r =>
      assert(r.getInt(0) ==
        GraftBucketFunction.bucketOf(4, r.getAs[Array[Byte]](1)),
        "stored bucket id diverges from the bucket function")
    }
  }

  test("LWW upsert across INSERTs; CALL compact_bucketed folds chains, keeps stems") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_bkt.bk2")
    spark.sql("CREATE TABLE graft_bkt.bk2.t TBLPROPERTIES ('buckets'='3')")
    val dir = s"$warehouse/bk2/t"
    insertRows("graft_bkt.bk2.t", Seq(("a", "old", 100L), ("b", "1", 100L), ("c", "1", 100L)))
    insertRows("graft_bkt.bk2.t", Seq(("a", "new", 200L), ("d", "2", 200L)))
    def valueOf(k: String): String = spark.sql(
      s"SELECT CAST(columns[0].value AS STRING) FROM graft_bkt.bk2.t " +
        s"WHERE key = CAST('$k' AS BINARY)").head().getString(0)
    // raw SQL reads surface row VERSIONS; the merge view is compactRows
    // (zero-exchange on the bucketed path) — assert the merged winner
    val merged = graft.operators.SSTableOps.compactRows(
      spark.read.format("sstable").option("buckets", "3").load(dir))
    val aRow = merged.filter(col("key").cast("string") === "a")
      .select(expr("CAST(columns[0].value AS STRING)")).head().getString(0)
    assert(aRow == "new", "LWW upsert must keep the newest cell")

    val before = stems(dir).size
    val folds = spark.sql("CALL graft_bkt.system.compact_bucketed(table => 'bk2.t')")
      .head().getInt(0)
    assert(folds > 0, "chains of 2 generations must fold")
    val after = stems(dir)
    assert(after.size < before)
    assert(after.forall(SSTableSource.BucketNameRe.matches),
      s"fold must keep bucket stems: $after")
    assert(valueOf("a") == "new")
    assert(keysOf(spark.sql("SELECT * FROM graft_bkt.bk2.t")) == Seq("a", "b", "c", "d"))
  }

  test("SQL diff reads (VERSION AS OF 'a..') compose with the bucketed layout") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_bkt.bkd")
    spark.sql("CREATE TABLE graft_bkt.bkd.t TBLPROPERTIES ('buckets'='3')")
    val dir = s"$warehouse/bkd/t"
    insertRows("graft_bkt.bkd.t", Seq(("a", "1", 100L), ("b", "1", 100L), ("c", "1", 100L)))
    graft.operators.SSTableOps.snapshot(dir, "e1")
    insertRows("graft_bkt.bkd.t", Seq(("b", "2", 200L), ("d", "1", 200L)))
    // the SQL diff (the catalog table keeps its SPJ bucketed identity)
    // = the option-based epoch diff of the same directory, exactly
    val viaSql = keysOf(spark.sql("SELECT * FROM graft_bkt.bkd.t VERSION AS OF 'e1..'"))
    val viaOpt = keysOf(spark.read.format("sstable")
      .option("sincesnapshot", "e1").option("applydeletes", "true").load(dir))
    assert(viaSql == viaOpt && viaSql == Seq("b", "d"), s"$viaSql vs $viaOpt")
    // and the live table still validates + reads as bucketed afterwards
    assert(keysOf(spark.sql("SELECT * FROM graft_bkt.bkd.t")) ==
      Seq("a", "b", "b", "c", "d"))
    spark.sql("DROP TABLE graft_bkt.bkd.t PURGE")
  }

  test("rollback restores a bucketed table with its layout intact") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_bkt.bkr")
    spark.sql("CREATE TABLE graft_bkt.bkr.t TBLPROPERTIES ('buckets'='3')")
    val dir = s"$warehouse/bkr/t"
    insertRows("graft_bkt.bkr.t", Seq(("a", "1", 100L), ("b", "1", 100L), ("c", "1", 100L)))
    graft.operators.SSTableOps.snapshot(dir, "good")
    insertRows("graft_bkt.bkr.t", Seq(("d", "1", 200L)))
    spark.sql("DELETE FROM graft_bkt.bkr.t WHERE key = CAST('a' AS BINARY)")

    spark.sql("CALL graft_bkt.system.rollback(table => 'bkr.t', tag => 'good')")
    assert(keysOf(spark.sql("SELECT * FROM graft_bkt.bkr.t")) == Seq("a", "b", "c"))
    // generation names traveled verbatim: every stem still bucket-formed,
    // so layout validation and the layout's maintenance keep working
    assert(stems(dir).forall(SSTableSource.BucketNameRe.matches), stems(dir).toString)
    insertRows("graft_bkt.bkr.t", Seq(("a", "2", 300L)))
    assert(spark.sql("CALL graft_bkt.system.compact_bucketed(table => 'bkr.t')")
      .head().getInt(0) >= 1)
    assert(keysOf(spark.sql("SELECT * FROM graft_bkt.bkr.t")) == Seq("a", "b", "c"))
    spark.sql("DROP TABLE graft_bkt.bkr.t PURGE")
  }

  test("DELETE appends per-bucket tombstone generations; compaction folds the debt") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_bkt.bk3")
    spark.sql("CREATE TABLE graft_bkt.bk3.t TBLPROPERTIES ('buckets'='4')")
    val dir = s"$warehouse/bk3/t"
    val rows = (0 until 20).map(i => (f"k$i%02d", s"v$i", 100L + i))
    insertRows("graft_bkt.bk3.t", rows)
    val doomed = Seq("k03", "k07", "k11")
    val before = stems(dir).size

    spark.sql("DELETE FROM graft_bkt.bk3.t WHERE key IN (" +
      doomed.map(k => s"CAST('$k' AS BINARY)").mkString(", ") + ")")

    // tombstones keep the layout: every new generation is bucket-stemmed
    // and delete-only, one per AFFECTED bucket
    val after = stems(dir)
    assert(after.forall(SSTableSource.BucketNameRe.matches), s"layout broken: $after")
    val affected = doomed.map(k =>
      GraftBucketFunction.bucketOf(4, k.getBytes("UTF-8"))).distinct.size
    assert(after.size == before + affected,
      s"expected one tombstone generation per affected bucket ($affected), " +
        s"got ${after.size - before}")

    // catalog reads shadow the keys (delete-aware merge-on-read)
    val expected = rows.map(_._1).filterNot(doomed.contains).sorted
    assert(keysOf(spark.sql("SELECT * FROM graft_bkt.bk3.t")) == expected)

    // the bucketed fold GCs the tombstones structurally: chains collapse,
    // stems survive, the deleted keys stay gone, debt is resolved
    val folds = spark.sql("CALL graft_bkt.system.compact_bucketed(table => 'bk3.t')")
      .head().getInt(0)
    assert(folds > 0)
    assert(keysOf(spark.sql("SELECT * FROM graft_bkt.bk3.t")) == expected)
    val folded = stems(dir)
    assert(folded.forall(SSTableSource.BucketNameRe.matches))
    // tombstone rows are GONE from the raw view too (GC'd, not carried)
    val raw = spark.read.format("sstable").load(dir)
    assert(raw.filter(col("rowTombstone").isNotNull).count() == 0,
      "bucketed fold must GC its tombstones (whole-chain fold is isolation proof)")
  }

  test("UPDATE and MERGE preserve the bucket layout (delta write rolls buckets)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_bkt.bk6")
    spark.sql("CREATE TABLE graft_bkt.bk6.t TBLPROPERTIES ('buckets'='4')")
    val dir = s"$warehouse/bk6/t"
    val rows = (0 until 20).map(i => (f"u$i%02d", s"v$i", 100L + i))
    insertRows("graft_bkt.bk6.t", rows)

    // UPDATE by VALUE predicate (not key): the real delta path — scan,
    // delete+re-insert representation, per-bucket tombstones + rolling
    // re-insert generations
    spark.sql("UPDATE graft_bkt.bk6.t SET columns = array(named_struct(" +
      "'name', CAST('c' AS BINARY), 'state', 'NORMAL', " +
      "'value', CAST('bumped' AS BINARY), 'timestamp', CAST(0 AS BIGINT), " +
      "'ttlSecs', CAST(0 AS BIGINT), 'expiresMillis', CAST(0 AS BIGINT))) " +
      "WHERE CAST(columns[0].value AS STRING) IN ('v3', 'v7')")
    assert(stems(dir).forall(SSTableSource.BucketNameRe.matches),
      s"UPDATE broke the layout: ${stems(dir)}")
    def valueOf(k: String): String = spark.sql(
      s"SELECT CAST(columns[0].value AS STRING) FROM graft_bkt.bk6.t " +
        s"WHERE key = CAST('$k' AS BINARY)").head().getString(0)
    assert(valueOf("u03") == "bumped" && valueOf("u07") == "bumped")
    assert(valueOf("u04") == "v4", "untouched rows must keep their cells")

    // two-branch MERGE: matched update + not-matched insert
    spark.sql("CREATE OR REPLACE TEMP VIEW bk6_src AS SELECT " +
      "CAST(k AS BINARY) key, array(named_struct('name', CAST('c' AS BINARY), " +
      "'state', 'NORMAL', 'value', CAST(v AS BINARY), 'timestamp', CAST(0 AS BIGINT), " +
      "'ttlSecs', CAST(0 AS BIGINT), 'expiresMillis', CAST(0 AS BIGINT))) columns " +
      "FROM VALUES ('u04', 'merged'), ('zz1', 'fresh') AS s(k, v)")
    spark.sql("MERGE INTO graft_bkt.bk6.t t USING bk6_src s ON t.key = s.key " +
      "WHEN MATCHED THEN UPDATE SET columns = s.columns " +
      "WHEN NOT MATCHED THEN INSERT (key, columns, rowTombstone) " +
      "VALUES (s.key, s.columns, NULL)")
    assert(stems(dir).forall(SSTableSource.BucketNameRe.matches),
      s"MERGE broke the layout: ${stems(dir)}")
    assert(valueOf("u04") == "merged" && valueOf("zz1") == "fresh")
    assert(spark.sql("SELECT * FROM graft_bkt.bk6.t").count() == 21)

    // maintenance still folds the grown chains and the state survives
    val folds = spark.sql("CALL graft_bkt.system.compact_bucketed(table => 'bk6.t')")
      .head().getInt(0)
    assert(folds > 0)
    assert(valueOf("u03") == "bumped" && valueOf("u04") == "merged" &&
      valueOf("zz1") == "fresh" && valueOf("u05") == "v5")
    assert(spark.sql("SELECT * FROM graft_bkt.bk6.t").count() == 21)
  }

  test("streaming writes keep the bucketed layout: epoch generations under bucket stems") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_bkt.bks")
    spark.sql("CREATE TABLE graft_bkt.bks.t TBLPROPERTIES ('buckets'='4')")
    val dir = s"$warehouse/bks/t"
    val ck = Files.createTempDirectory("bks-ck").toString
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String, Long)]
    val q = source.toDF().toDF("k", "v", "ts")
      .select(col("k").cast("binary").as("key"),
        array(struct(lit("c").cast("binary").as("name"), lit("NORMAL").as("state"),
          col("v").cast("binary").as("value"), col("ts").as("timestamp"),
          lit(0L).as("ttlSecs"), lit(0L).as("expiresMillis"))).as("columns"),
        lit(null).cast("struct<localDeletionTime:int,markedForDeleteAt:bigint>")
          .as("rowTombstone"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", ck).toTable("graft_bkt.bks.t")
    val epoch1 = (0 until 12).map(i => (f"s$i%02d", s"v$i", 100L + i))
    source.addData(epoch1: _*)
    q.processAllAvailable()
    source.addData(("s03", "v3b", 500L), ("s07", "v7b", 500L)) // cross-epoch upsert
    q.processAllAvailable()
    q.stop()
    // every epoch generation keeps the canonical bucket stem, with the
    // epoch id in the name (replay-deterministic), at most 4 per epoch
    val st = stems(dir)
    assert(st.nonEmpty && st.forall(SSTableSource.BucketNameRe.matches),
      s"streaming broke the layout: $st")
    assert(st.forall(_.contains("-epoch-")), s"epoch stems expected: $st")
    assert(st.size <= 8, s"at most buckets-per-epoch generations: $st")
    // batch SQL sees the stream's rows; LWW resolves cross-epoch upserts
    assert(keysOf(spark.sql("SELECT * FROM graft_bkt.bks.t")).distinct.size == 12)
    def valueOf(k: String): String = spark.sql(
      s"SELECT CAST(columns[0].value AS STRING) FROM graft_bkt.bks.t " +
        s"WHERE key = CAST('$k' AS BINARY) ORDER BY columns[0].timestamp DESC " +
        "LIMIT 1").head().getString(0)
    assert(valueOf("s03") == "v3b" && valueOf("s07") == "v7b")
    // layout-preserving maintenance folds the streamed chains
    val folds = spark.sql("CALL graft_bkt.system.compact_bucketed(table => 'bks.t')")
      .head().getInt(0)
    assert(folds > 0)
    assert(stems(dir).forall(SSTableSource.BucketNameRe.matches))
    assert(keysOf(spark.sql("SELECT * FROM graft_bkt.bks.t")).distinct.size == 12)
    assert(valueOf("s03") == "v3b")
  }

  test("autocompact bounds a bucketed stream's chains, epoch by epoch") {
    // VERDICT r8 #2 on the flagship layout: every micro-batch appends
    // one generation per bucket; with TBLPROPERTIES autocompact the
    // committing epoch folds each over-bound chain back before the next
    // batch plans — continuous bucketed ingestion needs no CALL schedule
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_bkt.bac")
    spark.sql("CREATE TABLE graft_bkt.bac.t " +
      "TBLPROPERTIES ('buckets'='4', 'autocompact'='3')")
    val dir = s"$warehouse/bac/t"
    val ck = Files.createTempDirectory("bac-ck").toString
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)]
    val q = source.toDF().toDF("k", "ts")
      .select(col("k").cast("binary").as("key"),
        array(struct(lit("c").cast("binary").as("name"), lit("NORMAL").as("state"),
          concat(lit("v"), col("ts")).cast("binary").as("value"),
          col("ts").as("timestamp"),
          lit(0L).as("ttlSecs"), lit(0L).as("expiresMillis"))).as("columns"),
        lit(null).cast("struct<localDeletionTime:int,markedForDeleteAt:bigint>")
          .as("rowTombstone"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", ck).toTable("graft_bkt.bac.t")
    val epochs = 9
    (1 to epochs).foreach { e =>
      source.addData((0 until 30).map(i => (f"k$i%04d", e.toLong)): _*)
      q.processAllAvailable()
      // the bound holds after EVERY epoch commit, per bucket
      val byBucket = LocalStorage.listDataFiles(dir).groupBy { f =>
        SSTableFiles.generationStem(f) match {
          case SSTableSource.BucketNameRe(b) => b.toInt
          case other => fail(s"non-bucket stem under autocompact: $other")
        }
      }
      assert(byBucket.values.forall(_.length <= 3),
        s"epoch $e: ${byBucket.view.mapValues(_.length).toMap}")
    }
    q.stop()
    // reconciled state: every key at the last epoch's value
    val got = graft.operators.SSTableOps.compactRows(spark.table("graft_bkt.bac.t"))
      .selectExpr("cast(key as string) k", "cast(columns[0].value as string) v")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == (0 until 30).map(i => f"k$i%04d" -> s"v$epochs").toMap)
    assert(!LocalStorage.exists(
      s"$dir/${graft.sources.sstable.MaintenanceLease.LeaseFile}"))
  }

  test("refusals: generic compact, path-API writebuckets") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_bkt.bk4")
    spark.sql("CREATE TABLE graft_bkt.bk4.t TBLPROPERTIES ('buckets'='2')")
    insertRows("graft_bkt.bk4.t", Seq(("a", "1", 10L)))

    // generic size-tier compaction refuses, pointing at the bucketed path
    val cp = intercept[Exception](spark.sql(
      "CALL graft_bkt.system.compact(table => 'bk4.t')"))
    assert(cp.getMessage.contains("compact_bucketed"), cp.getMessage)

    // the path API has no FunctionCatalog: writebuckets refused with the
    // pointer, not Spark's unresolved-transform error
    import spark.implicits._
    val pw = intercept[Exception] {
      Seq(("k".getBytes("UTF-8"))).toDF("key")
        .write.format("sstable").option("writebuckets", "2")
        .mode("append").save(s"$warehouse/bk4/pathwrite")
    }
    assert(pw.getMessage.contains("writeBucketed"), pw.getMessage)
  }

  test("SPJ: co-bucketed join and GROUP BY key run exchange-free in pure SQL") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_bkt.spj")
    spark.sql("CREATE TABLE graft_bkt.spj.a TBLPROPERTIES ('buckets'='4')")
    spark.sql("CREATE TABLE graft_bkt.spj.b TBLPROPERTIES ('buckets'='4')")
    val rows = (0 until 30).map(i => (f"k$i%02d", s"v$i", 100L + i))
    insertRows("graft_bkt.spj.a", rows)
    insertRows("graft_bkt.spj.b", rows.take(20))

    // shuffle exchanges only — a BroadcastExchange is the WANTED plan
    // for tiny sides (our reported statistics auto-broadcast them)
    def shuffles(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.toString
        .linesIterator.count(l =>
          l.contains("Exchange") && !l.contains("BroadcastExchange"))

    val join = "SELECT a.key FROM graft_bkt.spj.a a JOIN graft_bkt.spj.b b ON a.key = b.key"
    val agg = "SELECT key, count(*) AS versions FROM graft_bkt.spj.a GROUP BY key"

    // default conf: the report is inert — plans shuffle as usual,
    // results correct, full split parallelism
    assert(spark.sql(join).count() == 20)

    withV2Bucketing {
      val j = spark.sql(join)
      assert(shuffles(j) == 0,
        s"co-bucketed join must be exchange-free:\n${j.queryExecution.executedPlan}")
      assert(keysOf(j) == rows.take(20).map(_._1).sorted)
      val a = spark.sql(agg)
      assert(shuffles(a) == 0,
        s"bucketed GROUP BY key must be exchange-free:\n${a.queryExecution.executedPlan}")
      assert(a.count() == 30)
      // delete-aware composition: shadowed keys stay out, still no shuffle
      spark.sql("DELETE FROM graft_bkt.spj.b WHERE key = CAST('k01' AS BINARY)")
      val j2 = spark.sql(join)
      assert(shuffles(j2) == 0)
      assert(keysOf(j2) == rows.take(20).map(_._1).filterNot(_ == "k01").sorted)
    }
  }

  /** SPJ window: v2 bucketing on, auto-broadcast off (tiny test tables
    * would otherwise — correctly — take a BroadcastHashJoin and never
    * exercise the storage-partitioned path this spec pins). */
  private def withV2Bucketing[A](body: => A): A = {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("labeled change feed composes with bucketed tables and the sincesnapshot floor") {
    // VERDICT r8 #8: the full CDC loop on the flagship layout — a
    // bucketed table streams labeled _change_type events, and the
    // sincesnapshot floor starts the feed at a pin instead of replaying
    // history
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_bkt.cdc")
    spark.sql("CREATE TABLE graft_bkt.cdc.t TBLPROPERTIES ('buckets'='4')")
    val dir = s"$warehouse/cdc/t"
    insertRows("graft_bkt.cdc.t",
      (0 until 8).map(i => (f"old$i%02d", "v1", 10L + i)))
    spark.sql("CALL graft_bkt.system.snapshot(table => 'cdc.t', tag => 'floor')")
    // post-floor changes: an upsert epoch and a delete — all under
    // bucket stems (per-bucket tombstone generations included)
    insertRows("graft_bkt.cdc.t", Seq(("new01", "v2", 100L), ("old03", "v2", 100L)))
    spark.sql("DELETE FROM graft_bkt.cdc.t WHERE key = CAST('old05' AS BINARY)")

    val ck = Files.createTempDirectory("bcdc-ck").toString
    val q = spark.readStream
      .option("sincesnapshot", "floor")
      .table("graft_bkt.cdc.t")
      .select(col("key").cast("string").as("k"), col("_change_type").as("ct"))
      .writeStream.outputMode("append").format("memory").queryName("bcdc_feed")
      .option("checkpointLocation", ck).start()
    q.processAllAvailable()
    // a LIVE post-start epoch arrives too, still labeled, still bucketed
    insertRows("graft_bkt.cdc.t", Seq(("new02", "v3", 200L)))
    q.processAllAvailable()
    q.stop()

    val events = spark.table("bcdc_feed").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(e => (e._1, e._2))
    assert(events.toSeq == Seq(("new01", "upsert"), ("new02", "upsert"),
      ("old03", "upsert"), ("old05", "delete")),
      s"floor must cut history, labels must ride: ${events.mkString(", ")}")
    // the feed's generations were all bucket-stemmed (the delete's
    // tombstone generations included)
    assert(stems(dir).forall(SSTableSource.BucketNameRe.matches), stems(dir).toString)
    spark.sql("CALL graft_bkt.system.drop_snapshot(table => 'cdc.t', tag => 'floor')")
    spark.sql("DROP TABLE graft_bkt.cdc.t")
  }

  test("CALL rebucket: live re-layout, pin guard, SPJ at the new count") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_bkt.rbk")
    spark.sql("CREATE TABLE graft_bkt.rbk.t TBLPROPERTIES ('buckets'='2')")
    val dir = s"$warehouse/rbk/t"
    val rows = (0 until 30).map(i => (f"k$i%02d", s"v$i", 100L + i))
    insertRows("graft_bkt.rbk.t", rows)
    spark.sql("DELETE FROM graft_bkt.rbk.t WHERE key = CAST('k05' AS BINARY)")

    // the centralized pin guard (shared with ALTER): a snapshot pins the
    // OLD layout, so rebucket refuses pointing at the pins
    spark.sql("CALL graft_bkt.system.snapshot(table => 'rbk.t', tag => 'pre')")
    val pinned = intercept[Exception](spark.sql(
      "CALL graft_bkt.system.rebucket(table => 'rbk.t', new_buckets => 4)"))
    assert(pinned.getMessage.contains("snapshots pin"), pinned.getMessage)
    spark.sql("CALL graft_bkt.system.drop_snapshot(table => 'rbk.t', tag => 'pre')")

    val preHistory = spark.sql("SELECT count(*) FROM graft_bkt.rbk.t.history")
      .head().getLong(0)
    assert(preHistory >= 2) // the insert + the delete at least

    // re-layout 2 → 4: atomic, state preserved, deletes folded away
    val report = spark.sql(
      "CALL graft_bkt.system.rebucket(table => 'rbk.t', new_buckets => 4)").head()
    assert(report.getInt(0) == 2 && report.getInt(1) == 4)

    // the audit trail SURVIVES the directory swap (exportLog/importLog
    // carries it), and the rebucket is itself its newest event
    val ops = spark.sql(
      "SELECT op FROM graft_bkt.rbk.t.history ORDER BY id").collect()
      .map(_.getString(0))
    assert(ops.length >= preHistory + 1,
      s"history must survive rebucket: $preHistory before, ${ops.length} after")
    assert(ops.contains("rebucket") && ops.take(preHistory.toInt).contains("insert"),
      ops.mkString(", "))
    assert(report.getLong(2) == 29) // k05's pending delete netted out
    assert(keysOf(spark.sql("SELECT * FROM graft_bkt.rbk.t"))
      == rows.map(_._1).filterNot(_ == "k05").sorted)
    assert(spark.sql("SHOW CREATE TABLE graft_bkt.rbk.t").head().getString(0)
      .contains("'buckets' = '4'"))
    val st = stems(dir)
    assert(st.nonEmpty && st.forall(SSTableSource.BucketNameRe.matches), st.toString)

    // the new count is real for SPJ: a join against a 4-bucket sibling
    // runs exchange-free
    spark.sql("CREATE TABLE graft_bkt.rbk.s TBLPROPERTIES ('buckets'='4')")
    insertRows("graft_bkt.rbk.s", rows.take(10))
    def shuffles(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.toString
        .linesIterator.count(l =>
          l.contains("Exchange") && !l.contains("BroadcastExchange"))
    withV2Bucketing {
      val j = spark.sql("SELECT a.key FROM graft_bkt.rbk.t a " +
        "JOIN graft_bkt.rbk.s b ON a.key = b.key")
      assert(shuffles(j) == 0,
        s"rebucketed table must SPJ at the new count:\n${j.queryExecution.executedPlan}")
      assert(j.count() == 9) // 10 minus deleted k05
    }

    // no-op re-layouts refuse; 0 drops the layout entirely
    val same = intercept[Exception](spark.sql(
      "CALL graft_bkt.system.rebucket(table => 'rbk.t', new_buckets => 4)"))
    assert(same.getMessage.contains("nothing to re-layout"), same.getMessage)
    spark.sql("CALL graft_bkt.system.rebucket(table => 'rbk.t', new_buckets => 0)")
    assert(!spark.sql("SHOW CREATE TABLE graft_bkt.rbk.t").head().getString(0)
      .contains("buckets"))
    assert(stems(dir).forall(!SSTableSource.BucketNameRe.matches(_)))
    assert(keysOf(spark.sql("SELECT * FROM graft_bkt.rbk.t"))
      == rows.map(_._1).filterNot(_ == "k05").sorted)
    spark.sql("DROP TABLE graft_bkt.rbk.t")
    spark.sql("DROP TABLE graft_bkt.rbk.s")
  }

  test("CREATE TABLE property validation is loud and at CREATE time") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_bkt.bk5")
    val bad = intercept[Exception](spark.sql(
      "CREATE TABLE graft_bkt.bk5.p1 TBLPROPERTIES ('nonsense'='1')"))
    assert(bad.getMessage.contains("unsupported table property"), bad.getMessage)
    val badVal = intercept[Exception](spark.sql(
      "CREATE TABLE graft_bkt.bk5.p2 TBLPROPERTIES ('buckets'='zero')"))
    assert(badVal.getMessage.contains("must be an int"), badVal.getMessage)
    val range = intercept[Exception](spark.sql(
      "CREATE TABLE graft_bkt.bk5.p3 TBLPROPERTIES ('buckets'='2', 'layout'='range')"))
    assert(range.getMessage.contains("cannot compose"), range.getMessage)
    // failed CREATEs leave nothing behind
    assert(spark.sql("SHOW TABLES IN graft_bkt.bk5").collect().isEmpty)
    // writer tuning persists and applies: deflate-compressed generations
    spark.sql("CREATE TABLE graft_bkt.bk5.t " +
      "TBLPROPERTIES ('buckets'='2', 'compressionalgorithm'='deflate')")
    insertRows("graft_bkt.bk5.t", Seq(("a", "1", 10L), ("b", "2", 20L)))
    val dir = s"$warehouse/bk5/t"
    val f = LocalStorage.listDataFiles(dir).head
    val r = new graft.sources.sstable.SSTableReader(f, LocalStorage)
    assert(r.compressionInfo.exists(_.algorithm.toLowerCase.contains("deflate")),
      "persisted compressionalgorithm must shape INSERT-written generations")
    // SHOW CREATE TABLE echoes the declared properties
    val ddl = spark.sql("SHOW CREATE TABLE graft_bkt.bk5.t").head().getString(0)
    assert(ddl.contains("buckets") && ddl.contains("'2'"), ddl)
    assert(ddl.toLowerCase.contains("deflate"), ddl)
  }
}
