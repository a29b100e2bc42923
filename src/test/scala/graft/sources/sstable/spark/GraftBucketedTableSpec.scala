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
    s.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft.warehouse", warehouse)
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
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.bk")
    spark.sql("CREATE TABLE graft.bk.t TBLPROPERTIES ('buckets'='4')")
    val dir = s"$warehouse/bk/t"
    val rows = (0 until 40).map(i => (f"k$i%03d", s"v$i", 100L + i))
    insertRows("graft.bk.t", rows)

    // every generation carries the bucket stem; one INSERT appends at
    // most `buckets` generations no matter how many tasks ran
    val gens = stems(dir)
    assert(gens.nonEmpty && gens.size <= 4, s"expected <=4 generations, got $gens")
    assert(gens.forall(SSTableSource.BucketNameRe.matches),
      s"non-bucket stems after INSERT: $gens")

    // SQL reads round-trip with the PLAIN schema (no _bucket column)
    assert(keysOf(spark.sql("SELECT * FROM graft.bk.t")) == rows.map(_._1).sorted)
    assert(!spark.table("graft.bk.t").columns.contains("_bucket"))

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
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.bk2")
    spark.sql("CREATE TABLE graft.bk2.t TBLPROPERTIES ('buckets'='3')")
    val dir = s"$warehouse/bk2/t"
    insertRows("graft.bk2.t", Seq(("a", "old", 100L), ("b", "1", 100L), ("c", "1", 100L)))
    insertRows("graft.bk2.t", Seq(("a", "new", 200L), ("d", "2", 200L)))
    def valueOf(k: String): String = spark.sql(
      s"SELECT CAST(columns[0].value AS STRING) FROM graft.bk2.t " +
        s"WHERE key = CAST('$k' AS BINARY)").head().getString(0)
    // raw SQL reads surface row VERSIONS; the merge view is compactRows
    // (zero-exchange on the bucketed path) — assert the merged winner
    val merged = graft.operators.SSTableOps.compactRows(
      spark.read.format("sstable").option("buckets", "3").load(dir))
    val aRow = merged.filter(col("key").cast("string") === "a")
      .select(expr("CAST(columns[0].value AS STRING)")).head().getString(0)
    assert(aRow == "new", "LWW upsert must keep the newest cell")

    val before = stems(dir).size
    val folds = spark.sql("CALL graft.system.compact_bucketed(table => 'bk2.t')")
      .head().getInt(0)
    assert(folds > 0, "chains of 2 generations must fold")
    val after = stems(dir)
    assert(after.size < before)
    assert(after.forall(SSTableSource.BucketNameRe.matches),
      s"fold must keep bucket stems: $after")
    assert(valueOf("a") == "new")
    assert(keysOf(spark.sql("SELECT * FROM graft.bk2.t")) == Seq("a", "b", "c", "d"))
  }

  test("DELETE appends per-bucket tombstone generations; compaction folds the debt") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.bk3")
    spark.sql("CREATE TABLE graft.bk3.t TBLPROPERTIES ('buckets'='4')")
    val dir = s"$warehouse/bk3/t"
    val rows = (0 until 20).map(i => (f"k$i%02d", s"v$i", 100L + i))
    insertRows("graft.bk3.t", rows)
    val doomed = Seq("k03", "k07", "k11")
    val before = stems(dir).size

    spark.sql("DELETE FROM graft.bk3.t WHERE key IN (" +
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
    assert(keysOf(spark.sql("SELECT * FROM graft.bk3.t")) == expected)

    // the bucketed fold GCs the tombstones structurally: chains collapse,
    // stems survive, the deleted keys stay gone, debt is resolved
    val folds = spark.sql("CALL graft.system.compact_bucketed(table => 'bk3.t')")
      .head().getInt(0)
    assert(folds > 0)
    assert(keysOf(spark.sql("SELECT * FROM graft.bk3.t")) == expected)
    val folded = stems(dir)
    assert(folded.forall(SSTableSource.BucketNameRe.matches))
    // tombstone rows are GONE from the raw view too (GC'd, not carried)
    val raw = spark.read.format("sstable").load(dir)
    assert(raw.filter(col("rowTombstone").isNotNull).count() == 0,
      "bucketed fold must GC its tombstones (whole-chain fold is isolation proof)")
  }

  test("refusals: UPDATE/MERGE, streaming write, generic compact, path-API writebuckets") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.bk4")
    spark.sql("CREATE TABLE graft.bk4.t TBLPROPERTIES ('buckets'='2')")
    insertRows("graft.bk4.t", Seq(("a", "1", 10L)))

    val up = intercept[Exception](spark.sql(
      "UPDATE graft.bk4.t SET columns = array() WHERE key = CAST('a' AS BINARY)"))
    assert(up.getMessage.contains("bucketed"), up.getMessage)

    val mg = intercept[Exception](spark.sql(
      """MERGE INTO graft.bk4.t t USING (SELECT CAST('a' AS BINARY) AS key) s
        |ON t.key = s.key WHEN MATCHED THEN DELETE""".stripMargin))
    assert(mg.getMessage.contains("bucketed"), mg.getMessage)

    // generic size-tier compaction refuses, pointing at the bucketed path
    val cp = intercept[Exception](spark.sql(
      "CALL graft.system.compact(table => 'bk4.t')"))
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

  test("CREATE TABLE property validation is loud and at CREATE time") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.bk5")
    val bad = intercept[Exception](spark.sql(
      "CREATE TABLE graft.bk5.p1 TBLPROPERTIES ('nonsense'='1')"))
    assert(bad.getMessage.contains("unsupported table property"), bad.getMessage)
    val badVal = intercept[Exception](spark.sql(
      "CREATE TABLE graft.bk5.p2 TBLPROPERTIES ('buckets'='zero')"))
    assert(badVal.getMessage.contains("must be an int"), badVal.getMessage)
    val range = intercept[Exception](spark.sql(
      "CREATE TABLE graft.bk5.p3 TBLPROPERTIES ('buckets'='2', 'layout'='range')"))
    assert(range.getMessage.contains("cannot compose"), range.getMessage)
    // failed CREATEs leave nothing behind
    assert(spark.sql("SHOW TABLES IN graft.bk5").collect().isEmpty)
    // writer tuning persists and applies: deflate-compressed generations
    spark.sql("CREATE TABLE graft.bk5.t " +
      "TBLPROPERTIES ('buckets'='2', 'compressionalgorithm'='deflate')")
    insertRows("graft.bk5.t", Seq(("a", "1", 10L), ("b", "2", 20L)))
    val dir = s"$warehouse/bk5/t"
    val f = LocalStorage.listDataFiles(dir).head
    val r = new graft.sources.sstable.SSTableReader(f, LocalStorage)
    assert(r.compressionInfo.exists(_.algorithm.toLowerCase.contains("deflate")),
      "persisted compressionalgorithm must shape INSERT-written generations")
    // SHOW CREATE TABLE echoes the declared properties
    val ddl = spark.sql("SHOW CREATE TABLE graft.bk5.t").head().getString(0)
    assert(ddl.contains("buckets") && ddl.contains("'2'"), ddl)
    assert(ddl.toLowerCase.contains("deflate"), ddl)
  }
}
