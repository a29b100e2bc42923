package graft.plans

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** `SELECT * FROM graft_lookup(dir, keys[, gc])` — the relation-valued
  * twin of `CALL lookup` (VERDICT r12 Next #7): same DirectoryProber
  * tier, same tombstone semantics, but a RELATION that composes (joins,
  * filters). Parity is pinned row-for-row against the CALL over the same
  * multi-generation table with pending deletes. Registered through the
  * TableFunctionRegistry (injectTableFunction at session build, or
  * GraftExtensions.register on a live session, as here). */
class GraftLookupTvfSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("tvf-wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(s)
    s
  }

  private lazy val tableDir: String = {
    spark.conf.set("spark.sql.catalog.graft_tvf",
      classOf[graft.sources.sstable.spark.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_tvf.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE graft_tvf.lk")
    spark.sql("CREATE TABLE graft_tvf.lk.t")
    def ins(rows: Seq[(String, String, Long)]): Unit =
      spark.sql(s"INSERT INTO graft_tvf.lk.t VALUES " + rows.map {
        case (k, v, ts) =>
          s"(CAST('$k' AS BINARY), array(named_struct(" +
            s"'name', CAST('c' AS BINARY), 'state', 'NORMAL', " +
            s"'value', CAST('$v' AS BINARY), 'timestamp', CAST($ts AS BIGINT), " +
            s"'ttlSecs', CAST(0 AS BIGINT), 'expiresMillis', CAST(0 AS BIGINT))), " +
            "CAST(NULL AS STRUCT<localDeletionTime: INT, markedForDeleteAt: BIGINT>))"
      }.mkString(", "))
    ins(Seq(("k1", "a", 10L), ("k2", "b", 10L)))
    ins(Seq(("k3", "c", 20L)))
    spark.sql("DELETE FROM graft_tvf.lk.t WHERE key = CAST('k2' AS BINARY)")
    s"$warehouse/lk/t"
  }

  private val keysSql = "array(CAST('k1' AS BINARY), CAST('k2' AS BINARY), " +
    "CAST('k3' AS BINARY), CAST('absent' AS BINARY), CAST(NULL AS BINARY))"

  test("row-for-row parity with CALL lookup — live view and merged " +
    "tombstone view, absent keys miss, NULL keys match nothing") {
    val d = tableDir
    for (gc <- Seq(true, false)) {
      val tvf = spark.sql(
        s"SELECT * FROM graft_lookup('$d', $keysSql, $gc)")
        .toJSON.collect().toSeq.sorted
      val call = spark.sql(
        s"CALL graft_tvf.system.lookup(table => 'lk.t', keys => $keysSql, " +
          s"gc_tombstones => $gc)").toJSON.collect().toSeq.sorted
      assert(tvf == call, s"gc=$gc: TVF diverged from CALL lookup")
      assert(tvf.nonEmpty)
    }
    // the live view drops the deleted k2
    val liveKeys = spark.sql(
      s"SELECT CAST(key AS STRING) k FROM graft_lookup('$d', $keysSql)")
      .collect().map(_.getString(0)).toSeq.sorted
    assert(liveKeys == Seq("k1", "k3"), liveKeys)
  }

  test("the TVF is a RELATION: it joins and filters like any table") {
    val d = tableDir
    val sp = spark
    import sp.implicits._
    Seq(("k1", "dim1"), ("k3", "dim3"), ("k9", "dim9")).toDF("k", "side")
      .createOrReplaceTempView("tvf_dim")
    val joined = spark.sql(
      s"""SELECT d.side FROM graft_lookup('$d', $keysSql) l
          JOIN tvf_dim d ON CAST(l.key AS STRING) = d.k
          WHERE CAST(l.key AS STRING) != 'k3'
          ORDER BY d.side""").collect().map(_.getString(0)).toSeq
    assert(joined == Seq("dim1"), joined)
  }

  test("probing a tombstoned catalog directory refuses loudly — the " +
    "raw-path pointer guard applies to the TVF like every path-API " +
    "entry (self-review: a residue probe must never answer)") {
    tableDir // fixture built
    spark.sql("CREATE TABLE graft_tvf.lk.gone")
    spark.sql("INSERT INTO graft_tvf.lk.gone VALUES (CAST('g' AS BINARY), " +
      "array(named_struct('name', CAST('c' AS BINARY), 'state', 'NORMAL', " +
      "'value', CAST('v' AS BINARY), 'timestamp', CAST(1 AS BIGINT), " +
      "'ttlSecs', CAST(0 AS BIGINT), 'expiresMillis', CAST(0 AS BIGINT))), " +
      "CAST(NULL AS STRUCT<localDeletionTime: INT, markedForDeleteAt: BIGINT>))")
    // the crash shape a committed DROP leaves: the graft.state tombstone
    // line in _table over still-present content — crafted through the
    // ON-DISK contract (the format, not shared code)
    val d = s"$warehouse/lk/gone"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$d/_table"),
      "graft.state=dropped::deadbeef".getBytes)
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_lookup('$d', array(CAST('g' AS BINARY)))").collect())
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("mid-lifecycle")), chain(e))
  }

  test("a nonexistent directory is an ANALYSIS error, never an empty " +
    "relation (advice r13: a typo'd path silently serving zero rows)") {
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_lookup('$warehouse/lk/no_such_table', " +
        "array(CAST('k1' AS BINARY)))").collect())
    assert(chain(e).exists(_.contains("does not exist")), chain(e))
  }

  test("argument validation is loud: wrong key type, NULL dir, bad arity") {
    val d = tableDir
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    val e1 = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_lookup('$d', array('k1'))").collect())
    assert(chain(e1).exists(_.contains("ARRAY<BINARY>")), chain(e1))
    val e2 = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_lookup(CAST(NULL AS STRING), $keysSql)").collect())
    assert(chain(e2).exists(_.contains("NULL")), chain(e2))
    val e3 = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_lookup('$d')").collect())
    assert(chain(e3).exists(_.contains("dir, keys")), chain(e3))
  }
}
