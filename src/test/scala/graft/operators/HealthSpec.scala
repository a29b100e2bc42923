package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `CALL health` (round 18, VERDICT r17 missing #5): the spanning
  * operational-health surface over the derived-store registry. Pinned:
  * an all-healthy pipeline reads all-green; a pipeline with one
  * DRIFTED index and one consolidation-overdue df store names exactly
  * those two rows; a dropped registered store surfaces as a not-ok
  * 'present' row; a stale lease names the dead maintainer. */
class HealthSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val warehouse: String =
    Files.createTempDirectory("graft-health").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s.conf.set("spark.sql.catalog.graft_hl",
      classOf[graft.sources.sstable.spark.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_hl.warehouse", warehouse)
    s.sql("CREATE NAMESPACE graft_hl.hl")
    s
  }

  private def health(args: String = ""): Seq[(String, String, String,
      Long, Long, Boolean, String)] =
    spark.sql(s"CALL graft_hl.system.health($args)").collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5), r.getString(6)))

  test("all-green on a healthy pipeline; a drifted index and a " +
    "consolidation-overdue df store name exactly themselves; a " +
    "dropped store and a stale lease surface") {
    // a corpus dir this test owns (so the shifted slice can append)
    val dir = Files.createTempDirectory("health-corpus").toString
    val emb = graft.Tables.embeddings(spark, sfDir)
    emb.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    // df store with consolidation DISABLED (the operator-forgot shape),
    // three disjoint update epochs -> three unfolded partials
    (0 until 3).foreach(i => spark.sql(
      "CALL graft_hl.system.update_doc_freqs(table => 'hl.df', " +
        s"source_dir => '$sfDir', where => 'doc_id % 3 = $i', " +
        "autocompact => 3, autoconsolidate => 0)"))
    spark.sql("CALL graft_hl.system.update_signatures(table => 'hl.sig', " +
      s"source_dir => '$sfDir', autocompact => 3)")
    // covering index with a pinned drift_warn — the rebuild-runbook pin
    spark.sql("CALL graft_hl.system.build_ann_index(table => 'hl.ann', " +
      s"source_dir => '$dir', kind => 'ivf', k => 4, iters => 2, " +
      "store_vectors => true, drift_warn => 10150)")

    // ALL-HEALTHY: every row green (df partials are informational
    // without a pinned bound or override; the fresh index has no
    // post-build samples -> neutral 10000 under warn 10150)
    val h0 = health()
    assert(h0.nonEmpty && h0.forall(_._6), s"expected all-green: $h0")
    assert(h0.map(_._2).toSet == Set("hl.df", "hl.sig", "hl.ann"), h0)

    // drift the index: a NEGATED slice under fresh ids (the worst case
    // for cosine assignment), ingested as a post-build epoch -> the
    // _health sample exceeds the pinned warn
    val nmax = emb.agg(max(col("vec_id"))).head().getLong(0)
    emb.unionAll(emb.select((col("vec_id") + nmax + 1).as("vec_id"),
        transform(col("embedding"), x => -x).as("embedding"),
        col("label")))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    spark.sql("CALL graft_hl.system.update_ann_index(table => 'hl.ann', " +
      s"source_dir => '$dir')")

    // exactly TWO rows name themselves: the drifted index and (under
    // the operator's unfolded-partials policy) the overdue df store
    val h1 = health("max_unfolded => 2")
    val bad = h1.filterNot(_._6).map(r => (r._2, r._3)).toSet
    assert(bad == Set(("hl.ann", "drift"), ("hl.df", "unfolded_partials")),
      s"expected exactly the two unhealthy rows: $h1")
    val drift = h1.find(r => r._2 == "hl.ann" && r._3 == "drift").get
    assert(drift._4 > 10150L && drift._5 == 10150L, drift.toString)
    val unfolded = h1.find(r => r._2 == "hl.df" &&
      r._3 == "unfolded_partials").get
    assert(unfolded._4 == 3L && unfolded._5 == 2L, unfolded.toString)

    // consolidating the store turns its row green again
    spark.sql("CALL graft_hl.system.consolidate_doc_freqs(table => 'hl.df')")
    assert(health("max_unfolded => 2")
      .filter(r => r._2 == "hl.df" && r._3 == "unfolded_partials")
      .forall(_._6), "a consolidated store must read green")

    // a STALE lease (a dead maintainer's husk) names itself; a fresh
    // lease would be a live holder (green) — stale is mtime-driven
    val sigDir = s"$warehouse/hl/sig"
    val leasePath = java.nio.file.Paths.get(sigDir, "_lease")
    java.nio.file.Files.writeString(leasePath, "dead-op@gone-host#feed")
    leasePath.toFile.setLastModified(
      System.currentTimeMillis() - 20L * 60 * 1000)
    val lease = health().find(r => r._2 == "hl.sig" && r._3 == "lease").get
    assert(!lease._6 && lease._7.contains("STALE") &&
      lease._7.contains("dead-op@gone-host"), lease.toString)
    java.nio.file.Files.delete(leasePath)

    // a DROPPED registered store reports one not-ok 'present' row (its
    // ledger record would still guard a rebuild)
    spark.sql("DROP TABLE graft_hl.hl.sig")
    val present = health().filter(r => r._2 == "hl.sig")
    assert(present.map(_._3) == Seq("present") && !present.head._6,
      present.toString)
  }
}
