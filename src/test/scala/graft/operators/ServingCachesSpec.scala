package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** Serving-cache LIFECYCLE (round 16, VERDICT r15 #6): the query
  * library memoizes trained/derived relations per (session, corpus) —
  * `localCheckpoint`-backed clusterings and quantizers, persisted
  * serving intermediates (the TF-IDF probe batch, the ANN rerank
  * shortlist), fixture directories. `CALL release_serving_caches()`
  * is the explicit release surface: it must actually free the pinned
  * storage (CacheManager entries AND checkpoint blocks), and the
  * served queries must come back green on re-run (a release costs the
  * rebuild, never correctness).
  *
  * Isolation: this spec runs on its OWN `newSession()` over its OWN
  * corpus-directory copy — the caches key by (session, corpus) and
  * fixture directories derive from the corpus path, so releasing here
  * can never disturb a concurrently-running suite's entries on the
  * shared session. */
class ServingCachesSpec extends AnyFunSuite {

  private lazy val corpusDir: String = {
    val d = Files.createTempDirectory("graft-relcorpus")
    Seq("documents.parquet", "embeddings.parquet").foreach { f =>
      Files.copy(Paths.get(s"/root/testdata/sf0.001/$f"),
        d.resolve(f), StandardCopyOption.REPLACE_EXISTING)
    }
    d.toString
  }

  private lazy val warehouse: String =
    Files.createTempDirectory("graft-relwh").toString

  private lazy val spark: SparkSession = {
    val base = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    base.sparkContext.setLogLevel("ERROR")
    val s = base.newSession()
    s.conf.set("spark.sql.catalog.graft_rel",
      classOf[graft.sources.sstable.spark.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_rel.warehouse", warehouse)
    s
  }

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, corpusDir)
      .collect().map(_.toString).sorted.toSeq

  test("CALL release_serving_caches frees every pinned entry of the " +
    "session — CacheManager entries AND localCheckpoint blocks — and " +
    "the served queries re-run green afterwards") {
    // build three distinct cache classes: a localCheckpoint-backed
    // clustering, a persisted serving intermediate (TF-IDF probe tf),
    // and the rerank shortlist on top of a trained served index
    val before = Map(
      "q_dedup_clusters" -> run("q_dedup_clusters"),
      "q_tfidf_probe" -> run("q_tfidf_probe"),
      "q_ann_rerank" -> run("q_ann_rerank"))
    val frames = ServingCaches.sessionFrames(spark)
    assert(frames.nonEmpty, "the serving queries cached nothing to release")
    val persisted = frames.filter(_.storageLevel != StorageLevel.NONE)
    val ckptIds = frames.flatMap(ServingCaches.checkpointRddIds).distinct
    assert(persisted.nonEmpty,
      "expected at least one CacheManager-persisted serving intermediate")
    assert(ckptIds.nonEmpty,
      "expected at least one localCheckpoint-backed trained relation")
    ckptIds.foreach(id => assert(
      spark.sparkContext.getPersistentRDDs.contains(id),
      s"checkpoint RDD $id should be pinned before the release"))

    val r = spark.sql(
      "CALL graft_rel.system.release_serving_caches()").head()
    assert(r.getAs[Long]("entriesReleased") >= 3L, r)

    // all pinned storage actually left: CacheManager levels back to
    // NONE, checkpoint blocks gone from the block manager, and the
    // registry holds nothing for this session any more
    persisted.foreach(df => assert(df.storageLevel == StorageLevel.NONE,
      "a persisted serving intermediate survived the release"))
    ckptIds.foreach(id => assert(
      !spark.sparkContext.getPersistentRDDs.contains(id),
      s"checkpoint RDD $id still pinned after the release"))
    assert(ServingCaches.sessionFrames(spark).isEmpty,
      "the registry still holds entries for the released session")

    // a second release finds nothing (idempotent, receipt-visible)
    assert(spark.sql("CALL graft_rel.system.release_serving_caches()")
      .head().getAs[Long]("entriesReleased") == 0L)

    // serving is REBUILT, not broken: every query returns the exact
    // pre-release result
    before.foreach { case (name, want) =>
      assert(run(name) == want, s"$name diverged after the release")
    }
  }

  test("per-corpus release (round 17, VERDICT r16 #6): CALL " +
    "release_serving_caches(corpus_dir => A) drops ONLY corpus A's " +
    "entries — corpus B's stay live and bit-identical, the argless " +
    "form keeps today's whole-session behavior") {
    // a SECOND corpus copy: same bytes, different directory key
    val corpusB = {
      val d = Files.createTempDirectory("graft-relcorpusB")
      Seq("documents.parquet", "embeddings.parquet").foreach { f =>
        Files.copy(Paths.get(s"/root/testdata/sf0.001/$f"),
          d.resolve(f), StandardCopyOption.REPLACE_EXISTING)
      }
      d.toString
    }
    def runOn(dir: String, name: String) =
      graft.SparkEntry.queries(name)(spark, dir)
        .collect().map(_.toString).sorted.toSeq
    val wantA = runOn(corpusDir, "q_dedup_clusters")
    val wantB = runOn(corpusB, "q_dedup_clusters")
    assert(ServingCaches.sessionFrames(spark, Some(corpusDir)).nonEmpty)
    assert(ServingCaches.sessionFrames(spark, Some(corpusB)).nonEmpty)
    val bFrames = ServingCaches.sessionFrames(spark, Some(corpusB))
    val bCkpt = bFrames.flatMap(ServingCaches.checkpointRddIds).distinct

    val n = spark.sql("CALL graft_rel.system.release_serving_caches(" +
      s"corpus_dir => '$corpusDir')").head().getAs[Long]("entriesReleased")
    assert(n >= 1L, "the scoped release dropped nothing for corpus A")

    // A's entries are gone; B's entries AND their pinned blocks survive
    assert(ServingCaches.sessionFrames(spark, Some(corpusDir)).isEmpty,
      "corpus A still has registry entries after its scoped release")
    assert(ServingCaches.sessionFrames(spark, Some(corpusB)).nonEmpty,
      "the scoped release for corpus A dumped corpus B's entries too")
    bCkpt.foreach(id => assert(
      spark.sparkContext.getPersistentRDDs.contains(id),
      s"corpus B's checkpoint RDD $id was dropped by corpus A's release"))

    // B serves from its LIVE cache (bit-identical), A rebuilds exactly
    assert(runOn(corpusB, "q_dedup_clusters") == wantB)
    assert(runOn(corpusDir, "q_dedup_clusters") == wantA)

    // a scoped release of an unknown corpus is a receipt-visible noop
    assert(spark.sql("CALL graft_rel.system.release_serving_caches(" +
      "corpus_dir => '/no/such/corpus')").head()
      .getAs[Long]("entriesReleased") == 0L)
  }
}
