package graft.operators

import java.nio.file.Files
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.sstable.LocalStorage

/** Sustained writer ∥ maintainer concurrency — the contract every race
  * re-check individually promises, exercised as a WHOLE: a flusher
  * appending generations while one maintainer loops compaction must
  * never lose a row, never resurrect a deleted one, and must converge
  * once the writer stops. The per-race choreography (post-stage chain
  * re-checks, withdraw-on-growth, GC isolation re-proof) is pinned in
  * SSTableOpsSpec; this spec pins that their COMPOSITION holds under
  * real interleaving, including the parallel cross-bucket fold pool. */
class ConcurrencyStressSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def writeBatch(dir: String, keys: Seq[Int], ts: Long,
                         buckets: Option[Int] = None): Unit = {
    import spark.implicits._
    val df = keys.toDF("id").select(
      concat(lit("k"), lpad(col("id").cast("string"), 4, "0")).cast("binary").as("key"),
      array(struct(lit("c").cast("binary").as("name"), lit("NORMAL").as("state"),
        lit(s"v$ts").cast("binary").as("value"), lit(ts).as("timestamp"),
        lit(0L).as("ttlSecs"), lit(0L).as("expiresMillis"))).as("columns"))
    buckets match {
      case Some(n) => SSTableOps.writeBucketed(df, dir, n)
      case None => df.write.format("sstable")
        .option("writepartitions", "1").mode("append").save(dir)
    }
  }

  private def lwwState(dir: String): Map[String, Long] =
    SSTableOps.compactRows(spark.read.format("sstable").load(dir))
      .selectExpr("cast(key as string) k", "columns[0].timestamp ts")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("flusher vs looping STCS maintainer: no lost rows, convergence after quiesce") {
    val dir = Files.createTempDirectory("stress-stcs").toString
    val epochs = 12
    val writerDone = new AtomicBoolean(false)
    val maintainerError = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val folds = new AtomicInteger(0)
    // writer: 12 epochs, each upserting a sliding window of keys at a
    // strictly-increasing timestamp (LWW winner is always the last epoch
    // that touched the key)
    val writer = new Thread(() => {
      try (1 to epochs).foreach { e =>
        writeBatch(dir, (0 until 60).map(i => (e * 7 + i) % 100), e.toLong)
      } finally writerDone.set(true)
    })
    // maintainer: loop STCS folds (aggressive thresholds) until the
    // writer quiesces, then repeat-until-zero to converge
    val maintainer = new Thread(() => {
      try {
        while (!writerDone.get())
          folds.addAndGet(SSTableOps.compactInPlace(spark, dir,
            minThreshold = 2, minSize = 1L))
        while (SSTableOps.compactInPlace(spark, dir,
            minThreshold = 2, minSize = 1L) > 0) {}
      } catch { case t: Throwable => maintainerError.set(t) }
    })
    writer.start()
    // let the first generation land so the maintainer has a directory
    while (LocalStorage.listDataFiles(dir).isEmpty) Thread.sleep(10)
    maintainer.start()
    writer.join(); maintainer.join()
    assert(maintainerError.get() == null,
      s"maintainer must survive racing flushes: ${maintainerError.get()}")
    // expected LWW state: for every key, the LAST epoch that wrote it
    val expected = (1 to epochs).flatMap(e =>
      (0 until 60).map(i => f"k${(e * 7 + i) % 100}%04d" -> e.toLong))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    assert(lwwState(dir) == expected, "reconciled state must equal the epoch log")
    assert(folds.get() > 0, "the maintainer must have actually folded under fire")
    // converged: one more pass folds nothing
    assert(SSTableOps.compactInPlace(spark, dir, minThreshold = 2, minSize = 1L) == 0)
    // no staging garbage survives the races (withdrawn folds clean up)
    assert(LocalStorage.listSubdirs(dir, "_staging").isEmpty,
      "withdrawn/committed folds must leave no staging dirs")
  }

  test("bucketed flusher vs parallel fold pool: layout intact, no lost rows") {
    val dir = Files.createTempDirectory("stress-bucket").toString
    val epochs = 8
    val buckets = 4
    val writerDone = new AtomicBoolean(false)
    val maintainerError = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val writer = new Thread(() => {
      try (1 to epochs).foreach { e =>
        writeBatch(dir, (0 until 50).map(i => (e * 11 + i) % 80), e.toLong,
          buckets = Some(buckets))
      } finally writerDone.set(true)
    })
    val maintainer = new Thread(() => {
      try {
        while (!writerDone.get()) {
          SSTableOps.compactBucketedInPlace(spark, dir)
          ()
        }
        while (SSTableOps.compactBucketedInPlace(spark, dir) > 0) {}
      } catch { case t: Throwable => maintainerError.set(t) }
    })
    writer.start()
    while (LocalStorage.listDataFiles(dir).isEmpty) Thread.sleep(10)
    maintainer.start()
    writer.join(); maintainer.join()
    assert(maintainerError.get() == null,
      s"bucketed maintainer must survive racing flushes: ${maintainerError.get()}")
    val expected = (1 to epochs).flatMap(e =>
      (0 until 50).map(i => f"k${(e * 11 + i) % 80}%04d" -> e.toLong))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    assert(lwwState(dir) == expected)
    // every surviving generation still carries a bucket stem — the fold
    // pool never published a layout-breaking name, even when withdrawing
    val stems = LocalStorage.listDataFiles(dir)
      .map(graft.sources.sstable.SSTableFiles.generationStem)
    assert(stems.forall(graft.sources.sstable.spark.SSTableSource.BucketNameRe.matches),
      s"non-bucket stem after concurrent maintenance: $stems")
    // fully folded: at most one generation per bucket
    assert(LocalStorage.listDataFiles(dir).length <= buckets)
    assert(LocalStorage.listSubdirs(dir, "_staging").isEmpty)
  }

  test("maintainer vs maintainer: the lease turns the race into a loud refusal") {
    import graft.sources.sstable.MaintenanceLease
    val dir = Files.createTempDirectory("stress-mvm").toString
    val buckets = 4
    (1 to 6).foreach(e => writeBatch(dir, 0 until 40, e.toLong, Some(buckets)))
    val before = LocalStorage.listDataFiles(dir)
    assert(before.length == buckets * 6)
    // a first maintainer is mid-run (simulated by holding its lease);
    // the second CALL compact_bucketed must refuse NAMING it, and must
    // not have touched a single generation
    SSTableOps.snapshot(dir, "pin", LocalStorage) // snapshot is lock-free
    val first = MaintenanceLease.acquire(dir, LocalStorage, "compactBucketedInPlace")
    val e = intercept[MaintenanceLease.MaintenanceLeaseHeldException] {
      SSTableOps.compactBucketedInPlace(spark, dir)
    }
    assert(e.holder.startsWith("compactBucketedInPlace@"))
    assert(LocalStorage.listDataFiles(dir) == before,
      "a refused maintainer must leave the directory untouched")
    // rollback shares the same exclusion — and so does PIN DESTRUCTION
    // (an expire deleting the pin a rollback is restoring from would
    // fail the restore half-way)
    intercept[MaintenanceLease.MaintenanceLeaseHeldException] {
      SSTableOps.rollbackToSnapshot(dir, "pin", LocalStorage)
    }
    intercept[MaintenanceLease.MaintenanceLeaseHeldException] {
      SSTableOps.expireSnapshots(dir, olderThanMs = -1L, storage = LocalStorage)
    }
    intercept[MaintenanceLease.MaintenanceLeaseHeldException] {
      SSTableOps.dropSnapshot(dir, "pin", LocalStorage)
    }
    assert(LocalStorage.exists(SSTableOps.snapshotPath(dir, "pin")),
      "a refused expire/drop must leave the pin intact")
    first.release()
    // the surviving maintainer folds to the single-maintainer result
    assert(SSTableOps.compactBucketedInPlace(spark, dir) == buckets)
    val expected = (0 until 40).map(i => f"k$i%04d" -> 6L).toMap
    assert(lwwState(dir) == expected)
    assert(LocalStorage.listDataFiles(dir).length == buckets)
    assert(!LocalStorage.exists(s"$dir/${MaintenanceLease.LeaseFile}"),
      "the lease must be released after the fold")
  }

  test("two concurrent bucketed maintainers: exactly one folds each bucket, state intact") {
    import graft.sources.sstable.MaintenanceLease
    val dir = Files.createTempDirectory("stress-mvm2").toString
    val buckets = 4
    (1 to 8).foreach(e => writeBatch(dir, 0 until 60, e.toLong, Some(buckets)))
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, Int]]()
    val threads = (1 to 2).map(_ => new Thread(() =>
      results.add(
        try Right(SSTableOps.compactBucketedInPlace(spark, dir))
        catch { case t: Throwable => Left(t) })))
    threads.foreach(_.start()); threads.foreach(_.join())
    val (failures, folds) = (results.toArray(Array.empty[Either[Throwable, Int]])
      .partition(_.isLeft))
    // every failure is the lease refusal — never a mid-fold data race
    failures.foreach { f =>
      assert(f.swap.toOption.get.isInstanceOf[MaintenanceLease.MaintenanceLeaseHeldException],
        s"unexpected maintainer failure: ${f.swap.toOption.get}")
    }
    // folds are serialized by the lease: each bucket folded at most once
    assert(folds.flatMap(_.toOption).sum <= buckets)
    // 1 refusal = the threads overlapped and the lease fired; 0 = they
    // legitimately serialized (the loser listed AFTER the winner's fold,
    // found chains of one, and returned without acquiring). Both satisfy
    // the actual invariant — never a silent concurrent fold; the
    // DETERMINISTIC refusal is pinned by the held-lease test above.
    assert(failures.length <= 1,
      s"at most one maintainer may lose the lease race, got ${failures.length}")
    // reconciled state is the single-maintainer result regardless
    val expected = (0 until 60).map(i => f"k$i%04d" -> 8L).toMap
    assert(lwwState(dir) == expected)
    val stems = LocalStorage.listDataFiles(dir)
      .map(graft.sources.sstable.SSTableFiles.generationStem)
    assert(stems.forall(graft.sources.sstable.spark.SSTableSource.BucketNameRe.matches))
    assert(LocalStorage.listSubdirs(dir, "_staging").isEmpty)
    assert(!LocalStorage.exists(s"$dir/${MaintenanceLease.LeaseFile}"))
  }
}
