package graft.sources.sstable

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Split-planning metadata cache (VERDICT r3 #4): a second scan of an
  * unchanged fileset performs NO metadata IO — no Summary/CompressionInfo/
  * Filter/Index opens — and a rewritten file (new len/mtime) misses. */
class MetadataCacheSpec extends AnyFunSuite {

  /** Storage spy: delegates to LocalStorage, counts open() by suffix. */
  private final class SpyStorage extends Storage {
    val opens = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    private def record(path: String): Unit = synchronized {
      val suf = SSTableFiles.AllSuffixes.find(path.endsWith).getOrElse("other")
      opens(suf) += 1
    }
    def open(path: String): SeekableInput = { record(path); LocalStorage.open(path) }
    def length(path: String): Long = LocalStorage.length(path)
    def mtime(path: String): Long = LocalStorage.mtime(path)
    def exists(path: String): Boolean = LocalStorage.exists(path)
    def listDataFiles(dir: String): Seq[String] = LocalStorage.listDataFiles(dir)
    def create(path: String): java.io.DataOutputStream = LocalStorage.create(path)
    def delete(path: String): Unit = LocalStorage.delete(path)
    def rename(src: String, dst: String): Unit = LocalStorage.rename(src, dst)
    def replace(src: String, dst: String): Unit = LocalStorage.replace(src, dst)
    def listFiles(dir: String): Seq[String] = LocalStorage.listFiles(dir)
    def listSubdirs(dir: String, prefix: String): Seq[String] =
      LocalStorage.listSubdirs(dir, prefix)
    def deleteRecursive(dir: String): Unit = LocalStorage.deleteRecursive(dir)
    def mkdirs(dir: String): Unit = LocalStorage.mkdirs(dir)
    def metadataOpens: Int = synchronized {
      opens(SSTableFiles.SummarySuffix) + opens(SSTableFiles.CompressionSuffix) +
        opens(SSTableFiles.FilterSuffix) + opens(SSTableFiles.IndexSuffix)
    }
  }

  private def writeFileset(path: String, n: Int): Unit = {
    val w = new SSTableWriter(path, compress = true, chunkLength = 256,
      summaryInterval = 4)
    try (0 until n).foreach(i => w.append(SSTableRow(f"k$i%05d".getBytes,
      Seq(Column.Normal("c".getBytes, s"v$i".getBytes, i.toLong)))))
    finally w.close()
  }

  test("second plan of an unchanged fileset does no metadata IO") {
    val dir = Files.createTempDirectory("metacache").toString
    val p = s"$dir/gen1-Data.db"
    writeFileset(p, 200)
    val spy = new SpyStorage

    val r1 = new SSTableReader(p, spy)
    r1.planSplits(1024)
    assert(r1.mightContainKey("k00007".getBytes))
    val afterFirst = spy.metadataOpens
    assert(afterFirst > 0, "first plan must actually read metadata")

    // same (path, len, mtime) → every metadata artifact served from cache
    val r2 = new SSTableReader(p, spy)
    assert(r2.planSplits(1024) == r1.planSplits(1024))
    r2.summary()
    assert(r2.mightContainKey("k00007".getBytes))
    assert(spy.metadataOpens == afterFirst,
      s"second plan re-read metadata: ${spy.opens}")

    // a DIFFERENT split target re-plans (index point reads) but still
    // reuses the cached Summary
    val sumOpens = spy.opens(SSTableFiles.SummarySuffix)
    r2.planSplits(4096)
    assert(spy.opens(SSTableFiles.SummarySuffix) == sumOpens)
  }

  /** Counts seeks on Index.db streams — each split-planning point read
    * is one seek (the stream is opened once and reused). */
  private final class SeekCountingStorage extends Storage {
    var indexSeeks = 0
    def open(path: String): SeekableInput = {
      val underlying = LocalStorage.open(path)
      if (!path.endsWith(SSTableFiles.IndexSuffix)) underlying
      else new SeekableInput {
        def position: Long = underlying.position
        def seek(pos: Long): Unit = {
          SeekCountingStorage.this.synchronized { indexSeeks += 1 }
          underlying.seek(pos)
        }
        def length: Long = underlying.length
        def read(buf: Array[Byte], off: Int, nn: Int): Int = underlying.read(buf, off, nn)
        def close(): Unit = underlying.close()
      }
    }
    def length(path: String): Long = LocalStorage.length(path)
    def mtime(path: String): Long = LocalStorage.mtime(path)
    def exists(path: String): Boolean = LocalStorage.exists(path)
    def listDataFiles(dir: String): Seq[String] = LocalStorage.listDataFiles(dir)
    def create(path: String): java.io.DataOutputStream = LocalStorage.create(path)
    def delete(path: String): Unit = LocalStorage.delete(path)
    def rename(src: String, dst: String): Unit = LocalStorage.rename(src, dst)
    def replace(src: String, dst: String): Unit = LocalStorage.replace(src, dst)
    def listFiles(dir: String): Seq[String] = LocalStorage.listFiles(dir)
    def listSubdirs(dir: String, prefix: String): Seq[String] =
      LocalStorage.listSubdirs(dir, prefix)
    def deleteRecursive(dir: String): Unit = LocalStorage.deleteRecursive(dir)
    def mkdirs(dir: String): Unit = LocalStorage.mkdirs(dir)
  }

  test("split planning does O(#splits) index point reads, not O(#summary entries)") {
    SSTableMetadataCache.clear()
    val dir = Files.createTempDirectory("plan-io").toString
    val p = s"$dir/big-Data.db"
    writeFileset(p, 20000) // summaryInterval 4 → 5000 summary entries
    val spy = new SeekCountingStorage
    val r = new SSTableReader(p, spy)
    // rows are ~26 B: a ~50 KB target yields a handful of splits
    val splits = r.planSplits(50000)
    assert(splits.length >= 4 && splits.length <= 32, s"got ${splits.length} splits")
    assert(spy.indexSeeks < 200,
      s"planning a ${splits.length}-split file cost ${spy.indexSeeks} index point reads " +
        "— the per-summary-entry walk is back")
    // coverage invariant unchanged: splits abut exactly, first at 0,
    // last at dataLength
    assert(splits.head.start == 0L && splits.last.end == r.dataLength)
    splits.zip(splits.tail).foreach { case (a, b) =>
      assert(a.end == b.start, "splits must abut")
      assert(a.lastKeyBound.get.sameElements(b.firstKey))
    }
    // sizes estimate-shaped: every split ∈ [target, ~2×target] except
    // possibly the tail remainder
    splits.init.foreach { s =>
      assert(s.end - s.start >= 50000, s"undersized split ${s.end - s.start}")
      assert(s.end - s.start <= 2 * 50000 + 4096, s"oversized split ${s.end - s.start}")
    }
  }

  test("LocalStorage.rename refuses an existing destination (no silent generation overwrite)") {
    val dir = Files.createTempDirectory("rename-refuse").toString
    val a = s"$dir/a"; val b = s"$dir/b"
    LocalStorage.create(a).close(); LocalStorage.create(b).close()
    intercept[java.io.IOException](LocalStorage.rename(a, b))
    LocalStorage.delete(b)
    LocalStorage.rename(a, b) // free destination: fine
    assert(LocalStorage.exists(b) && !LocalStorage.exists(a))
  }

  test("LocalStorage.replace overwrites the destination whole (the _table swap primitive)") {
    val dir = Files.createTempDirectory("replace-prim").toString
    val a = s"$dir/a"; val b = s"$dir/b"
    def write(p: String, s: String): Unit = {
      val o = LocalStorage.create(p); o.write(s.getBytes); o.close()
    }
    def read(p: String): String = {
      val in = LocalStorage.open(p)
      try { val buf = new Array[Byte](in.length.toInt); in.read(buf, 0, buf.length)
        new String(buf) } finally in.close()
    }
    // unlike rename, an existing destination is replaced — whole new bytes
    write(a, "new-props"); write(b, "old-props")
    LocalStorage.replace(a, b)
    assert(read(b) == "new-props" && !LocalStorage.exists(a))
    // absent destination: behaves like a plain move
    write(a, "again")
    LocalStorage.replace(a, s"$dir/c")
    assert(read(s"$dir/c") == "again" && !LocalStorage.exists(a))
  }

  test("rewritten fileset (changed len/mtime) invalidates; useCache=false bypasses") {
    val dir = Files.createTempDirectory("metacache-inv").toString
    val p = s"$dir/gen1-Data.db"
    writeFileset(p, 100)
    val spy = new SpyStorage
    new SSTableReader(p, spy).planSplits(1024)
    val afterFirst = spy.metadataOpens

    // rewrite with different content — length changes, entry misses
    writeFileset(p, 150)
    val r = new SSTableReader(p, spy)
    r.planSplits(1024)
    assert(spy.metadataOpens > afterFirst, "rewrite must invalidate the cache")
    assert(r.rows().toSeq.length == 150)

    // uncached readers always hit storage
    val before = spy.metadataOpens
    new SSTableReader(p, spy, useCache = false).summary()
    new SSTableReader(p, spy, useCache = false).summary()
    assert(spy.metadataOpens >= before + 2)
  }
}
