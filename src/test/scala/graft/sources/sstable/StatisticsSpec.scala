package graft.sources.sstable

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Per-generation `-Statistics.db` (VERDICT r4 #1): codec round-trip,
  * unrecognized-layout tolerance, writer tracking, and the two
  * DirectoryProber prunes (key bounds, newest-first tombstone early-out)
  * proven at the storage level — a pruned generation's Data/Index/Filter/
  * Summary files are never opened. */
class StatisticsSpec extends AnyFunSuite {

  /** Storage spy: delegates to LocalStorage, records every open() path. */
  private final class SpyStorage extends Storage {
    val opened = scala.collection.mutable.ArrayBuffer.empty[String]
    def open(path: String): SeekableInput =
      { synchronized(opened += path); LocalStorage.open(path) }
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
    def opensOf(stem: String, suffix: String): Int =
      synchronized(opened.count(p => p.contains(stem) && p.endsWith(suffix)))
  }

  private def roundTrip(s: SSTableStatistics): Option[SSTableStatistics] = {
    val bos = new ByteArrayOutputStream()
    StatisticsFile.write(new DataOutputStream(bos), s)
    StatisticsFile.read(new DataInputStream(new ByteArrayInputStream(bos.toByteArray)))
  }

  test("statistics codec round-trips; foreign/truncated layouts read as None") {
    val s = SSTableStatistics(12L, 9876543210L, "aa".getBytes, "zz".getBytes, 41L, 7L,
      Some(CellStatistics(100L, 12L, 9876543210L)))
    val got = roundTrip(s).get
    assert(got.minTimestamp == 12L && got.maxTimestamp == 9876543210L)
    assert(new String(got.minKey) == "aa" && new String(got.maxKey) == "zz")
    assert(got.rowCount == 41L && got.tombstoneCount == 7L)
    assert(got.cellStats.contains(CellStatistics(100L, 12L, 9876543210L)))

    // no magic (a real Cassandra 1.2 Statistics.db opens with histogram
    // bucket counts, never 'GRST') → recognized as foreign, not a throw
    val foreign = new DataInputStream(new ByteArrayInputStream(
      Array[Byte](0, 0, 0, 90, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9)))
    assert(StatisticsFile.read(foreign).isEmpty)
    // truncated own layout → None, not EOFException
    val bos = new ByteArrayOutputStream()
    StatisticsFile.write(new DataOutputStream(bos), s)
    val cut = bos.toByteArray.take(20)
    assert(StatisticsFile.read(new DataInputStream(new ByteArrayInputStream(cut))).isEmpty)
  }

  test("writer tracks bounds over cells, range tombstones and row tombstones") {
    val dir = Files.createTempDirectory("stats-track").toString
    val p = s"$dir/gen-Data.db"
    val w = new SSTableWriter(p, compress = false, summaryInterval = 4)
    w.append(SSTableRow("a".getBytes, Seq(
      Column.Normal("n".getBytes, "v".getBytes, 100L),
      Column.Deleted("o".getBytes, 90L))))
    w.append(SSTableRow("m".getBytes, Seq(
      Column.RangeTombstone("a".getBytes, "z".getBytes, 1700000000, 250L))))
    // row tombstone's mfda extends the max; half-LIVE sentinel must not
    // drag the min down to Long.MinValue
    w.append(SSTableRow("z".getBytes, Nil, Some(RowTombstone(1700000001, 300L))))
    w.close()
    val s = new SSTableReader(p).statistics.get
    assert(s.minTimestamp == 90L && s.maxTimestamp == 300L)
    assert(new String(s.minKey) == "a" && new String(s.maxKey) == "z")
    assert(s.rowCount == 3 && s.tombstoneCount == 3) // Deleted + range + row
    // cell stats (v2) exclude the row tombstone's mfda=300
    assert(s.cellStats.contains(CellStatistics(3L, 90L, 250L)))
    assert(s.mightContainKey("m".getBytes) && !s.mightContainKey("zz".getBytes))

    val dir2 = Files.createTempDirectory("stats-live").toString
    val p2 = s"$dir2/gen-Data.db"
    val w2 = new SSTableWriter(p2, compress = false)
    w2.append(SSTableRow("k".getBytes, Nil, Some(RowTombstone(5, Long.MinValue))))
    w2.close()
    val s2 = new SSTableReader(p2).statistics.get
    assert(s2.minTimestamp == Long.MaxValue && s2.maxTimestamp == Long.MinValue,
      "half-LIVE mfda sentinel shadows nothing and must not enter the ts bounds")
    assert(s2.tombstoneCount == 0,
      "half-LIVE row tombstone shadows nothing and must not count (ADVICE r5)")
  }

  private def writeGen(dir: String, stem: String, rows: Seq[SSTableRow]): Unit = {
    val w = new SSTableWriter(s"$dir/$stem-Data.db", compress = false,
      summaryInterval = 4)
    try rows.sortWith((a, b) => SSTableFiles.compareKeys(a.key, b.key) < 0)
      .foreach(w.append)
    finally w.close()
  }

  test("key-bounds prune: a generation whose range excludes the key is never opened") {
    SSTableMetadataCache.clear()
    val dir = Files.createTempDirectory("stats-bounds").toString
    writeGen(dir, "low", Seq(SSTableRow("aaa".getBytes,
      Seq(Column.Normal("n".getBytes, "vlow".getBytes, 10L)))))
    writeGen(dir, "high", Seq(SSTableRow("mmm".getBytes,
      Seq(Column.Normal("n".getBytes, "vhigh".getBytes, 20L)))))
    val spy = new SpyStorage
    val got = SSTableReader.get(dir, "mmm".getBytes, spy).get
    assert(new String(got.columns.collect {
      case Column.Normal(_, v, _) => new String(v) }.head) == "vhigh")
    // 'low' ([aaa, aaa]) cannot contain 'mmm': only its Statistics.db read
    assert(spy.opensOf("low", SSTableFiles.StatisticsSuffix) == 1)
    for (suf <- Seq(SSTableFiles.DataSuffix, SSTableFiles.IndexSuffix,
        SSTableFiles.SummarySuffix, SSTableFiles.FilterSuffix))
      assert(spy.opensOf("low", suf) == 0, s"pruned generation opened $suf")
  }

  test("tombstone early-out: generations older than a probed row tombstone are never opened") {
    SSTableMetadataCache.clear()
    val dir = Files.createTempDirectory("stats-earlyout").toString
    // old generation: cells at ts <= 100 (maxTimestamp 100)
    writeGen(dir, "old", Seq(SSTableRow("k1".getBytes, Seq(
      Column.Normal("a".getBytes, "stale".getBytes, 80L),
      Column.Normal("b".getBytes, "stale2".getBytes, 100L)))))
    // new generation: row tombstone mfda=500 shadows everything older,
    // plus one live cell written after it
    writeGen(dir, "new", Seq(SSTableRow("k1".getBytes,
      Seq(Column.Normal("a".getBytes, "fresh".getBytes, 600L)),
      Some(RowTombstone(1700000000, 500L)))))
    val spy = new SpyStorage
    val got = SSTableReader.get(dir, "k1".getBytes, spy).get
    assert(got.columns.collect { case Column.Normal(_, v, _) => new String(v) }
      == Seq("fresh"))
    assert(got.tombstone.contains(RowTombstone(1700000000, 500L)))
    assert(spy.opensOf("old", SSTableFiles.StatisticsSuffix) == 1)
    for (suf <- Seq(SSTableFiles.DataSuffix, SSTableFiles.IndexSuffix,
        SSTableFiles.SummarySuffix, SSTableFiles.FilterSuffix))
      assert(spy.opensOf("old", suf) == 0,
        s"tombstone-shadowed generation opened $suf")

    // strictness: an old generation at maxTimestamp == mfda may carry an
    // equal-mfda tombstone with a LARGER ldt that must still win the merge
    SSTableMetadataCache.clear()
    val dir2 = Files.createTempDirectory("stats-equal-mfda").toString
    writeGen(dir2, "older", Seq(SSTableRow("k1".getBytes, Nil,
      Some(RowTombstone(1700009999, 500L))))) // same mfda, larger ldt
    writeGen(dir2, "newer", Seq(SSTableRow("k1".getBytes,
      Seq(Column.Normal("a".getBytes, "live".getBytes, 600L)),
      Some(RowTombstone(1700000000, 500L)))))
    val merged = SSTableReader.get(dir2, "k1".getBytes).get
    assert(merged.tombstone.contains(RowTombstone(1700009999, 500L)),
      "equal-mfda/larger-ldt tombstone in the older generation must win")
  }

  test("stats-less generations (pre-statistics or real-Cassandra) are probed unconditionally") {
    SSTableMetadataCache.clear()
    val dir = Files.createTempDirectory("stats-absent").toString
    writeGen(dir, "old", Seq(SSTableRow("k1".getBytes,
      Seq(Column.Normal("a".getBytes, "oldv".getBytes, 50L)))))
    writeGen(dir, "new", Seq(SSTableRow("k1".getBytes,
      Seq(Column.Normal("b".getBytes, "newv".getBytes, 900L)),
      Some(RowTombstone(1, 100L)))))
    // strip the old generation's stats: it must still merge correctly
    // (probed despite the shadowing tombstone — "unknown" is never pruned)
    LocalStorage.delete(s"$dir/old-Statistics.db")
    val got = SSTableReader.get(dir, "k1".getBytes).get
    assert(got.columns.collect { case Column.Normal(_, v, _) => new String(v) }
      == Seq("newv"))
  }
}
