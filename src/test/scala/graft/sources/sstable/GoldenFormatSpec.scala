package graft.sources.sstable

import java.nio.file.{Files, Paths}
import java.security.MessageDigest
import org.scalatest.funsuite.AnyFunSuite

/** Pins the on-disk byte format (FIXTURES.md §B1 "tiny-plain" golden
  * fixture): a deterministic 3-row SSTable set must hash to these exact
  * digests — and the Data.db bytes are additionally asserted field-by-field
  * against the Cassandra 1.2 ("ic") wire layout, so the pin can't drift
  * into a self-consistent-but-wrong format again. */
class GoldenFormatSpec extends AnyFunSuite {

  private def md5hex(p: String): String =
    MessageDigest.getInstance("MD5").digest(Files.readAllBytes(Paths.get(p)))
      .map(b => f"$b%02x").mkString

  private def writeFixture(dir: java.io.File): String = {
    val data = s"${dir.getPath}/tiny-plain-Data.db"
    val w = new SSTableWriter(data, compress = false, summaryInterval = 2)
    w.append(SSTableRow("apple".getBytes, Seq(
      Column.Normal("c1".getBytes, "v1".getBytes, 1000L),
      Column.Normal("c2".getBytes, "v2".getBytes, 2000L))))
    w.append(SSTableRow("banana".getBytes, Seq(
      Column.Deleted("c1".getBytes, 3000L))))
    w.append(SSTableRow("cherry".getBytes, Seq(
      Column.Expiring("c3".getBytes, "v3".getBytes, 60L, 1700000000000L, 4000L))))
    w.close()
    data
  }

  test("tiny-plain golden fixture bytes are stable") {
    val dir = Files.createTempDirectory("golden").toFile
    dir.deleteOnExit()
    val data = writeFixture(dir)
    val got = Seq(
      md5hex(data),
      md5hex(s"${dir.getPath}/tiny-plain-Index.db"),
      md5hex(s"${dir.getPath}/tiny-plain-Summary.db"))
    val want = Seq(
      "52e8da44b488560621773996544420e4",
      "c294d1dc7e4a6d549b99d2636e3f66af",
      "9fcb4efcb30035f7c2398c070431bf45")
    assert(got == want, s"fixture bytes changed (Data/Index/Summary): $got")
  }

  test("reader accepts a hand-authored fileset (bytes written from the format doc, not our writer)") {
    // The inverse direction of the field-by-field pin: these bytes are
    // laid down with raw DataOutputStream calls straight from the
    // Cassandra 1.2 layout — if the reader parses them, it parses
    // externally produced files, not merely its own writer's output.
    val dir = Files.createTempDirectory("golden-hand").toFile
    dir.deleteOnExit()
    val dataPath = s"${dir.getPath}/hand-Data.db"

    def out(p: String) = new java.io.DataOutputStream(new java.io.FileOutputStream(p))
    val d = out(dataPath)
    // row "aa": one NORMAL column c=v ts=7; body = 12 + 4 + (2+1+1+8+4+1)
    d.writeShort(2); d.write("aa".getBytes)
    d.writeLong(12L + 4 + 17)
    d.writeInt(Int.MaxValue); d.writeLong(Long.MinValue) // LIVE
    d.writeInt(1)
    d.writeShort(1); d.write("c".getBytes)
    d.writeByte(0); d.writeLong(7L)
    d.writeInt(1); d.write("v".getBytes)
    val row2Off = 2 + 2 + 8 + 12 + 4 + 17
    // row "bb": one DELETED column ts=9_000_000 (localDeletionTime 9s)
    d.writeShort(2); d.write("bb".getBytes)
    d.writeLong(12L + 4 + (2 + 1 + 1 + 8 + 4 + 4))
    d.writeInt(Int.MaxValue); d.writeLong(Long.MinValue)
    d.writeInt(1)
    d.writeShort(1); d.write("d".getBytes)
    d.writeByte(0x01); d.writeLong(9000000L)
    d.writeInt(4); d.writeInt(9)
    d.close()

    val ix = out(s"${dir.getPath}/hand-Index.db")
    ix.writeShort(2); ix.write("aa".getBytes); ix.writeLong(0L); ix.writeInt(0)
    ix.writeShort(2); ix.write("bb".getBytes); ix.writeLong(row2Off.toLong); ix.writeInt(0)
    ix.close()

    val sm = out(s"${dir.getPath}/hand-Summary.db")
    sm.writeInt(128); sm.writeInt(1) // interval, entryCount
    sm.writeLong(0L); sm.writeInt(2); sm.write("aa".getBytes)
    sm.close()

    val r = new SSTableReader(dataPath)
    val rows = r.rows().toSeq
    assert(rows.map(x => new String(x.key)) == Seq("aa", "bb"))
    val Column.Normal(nn, nv, nts) = rows.head.columns.head: @unchecked
    assert(new String(nn) == "c" && new String(nv) == "v" && nts == 7L)
    val Column.Deleted(dn, dts) = rows(1).columns.head: @unchecked
    assert(new String(dn) == "d" && dts == 9000000L)
    // index + summary are readable and consistent
    val idx = r.indexReader().toSeq
    assert(idx.map(_.dataOffset) == Seq(0L, row2Off.toLong))
    assert(r.planSplits(1L << 20).nonEmpty)
    // point-read path over the hand-authored files (no Filter.db: bloom
    // is optional, absent filter never prunes)
    assert(r.get("bb".getBytes).isDefined)
    assert(r.get("ab".getBytes).isEmpty)
  }

  test("Data.db bytes follow the Cassandra 1.2 wire layout, field by field") {
    val dir = Files.createTempDirectory("golden-wire").toFile
    dir.deleteOnExit()
    val data = writeFixture(dir)
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(
      Files.readAllBytes(Paths.get(data))))

    // row 1: "apple", two NORMAL columns — no file header before it
    assert(in.readUnsignedShort() == 5)
    val k = new Array[Byte](5); in.readFully(k)
    assert(new String(k) == "apple")
    // rowSize = deletionInfo(12) + count(4) + 2 × (2+2+1+8+4+2) = 54
    assert(in.readLong() == 54L)
    assert(in.readInt() == Int.MaxValue) // LIVE localDeletionTime
    assert(in.readLong() == Long.MinValue) // LIVE markedForDeleteAt
    assert(in.readInt() == 2) // column count
    assert(in.readUnsignedShort() == 2) // name "c1"
    in.skipBytes(2)
    assert(in.readUnsignedByte() == 0) // flags: plain column
    assert(in.readLong() == 1000L) // timestamp
    assert(in.readInt() == 2) // value length "v1"
    in.skipBytes(2 + 2 + 2 + 1 + 8 + 4 + 2) // rest of row 1

    // row 2: "banana", one DELETED column
    assert(in.readUnsignedShort() == 6)
    in.skipBytes(6)
    assert(in.readLong() == (12L + 4 + (2 + 2 + 1 + 8 + 4 + 4)))
    in.skipBytes(12 + 4 + 2 + 2)
    assert(in.readUnsignedByte() == DataFile.DeletionMask)
    assert(in.readLong() == 3000L)
    assert(in.readInt() == 4) // DELETED value = 4-byte localDeletionTime
    assert(in.readInt() == 0) // 3000µs / 1e6 = 0s

    // row 3: "cherry", one EXPIRING column
    assert(in.readUnsignedShort() == 6)
    in.skipBytes(6)
    assert(in.readLong() == (12L + 4 + (2 + 2 + 1 + 4 + 4 + 8 + 4 + 2)))
    in.skipBytes(12 + 4 + 2 + 2)
    assert(in.readUnsignedByte() == DataFile.ExpirationMask)
    assert(in.readInt() == 60) // ttl seconds
    assert(in.readInt() == 1700000000) // localExpirationTime seconds
    assert(in.readLong() == 4000L)
    assert(in.readInt() == 2)
    in.skipBytes(2)
    assert(in.available() == 0, "trailing bytes after last row")
  }

  test("range tombstone bytes follow RangeTombstone.Serializer, field by field") {
    val dir = Files.createTempDirectory("golden-rt").toFile
    dir.deleteOnExit()
    val path = s"${dir.getPath}/rt-Data.db"
    val w = new SSTableWriter(path, compress = false)
    w.append(SSTableRow("row".getBytes, Seq(
      Column.RangeTombstone("bb".getBytes, "dd".getBytes, 1700000000, 5000L))))
    w.close()
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(
      Files.readAllBytes(Paths.get(path))))
    assert(in.readUnsignedShort() == 3)
    in.skipBytes(3) // "row"
    // rowSize = deletionInfo(12) + count(4) + (2+2 +1 +2+2 +4 +8) = 37
    assert(in.readLong() == 37L)
    assert(in.readInt() == Int.MaxValue) // LIVE row deletion
    assert(in.readLong() == Long.MinValue)
    assert(in.readInt() == 1)
    assert(in.readUnsignedShort() == 2) // min bound = the column name slot
    val mn = new Array[Byte](2); in.readFully(mn)
    assert(new String(mn) == "bb")
    assert(in.readUnsignedByte() == DataFile.RangeTombstoneMask) // 0x10
    assert(in.readUnsignedShort() == 2) // max bound
    val mx = new Array[Byte](2); in.readFully(mx)
    assert(new String(mx) == "dd")
    assert(in.readInt() == 1700000000) // localDeletionTime (s)
    assert(in.readLong() == 5000L) // markedForDeleteAt (µs)
    assert(in.available() == 0)
  }

  test("counter column bytes follow ColumnSerializer's counter layouts, field by field") {
    val dir = Files.createTempDirectory("golden-cnt").toFile
    dir.deleteOnExit()
    val path = s"${dir.getPath}/cnt-Data.db"
    val w = new SSTableWriter(path, compress = false)
    w.append(SSTableRow("row".getBytes, Seq(
      Column.Counter("aa".getBytes, Array[Byte](1, 2, 3), 777L, 9000L),
      Column.CounterUpdate("bb".getBytes, Array[Byte](9), 9500L))))
    w.close()
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(
      Files.readAllBytes(Paths.get(path))))
    assert(in.readUnsignedShort() == 3)
    in.skipBytes(3) // "row"
    // rowSize = 12 + 4 + counter(2+2+1+8+8+4+3) + update(2+2+1+8+4+1)
    assert(in.readLong() == (12L + 4 + 28 + 18))
    in.skipBytes(12) // LIVE row deletion
    assert(in.readInt() == 2)
    // CounterColumn: name, 0x04, i64 timestampOfLastDelete, i64 ts, value
    assert(in.readUnsignedShort() == 2)
    in.skipBytes(2) // "aa"
    assert(in.readUnsignedByte() == DataFile.CounterMask) // 0x04
    assert(in.readLong() == 777L) // timestampOfLastDelete
    assert(in.readLong() == 9000L) // timestamp
    assert(in.readInt() == 3) // context length
    in.skipBytes(3)
    // CounterUpdateColumn: name, 0x08, NORMAL layout
    assert(in.readUnsignedShort() == 2)
    in.skipBytes(2) // "bb"
    assert(in.readUnsignedByte() == DataFile.CounterUpdateMask) // 0x08
    assert(in.readLong() == 9500L)
    assert(in.readInt() == 1)
    in.skipBytes(1)
    assert(in.available() == 0)
  }

  test("Statistics.db bytes are stable, field by field (own layout, magic-guarded)") {
    // A drift here would be silent: readers treat unrecognized bytes as
    // "no statistics" and every optimization (early-out, bounds prune,
    // count pushdown, size estimates) quietly degrades to worst-case.
    val dir = Files.createTempDirectory("golden-stats").toFile
    dir.deleteOnExit()
    val data = writeFixture(dir) // apple/banana/cherry, ts 1000..4000
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(
      Files.readAllBytes(Paths.get(
        SSTableFiles.sibling(data, SSTableFiles.StatisticsSuffix)))))
    assert(in.readInt() == 0x47525354) // 'GRST'
    assert(in.readInt() == 3) // version (v2: + cell statistics; v3: + namesSorted)
    assert(in.readLong() == 1000L) // min shadowing timestamp
    assert(in.readLong() == 4000L) // max shadowing timestamp
    assert(in.readUnsignedShort() == 5)
    val mn = new Array[Byte](5); in.readFully(mn)
    assert(new String(mn) == "apple")
    assert(in.readUnsignedShort() == 6)
    val mx = new Array[Byte](6); in.readFully(mx)
    assert(new String(mx) == "cherry")
    assert(in.readLong() == 3L) // rows
    assert(in.readLong() == 1L) // tombstones: banana's DELETED cell
    assert(in.readLong() == 4L) // cells: 2 + 1 + 1
    assert(in.readLong() == 1000L) // min cell timestamp
    assert(in.readLong() == 4000L) // max cell timestamp
    assert(in.readBoolean()) // namesSorted: the writer normalizes cell order
    assert(in.available() == 0)
  }

  test("a v1 Statistics.db still reads (cellStats absent)") {
    // previous releases wrote version 1 without cell statistics; those
    // sidecars must keep serving row-level consumers, with cell-level
    // consumers declining
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(0x47525354); out.writeInt(1)
    out.writeLong(10L); out.writeLong(20L)
    out.writeShort(1); out.write("a".getBytes)
    out.writeShort(1); out.write("z".getBytes)
    out.writeLong(7L); out.writeLong(2L)
    val got = StatisticsFile.read(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))).get
    assert(got.rowCount == 7L && got.tombstoneCount == 2L)
    assert(got.cellStats.isEmpty)
    assert(!got.namesSorted)
  }

  test("a v2 Statistics.db still reads (namesSorted defaults false)") {
    // v2 sidecars (round-6 releases) carry cell statistics but no
    // sorted-names flag; sliced reads of those generations must take the
    // order-independent walk
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(0x47525354); out.writeInt(2)
    out.writeLong(10L); out.writeLong(20L)
    out.writeShort(1); out.write("a".getBytes)
    out.writeShort(1); out.write("z".getBytes)
    out.writeLong(7L); out.writeLong(2L)
    out.writeLong(9L); out.writeLong(10L); out.writeLong(20L)
    val got = StatisticsFile.read(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))).get
    assert(got.cellStats.contains(CellStatistics(9L, 10L, 20L)))
    assert(!got.namesSorted)
  }
}
