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
}
