package graft.sources.sstable

import java.nio.file.{Files, Paths}
import java.security.MessageDigest
import org.scalatest.funsuite.AnyFunSuite

/** Pins the on-disk byte format (FIXTURES.md §B1 "tiny-plain" golden
  * fixture): a deterministic 3-row SSTable set must hash to these exact
  * digests. If a change here is intentional, bump the format version in
  * the file headers and regenerate. */
class GoldenFormatSpec extends AnyFunSuite {

  private def md5hex(p: String): String =
    MessageDigest.getInstance("MD5").digest(Files.readAllBytes(Paths.get(p)))
      .map(b => f"$b%02x").mkString

  test("tiny-plain golden fixture bytes are stable") {
    val dir = Files.createTempDirectory("golden").toFile
    dir.deleteOnExit()
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

    assert(md5hex(data) == "dc30776cc87bbeefb5b43952cbcfbf0c",
      s"Data.db bytes changed: ${md5hex(data)}")
    assert(md5hex(s"${dir.getPath}/tiny-plain-Index.db") == "deddc9f153c2eb00be52ec9b49b97a0e",
      s"Index.db bytes changed: ${md5hex(s"${dir.getPath}/tiny-plain-Index.db")}")
    assert(md5hex(s"${dir.getPath}/tiny-plain-Summary.db") == "e349a77459ee76de6b8d85ebd5a08b6e",
      s"Summary.db bytes changed: ${md5hex(s"${dir.getPath}/tiny-plain-Summary.db")}")
  }
}
