package graft.sources.sstable

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.util.Random
import org.scalatest.funsuite.AnyFunSuite

/** Filter.db codec pins: the murmur3 x64-128 hash is checked against an
  * independent public implementation (Guava's `Hashing.murmur3_128`, on
  * the Spark classpath) — the property that makes our Filter.db
  * interoperable with real Cassandra 1.2 files, which use the same
  * algorithm. Plus: serialization round-trip, the no-false-negative
  * guarantee, a sane false-positive rate, and the exact wire layout. */
class FilterFileSpec extends AnyFunSuite {

  test("murmur3 x64-128 matches Guava's independent implementation") {
    val rnd = new Random(42)
    val cases = Seq(
      Array.emptyByteArray,
      "a".getBytes, "abc".getBytes, "0123456789abcde".getBytes, // 15 = max tail
      "0123456789abcdef".getBytes, // exactly one block
      "The quick brown fox jumps over the lazy dog".getBytes) ++
      (0 until 50).map { _ => val b = new Array[Byte](rnd.nextInt(64)); rnd.nextBytes(b); b }
    cases.foreach { data =>
      val (h1, h2) = MurmurHash3x64.hash128(data)
      val g = com.google.common.hash.Hashing.murmur3_128()
        .hashBytes(data).asBytes() // 16 bytes: h1 LE, h2 LE
      def le(off: Int): Long = (0 until 8).map(i => (g(off + i) & 0xffL) << (8 * i)).reduce(_ | _)
      assert(h1 == le(0) && h2 == le(8),
        s"murmur mismatch for ${data.length} bytes: ($h1,$h2) vs (${le(0)},${le(8)})")
    }
  }

  test("build → serialize → read round-trip preserves membership") {
    val keys = (0 until 1000).map(i => s"row-$i".getBytes)
    val hashes = keys.map(k => MurmurHash3x64.hash128(k))
    val bf = FilterFile.build(hashes.iterator, keys.size, FilterFile.DefaultBitsPerKey)
    val bos = new ByteArrayOutputStream()
    FilterFile.write(new DataOutputStream(bos), bf)
    val back = FilterFile.read(new DataInputStream(new ByteArrayInputStream(bos.toByteArray)))
    assert(back.hashCount == bf.hashCount && back.words.sameElements(bf.words))
    // no false negatives — ever
    keys.foreach(k => assert(back.mightContain(k), s"false negative for ${new String(k)}"))
  }

  test("false-positive rate is near the designed ~1% at 10 bits/key") {
    val keys = (0 until 5000).map(i => s"present-$i".getBytes)
    val bf = FilterFile.build(keys.iterator.map(MurmurHash3x64.hash128(_)), keys.size, 10)
    val fp = (0 until 5000).count(i => bf.mightContain(s"absent-$i".getBytes))
    assert(fp < 250, s"false-positive rate implausibly high: $fp/5000") // 5% ≫ designed 1%
    assert(fp > 0 || true) // informational; zero is fine at this scale
  }

  test("wire layout: int hashCount, int wordCount, big-endian words") {
    val bf = FilterFile.build(Iterator((0x1122334455667788L, 0x0102030405060708L)), 1, 10)
    val bos = new ByteArrayOutputStream()
    FilterFile.write(new DataOutputStream(bos), bf)
    val bytes = bos.toByteArray
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    assert(in.readInt() == 7, "10 bits/key ⇒ round(ln2·10) = 7 hashes")
    val nWords = in.readInt()
    assert(nWords == bf.words.length && bytes.length == 8 + 8 * nWords)
  }

  test("corrupt header fails loudly") {
    val bad = new DataInputStream(new ByteArrayInputStream(
      Array[Byte](0, 0, 0, 99, 0, 0, 0, 1))) // hashCount 99 > 64
    assertThrows[CorruptSSTableException](FilterFile.read(bad))
  }
}
