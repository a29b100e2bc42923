package graft.sources.sstable

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.util.Random
import org.scalatest.funsuite.AnyFunSuite

/** Filter.db codec pins: the murmur3 x64-128 hash reproduces Cassandra
  * 1.2's `MurmurHash.hash3_x64_128` (seed 0) — including its signature
  * Java quirk of SIGN-EXTENDING tail bytes, which every Cassandra driver
  * deliberately copies and which diverges from Guava/canonical murmur3
  * whenever a tail byte is ≥ 0x80. Pinned two ways: golden vectors from
  * an independent transcription of Cassandra's published algorithm, and
  * agreement with Guava on inputs whose tails are ASCII-safe (where the
  * variants coincide). Plus: serialization round-trip, the
  * no-false-negative guarantee, a sane false-positive rate, and the
  * exact wire layout. */
class FilterFileSpec extends AnyFunSuite {

  test("murmur3 matches Guava where the variants agree (ASCII-safe tails)") {
    val rnd = new Random(42)
    val cases = Seq(
      Array.emptyByteArray,
      "a".getBytes, "abc".getBytes, "0123456789abcde".getBytes, // 15 = max tail
      "0123456789abcdef".getBytes, // exactly one block
      "The quick brown fox jumps over the lazy dog".getBytes) ++
      (0 until 50).map { _ =>
        val b = new Array[Byte](rnd.nextInt(64)); rnd.nextBytes(b)
        // body blocks may hold any bytes (identical in both variants);
        // clamp only the tail (len % 16 trailing bytes) to ASCII range
        val tail = b.length - (b.length & 15)
        (tail until b.length).foreach(i => b(i) = (b(i) & 0x7f).toByte)
        b
      }
    cases.foreach { data =>
      val (h1, h2) = MurmurHash3x64.hash128(data)
      val g = com.google.common.hash.Hashing.murmur3_128()
        .hashBytes(data).asBytes() // 16 bytes: h1 LE, h2 LE
      def le(off: Int): Long = (0 until 8).map(i => (g(off + i) & 0xffL) << (8 * i)).reduce(_ | _)
      assert(h1 == le(0) && h2 == le(8),
        s"murmur mismatch for ${data.length} bytes: ($h1,$h2) vs (${le(0)},${le(8)})")
    }
  }

  test("murmur3 reproduces Cassandra's sign-extended tail (golden vectors)") {
    // Vectors computed by an independent big-integer transcription of
    // Cassandra 1.2's MurmurHash.hash3_x64_128 (sign-extended tail bytes).
    def bytes(is: Int*): Array[Byte] = is.map(_.toByte).toArray
    val vectors: Seq[(Array[Byte], Long, Long)] = Seq(
      (bytes(0x80), -5284281814142962636L, 7980414882014114757L),
      (bytes(0xff, 0xfe, 0xfd), 4778542740094909933L, -8472617770952608660L),
      (bytes(240 to 254: _*), -7737243313669454511L, 6850168737387597374L),
      (bytes((Seq.fill(16)(1) ++ Seq(0x90, 0x05, 0xff)): _*),
        3893739582372264040L, 2375114460947737859L),
      (bytes(Seq.fill(5)(Seq(0xde, 0xad, 0xbe, 0xef)).flatten: _*),
        -6709390677619628861L, 8716583155612461043L),
      // ASCII vectors (agree with Guava) to anchor the shared body path
      (bytes(), 0L, 0L),
      ("abc".getBytes, -5434086359492102041L, 4297124817637354834L),
      ("0123456789abcdef".getBytes, 5467490433528156583L, -8663980805763692326L))
    vectors.foreach { case (data, e1, e2) =>
      val (h1, h2) = MurmurHash3x64.hash128(data)
      assert(h1 == e1 && h2 == e2,
        s"cassandra murmur mismatch for ${data.toSeq}: got ($h1,$h2), want ($e1,$e2)")
    }
    // and the divergence itself: a high tail byte must NOT match Guava
    val high = bytes(0x80)
    val g = com.google.common.hash.Hashing.murmur3_128().hashBytes(high).asBytes()
    def le(off: Int): Long = (0 until 8).map(i => (g(off + i) & 0xffL) << (8 * i)).reduce(_ | _)
    assert(MurmurHash3x64.hash128(high)._1 != le(0),
      "expected Cassandra variant to diverge from Guava on a 0x80 tail byte")
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
