package graft.sources.sstable

import java.io.{DataInput, DataOutput}

/** `*-Filter.db` — the SSTable bloom filter over row keys, in the
  * Cassandra 1.2 ("ic") on-disk layout:
  * {{{
  * filter := [u32 hashCount][u32 wordCount][wordCount × u64 word]   // big-endian
  * }}}
  * matching `BloomFilterSerializer` (int hash count, then the OpenBitSet:
  * int word count + that many longs). Bit `i` lives in word `i >> 6` at
  * in-word position `i & 63` (OpenBitSet layout). Key membership hashes
  * with MurmurHash3 x64-128 (seed 0 — `Murmur3BloomFilter`, the filter
  * type of the 1.2 "ia"+ descriptor versions) and probes
  * `abs((h1 + i·h2) mod numBits)` for `i ∈ [0, hashCount)` — Cassandra's
  * `BloomFilter.getHashBuckets` double-hashing scheme.
  *
  * The reference never consumed Filter.db (its 4-file set stops at
  * Summary, SURVEY.md §2.1) — this is a new capability: the DSv2 scan
  * uses it to skip *whole files* on pushed key-equality lookups, the
  * same negative-lookup elimination Cassandra's read path does. At
  * 100 TB a point lookup touches only the files whose filters admit the
  * key — O(#files) in-memory probes instead of O(#files) index reads.
  *
  * Sizing is writer policy, not format: [[FilterFile.build]] uses the
  * classic bits-per-key heuristic (k = round(ln2 · bitsPerKey)).
  * No false negatives by construction; false positives only cost IO
  * (Spark re-filters rows), never correctness.
  */
object FilterFile {
  /** ~1% false-positive rate at the classic 10 bits/key, 7 hashes. */
  val DefaultBitsPerKey = 10

  final class BloomFilter(val hashCount: Int, val words: Array[Long]) {
    val numBits: Long = words.length.toLong * 64

    private[FilterFile] def set(bit: Long): Unit =
      words((bit >> 6).toInt) |= 1L << (bit & 63)
    private def get(bit: Long): Boolean =
      (words((bit >> 6).toInt) & (1L << (bit & 63))) != 0

    /** Cassandra 1.2 BloomFilter.getHashBuckets: double hashing over the
      * murmur3 128-bit halves. */
    private[FilterFile] def addHash(h1: Long, h2: Long): Unit = {
      var i = 0
      while (i < hashCount) { set(math.abs((h1 + i * h2) % numBits)); i += 1 }
    }

    def mightContain(key: Array[Byte]): Boolean = {
      val (h1, h2) = MurmurHash3x64.hash128(key)
      var i = 0
      while (i < hashCount) {
        if (!get(math.abs((h1 + i * h2) % numBits))) return false
        i += 1
      }
      true
    }
  }

  /** Build a filter for `n` keys whose murmur halves were pre-collected
    * (the streaming writer can't know `n` until close). */
  def build(hashes: Iterator[(Long, Long)], n: Long, bitsPerKey: Int): BloomFilter = {
    require(bitsPerKey > 0, s"bitsPerKey must be positive: $bitsPerKey")
    val nWords = math.max(1L, (n * bitsPerKey + 63) / 64)
    require(nWords <= Int.MaxValue, s"bloom filter too large: $nWords words")
    val k = math.max(1, math.round(0.6931471805599453 * bitsPerKey).toInt)
    val bf = new BloomFilter(k, new Array[Long](nWords.toInt))
    hashes.foreach { case (h1, h2) => bf.addHash(h1, h2) }
    bf
  }

  def write(out: DataOutput, bf: BloomFilter): Unit = {
    out.writeInt(bf.hashCount)
    out.writeInt(bf.words.length)
    bf.words.foreach(out.writeLong)
  }

  def read(in: DataInput): BloomFilter = {
    val hashCount = in.readInt()
    if (hashCount <= 0 || hashCount > 64)
      throw new CorruptSSTableException(s"implausible bloom hash count $hashCount")
    val nWords = in.readInt()
    if (nWords < 0)
      throw new CorruptSSTableException(s"negative bloom word count $nWords")
    val words = new Array[Long](nWords)
    var i = 0
    while (i < nWords) { words(i) = in.readLong(); i += 1 }
    new BloomFilter(hashCount, words)
  }
}

/** MurmurHash3 x64 128-bit as Cassandra 1.2 computes it
  * (`MurmurHash.hash3_x64_128`, seed 0) — Austin Appleby's public-domain
  * algorithm with Cassandra's well-known Java quirk: tail bytes are
  * SIGN-EXTENDED (`(long) data.get(i)`, no `& 0xff`), unlike the
  * canonical C/Guava variant. Every Cassandra driver reproduces this
  * deliberately; diverging from it would make bloom probes against real
  * Cassandra-written Filter.db files yield false NEGATIVES for keys whose
  * tail (len % 16 trailing bytes) contains a byte ≥ 0x80 — silently
  * dropping present rows on point lookups. Body blocks remain unsigned
  * little-endian, identical to canonical. For ASCII-only tails (all
  * bytes < 0x80) the two variants agree.
  *
  * FORMAT BREAK (round 3): builds prior to this change hashed tails
  * UNSIGNED, so a Filter.db they wrote can yield false negatives for keys
  * whose tail bytes are ≥ 0x80 when probed by this build. This is a
  * pre-release format; regenerate any such filters (rewrite the fileset,
  * or delete Filter.db — absent filters never prune). */
object MurmurHash3x64 {
  private final val C1 = 0x87c37b91114253d5L
  private final val C2 = 0x4cf5ad432745937fL

  @inline private def rotl(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))

  @inline private def fmix(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  @inline private def getLongLE(d: Array[Byte], i: Int): Long =
    (d(i) & 0xffL) | ((d(i + 1) & 0xffL) << 8) | ((d(i + 2) & 0xffL) << 16) |
      ((d(i + 3) & 0xffL) << 24) | ((d(i + 4) & 0xffL) << 32) |
      ((d(i + 5) & 0xffL) << 40) | ((d(i + 6) & 0xffL) << 48) |
      ((d(i + 7) & 0xffL) << 56)

  def hash128(data: Array[Byte], seed: Long = 0L): (Long, Long) = {
    val len = data.length
    val nBlocks = len / 16
    var h1 = seed
    var h2 = seed

    var b = 0
    while (b < nBlocks) {
      var k1 = getLongLE(data, b * 16)
      var k2 = getLongLE(data, b * 16 + 8)
      k1 *= C1; k1 = rotl(k1, 31); k1 *= C2; h1 ^= k1
      h1 = rotl(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= C2; k2 = rotl(k2, 33); k2 *= C1; h2 ^= k2
      h2 = rotl(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      b += 1
    }

    // fallthrough-free tail: accumulate the remaining bytes explicitly
    // (equivalent to Cassandra's switch with its fallthrough cases).
    // data(i).toLong sign-extends — Cassandra's `(long) data.get(i)`
    // quirk; do NOT mask with & 0xffL here (that's the Guava variant,
    // and it breaks interop with real Cassandra Filter.db files).
    val tail = nBlocks * 16
    var k1 = 0L
    var k2 = 0L
    val rem = len & 15
    if (rem > 8) {
      var i = rem - 1
      while (i >= 8) { k2 ^= data(tail + i).toLong << ((i - 8) * 8); i -= 1 }
      k2 *= C2; k2 = rotl(k2, 33); k2 *= C1; h2 ^= k2
    }
    if (rem > 0) {
      var i = math.min(rem, 8) - 1
      while (i >= 0) { k1 ^= data(tail + i).toLong << (i * 8); i -= 1 }
      k1 *= C1; k1 = rotl(k1, 31); k1 *= C2; h1 ^= k1
    }

    h1 ^= len
    h2 ^= len
    h1 += h2
    h2 += h1
    h1 = fmix(h1)
    h2 = fmix(h2)
    h1 += h2
    h2 += h1
    (h1, h2)
  }
}
