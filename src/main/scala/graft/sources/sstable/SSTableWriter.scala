package graft.sources.sstable

import java.io.{ByteArrayOutputStream, DataOutputStream}

/** Writes a complete 4-file SSTable set (`-Data.db`, `-Index.db`,
  * `-Summary.db`, optional `-CompressionInfo.db`).
  *
  * The reference is a read-only library (SURVEY.md §2.2 — no writer
  * exists); this writer is the new capability that enables round-trip
  * tests and the DSv2 write path. Rows should arrive sorted by key
  * (unsigned byte order) for Summary-based range pruning to be usable;
  * sortedness is the caller's contract (the DSv2 write path requests it
  * from Spark via RequiresDistributionAndOrdering) and is validated here.
  *
  * Streaming: rows are encoded one at a time into a reusable scratch
  * buffer, then streamed into the (optionally chunk-compressing) sink —
  * memory is O(row + chunk), never O(file).
  */
final class SSTableWriter(dataPath: String,
                          compress: Boolean = true,
                          chunkLength: Int = CompressionInfo.DefaultChunkLength,
                          summaryInterval: Int = IndexFile.DefaultSummaryInterval,
                          enforceSorted: Boolean = true,
                          bloomBitsPerKey: Int = FilterFile.DefaultBitsPerKey,
                          algorithm: String = CompressionInfo.SnappyAlgorithm,
                          storage: Storage = LocalStorage) extends AutoCloseable {
  import SSTableFiles._

  private val dataOut = storage.create(dataPath)
  private val snappy =
    if (compress) new CompressedChunkedOutput(dataOut, chunkLength,
      CompressionInfo.algorithmFor(algorithm)) else null

  private val indexOut = storage.create(sibling(dataPath, IndexSuffix))

  private val scratch = new ByteArrayOutputStream(1 << 16)
  private var uncompressedPos = 0L // uncompressed-domain Data.db position
  private var indexPos = 0L // real Cassandra Index.db has no header
  private var rowCount = 0L
  private var lastKey: Array[Byte] = _
  private var closed = false
  // Summary.db's header carries the entry count, so entries are buffered
  // (tiny: 1 per `summaryInterval` rows) and the file written at close.
  private val summaryEntries = scala.collection.mutable.ArrayBuffer.empty[SummaryEntry]
  // Filter.db needs the key count before sizing, so the murmur halves are
  // buffered (16 B/row — ~16 MB per million rows) and the filter built at
  // close. bloomBitsPerKey = 0 disables the filter (and the buffer).
  private val bloomHashes =
    if (bloomBitsPerKey > 0) new scala.collection.mutable.ArrayBuffer[Long]() else null
  // Per-generation planning metadata (min/max LWW timestamp, key bounds,
  // row/tombstone counts) — O(1) state, written as -Statistics.db at close.
  private val stats = new StatisticsFile.Tracker

  def append(row: SSTableRow): Unit = {
    require(!closed, "writer closed")
    if (enforceSorted && lastKey != null && compareKeys(lastKey, row.key) > 0)
      throw new IllegalArgumentException(
        "rows must be appended in unsigned-lexicographic key order")
    lastKey = row.key

    val rowOffset = uncompressedPos
    val enc = new DataOutputStream(scratch)
    // the format invariant real Cassandra guarantees: cells within a row
    // are comparator-sorted by name (sliced reads early-exit on it).
    // Stable, so equal names (not produced by our merge paths) keep
    // caller order. Skipped when already sorted — the common case for
    // merge outputs — to avoid the allocation.
    val sortedRow =
      if (DataFile.namesSorted(row.columns)) row
      else row.copy(columns = row.columns.sortWith((a, b) =>
        compareKeys(a.name, b.name) < 0))
    DataFile.writeRow(enc, sortedRow)
    val bytes = scratch.toByteArray
    scratch.reset()
    if (compress) snappy.write(bytes, 0, bytes.length) else dataOut.write(bytes)
    uncompressedPos += bytes.length

    if (rowCount % summaryInterval == 0)
      summaryEntries += SummaryEntry(row.key, indexPos)
    if (bloomHashes != null) {
      val (h1, h2) = MurmurHash3x64.hash128(row.key)
      bloomHashes += h1
      bloomHashes += h2
    }
    indexPos += IndexFile.writeEntry(indexOut, row.key, rowOffset)
    stats.see(row)
    rowCount += 1
  }

  def close(): Unit = {
    if (closed) return
    closed = true
    if (compress) {
      val info = snappy.finish()
      dataOut.close()
      val ciOut = storage.create(sibling(dataPath, CompressionSuffix))
      try CompressionInfo.write(ciOut, info) finally ciOut.close()
    } else dataOut.close()
    indexOut.close()
    val summaryOut = storage.create(sibling(dataPath, SummarySuffix))
    try IndexFile.writeSummary(summaryOut, summaryInterval, summaryEntries.toSeq)
    finally summaryOut.close()
    if (bloomHashes != null) {
      val bf = FilterFile.build(
        bloomHashes.grouped(2).map(p => (p(0), p(1))), rowCount, bloomBitsPerKey)
      val filterOut = storage.create(sibling(dataPath, FilterSuffix))
      try FilterFile.write(filterOut, bf) finally filterOut.close()
    }
    val statsOut = storage.create(sibling(dataPath, StatisticsSuffix))
    try StatisticsFile.write(statsOut, stats.result()) finally statsOut.close()
  }
}
