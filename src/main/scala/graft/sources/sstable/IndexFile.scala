package graft.sources.sstable

import java.io.{DataOutputStream, EOFException}

/** `*-Index.db` + `*-Summary.db` codecs — real Cassandra 1.2 ("ic")
  * layouts, re-implemented from the public format.
  *
  * Index.db (no file header; entries from offset 0), per Cassandra 1.2's
  * `SSTableWriter.IndexWriter.append` + `RowIndexEntry.Serializer`:
  * {{{
  * entry := [u16 keyLen][key][u64 position][u32 promotedSize][promoted…]
  * }}}
  * `position` is the row's start offset in the *uncompressed* domain of
  * Data.db (the reference mixed the two domains, defect SURVEY.md §2.9-3;
  * we stay uncompressed-only). Rows below Cassandra's column_index
  * threshold have `promotedSize = 0`; we always write 0 and skip any
  * promoted bytes on read (the row-level column index is an intra-row
  * seek aid we don't need — Spark prunes at split granularity).
  * Recovered surface: `IndexReader` of `{name, pos}`
  * (SSTableIndexRecordReader.scala:30,49-52).
  *
  * Summary.db, per Cassandra 1.2's `IndexSummary.IndexSummarySerializer`:
  * {{{
  * file  := [u32 indexInterval][u32 entryCount] entry*
  * entry := [u64 indexPosition][u32 keyLen][key]
  * }}}
  * `indexPosition` points INTO Index.db (every `interval`-th entry).
  * Recovered surface: `IndexSummaryReader` of `IndexPosition{location}`
  * (GenerateSSTableIndexSplits.scala:73-88).
  */
object IndexFile {
  /** Real Cassandra Index.db files have no header. */
  val HeaderLen = 0L
  val DefaultSummaryInterval = 128

  def writeEntry(out: DataOutputStream, key: Array[Byte], dataOffset: Long): Int = {
    require(key.length <= 0xffff, s"key too long: ${key.length}")
    out.writeShort(key.length); out.write(key)
    out.writeLong(dataOffset)
    out.writeInt(0) // promotedSize — no promoted column index
    2 + key.length + 8 + 4
  }

  /** Writes a complete Summary.db (header needs the entry count, so the
    * whole — tiny, 1/interval sampled — file is written at once). */
  def writeSummary(out: DataOutputStream, interval: Int,
                   entries: Seq[SummaryEntry]): Unit = {
    out.writeInt(interval)
    out.writeInt(entries.size)
    entries.foreach { e =>
      out.writeLong(e.indexOffset)
      out.writeInt(e.key.length); out.write(e.key)
    }
  }
}

final case class IndexEntry(key: Array[Byte], dataOffset: Long)
final case class SummaryEntry(key: Array[Byte], indexOffset: Long)

/** Iterator over Index.db entries; bound with [[BoundedSeekableInput]] for
  * split-ranged scans. Caller must be positioned at a record boundary
  * (offset 0, or a Summary-provided offset). */
final class IndexReader(in: SeekableInput, endOffset: Long = Long.MaxValue)
    extends Iterator[IndexEntry] with AutoCloseable {
  private val din = in.asDataInput

  def position: Long = in.position
  def hasNext: Boolean = in.position < math.min(endOffset, in.length)
  def next(): IndexEntry =
    try {
      val keyLen = din.readUnsignedShort()
      val key = new Array[Byte](keyLen)
      din.readFully(key)
      val pos = din.readLong()
      val promotedSize = din.readInt()
      if (promotedSize < 0)
        throw new CorruptSSTableException(s"negative promoted size at ${in.position}")
      if (promotedSize > 0) in.seek(in.position + promotedSize)
      IndexEntry(key, pos)
    } catch {
      case e: EOFException =>
        throw new CorruptSSTableException(s"truncated index entry at ${in.position}", e)
    }
  def close(): Unit = in.close()
}

final class SummaryReader(in: SeekableInput) extends AutoCloseable {
  private val din = in.asDataInput
  private var entryCount = -1

  /** Reads header, returns the sampling interval. */
  def readHeader(): Int = {
    val interval = din.readInt()
    entryCount = din.readInt()
    if (interval <= 0 || entryCount < 0)
      throw new CorruptSSTableException(
        s"Summary.db invalid header interval=$interval count=$entryCount")
    interval
  }

  def entries: Iterator[SummaryEntry] = new Iterator[SummaryEntry] {
    require(entryCount >= 0, "readHeader first")
    private var read = 0
    def hasNext: Boolean = read < entryCount
    def next(): SummaryEntry =
      try {
        val pos = din.readLong()
        val keyLen = din.readInt()
        if (keyLen < 0 || keyLen > 0xffff)
          throw new CorruptSSTableException(s"summary key length $keyLen at ${in.position}")
        val key = new Array[Byte](keyLen)
        din.readFully(key)
        read += 1
        SummaryEntry(key, pos)
      } catch {
        case e: EOFException =>
          throw new CorruptSSTableException(s"truncated summary entry at ${in.position}", e)
      }
  }
  def close(): Unit = in.close()
}
