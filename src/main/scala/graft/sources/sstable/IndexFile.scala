package graft.sources.sstable

import java.io.{DataOutputStream, EOFException}

/** `*-Index.db` + `*-Summary.db` codecs.
  *
  * Index: `[u32 magic GSSI][u16 version]` then entries
  * `[u16 keyLen][key][i64 dataOffset]` — one per row, dataOffset in the
  * *uncompressed* domain of Data.db (the reference mixed the two domains,
  * defect SURVEY.md §2.9-3; we stay uncompressed-only). Recovered surface:
  * `IndexReader` of `{name, pos}` (SSTableIndexRecordReader.scala:30,49-52).
  *
  * Summary: `[u32 magic GSSU][u16 version][u32 interval]` then entries
  * `[u16 keyLen][key][i64 indexOffset]` — every `interval`-th index entry,
  * offset pointing INTO Index.db. Recovered surface: `IndexSummaryReader`
  * of `IndexPosition{location}` (GenerateSSTableIndexSplits.scala:73-88).
  */
object IndexFile {
  val Magic = 0x47535349 // "GSSI"
  val SummaryMagic = 0x47535355 // "GSSU"
  val Version = 1
  val HeaderLen = 6L
  val SummaryHeaderLen = 10L
  val DefaultSummaryInterval = 128

  def writeHeader(out: DataOutputStream): Unit = {
    out.writeInt(Magic); out.writeShort(Version)
  }
  def writeEntry(out: DataOutputStream, key: Array[Byte], dataOffset: Long): Int = {
    out.writeShort(key.length); out.write(key); out.writeLong(dataOffset)
    2 + key.length + 8
  }
  def writeSummaryHeader(out: DataOutputStream, interval: Int): Unit = {
    out.writeInt(SummaryMagic); out.writeShort(Version); out.writeInt(interval)
  }
  def writeSummaryEntry(out: DataOutputStream, key: Array[Byte], indexOffset: Long): Unit = {
    out.writeShort(key.length); out.write(key); out.writeLong(indexOffset)
  }
}

final case class IndexEntry(key: Array[Byte], dataOffset: Long)
final case class SummaryEntry(key: Array[Byte], indexOffset: Long)

/** Iterator over Index.db entries; bound with [[BoundedSeekableInput]] for
  * split-ranged scans. Caller must be positioned at a record boundary
  * (use [[readHeader]] from 0, or a Summary-provided offset). */
final class IndexReader(in: SeekableInput, endOffset: Long = Long.MaxValue)
    extends Iterator[IndexEntry] with AutoCloseable {
  private val din = in.asDataInput

  def readHeader(): Long = {
    val magic = din.readInt()
    if (magic != IndexFile.Magic)
      throw new CorruptSSTableException(f"Index.db bad magic 0x$magic%08x")
    val v = din.readUnsignedShort()
    if (v != IndexFile.Version)
      throw new CorruptSSTableException(s"Index.db unsupported version $v")
    IndexFile.HeaderLen
  }

  def position: Long = in.position
  def hasNext: Boolean = in.position < math.min(endOffset, in.length)
  def next(): IndexEntry =
    try {
      val keyLen = din.readUnsignedShort()
      val key = new Array[Byte](keyLen)
      din.readFully(key)
      IndexEntry(key, din.readLong())
    } catch {
      case e: EOFException =>
        throw new CorruptSSTableException(s"truncated index entry at ${in.position}", e)
    }
  def close(): Unit = in.close()
}

final class SummaryReader(in: SeekableInput) extends AutoCloseable {
  private val din = in.asDataInput

  /** Reads header, returns the sampling interval. */
  def readHeader(): Int = {
    val magic = din.readInt()
    if (magic != IndexFile.SummaryMagic)
      throw new CorruptSSTableException(f"Summary.db bad magic 0x$magic%08x")
    val v = din.readUnsignedShort()
    if (v != IndexFile.Version)
      throw new CorruptSSTableException(s"Summary.db unsupported version $v")
    din.readInt()
  }

  def entries: Iterator[SummaryEntry] = new Iterator[SummaryEntry] {
    def hasNext: Boolean = in.position < in.length
    def next(): SummaryEntry =
      try {
        val keyLen = din.readUnsignedShort()
        val key = new Array[Byte](keyLen)
        din.readFully(key)
        SummaryEntry(key, din.readLong())
      } catch {
        case e: EOFException =>
          throw new CorruptSSTableException(s"truncated summary entry at ${in.position}", e)
      }
  }
  def close(): Unit = in.close()
}
