package graft.sources.sstable

import java.io.{DataOutputStream, EOFException}

/** `*-Data.db` row codec.
  *
  * Re-implements the recovered `DataReader` surface (SURVEY.md §1.4;
  * call sites SSTableDataRecordReader.scala:47,85-94): an iterator of
  * rows over a seekable (uncompressed-domain) stream, with `position`
  * exposed so callers can bound a scan to a split's byte range.
  *
  * Layout (big-endian): file header `[u32 magic GSSD][u16 version]`, then
  * rows `[u16 keyLen][key][u32 nCols][cols…]`; column =
  * `[u16 nameLen][name][u8 state][i64 timestampMicros]` +
  * state-dependent payload: NORMAL `[u32 valLen][value]`, DELETED nothing
  * (WritableColumn.java:51-58), EXPIRING `[i64 ttlSecs][i64 expiresMillis]
  * [u32 valLen][value]` (WritableColumn.java:64-72).
  *
  * Corruption fails loudly ([[CorruptSSTableException]]) instead of the
  * reference's silent catch-and-truncate (SSTableDataRecordReader.scala:95-97).
  */
object DataFile {
  val Magic = 0x47535344 // "GSSD"
  val Version = 1
  val HeaderLen = 6L

  val StateNormal = 0
  val StateDeleted = 1
  val StateExpiring = 2

  def writeHeader(out: DataOutputStream): Unit = {
    out.writeInt(Magic)
    out.writeShort(Version)
  }

  def writeRow(out: DataOutputStream, row: SSTableRow): Int = {
    var bytes = 0
    def u16(n: Int): Unit = { out.writeShort(n); bytes += 2 }
    def u32(n: Int): Unit = { out.writeInt(n); bytes += 4 }
    def i64(n: Long): Unit = { out.writeLong(n); bytes += 8 }
    def u8(n: Int): Unit = { out.writeByte(n); bytes += 1 }
    def arr(a: Array[Byte]): Unit = { out.write(a); bytes += a.length }

    require(row.key.length <= 0xffff, s"key too long: ${row.key.length}")
    u16(row.key.length); arr(row.key)
    u32(row.columns.size)
    row.columns.foreach { c =>
      require(c.name.length <= 0xffff, s"column name too long: ${c.name.length}")
      u16(c.name.length); arr(c.name)
      c match {
        case Column.Normal(_, v, ts) =>
          u8(StateNormal); i64(ts); u32(v.length); arr(v)
        case Column.Deleted(_, ts) =>
          u8(StateDeleted); i64(ts)
        case Column.Expiring(_, v, ttl, exp, ts) =>
          u8(StateExpiring); i64(ts); i64(ttl); i64(exp); u32(v.length); arr(v)
      }
    }
    bytes
  }
}

/** Streaming row iterator over an uncompressed-domain stream, optionally
  * bounded to `[in.position, endOffset)`. The caller seeks `in` to a row
  * boundary first (header or an Index-derived offset). */
final class DataReader(in: SeekableInput, endOffset: Long = Long.MaxValue)
    extends Iterator[SSTableRow] with AutoCloseable {
  private val din = in.asDataInput

  /** Validate header; returns offset of first row. Call only when
    * positioned at 0. */
  def readHeader(): Long = {
    val magic = din.readInt()
    if (magic != DataFile.Magic)
      throw new CorruptSSTableException(f"Data.db bad magic 0x$magic%08x")
    val v = din.readUnsignedShort()
    if (v != DataFile.Version)
      throw new CorruptSSTableException(s"Data.db unsupported version $v")
    DataFile.HeaderLen
  }

  def position: Long = in.position

  def hasNext: Boolean = in.position < math.min(endOffset, in.length)

  def next(): SSTableRow = {
    if (!hasNext) throw new NoSuchElementException
    try {
      val keyLen = din.readUnsignedShort()
      val key = new Array[Byte](keyLen)
      din.readFully(key)
      val nCols = din.readInt()
      if (nCols < 0)
        throw new CorruptSSTableException(s"negative column count $nCols at ${in.position}")
      val cols = new Array[Column](nCols)
      var i = 0
      while (i < nCols) {
        val nameLen = din.readUnsignedShort()
        val name = new Array[Byte](nameLen)
        din.readFully(name)
        val state = din.readUnsignedByte()
        val ts = din.readLong()
        cols(i) = state match {
          case DataFile.StateNormal =>
            val v = new Array[Byte](din.readInt())
            din.readFully(v)
            Column.Normal(name, v, ts)
          case DataFile.StateDeleted =>
            Column.Deleted(name, ts)
          case DataFile.StateExpiring =>
            val ttl = din.readLong()
            val exp = din.readLong()
            val v = new Array[Byte](din.readInt())
            din.readFully(v)
            Column.Expiring(name, v, ttl, exp, ts)
          case other =>
            throw new CorruptSSTableException(s"unknown column state $other at ${in.position}")
        }
        i += 1
      }
      SSTableRow(key, cols.toSeq)
    } catch {
      case e: EOFException =>
        throw new CorruptSSTableException(s"truncated row at ${in.position}", e)
    }
  }

  def close(): Unit = in.close()
}
