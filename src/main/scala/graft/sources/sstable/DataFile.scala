package graft.sources.sstable

import java.io.{DataOutputStream, EOFException}

/** `*-Data.db` row codec — the real Cassandra 1.2-era ("ic") on-disk
  * layout, re-implemented from the public Cassandra 1.2 format (the only
  * 1.x line that ships the full 4-file `Data/Index/Summary/CompressionInfo`
  * set the reference consumes). Provides the recovered `DataReader`
  * surface (SURVEY.md §1.4; call sites SSTableDataRecordReader.scala:47,
  * 85-94): an iterator of rows over a seekable uncompressed-domain stream.
  *
  * Layout (big-endian, NO file header — rows start at offset 0, as in
  * Cassandra):
  * {{{
  * row    := [u16 keyLen][key]
  *           [u64 rowSize]                  // bytes after this field
  *           [u32 localDeletionTime]        // row tombstone, seconds epoch
  *           [u64 markedForDeleteAt]        // row tombstone, µs
  *           [u32 columnCount]
  *           column*
  * column := [u16 nameLen][name]
  *           [u8 flags]          // 0x01 DELETION, 0x02 EXPIRATION, 0x10 RANGE
  *           [u32 ttlSecs][u32 localExpirationTime]   // EXPIRATION only
  *           [u64 timestamp]                // µs writer clock
  *           [u32 valueLen][value]
  * range  := [u16 minLen][minName]          // in the column name slot
  *           [u8 flags = 0x10]
  *           [u16 maxLen][maxName]
  *           [u32 localDeletionTime][u64 markedForDeleteAt]
  * }}}
  * matching Cassandra 1.2's `SSTableWriter.append` (key + long row size),
  * `DeletionTime.Serializer` (int localDeletionTime, long markedForDeleteAt;
  * LIVE = `(Int.MaxValue, Long.MinValue)`), and `ColumnSerializer` (short
  * name, byte flags, [int ttl + int localExpirationTime], long timestamp,
  * int-length value). A DELETED column's value payload is the 4-byte
  * localDeletionTime, per Cassandra's `DeletedColumn`.
  *
  * Model mapping (our ADT mirrors the reference codec's,
  * WritableColumn.java:16-21):
  *  - `Expiring.expiresMillis` ⇄ `localExpirationTime` (u32 *seconds*
  *    epoch) — the format stores whole seconds, so ms precision is
  *    truncated on write (and must fit in u32 seconds).
  *  - `Deleted` carries no payload at the model level
  *    (WritableColumn.java:51-58); the on-disk 4-byte localDeletionTime is
  *    derived from its µs timestamp on write and ignored on read.
  *  - Row-level deletion info IS surfaced ([[SSTableRow.tombstone]],
  *    `None` ⇔ on-disk `DeletionTime.LIVE`) and written back — beyond the
  *    reference, whose codec `Row { key, columns }` silently discards it
  *    (SSTableDataRecordReader.scala:62-64) and would surface wholesale-
  *    deleted rows' columns as live against real Cassandra files.
  *
  * Range tombstones (0x10, `RangeTombstone.Serializer`) ARE read and
  * written — beyond the reference, which predates them surfacing in its
  * data. Counter columns (0x04 `CounterColumn`: extra leading i64
  * timestampOfLastDelete; 0x08 `CounterUpdateColumn`: normal layout) are
  * read and written as RAW bytes so real 1.2 counter CFs scan — but the
  * merge paths reject them loudly, because their partitioned replication
  * contexts carry no LWW semantics (see [[Column.Counter]]).
  *
  * Corruption fails loudly ([[CorruptSSTableException]]) instead of the
  * reference's silent catch-and-truncate (SSTableDataRecordReader.scala:95-97).
  */
object DataFile {
  /** Real Cassandra Data.db files have no header; kept for call sites that
    * express "offset of the first row". */
  val HeaderLen = 0L

  // ColumnSerializer masks (Cassandra 1.2).
  val DeletionMask = 0x01
  val ExpirationMask = 0x02
  val CounterMask = 0x04
  val CounterUpdateMask = 0x08
  val RangeTombstoneMask = 0x10

  // DeletionTime.LIVE
  val LiveLocalDeletionTime: Int = Int.MaxValue
  val LiveMarkedForDeleteAt: Long = Long.MinValue

  /** Are the cells already in comparator (unsigned-lexicographic name)
    * order? The write path's fast-path check. */
  def namesSorted(cols: Seq[Column]): Boolean = {
    var prev: Array[Byte] = null
    cols.forall { c =>
      val ok = prev == null || SSTableFiles.compareKeys(prev, c.name) <= 0
      prev = c.name
      ok
    }
  }

  private def columnDiskSize(c: Column): Long = c match {
    case Column.Normal(n, v, _) => 2L + n.length + 1 + 8 + 4 + v.length
    case Column.Deleted(n, _) => 2L + n.length + 1 + 8 + 4 + 4 // value = u32 localDeletionTime
    case Column.Expiring(n, v, _, _, _) => 2L + n.length + 1 + 4 + 4 + 8 + 4 + v.length
    case Column.RangeTombstone(n, mx, _, _) => 2L + n.length + 1 + 2 + mx.length + 4 + 8
    case Column.Counter(n, v, _, _) => 2L + n.length + 1 + 8 + 8 + 4 + v.length
    case Column.CounterUpdate(n, v, _) => 2L + n.length + 1 + 8 + 4 + v.length
  }

  /** Size of the row body after the u64 rowSize field: deletion info (12) +
    * column count (4) + columns. */
  def rowBodySize(row: SSTableRow): Long =
    12L + 4L + row.columns.iterator.map(columnDiskSize).sum

  def writeRow(out: DataOutputStream, row: SSTableRow): Long = {
    require(row.key.length <= 0xffff, s"key too long: ${row.key.length}")
    val body = rowBodySize(row)
    out.writeShort(row.key.length); out.write(row.key)
    out.writeLong(body)
    row.tombstone match {
      case Some(t) =>
        require(t.markedForDeleteAtMicros != LiveMarkedForDeleteAt ||
            t.localDeletionTimeSecs != LiveLocalDeletionTime,
          "the (Int.MaxValue, Long.MinValue) pair is reserved for DeletionTime.LIVE")
        out.writeInt(t.localDeletionTimeSecs)
        out.writeLong(t.markedForDeleteAtMicros)
      case None =>
        out.writeInt(LiveLocalDeletionTime)
        out.writeLong(LiveMarkedForDeleteAt)
    }
    out.writeInt(row.columns.size)
    row.columns.foreach { c =>
      require(c.name.length <= 0xffff, s"column name too long: ${c.name.length}")
      out.writeShort(c.name.length); out.write(c.name)
      c match {
        case Column.Normal(_, v, ts) =>
          out.writeByte(0)
          out.writeLong(ts)
          out.writeInt(v.length); out.write(v)
        case Column.Deleted(_, ts) =>
          out.writeByte(DeletionMask)
          out.writeLong(ts)
          out.writeInt(4); out.writeInt((ts / 1000000L).toInt) // localDeletionTime (s)
        case Column.Expiring(_, v, ttl, expMs, ts) =>
          val expSec = expMs / 1000L
          require(ttl >= 0 && ttl <= Int.MaxValue, s"ttlSecs out of u32 range: $ttl")
          require(expSec >= 0 && expSec <= Int.MaxValue,
            s"expiresMillis out of range for u32 localExpirationTime: $expMs")
          out.writeByte(ExpirationMask)
          out.writeInt(ttl.toInt)
          out.writeInt(expSec.toInt)
          out.writeLong(ts)
          out.writeInt(v.length); out.write(v)
        case Column.RangeTombstone(_, maxName, ldt, mfda) =>
          // RangeTombstone.Serializer: min name (already written as the
          // column name), flags 0x10, max name, DeletionTime(ldt, mfda)
          require(maxName.length <= 0xffff, s"range max name too long: ${maxName.length}")
          out.writeByte(RangeTombstoneMask)
          out.writeShort(maxName.length); out.write(maxName)
          out.writeInt(ldt)
          out.writeLong(mfda)
        case Column.Counter(_, v, tsd, ts) =>
          // CounterColumn: flags 0x04, long timestampOfLastDelete, long
          // timestamp, int-length context bytes
          out.writeByte(CounterMask)
          out.writeLong(tsd)
          out.writeLong(ts)
          out.writeInt(v.length); out.write(v)
        case Column.CounterUpdate(_, v, ts) =>
          // CounterUpdateColumn: flags 0x08, NORMAL wire layout
          out.writeByte(CounterUpdateMask)
          out.writeLong(ts)
          out.writeInt(v.length); out.write(v)
      }
    }
    2L + row.key.length + 8L + body
  }
}

/** Streaming row iterator over an uncompressed-domain stream, optionally
  * bounded to `[in.position, endOffset)`. The caller seeks `in` to a row
  * boundary first (offset 0 or an Index-derived offset). */
final class DataReader(in: SeekableInput, endOffset: Long = Long.MaxValue,
                       nameLo: Option[(Array[Byte], Boolean)] = None,
                       nameHi: Option[(Array[Byte], Boolean)] = None,
                       sortedNames: Boolean = false)
    extends Iterator[SSTableRow] with AutoCloseable {
  private val din = in.asDataInput

  def position: Long = in.position

  def hasNext: Boolean = in.position < math.min(endOffset, in.length)

  private def decodeColumnBody(name: Array[Byte], flags: Int): Column =
    if ((flags & DataFile.CounterMask) != 0) {
      // CounterColumn: long timestampOfLastDelete precedes the
      // normal (timestamp, value) tail; surfaced RAW (no merge
      // semantics — see Column.Counter)
      val tsd = din.readLong()
      val ts = din.readLong()
      val v = new Array[Byte](din.readInt())
      din.readFully(v)
      Column.Counter(name, v, tsd, ts)
    } else if ((flags & DataFile.RangeTombstoneMask) != 0) {
      // RangeTombstone.Serializer: the name already read is the MIN
      // bound; then max name + DeletionTime(ldt, mfda)
      val maxLen = din.readUnsignedShort()
      val maxName = new Array[Byte](maxLen)
      din.readFully(maxName)
      val ldt = din.readInt()
      val mfda = din.readLong()
      Column.RangeTombstone(name, maxName, ldt, mfda)
    } else if ((flags & DataFile.ExpirationMask) != 0) {
      val ttl = din.readInt().toLong & 0xffffffffL
      val expSec = din.readInt().toLong & 0xffffffffL
      val ts = din.readLong()
      val v = new Array[Byte](din.readInt())
      din.readFully(v)
      Column.Expiring(name, v, ttl, expSec * 1000L, ts)
    } else if ((flags & DataFile.DeletionMask) != 0) {
      val ts = din.readLong()
      val vLen = din.readInt()
      if (vLen != 4)
        throw new CorruptSSTableException(
          s"DELETED column value must be 4 bytes, got $vLen at ${in.position}")
      din.readInt() // localDeletionTime — not surfaced at the model level
      Column.Deleted(name, ts)
    } else {
      val ts = din.readLong()
      val v = new Array[Byte](din.readInt())
      din.readFully(v)
      if ((flags & DataFile.CounterUpdateMask) != 0)
        Column.CounterUpdate(name, v, ts) // normal layout, 0x08 tag
      else Column.Normal(name, v, ts)
    }

  /** Seek past a column body WITHOUT materializing its value bytes (the
    * name and flags were already read). Length fields must still be
    * read — bodies are variable-width — but value payloads are skipped
    * by position, so a sliced read of a wide row never copies the
    * out-of-range cells' data. */
  private def skipColumnBody(flags: Int): Unit = {
    def skipValue(): Unit = { val n = din.readInt(); in.seek(in.position + n) }
    if ((flags & DataFile.CounterMask) != 0) { in.seek(in.position + 16); skipValue() }
    else if ((flags & DataFile.RangeTombstoneMask) != 0) {
      val maxLen = din.readUnsignedShort()
      in.seek(in.position + maxLen + 12) // max name + ldt(4) + mfda(8)
    } else if ((flags & DataFile.ExpirationMask) != 0) {
      in.seek(in.position + 16) // ttl(4) + exp(4) + ts(8)
      skipValue()
    } else { in.seek(in.position + 8); skipValue() } // ts(8) + value (Deleted: 4-byte body)
  }

  private def belowLo(name: Array[Byte]): Boolean = nameLo.exists { case (lo, incl) =>
    val c = SSTableFiles.compareKeys(name, lo)
    c < 0 || (c == 0 && !incl)
  }
  private def aboveHi(name: Array[Byte]): Boolean = nameHi.exists { case (hi, incl) =>
    val c = SSTableFiles.compareKeys(name, hi)
    c > 0 || (c == 0 && !incl)
  }

  def next(): SSTableRow = {
    if (!hasNext) throw new NoSuchElementException
    try {
      val keyLen = din.readUnsignedShort()
      val key = new Array[Byte](keyLen)
      din.readFully(key)
      val rowSize = din.readLong()
      if (rowSize < 16L)
        throw new CorruptSSTableException(s"row size $rowSize too small at ${in.position}")
      val rowEnd = in.position + rowSize
      val localDeletionTime = din.readInt()
      val markedForDeleteAt = din.readLong()
      // Cassandra's DeletionTime.LIVE is the PAIR (ldt=Int.MaxValue,
      // mfda=Long.MinValue). Matching on the pair (not mfda alone) keeps
      // the pathological on-disk case mfda=MIN with a non-MAX ldt
      // byte-identical on rewrite: it surfaces as a (shadows-nothing)
      // tombstone instead of silently losing its ldt (ADVICE r3).
      val tombstone =
        if (markedForDeleteAt == DataFile.LiveMarkedForDeleteAt &&
            localDeletionTime == DataFile.LiveLocalDeletionTime) None
        else Some(RowTombstone(localDeletionTime, markedForDeleteAt))
      val nCols = din.readInt()
      if (nCols < 0)
        throw new CorruptSSTableException(s"negative column count $nCols at ${in.position}")
      if (nameLo.isEmpty && nameHi.isEmpty) {
        val cols = new Array[Column](nCols)
        var i = 0
        while (i < nCols) {
          val nameLen = din.readUnsignedShort()
          val name = new Array[Byte](nameLen)
          din.readFully(name)
          val flags = din.readUnsignedByte()
          cols(i) = decodeColumnBody(name, flags)
          i += 1
        }
        if (in.position != rowEnd)
          throw new CorruptSSTableException(
            s"row size mismatch: declared end $rowEnd, parsed to ${in.position}")
        SSTableRow(key, cols.toSeq, tombstone)
      } else {
        // column slice (Cassandra's SliceQueryFilter shape): out-of-range
        // bodies are length-skipped, never materialized. When the
        // generation GUARANTEES comparator-sorted names (`sortedNames`,
        // from the Statistics v3 flag the writer sets), the FIRST
        // post-range name additionally seeks straight to the row end — a
        // slice of a million-column row touches only the slice's bytes
        // (plus name headers up to it). Without the guarantee (v1/v2
        // generations: earlier releases encoded caller column order) the
        // seek would silently drop in-range cells appearing after an
        // out-of-order one, so every name is tested individually — same
        // results, post-slice tail costs its name headers.
        val cols = Seq.newBuilder[Column]
        var i = 0
        var pastHi = false
        while (i < nCols && !pastHi) {
          val nameLen = din.readUnsignedShort()
          val name = new Array[Byte](nameLen)
          din.readFully(name)
          val flags = din.readUnsignedByte()
          if (aboveHi(name)) {
            if (sortedNames) { in.seek(rowEnd); pastHi = true }
            else skipColumnBody(flags)
          }
          else if (belowLo(name)) skipColumnBody(flags)
          else cols += decodeColumnBody(name, flags)
          i += 1
        }
        if (!pastHi && in.position != rowEnd)
          throw new CorruptSSTableException(
            s"row size mismatch: declared end $rowEnd, parsed to ${in.position}")
        SSTableRow(key, cols.result(), tombstone)
      }
    } catch {
      case e: EOFException =>
        throw new CorruptSSTableException(s"truncated row at ${in.position}", e)
    }
  }

  def close(): Unit = in.close()
}
