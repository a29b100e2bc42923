package graft.sources.sstable

import java.io.{DataInputStream, EOFException, InputStream, RandomAccessFile}

/** Seekable input abstraction — the recovered stream surface of the
  * reference codec (SURVEY.md §1.4: `SeekableDataInputStream` with
  * position/seek/length, bounded and in-memory variants). Pure JVM, no
  * Hadoop/Spark types, so the codec unit-tests without a cluster and the
  * DSv2 layer can adapt any storage (local fs here; HDFS/object-store via
  * an adapter) behind the same trait.
  */
trait SeekableInput extends AutoCloseable {
  def position: Long
  def seek(pos: Long): Unit
  def length: Long
  /** Read up to `len` bytes; -1 at EOF. */
  def read(buf: Array[Byte], off: Int, len: Int): Int

  def readFully(buf: Array[Byte]): Unit = {
    var off = 0
    while (off < buf.length) {
      val n = read(buf, off, buf.length - off)
      if (n < 0) throw new EOFException(
        s"unexpected EOF at $position (wanted ${buf.length - off} more bytes)")
      off += n
    }
  }

  def asInputStream: InputStream = new InputStream {
    private val one = new Array[Byte](1)
    override def read(): Int =
      if (SeekableInput.this.read(one, 0, 1) < 0) -1 else one(0) & 0xff
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      SeekableInput.this.read(b, off, len)
  }

  def asDataInput: DataInputStream = new DataInputStream(asInputStream)
}

final class FileSeekableInput(path: String) extends SeekableInput {
  private val raf = new RandomAccessFile(path, "r")
  def position: Long = raf.getFilePointer
  def seek(pos: Long): Unit = raf.seek(pos)
  def length: Long = raf.length()
  def read(buf: Array[Byte], off: Int, len: Int): Int = raf.read(buf, off, len)
  def close(): Unit = raf.close()
}

final class InMemorySeekableInput(bytes: Array[Byte]) extends SeekableInput {
  private var pos = 0L
  def position: Long = pos
  def seek(p: Long): Unit = pos = p
  def length: Long = bytes.length.toLong
  def read(buf: Array[Byte], off: Int, len: Int): Int = {
    if (pos >= bytes.length) return -1
    val n = math.min(len.toLong, bytes.length - pos).toInt
    System.arraycopy(bytes, pos.toInt, buf, off, n)
    pos += n
    n
  }
  def close(): Unit = ()
}

/** Windowed view [start, start+len) of an underlying stream — the
  * reference's `BoundedSeekableDataInputStreamProxy`
  * (SSTableIndexRecordReader.scala:29). Positions are window-relative. */
final class BoundedSeekableInput(underlying: SeekableInput, start: Long, len: Long)
    extends SeekableInput {
  underlying.seek(start)
  def position: Long = underlying.position - start
  def seek(p: Long): Unit = underlying.seek(start + p)
  def length: Long = len
  def read(buf: Array[Byte], off: Int, n: Int): Int = {
    val remaining = len - position
    if (remaining <= 0) return -1
    underlying.read(buf, off, math.min(n.toLong, remaining).toInt)
  }
  def close(): Unit = underlying.close()
}
