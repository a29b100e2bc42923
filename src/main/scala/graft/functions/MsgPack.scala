package graft.functions

import java.io.ByteArrayOutputStream

/** Minimal MessagePack encoder/decoder (public spec, msgpack.org — format
  * families nil/int/bin/array only; that is all the export needs).
  *
  * Models the reference's msgpack export rows (`MsgPackRow{key, cols[]}`,
  * `MsgPackCol{key, value, ts, expiresMillis, ttlSecs}` —
  * mapred/SSTableData.scala:64-77), which msgpack-java 0.6 `@Message`
  * serializes as nested arrays. Layout produced here:
  * `[bin key, [[bin name, bin|nil value, int ts, int expiresMillis,
  * int ttlSecs], …]]`. The decoder exists for round-trip tests only
  * (SURVEY.md §2.2-K2: base64 half oracle-able, msgpack bytes via
  * round-trip).
  */
object MsgPack {

  // ---- encoder ----

  final class Packer {
    private val out = new ByteArrayOutputStream()

    def packNil(): this.type = { out.write(0xc0); this }

    def packLong(v: Long): this.type = {
      if (v >= 0) {
        if (v < 128) out.write(v.toInt)
        else if (v <= 0xff) { out.write(0xcc); out.write(v.toInt) }
        else if (v <= 0xffff) { out.write(0xcd); be(v, 2) }
        else if (v <= 0xffffffffL) { out.write(0xce); be(v, 4) }
        else { out.write(0xcf); be(v, 8) }
      } else {
        if (v >= -32) out.write(0xe0 | (v.toInt & 0x1f))
        else if (v >= Byte.MinValue) { out.write(0xd0); out.write(v.toInt & 0xff) }
        else if (v >= Short.MinValue) { out.write(0xd1); be(v, 2) }
        else if (v >= Int.MinValue) { out.write(0xd2); be(v, 4) }
        else { out.write(0xd3); be(v, 8) }
      }
      this
    }

    /** Old-spec raw family (fixraw/raw16/raw32) — what msgpack-java 0.6
      * (the reference's serializer, pom.xml:102) emits for `byte[]`; the
      * new-spec bin family (0xc4-0xc6) postdates it, and downstream
      * consumers of the reference's export expect raw (ADVICE r1). */
    def packBin(b: Array[Byte]): this.type = {
      if (b.length <= 31) out.write(0xa0 | b.length)
      else if (b.length <= 0xffff) { out.write(0xda); be(b.length.toLong, 2) }
      else { out.write(0xdb); be(b.length.toLong, 4) }
      out.write(b, 0, b.length)
      this
    }

    def packArrayHeader(n: Int): this.type = {
      if (n < 16) out.write(0x90 | n)
      else if (n <= 0xffff) { out.write(0xdc); be(n.toLong, 2) }
      else { out.write(0xdd); be(n.toLong, 4) }
      this
    }

    private def be(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { out.write(((v >>> (8 * i)) & 0xff).toInt); i -= 1 }
    }

    def result(): Array[Byte] = out.toByteArray
  }

  // ---- decoder (tests only) ----

  sealed trait Value
  final case class VLong(v: Long) extends Value
  final case class VBin(v: Array[Byte]) extends Value
  final case class VArr(v: Vector[Value]) extends Value
  case object VNil extends Value

  def decode(bytes: Array[Byte]): Value = {
    val it = new Decoder(bytes)
    val v = it.next()
    require(it.exhausted, "trailing bytes after msgpack value")
    v
  }

  private final class Decoder(b: Array[Byte]) {
    private var p = 0
    def exhausted: Boolean = p == b.length
    private def u8(): Int = { val v = b(p) & 0xff; p += 1; v }
    private def beN(n: Int): Long = {
      var v = 0L
      (0 until n).foreach(_ => v = (v << 8) | u8())
      v
    }
    private def bin(n: Int): Array[Byte] = {
      val a = java.util.Arrays.copyOfRange(b, p, p + n); p += n; a
    }
    def next(): Value = {
      val t = u8()
      if (t < 0x80) VLong(t)
      else if (t >= 0xe0) VLong((t & 0x1f) - 32)
      else if ((t & 0xf0) == 0x90) VArr(Vector.fill(t & 0x0f)(next()))
      else if ((t & 0xe0) == 0xa0) VBin(bin(t & 0x1f)) // old-spec fixraw
      else t match {
        case 0xc0 => VNil
        case 0xda => VBin(bin(beN(2).toInt)) // old-spec raw16
        case 0xdb => VBin(bin(beN(4).toInt)) // old-spec raw32
        case 0xc4 => VBin(bin(u8())) // new-spec bin accepted on read
        case 0xc5 => VBin(bin(beN(2).toInt))
        case 0xc6 => VBin(bin(beN(4).toInt))
        case 0xcc => VLong(beN(1))
        case 0xcd => VLong(beN(2))
        case 0xce => VLong(beN(4))
        case 0xcf => VLong(beN(8))
        case 0xd0 => VLong(beN(1).toByte.toLong)
        case 0xd1 => VLong(beN(2).toShort.toLong)
        case 0xd2 => VLong(beN(4).toInt.toLong)
        case 0xd3 => VLong(beN(8))
        case 0xdc => VArr(Vector.fill(beN(2).toInt)(next()))
        case 0xdd => VArr(Vector.fill(beN(4).toInt)(next()))
        case other => throw new IllegalArgumentException(f"unsupported msgpack type 0x$other%02x")
      }
    }
  }

  /** Encode one merged wide row: key + columns(name, value|null, ts,
    * expiresMillis, ttlSecs). */
  def encodeRow(key: Array[Byte],
                cols: Seq[(Array[Byte], Array[Byte], Long, Long, Long)]): Array[Byte] = {
    val p = new Packer
    p.packArrayHeader(2).packBin(key).packArrayHeader(cols.length)
    cols.foreach { case (name, value, ts, exp, ttl) =>
      p.packArrayHeader(5).packBin(name)
      if (value == null) p.packNil() else p.packBin(value)
      p.packLong(ts).packLong(exp).packLong(ttl)
    }
    p.result()
  }
}
