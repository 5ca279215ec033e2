package graft.core.io

import java.util.Arrays

/** Growable little output buffer used by all stream encoders.
  *
  * Equivalent in role to the reference's `slice.SliceOutput`
  * (/root/reference/pkg/store/LongOutputStreamV2.go:531-545 writes varints
  * into it); re-designed: plain byte array doubling, no slices.
  */
final class ByteBuf(initial: Int = 64) {
  private var buf = new Array[Byte](math.max(initial, 16))
  private var len = 0

  def size: Int = len

  private def ensure(extra: Int): Unit = {
    if (len + extra > buf.length) {
      var n = buf.length * 2
      while (n < len + extra) n *= 2
      buf = Arrays.copyOf(buf, n)
    }
  }

  def writeByte(b: Int): Unit = { ensure(1); buf(len) = b.toByte; len += 1 }

  def writeBytes(src: Array[Byte], off: Int, n: Int): Unit = {
    ensure(n); System.arraycopy(src, off, buf, len, n); len += n
  }
  def writeBytes(src: Array[Byte]): Unit = writeBytes(src, 0, src.length)

  def writeBuf(other: ByteBuf): Unit = writeBytes(other.array, 0, other.size)

  /** Unsigned LEB128 varint (ORC vulong). */
  def writeVulong(v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { writeByte((0x80 | (v & 0x7f)).toInt); v >>>= 7 }
    writeByte(v.toInt)
  }

  /** Signed zigzag varint (ORC vslong). */
  def writeVslong(v: Long): Unit = writeVulong((v << 1) ^ (v >> 63))

  def writeLongLE(v: Long): Unit = {
    ensure(8)
    var i = 0
    while (i < 8) { buf(len + i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    len += 8
  }

  def writeIntLE(v: Int): Unit = {
    ensure(4)
    buf(len) = (v & 0xff).toByte
    buf(len + 1) = ((v >>> 8) & 0xff).toByte
    buf(len + 2) = ((v >>> 16) & 0xff).toByte
    buf(len + 3) = ((v >>> 24) & 0xff).toByte
    len += 4
  }

  /** Big-endian minimal-byte value (RLEv2 SHORT_REPEAT / PATCHED_BASE base). */
  def writeBE(v: Long, nBytes: Int): Unit = {
    var i = nBytes - 1
    while (i >= 0) { writeByte(((v >>> (i * 8)) & 0xff).toInt); i -= 1 }
  }

  /** Direct (unsafe) view of the backing array — valid up to [[size]]. */
  def array: Array[Byte] = buf

  def toArray: Array[Byte] = Arrays.copyOf(buf, len)

  def clear(): Unit = len = 0

  /** Truncate to a previously recorded size (used by lazy PRESENT drop). */
  def truncate(newLen: Int): Unit = { require(newLen <= len); len = newLen }
}

/** Positioned reader over a byte array — decode-side mirror of [[ByteBuf]]. */
final class ByteRd(val buf: Array[Byte], var pos: Int, val limit: Int) {
  def this(buf: Array[Byte]) = this(buf, 0, buf.length)

  def remaining: Int = limit - pos
  def hasMore: Boolean = pos < limit

  def readByte(): Int = { val b = buf(pos) & 0xff; pos += 1; b }
  def readSignedByte(): Int = { val b = buf(pos).toInt; pos += 1; b }

  def readBytes(n: Int): Array[Byte] = {
    val out = Arrays.copyOfRange(buf, pos, pos + n); pos += n; out
  }
  def readInto(dst: Array[Byte], off: Int, n: Int): Unit = {
    System.arraycopy(buf, pos, dst, off, n); pos += n
  }
  def skip(n: Int): Unit = pos += n

  def readVulong(): Long = {
    var result = 0L; var shift = 0; var b = 0
    while ({ b = readByte(); (b & 0x80) != 0 }) {
      result |= (b & 0x7fL) << shift; shift += 7
    }
    result | (b.toLong << shift)
  }

  def readVslong(): Long = { val v = readVulong(); (v >>> 1) ^ -(v & 1) }

  def readLongLE(): Long = {
    var v = 0L; var i = 0
    while (i < 8) { v |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
    pos += 8; v
  }

  def readIntLE(): Int = {
    val v = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
      ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
    pos += 4; v
  }

  /** Big-endian nBytes value. */
  def readBE(nBytes: Int): Long = {
    var v = 0L; var i = 0
    while (i < nBytes) { v = (v << 8) | (buf(pos + i) & 0xffL); i += 1 }
    pos += nBytes; v
  }
}
