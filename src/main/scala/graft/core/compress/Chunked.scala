package graft.core.compress

import graft.core.io.{ByteBuf, ByteRd}
import java.util.zip.{Deflater, Inflater}

/** Compression kinds, numbering per the MOTH/ORC proto enum
  * (/root/reference/pkg/store/metadata/CompressionKind.go:3-11).
  */
object CompressionKind extends Enumeration {
  val NONE = Value(0)
  val ZLIB = Value(1)
  val SNAPPY = Value(2)
  val LZO = Value(3) // declared for enum parity; not implemented (as in reference)
  val LZ4 = Value(4)
  val ZSTD = Value(5)
}

/** One compressed chunk framing codec: each chunk is prefixed by a 3-byte
  * little-endian header `(length << 1) | isOriginal`, where isOriginal=1
  * means the chunk is stored raw because compression did not shrink it.
  * Behavior per /root/reference/pkg/store/MothOutputBuffer.go:348-371.
  * NONE writes payload with no framing (whole stream raw).
  */
object Chunked {
  /** Default chunk size — reference `maxCompressionBufferSize` 256 KB
    * (/root/reference/pkg/store/MothWriterOptions.go:10).
    */
  val DefaultChunkSize: Int = 256 * 1024

  def compress(kind: CompressionKind.Value, data: Array[Byte], off: Int, len: Int,
               out: ByteBuf, chunkSize: Int = DefaultChunkSize): Unit = {
    if (kind == CompressionKind.NONE) { out.writeBytes(data, off, len); return }
    val codec = Codec(kind)
    val scratch = new Array[Byte](codec.maxCompressedLength(chunkSize))
    var pos = off
    val end = off + len
    while (pos < end) {
      val n = math.min(chunkSize, end - pos)
      val clen = codec.compress(data, pos, n, scratch)
      if (clen > 0 && clen < n) {
        writeHeader(out, clen, isOriginal = false)
        out.writeBytes(scratch, 0, clen)
      } else {
        writeHeader(out, n, isOriginal = true)
        out.writeBytes(data, pos, n)
      }
      pos += n
    }
  }

  def decompress(kind: CompressionKind.Value, data: Array[Byte], off: Int, len: Int,
                 chunkSize: Int = DefaultChunkSize): Array[Byte] = {
    if (kind == CompressionKind.NONE)
      return java.util.Arrays.copyOfRange(data, off, off + len)
    val codec = Codec(kind)
    val out = new ByteBuf(math.max(len * 3, 1024))
    val scratch = new Array[Byte](chunkSize)
    var pos = off
    val end = off + len
    while (pos < end) {
      if (pos + 3 > end)
        throw new java.io.EOFException(s"truncated chunk header at $pos (limit $end)")
      val h = (data(pos) & 0xff) | ((data(pos + 1) & 0xff) << 8) | ((data(pos + 2) & 0xff) << 16)
      pos += 3
      val isOriginal = (h & 1) == 1
      val clen = h >>> 1
      if (pos + clen > end)
        throw new java.io.EOFException(s"truncated chunk body at $pos+$clen (limit $end)")
      if (isOriginal) out.writeBytes(data, pos, clen)
      else {
        val dlen = codec.decompress(data, pos, clen, scratch)
        out.writeBytes(scratch, 0, dlen)
      }
      pos += clen
    }
    out.toArray
  }

  private def writeHeader(out: ByteBuf, len: Int, isOriginal: Boolean): Unit = {
    val h = (len << 1) | (if (isOriginal) 1 else 0)
    out.writeByte(h & 0xff)
    out.writeByte((h >>> 8) & 0xff)
    out.writeByte((h >>> 16) & 0xff)
  }
}

/** Raw block codec. Implementations must be cheap to construct per call site
  * but are NOT thread-safe (hold scratch state).
  */
trait Codec {
  def maxCompressedLength(uncompressed: Int): Int
  /** @return compressed length, or -1 if not compressible into dst */
  def compress(src: Array[Byte], off: Int, len: Int, dst: Array[Byte]): Int
  /** @return decompressed length */
  def decompress(src: Array[Byte], off: Int, len: Int, dst: Array[Byte]): Int
}

object Codec {
  def apply(kind: CompressionKind.Value): Codec = kind match {
    case CompressionKind.ZLIB   => new ZlibCodec
    case CompressionKind.SNAPPY => new SnappyCodec
    case CompressionKind.LZ4    => new Lz4Codec
    case CompressionKind.ZSTD   => new ZstdCodec
    case other => throw new IllegalArgumentException(s"no codec for $other")
  }
}

/** JDK Deflater-based zlib, matching the reference's DeflateCompressor —
  * COMPRESSION_LEVEL = 4 (/root/reference/pkg/store/DeflateCompressor.go:11),
  * raw deflate stream. Deflater/Inflater instances are reused across chunks
  * (reset, not re-created) — Codec instances are per-call-site, not shared.
  */
final class ZlibCodec extends Codec {
  private val d = new Deflater(4, true)
  private val inf = new Inflater(true)

  def maxCompressedLength(n: Int): Int = n + (n >> 3) + 512
  def compress(src: Array[Byte], off: Int, len: Int, dst: Array[Byte]): Int = {
    d.reset()
    d.setInput(src, off, len)
    d.finish()
    var total = 0
    while (!d.finished() && total < dst.length) {
      total += d.deflate(dst, total, dst.length - total)
    }
    if (d.finished()) total else -1
  }
  def decompress(src: Array[Byte], off: Int, len: Int, dst: Array[Byte]): Int = {
    inf.reset()
    inf.setInput(src, off, len)
    var total = 0
    while (!inf.finished()) {
      val n = inf.inflate(dst, total, dst.length - total)
      if (n == 0 && inf.needsInput()) throw new java.io.EOFException("truncated zlib chunk")
      // a corrupt/foreign chunk inflating past the scratch buffer returns 0
      // with no input needed forever — fail instead of spinning
      if (n == 0 && !inf.needsInput())
        throw new java.io.IOException(
          s"zlib chunk inflates past buffer (${dst.length} bytes) — corrupt or oversized chunk")
      total += n
    }
    total
  }
}

final class SnappyCodec extends Codec {
  private val c = new io.airlift.compress.snappy.SnappyCompressor
  private val d = new io.airlift.compress.snappy.SnappyDecompressor
  def maxCompressedLength(n: Int): Int = c.maxCompressedLength(n)
  def compress(src: Array[Byte], off: Int, len: Int, dst: Array[Byte]): Int =
    c.compress(src, off, len, dst, 0, dst.length)
  def decompress(src: Array[Byte], off: Int, len: Int, dst: Array[Byte]): Int =
    d.decompress(src, off, len, dst, 0, dst.length)
}

final class Lz4Codec extends Codec {
  private val c = new io.airlift.compress.lz4.Lz4Compressor
  private val d = new io.airlift.compress.lz4.Lz4Decompressor
  def maxCompressedLength(n: Int): Int = c.maxCompressedLength(n)
  def compress(src: Array[Byte], off: Int, len: Int, dst: Array[Byte]): Int =
    c.compress(src, off, len, dst, 0, dst.length)
  def decompress(src: Array[Byte], off: Int, len: Int, dst: Array[Byte]): Int =
    d.decompress(src, off, len, dst, 0, dst.length)
}

final class ZstdCodec extends Codec {
  private val c = new io.airlift.compress.zstd.ZstdCompressor
  private val d = new io.airlift.compress.zstd.ZstdDecompressor
  def maxCompressedLength(n: Int): Int = c.maxCompressedLength(n)
  def compress(src: Array[Byte], off: Int, len: Int, dst: Array[Byte]): Int =
    c.compress(src, off, len, dst, 0, dst.length)
  def decompress(src: Array[Byte], off: Int, len: Int, dst: Array[Byte]): Int =
    d.decompress(src, off, len, dst, 0, dst.length)
}
