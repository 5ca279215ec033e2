package graft

import graft.core.io.{ByteBuf, ByteRd}
import graft.core.rle._
import graft.core.compress.{Chunked, CompressionKind}

/** CLI demo driver (role analog of the reference's demo at
  * /root/reference/pkg/main/main.go): exercises the public codec API
  * end-to-end and prints sizes + round-trip status.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    // transcript-ish turn_idx column: 1000 conversations of ramps 0..k
    val turnIdx = (0 until 1000).flatMap(c => 0 to (c % 37)).map(_.toLong).toArray
    val w = new RleV2Writer(signed = true)
    turnIdx.foreach(w.writeLong)
    w.flush()
    val enc = w.out.toArray
    val dst = new Array[Long](turnIdx.length)
    RleV2.read(new ByteRd(enc), signed = true, dst, 0, turnIdx.length)
    println(s"RLEv2: ${turnIdx.length} longs (${turnIdx.length * 8} raw bytes) -> " +
      s"${enc.length} bytes, roundtrip=${dst.sameElements(turnIdx)}")

    val text = ("the quick brown fox jumps over the lazy dog. " * 20000).getBytes("UTF-8")
    for (kind <- Seq(CompressionKind.ZLIB, CompressionKind.SNAPPY, CompressionKind.LZ4, CompressionKind.ZSTD)) {
      val cbuf = new ByteBuf()
      Chunked.compress(kind, text, 0, text.length, cbuf)
      val back = Chunked.decompress(kind, cbuf.array, 0, cbuf.size)
      println(f"$kind chunked: ${text.length} -> ${cbuf.size} bytes " +
        f"(${text.length.toDouble / cbuf.size}%.1fx), roundtrip=${java.util.Arrays.equals(back, text)}")
    }

    val extremes = Array(Long.MinValue, Long.MaxValue, 0L, -1L, Long.MinValue + 1)
    val w2 = new RleV2Writer(signed = true); extremes.foreach(w2.writeLong); w2.flush()
    val d2 = new Array[Long](5)
    RleV2.read(new ByteRd(w2.out.toArray), signed = true, d2, 0, 5)
    println(s"int64 extremes roundtrip=${d2.sameElements(extremes)}")

    val cbuf = new ByteBuf()
    Chunked.compress(CompressionKind.ZLIB, text, 0, text.length, cbuf)
    try {
      Chunked.decompress(CompressionKind.ZLIB, cbuf.array, 0, cbuf.size / 2)
      println("truncated stream: NO ERROR (bad)")
    } catch {
      case e: Exception => println(s"truncated stream -> ${e.getClass.getSimpleName} (good)")
    }
  }
}
