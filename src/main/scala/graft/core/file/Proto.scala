package graft.core.file

import graft.core.io.{ByteBuf, ByteRd}

/** Minimal proto2 wire-format writer/reader (varint, zigzag, fixed64,
  * length-delimited, packed repeated) — enough to serialize the MOTH
  * metadata messages of /root/reference/pkg/store/proto/moth_proto.proto
  * with matching field numbers and wire types. Hand-rolled because no
  * unshaded protobuf-java is available offline (SURVEY.md §7).
  */
object Pb {
  final val WireVarint = 0
  final val WireFixed64 = 1
  final val WireBytes = 2
  final val WireFixed32 = 5

  @inline def tag(field: Int, wire: Int): Int = (field << 3) | wire

  def writeVarint(out: ByteBuf, field: Int, v: Long): Unit = {
    out.writeVulong(tag(field, WireVarint).toLong)
    out.writeVulong(v)
  }
  def writeSInt(out: ByteBuf, field: Int, v: Long): Unit = {
    out.writeVulong(tag(field, WireVarint).toLong)
    out.writeVslong(v)
  }
  def writeBool(out: ByteBuf, field: Int, v: Boolean): Unit =
    writeVarint(out, field, if (v) 1 else 0)
  def writeDouble(out: ByteBuf, field: Int, v: Double): Unit = {
    out.writeVulong(tag(field, WireFixed64).toLong)
    out.writeLongLE(java.lang.Double.doubleToLongBits(v))
  }
  def writeFixed64(out: ByteBuf, field: Int, v: Long): Unit = {
    out.writeVulong(tag(field, WireFixed64).toLong)
    out.writeLongLE(v)
  }
  def writeBytes(out: ByteBuf, field: Int, v: Array[Byte]): Unit = {
    out.writeVulong(tag(field, WireBytes).toLong)
    out.writeVulong(v.length.toLong)
    out.writeBytes(v)
  }
  def writeString(out: ByteBuf, field: Int, v: String): Unit =
    writeBytes(out, field, v.getBytes("UTF-8"))
  def writeMessage(out: ByteBuf, field: Int, body: ByteBuf): Unit = {
    out.writeVulong(tag(field, WireBytes).toLong)
    out.writeVulong(body.size.toLong)
    out.writeBuf(body)
  }
  def writePackedVarints(out: ByteBuf, field: Int, vs: Iterable[Long]): Unit = {
    if (vs.isEmpty) return
    val body = new ByteBuf(vs.size * 2)
    vs.foreach(body.writeVulong)
    writeMessage(out, field, body)
  }

  /** Streaming field visitor for decode. */
  final class Reader(val rd: ByteRd) {
    def this(bytes: Array[Byte]) = this(new ByteRd(bytes))
    def this(bytes: Array[Byte], off: Int, len: Int) = this(new ByteRd(bytes, off, off + len))

    def foreachField(f: (Int, Int) => Unit): Unit = {
      while (rd.hasMore) {
        val t = rd.readVulong()
        f((t >>> 3).toInt, (t & 7).toInt)
      }
    }
    def readVarint(): Long = rd.readVulong()
    def readSInt(): Long = rd.readVslong()
    def readDouble(): Double = java.lang.Double.longBitsToDouble(rd.readLongLE())
    def readFixed64(): Long = rd.readLongLE()
    def readBytes(): Array[Byte] = {
      val n = rd.readVulong().toInt
      rd.readBytes(n)
    }
    def readString(): String = new String(readBytes(), "UTF-8")
    /** Returns a sub-reader for an embedded message / packed field. */
    def readMessage(): Reader = {
      val n = rd.readVulong().toInt
      val sub = new Reader(new ByteRd(rd.buf, rd.pos, rd.pos + n))
      rd.skip(n)
      sub
    }
    def readPackedVarints(): Array[Long] = {
      val sub = readMessage()
      val out = scala.collection.mutable.ArrayBuffer[Long]()
      while (sub.rd.hasMore) out += sub.rd.readVulong()
      out.toArray
    }
    def skipField(wire: Int): Unit = wire match {
      case WireVarint => rd.readVulong()
      case WireFixed64 => rd.skip(8)
      case WireBytes => val n = rd.readVulong().toInt; rd.skip(n)
      case WireFixed32 => rd.skip(4)
      case other => throw new IllegalArgumentException(s"wire type $other")
    }
  }
}
