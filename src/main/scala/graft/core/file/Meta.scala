package graft.core.file

import graft.core.io.{ByteBuf, ByteRd}
import graft.core.columns.{ColumnEncoding, MothType, RowGroupIndexEntry}
import graft.core.stats._
import scala.collection.mutable.ArrayBuffer

/** MOTH metadata messages + proto2 codecs, field numbers per
  * /root/reference/pkg/store/proto/moth_proto.proto. Magic string "MOTH"
  * (pkg/store/metadata/PostScript.go:5-6).
  */
object Meta {
  val Magic: Array[Byte] = "MOTH".getBytes("UTF-8")
  val WriterVersion = 6L // non-Java writers start at 6
  val FormatVersion: Seq[Long] = Seq(0L, 12L)

  final case class StreamInfo(kind: Int, column: Int, length: Long)
  final case class StripeFooterMsg(streams: Seq[StreamInfo],
      columns: Seq[ColumnEncoding], timezone: String)
  final case class StripeInfo(offset: Long, indexLength: Long, dataLength: Long,
      footerLength: Long, numberOfRows: Long)
  final case class FooterMsg(headerLength: Long, contentLength: Long,
      stripes: Seq[StripeInfo], types: Seq[TypeMsg], numberOfRows: Long,
      statistics: Seq[ColStats], rowIndexStride: Int,
      userMetadata: Map[String, Array[Byte]] = Map.empty)
  final case class TypeMsg(kind: Int, subtypes: Seq[Int], fieldNames: Seq[String],
      maximumLength: Int = 0, precision: Int = 0, scale: Int = 0,
      attributes: Map[String, String] = Map.empty)
  final case class PostScriptMsg(footerLength: Long, compression: Int,
      compressionBlockSize: Long, version: Seq[Long], metadataLength: Long,
      writerVersion: Long, magic: String)

  // ---- Type tree flattening (pre-order, root=0) ----

  def flattenTypes(root: MothType): Seq[TypeMsg] = {
    val out = new ArrayBuffer[TypeMsg]
    var next = 0
    def walk(t: MothType): Int = {
      val my = next
      next += 1
      out += null // placeholder
      val kids = t.children.map(walk)
      val (maxLen, prec, scale) = t match {
        case MothType.TVarchar(n) => (n, 0, 0)
        case MothType.TChar(n) => (n, 0, 0)
        case MothType.TDecimal(p, s) => (0, p, s)
        case _ => (0, 0, 0)
      }
      // TIME travels as a LONG column tagged with the Iceberg-ORC type
      // attribute, exactly how the reference dispatches its TimeColumnReader
      // (/root/reference/pkg/store/ColumnReaders.go:15)
      val attrs = t match {
        case MothType.TTime => Map("iceberg.long-type" -> "TIME")
        case _ => Map.empty[String, String]
      }
      out(my) = TypeMsg(t.kind, kids, t.fieldNames, maxLen, prec, scale, attrs)
      my
    }
    walk(root)
    out.toSeq
  }

  def unflattenTypes(types: Seq[TypeMsg]): MothType = {
    def build(id: Int): MothType = {
      val t = types(id)
      t.kind match {
        case 0 => MothType.TBoolean
        case 1 => MothType.TByte
        case 2 => MothType.TShort
        case 3 => MothType.TInt
        case 4 =>
          if (t.attributes.get("iceberg.long-type").contains("TIME")) MothType.TTime
          else MothType.TLong
        case 5 => MothType.TFloat
        case 6 => MothType.TDouble
        case 7 => MothType.TString
        case 8 => MothType.TBinary
        case 9 => MothType.TTimestamp
        case 10 => MothType.TList(build(t.subtypes(0)))
        case 11 => MothType.TMap(build(t.subtypes(0)), build(t.subtypes(1)))
        case 12 => MothType.TStruct(t.fieldNames.zip(t.subtypes.map(build)))
        case 13 => MothType.TUnion(t.subtypes.map(build))
        case 14 => MothType.TDecimal(t.precision, t.scale)
        case 15 => MothType.TDate
        case 16 => MothType.TVarchar(t.maximumLength)
        case 17 => MothType.TChar(t.maximumLength)
        case 18 => MothType.TTimestampInstant
        case k => throw new IllegalArgumentException(s"type kind $k")
      }
    }
    build(0)
  }

  // ---- ColumnStatistics ----

  def writeColStats(s: ColStats): ByteBuf = {
    val b = new ByteBuf(48)
    Pb.writeVarint(b, 1, s.numValues)
    s.intStats.foreach { is =>
      val m = new ByteBuf(24)
      Pb.writeSInt(m, 1, is.min)
      Pb.writeSInt(m, 2, is.max)
      is.sum.foreach(Pb.writeSInt(m, 3, _))
      Pb.writeMessage(b, 2, m)
    }
    s.doubleStats.foreach { ds =>
      val m = new ByteBuf(27)
      Pb.writeDouble(m, 1, ds.min)
      Pb.writeDouble(m, 2, ds.max)
      Pb.writeDouble(m, 3, ds.sum)
      Pb.writeMessage(b, 3, m)
    }
    s.stringStats.foreach { ss =>
      val m = new ByteBuf(32)
      ss.min.foreach(Pb.writeBytes(m, 1, _))
      ss.max.foreach(Pb.writeBytes(m, 2, _))
      Pb.writeSInt(m, 3, ss.sum)
      Pb.writeMessage(b, 4, m)
    }
    s.boolStats.foreach { tc =>
      val m = new ByteBuf(8)
      Pb.writePackedVarints(m, 1, Seq(tc))
      Pb.writeMessage(b, 5, m)
    }
    s.decimalStats.foreach { case (min, max) =>
      val m = new ByteBuf(24)
      Pb.writeString(m, 1, min.toString)
      Pb.writeString(m, 2, max.toString)
      Pb.writeMessage(b, 6, m)
    }
    s.dateStats.foreach { case (min, max) =>
      val m = new ByteBuf(12)
      Pb.writeSInt(m, 1, min.toLong)
      Pb.writeSInt(m, 2, max.toLong)
      Pb.writeMessage(b, 7, m)
    }
    s.binarySum.foreach { sum =>
      val m = new ByteBuf(8)
      Pb.writeSInt(m, 1, sum)
      Pb.writeMessage(b, 8, m)
    }
    s.tsStats.foreach { case (min, max) =>
      val m = new ByteBuf(24)
      Pb.writeSInt(m, 3, min) // minimumUtc
      Pb.writeSInt(m, 4, max) // maximumUtc
      Pb.writeMessage(b, 9, m)
    }
    Pb.writeBool(b, 10, s.hasNull)
    b
  }

  def readColStats(r: Pb.Reader): ColStats = {
    var numValues = 0L
    var hasNull = false
    var intS: Option[IntStats] = None
    var dblS: Option[DoubleStats] = None
    var strS: Option[StringStats] = None
    var boolS: Option[Long] = None
    var dateS: Option[(Int, Int)] = None
    var tsS: Option[(Long, Long)] = None
    var binS: Option[Long] = None
    var decS: Option[(BigDecimal, BigDecimal)] = None
    r.foreachField {
      case (1, _) => numValues = r.readVarint()
      case (2, _) =>
        val m = r.readMessage()
        var mn = 0L; var mx = 0L; var sum: Option[Long] = None
        m.foreachField {
          case (1, _) => mn = m.readSInt()
          case (2, _) => mx = m.readSInt()
          case (3, _) => sum = Some(m.readSInt())
          case (_, w) => m.skipField(w)
        }
        intS = Some(IntStats(mn, mx, sum))
      case (3, _) =>
        val m = r.readMessage()
        var mn = 0.0; var mx = 0.0; var sum = 0.0
        m.foreachField {
          case (1, _) => mn = m.readDouble()
          case (2, _) => mx = m.readDouble()
          case (3, _) => sum = m.readDouble()
          case (_, w) => m.skipField(w)
        }
        dblS = Some(DoubleStats(mn, mx, sum))
      case (4, _) =>
        val m = r.readMessage()
        var mn: Option[Array[Byte]] = None
        var mx: Option[Array[Byte]] = None
        var sum = 0L
        m.foreachField {
          case (1, _) => mn = Some(m.readBytes())
          case (2, _) => mx = Some(m.readBytes())
          case (3, _) => sum = m.readSInt()
          case (_, w) => m.skipField(w)
        }
        strS = Some(StringStats(mn, mx, sum))
      case (5, _) =>
        val m = r.readMessage()
        m.foreachField {
          case (1, _) => boolS = Some(m.readPackedVarints().headOption.getOrElse(0L))
          case (_, w) => m.skipField(w)
        }
      case (6, _) =>
        val m = r.readMessage()
        var mn = ""; var mx = ""
        m.foreachField {
          case (1, _) => mn = m.readString()
          case (2, _) => mx = m.readString()
          case (_, w) => m.skipField(w)
        }
        if (mn.nonEmpty || mx.nonEmpty) decS = Some((BigDecimal(mn), BigDecimal(mx)))
      case (7, _) =>
        val m = r.readMessage()
        var mn = 0; var mx = 0
        m.foreachField {
          case (1, _) => mn = m.readSInt().toInt
          case (2, _) => mx = m.readSInt().toInt
          case (_, w) => m.skipField(w)
        }
        dateS = Some((mn, mx))
      case (8, _) =>
        val m = r.readMessage()
        m.foreachField {
          case (1, _) => binS = Some(m.readSInt())
          case (_, w) => m.skipField(w)
        }
      case (9, _) =>
        val m = r.readMessage()
        var mn = 0L; var mx = 0L
        m.foreachField {
          case (3, _) => mn = m.readSInt()
          case (4, _) => mx = m.readSInt()
          case (1, _) => mn = m.readSInt() // legacy local-time fields
          case (2, _) => mx = m.readSInt()
          case (_, w) => m.skipField(w)
        }
        tsS = Some((mn, mx))
      case (10, _) => hasNull = r.readVarint() != 0
      case (_, w) => r.skipField(w)
    }
    ColStats(numValues, hasNull, intS, dblS, strS, boolS, dateS, tsS, binS, decS)
  }

  // ---- RowIndex / BloomFilterIndex ----

  def writeRowIndex(entries: Seq[RowGroupIndexEntry]): ByteBuf = {
    val b = new ByteBuf(64)
    entries.foreach { e =>
      val m = new ByteBuf(32)
      Pb.writePackedVarints(m, 1, e.positions.toSeq)
      Pb.writeMessage(m, 2, writeColStats(e.stats))
      Pb.writeMessage(b, 1, m)
    }
    b
  }

  def readRowIndex(bytes: Array[Byte]): Seq[RowGroupIndexEntry] = {
    val r = new Pb.Reader(bytes)
    val out = new ArrayBuffer[RowGroupIndexEntry]
    r.foreachField {
      case (1, _) =>
        val m = r.readMessage()
        var positions = Array.empty[Long]
        var stats = ColStats.empty
        m.foreachField {
          case (1, _) => positions = m.readPackedVarints()
          case (2, _) => stats = readColStats(m.readMessage())
          case (_, w) => m.skipField(w)
        }
        out += RowGroupIndexEntry(positions, stats)
      case (_, w) => r.skipField(w)
    }
    out.toSeq
  }

  def writeBloomIndex(blooms: Seq[BloomFilter]): ByteBuf = {
    val b = new ByteBuf(256)
    blooms.foreach { bf =>
      val m = new ByteBuf(bf.bits.length * 8 + 16)
      Pb.writeVarint(m, 1, bf.numHashFunctions.toLong)
      // utf8bitset (field 3): little-endian longs per ORC utf8 encoding
      val bs = new ByteBuf(bf.bits.length * 8)
      bf.bits.foreach(bs.writeLongLE)
      Pb.writeBytes(m, 3, bs.toArray)
      Pb.writeMessage(b, 1, m)
    }
    b
  }

  def readBloomIndex(bytes: Array[Byte]): Seq[BloomFilter] = {
    val r = new Pb.Reader(bytes)
    val out = new ArrayBuffer[BloomFilter]
    r.foreachField {
      case (1, _) =>
        val m = r.readMessage()
        var k = 1
        var bits = Array.empty[Long]
        m.foreachField {
          case (1, _) => k = m.readVarint().toInt
          case (3, _) =>
            val raw = m.readBytes()
            bits = Array.tabulate(raw.length / 8) { i =>
              var v = 0L
              var j = 0
              while (j < 8) { v |= (raw(i * 8 + j) & 0xffL) << (8 * j); j += 1 }
              v
            }
          case (2, w) => m.skipField(w)
          case (_, w) => m.skipField(w)
        }
        out += BloomFilter.fromBits(bits, k)
      case (_, w) => r.skipField(w)
    }
    out.toSeq
  }

  // ---- StripeFooter ----

  def writeStripeFooter(sf: StripeFooterMsg): ByteBuf = {
    val b = new ByteBuf(128)
    sf.streams.foreach { s =>
      val m = new ByteBuf(12)
      Pb.writeVarint(m, 1, s.kind.toLong)
      Pb.writeVarint(m, 2, s.column.toLong)
      Pb.writeVarint(m, 3, s.length)
      Pb.writeMessage(b, 1, m)
    }
    sf.columns.foreach { e =>
      val m = new ByteBuf(8)
      Pb.writeVarint(m, 1, e.kind.toLong)
      if (e.dictionarySize != 0) Pb.writeVarint(m, 2, e.dictionarySize.toLong)
      Pb.writeMessage(b, 2, m)
    }
    Pb.writeString(b, 3, sf.timezone)
    b
  }

  def readStripeFooter(bytes: Array[Byte]): StripeFooterMsg = {
    val r = new Pb.Reader(bytes)
    val streams = new ArrayBuffer[StreamInfo]
    val cols = new ArrayBuffer[ColumnEncoding]
    var tz = "UTC"
    r.foreachField {
      case (1, _) =>
        val m = r.readMessage()
        var kind = 0; var col = 0; var len = 0L
        m.foreachField {
          case (1, _) => kind = m.readVarint().toInt
          case (2, _) => col = m.readVarint().toInt
          case (3, _) => len = m.readVarint()
          case (_, w) => m.skipField(w)
        }
        streams += StreamInfo(kind, col, len)
      case (2, _) =>
        val m = r.readMessage()
        var kind = 0; var ds = 0
        m.foreachField {
          case (1, _) => kind = m.readVarint().toInt
          case (2, _) => ds = m.readVarint().toInt
          case (_, w) => m.skipField(w)
        }
        cols += ColumnEncoding(kind, ds)
      case (3, _) => tz = r.readString()
      case (_, w) => r.skipField(w)
    }
    StripeFooterMsg(streams.toSeq, cols.toSeq, tz)
  }

  // ---- Footer / Metadata / PostScript ----

  def writeFooter(f: FooterMsg): ByteBuf = {
    val b = new ByteBuf(256)
    Pb.writeVarint(b, 1, f.headerLength)
    Pb.writeVarint(b, 2, f.contentLength)
    f.stripes.foreach { s =>
      val m = new ByteBuf(24)
      Pb.writeVarint(m, 1, s.offset)
      Pb.writeVarint(m, 2, s.indexLength)
      Pb.writeVarint(m, 3, s.dataLength)
      Pb.writeVarint(m, 4, s.footerLength)
      Pb.writeVarint(m, 5, s.numberOfRows)
      Pb.writeMessage(b, 3, m)
    }
    f.types.foreach { t =>
      val m = new ByteBuf(24)
      Pb.writeVarint(m, 1, t.kind.toLong)
      Pb.writePackedVarints(m, 2, t.subtypes.map(_.toLong))
      t.fieldNames.foreach(Pb.writeString(m, 3, _))
      if (t.maximumLength != 0) Pb.writeVarint(m, 4, t.maximumLength.toLong)
      if (t.precision != 0) Pb.writeVarint(m, 5, t.precision.toLong)
      if (t.scale != 0) Pb.writeVarint(m, 6, t.scale.toLong)
      t.attributes.toSeq.sortBy(_._1).foreach { case (k, v) =>
        val a = new ByteBuf(8 + k.length + v.length)
        Pb.writeString(a, 1, k)
        Pb.writeString(a, 2, v)
        Pb.writeMessage(m, 7, a)
      }
      Pb.writeMessage(b, 4, m)
    }
    f.userMetadata.toSeq.sortBy(_._1).foreach { case (k, v) =>
      val m = new ByteBuf(16 + k.length + v.length)
      Pb.writeString(m, 1, k)
      Pb.writeBytes(m, 2, v)
      Pb.writeMessage(b, 5, m)
    }
    Pb.writeVarint(b, 6, f.numberOfRows)
    f.statistics.foreach(s => Pb.writeMessage(b, 7, writeColStats(s)))
    Pb.writeVarint(b, 8, f.rowIndexStride.toLong)
    Pb.writeVarint(b, 9, 3L) // writer code: non-Java
    b
  }

  def readFooter(bytes: Array[Byte]): FooterMsg = {
    val r = new Pb.Reader(bytes)
    var headerLength = 0L
    var contentLength = 0L
    val stripes = new ArrayBuffer[StripeInfo]
    val types = new ArrayBuffer[TypeMsg]
    var numberOfRows = 0L
    val stats = new ArrayBuffer[ColStats]
    var stride = 0
    val userMeta = new ArrayBuffer[(String, Array[Byte])]
    r.foreachField {
      case (1, _) => headerLength = r.readVarint()
      case (2, _) => contentLength = r.readVarint()
      case (3, _) =>
        val m = r.readMessage()
        var off = 0L; var il = 0L; var dl = 0L; var fl = 0L; var rows = 0L
        m.foreachField {
          case (1, _) => off = m.readVarint()
          case (2, _) => il = m.readVarint()
          case (3, _) => dl = m.readVarint()
          case (4, _) => fl = m.readVarint()
          case (5, _) => rows = m.readVarint()
          case (_, w) => m.skipField(w)
        }
        stripes += StripeInfo(off, il, dl, fl, rows)
      case (4, _) =>
        val m = r.readMessage()
        var kind = 0
        var subtypes = Array.empty[Long]
        val names = new ArrayBuffer[String]
        var maxLen = 0; var prec = 0; var scale = 0
        val attrs = scala.collection.mutable.Map[String, String]()
        m.foreachField {
          case (1, _) => kind = m.readVarint().toInt
          case (2, Pb.WireBytes) => subtypes = m.readPackedVarints()
          case (2, _) => subtypes = subtypes :+ m.readVarint()
          case (3, _) => names += m.readString()
          case (4, _) => maxLen = m.readVarint().toInt
          case (5, _) => prec = m.readVarint().toInt
          case (6, _) => scale = m.readVarint().toInt
          case (7, _) =>
            val a = m.readMessage()
            var k = ""; var v = ""
            a.foreachField {
              case (1, _) => k = a.readString()
              case (2, _) => v = a.readString()
              case (_, w) => a.skipField(w)
            }
            attrs(k) = v
          case (_, w) => m.skipField(w)
        }
        types += TypeMsg(kind, subtypes.map(_.toInt).toSeq, names.toSeq, maxLen, prec,
          scale, attrs.toMap)
      case (5, _) =>
        val m = r.readMessage()
        var k = ""
        var v = Array.empty[Byte]
        m.foreachField {
          case (1, _) => k = m.readString()
          case (2, _) => v = m.readBytes()
          case (_, w) => m.skipField(w)
        }
        userMeta += ((k, v))
      case (6, _) => numberOfRows = r.readVarint()
      case (7, _) => stats += readColStats(r.readMessage())
      case (8, _) => stride = r.readVarint().toInt
      case (_, w) => r.skipField(w)
    }
    FooterMsg(headerLength, contentLength, stripes.toSeq, types.toSeq,
      numberOfRows, stats.toSeq, stride, userMeta.toMap)
  }

  /** Metadata = per-stripe StripeStatistics{repeated colStats}. */
  def writeMetadata(perStripe: Seq[Seq[ColStats]]): ByteBuf = {
    val b = new ByteBuf(256)
    perStripe.foreach { cols =>
      val m = new ByteBuf(128)
      cols.foreach(s => Pb.writeMessage(m, 1, writeColStats(s)))
      Pb.writeMessage(b, 1, m)
    }
    b
  }

  def readMetadata(bytes: Array[Byte]): Seq[Seq[ColStats]] = {
    val r = new Pb.Reader(bytes)
    val out = new ArrayBuffer[Seq[ColStats]]
    r.foreachField {
      case (1, _) =>
        val m = r.readMessage()
        val cols = new ArrayBuffer[ColStats]
        m.foreachField {
          case (1, _) => cols += readColStats(m.readMessage())
          case (_, w) => m.skipField(w)
        }
        out += cols.toSeq
      case (_, w) => r.skipField(w)
    }
    out.toSeq
  }

  def writePostScript(ps: PostScriptMsg): ByteBuf = {
    val b = new ByteBuf(32)
    Pb.writeVarint(b, 1, ps.footerLength)
    Pb.writeVarint(b, 2, ps.compression.toLong)
    Pb.writeVarint(b, 3, ps.compressionBlockSize)
    Pb.writePackedVarints(b, 4, ps.version)
    Pb.writeVarint(b, 5, ps.metadataLength)
    Pb.writeVarint(b, 6, ps.writerVersion)
    Pb.writeString(b, 8000, ps.magic) // magic field per ORC proto
    b
  }

  def readPostScript(bytes: Array[Byte], off: Int, len: Int): PostScriptMsg = {
    val r = new Pb.Reader(bytes, off, len)
    var footerLength = 0L
    var compression = 0
    var blockSize = 256L * 1024
    var version: Seq[Long] = Nil
    var metadataLength = 0L
    var writerVersion = 0L
    var magic = ""
    r.foreachField {
      case (1, _) => footerLength = r.readVarint()
      case (2, _) => compression = r.readVarint().toInt
      case (3, _) => blockSize = r.readVarint()
      case (4, _) => version = r.readPackedVarints().toSeq
      case (5, _) => metadataLength = r.readVarint()
      case (6, _) => writerVersion = r.readVarint()
      case (8000, _) => magic = r.readString()
      case (_, w) => r.skipField(w)
    }
    PostScriptMsg(footerLength, compression, blockSize, version, metadataLength,
      writerVersion, magic)
  }
}
