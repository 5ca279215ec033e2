package graft.core.columns

import scala.collection.mutable.ArrayBuffer
import graft.core.io.ByteBuf
import graft.core.rle.{ByteRleWriter, BooleanWriter, RleV2Writer}
import graft.core.stats._

/** Stripe-scoped column writer — role analog of the reference's
  * `ColumnWriter` (/root/reference/pkg/store/ColumnWriter.go; factory
  * ColumnWriters.go:24-87), redesigned around [[ColVec]] batches.
  * Lifecycle per stripe: (beginRowGroup → writeVec* → finishRowGroup)* →
  * close → drain streams/encodings/index → reset.
  */
trait ColumnWriter {
  def columnId: Int
  def beginRowGroup(): Unit
  def writeVec(v: ColVec): Unit
  def finishRowGroup(): Unit
  def close(): Unit
  /** (columnId, encoding) for self + descendants. */
  def encodings: Seq[(Int, ColumnEncoding)]
  /** All data streams (PRESENT/DATA/LENGTH/…) for self + descendants. */
  def dataStreams: Seq[StreamData]
  /** Per column: row-group index entries (positions + stats). */
  def indexEntries: Seq[(Int, Seq[RowGroupIndexEntry])]
  /** Per column: one bloom filter per row group (only if enabled). */
  def bloomFilters: Seq[(Int, Seq[BloomFilter])]
  /** Per column: merged stripe statistics. */
  def stripeStats: Seq[(Int, ColStats)]
  def bufferedBytes: Long
  def reset(): Unit
}

object ColumnWriter {
  /** Builds the writer tree for a root struct; ids are assigned pre-order
    * with the root struct = column 0 (ORC convention).
    */
  def createTree(root: MothType.TStruct, opts: WriterOpts): StructColumnWriter = {
    var nextId = 0
    def create(t: MothType, path: String): ColumnWriter = {
      val id = nextId
      nextId += 1
      t match {
        case MothType.TBoolean => new BooleanColumnWriter(id)
        case MothType.TByte => new ByteColumnWriter(id)
        case MothType.TShort | MothType.TInt | MothType.TLong =>
          new LongColumnWriter(id, isDate = false, opts.bloomFor(path),
            rleCompat = opts.refCompatRle)
        case MothType.TDate => new LongColumnWriter(id, isDate = true, opts.bloomFor(path),
          rleCompat = opts.refCompatRle)
        case MothType.TTime =>
          new LongColumnWriter(id, isDate = false, opts.bloomFor(path), nanosToMicros = true,
            rleCompat = opts.refCompatRle)
        case MothType.TFloat => new FloatColumnWriter(id)
        case MothType.TDouble => new DoubleColumnWriter(id)
        case MothType.TTimestamp | MothType.TTimestampInstant =>
          new TimestampColumnWriter(id, opts.refCompatRle)
        case d: MothType.TDecimal =>
          new DecimalColumnWriter(id, d.precision, d.scale, opts.refCompatRle)
        case MothType.TBinary =>
          new BinaryColumnWriter(id, stats = new BinaryStatsBuilder, opts.refCompatRle)
        case MothType.TString | _: MothType.TVarchar | _: MothType.TChar =>
          new StringDictionaryColumnWriter(id, opts, opts.bloomFor(path))
        case l: MothType.TList =>
          new ListColumnWriter(id, create(l.elem, s"$path.item"), opts.refCompatRle)
        case m: MothType.TMap =>
          new MapColumnWriter(id, create(m.key, s"$path.key"),
            create(m.value, s"$path.value"), opts.refCompatRle)
        case s: MothType.TStruct =>
          val self = id
          val kids = s.fields.map { case (n, ft) => create(ft, if (path.isEmpty) n else s"$path.$n") }
          new StructColumnWriter(self, kids)
        case u: MothType.TUnion =>
          val self = id
          val kids = u.alts.zipWithIndex.map { case (a, i) => create(a, s"$path.$i") }
          new UnionColumnWriter(self, kids)
      }
    }
    create(root, "").asInstanceOf[StructColumnWriter]
  }

  /** Collect all dictionary writers in a tree (for the optimizer). */
  def dictionaryWriters(w: ColumnWriter): Seq[StringDictionaryColumnWriter] = w match {
    case d: StringDictionaryColumnWriter => Seq(d)
    case s: StructColumnWriter => s.fields.flatMap(dictionaryWriters)
    case l: ListColumnWriter => dictionaryWriters(l.elem)
    case m: MapColumnWriter => dictionaryWriters(m.key) ++ dictionaryWriters(m.value)
    case u: UnionColumnWriter => u.alts.flatMap(dictionaryWriters)
    case _ => Nil
  }
}

/** Writer knobs — defaults per /root/reference/pkg/store/MothWriterOptions.go. */
final case class WriterOpts(
    stripeMinBytes: Int = 32 << 20,
    stripeMaxBytes: Int = 64 << 20,
    stripeMaxRowCount: Int = 10_000_000,
    rowGroupMaxRowCount: Int = 10_000,
    dictionaryMaxMemoryBytes: Int = 16 << 20,
    stringStatsLimit: Int = 64,
    bloomFpp: Double = 0.05,
    bloomColumns: Set[String] = Set.empty,
    fsstEnabled: Boolean = true,
    // Reproduce the reference's exact RLEv2 encoding choices (int-truncated
    // percentileBits, no DELTA for all-equal runs) — the whole-file size
    // parity gate writes with this on and asserts default <= compat bytes
    refCompatRle: Boolean = false,
    compressionChunkSize: Int = 256 * 1024,
    // Footer UserMetadataItems (MothWriter.go:33,70-72); the writer adds
    // its version key like the reference's MOTHDB_MOTH_WRITER_VERSION
    userMetadata: Map[String, String] = Map.empty,
    codec: graft.core.compress.CompressionKind.Value = graft.core.compress.CompressionKind.ZLIB
) {
  def bloomFor(path: String): Option[BloomSpec] =
    if (bloomColumns.contains(path)) Some(BloomSpec(rowGroupMaxRowCount, bloomFpp)) else None
}

final case class BloomSpec(expectedEntries: Int, fpp: Double)

/** Shared plumbing: PRESENT stream, per-row-group positions/stats/blooms. */
abstract class PrimitiveColumnWriter(val columnId: Int) extends ColumnWriter {
  protected var present = new PresentWriter
  protected val presentCps = new ArrayBuffer[(Int, Int)]
  protected val dataCps = new ArrayBuffer[Array[Long]]
  protected val rgStats = new ArrayBuffer[ColStats]
  protected val rgBlooms = new ArrayBuffer[BloomFilter]
  protected var bloomSpec: Option[BloomSpec] = None
  protected var bloom: BloomFilter = null
  protected var closed = false

  protected def statsBuilder: StatsBuilder
  /** Positions of the non-PRESENT streams at the current point. */
  protected def dataCheckpoint(): Array[Long]
  protected def flushEncoders(): Unit
  /** Streams after PRESENT, in emission order. */
  protected def valueStreams: Seq[StreamData]
  protected def encoding: ColumnEncoding

  def beginRowGroup(): Unit = {
    presentCps += present.checkpoint()
    dataCps += dataCheckpoint()
    if (bloomSpec.isDefined && bloom == null)
      bloom = BloomFilter(bloomSpec.get.expectedEntries, bloomSpec.get.fpp)
  }

  def finishRowGroup(): Unit = {
    rgStats += statsBuilder.build()
    statsBuilder.reset()
    if (bloomSpec.isDefined) {
      rgBlooms += bloom
      bloom = BloomFilter(bloomSpec.get.expectedEntries, bloomSpec.get.fpp)
    }
  }

  def close(): Unit = { flushEncoders(); closed = true }

  def encodings: Seq[(Int, ColumnEncoding)] = Seq(columnId -> encoding)

  def dataStreams: Seq[StreamData] = {
    require(closed)
    present.finish().map(b => StreamData(StreamKind.Present, columnId, b)).toSeq ++ valueStreams
  }

  def indexEntries: Seq[(Int, Seq[RowGroupIndexEntry])] = {
    val hasPresent = present.materialized
    val entries = rgStats.indices.map { i =>
      val p = if (hasPresent) Array(presentCps(i)._1.toLong, presentCps(i)._2.toLong)
      else Array.empty[Long]
      RowGroupIndexEntry(p ++ dataCps(i), rgStats(i))
    }
    Seq(columnId -> entries)
  }

  def bloomFilters: Seq[(Int, Seq[BloomFilter])] =
    if (bloomSpec.isDefined) Seq(columnId -> rgBlooms.toSeq) else Nil

  def stripeStats: Seq[(Int, ColStats)] = Seq(columnId -> ColStats.mergeAll(rgStats))

  def reset(): Unit = {
    present = new PresentWriter
    presentCps.clear(); dataCps.clear(); rgStats.clear(); rgBlooms.clear()
    bloom = null
    closed = false
    resetEncoders()
  }
  protected def resetEncoders(): Unit
}

/** SHORT/INT/LONG (and DATE via days): PRESENT + DATA RLEv2 signed, DIRECT_V2
  * — /root/reference/pkg/store/LongColumnWriter.go.
  */
final class LongColumnWriter(id: Int, isDate: Boolean, bloomOpt: Option[BloomSpec],
    nanosToMicros: Boolean = false, rleCompat: Boolean = false)
    extends PrimitiveColumnWriter(id) {
  bloomSpec = bloomOpt
  private var data = new RleV2Writer(signed = true, refCompat = rleCompat)
  private val intStats = new IntStatsBuilder
  private val dateStats = new DateStatsBuilder
  protected def statsBuilder: StatsBuilder = if (isDate) dateStats else intStats

  def writeVec(v: ColVec): Unit = {
    present.appendVec(v.len, v.nulls)
    var i = 0
    while (i < v.len) {
      if (v.isNull(i)) statsBuilder.recordNull()
      else {
        // TIME: vec carries nanos-of-day, disk stores micros (stats/bloom
        // see the on-disk value) — TimeColumnWriter.go:30-32 semantics.
        // Sub-microsecond values are rejected rather than silently rounded:
        // Spark's TimeType is micro-precision so every Spark-fed value is
        // aligned; a raw core caller with real nanos would lose data.
        val x = if (nanosToMicros) {
          val n = v.longs(i)
          require(n % 1000L == 0,
            s"TIME value $n ns is not microsecond-aligned; MOTH TIME stores micros-of-day")
          n / 1000L
        } else v.longs(i)
        data.writeLong(x)
        if (isDate) dateStats.add(x.toInt) else intStats.add(x)
        if (bloom != null) bloom.addLong(x)
      }
      i += 1
    }
  }

  protected def dataCheckpoint(): Array[Long] = {
    val (off, pend) = data.checkpoint(); Array(off.toLong, pend.toLong)
  }
  protected def flushEncoders(): Unit = data.flush()
  protected def valueStreams: Seq[StreamData] =
    Seq(StreamData(StreamKind.Data, columnId, data.out.toArray))
  protected def encoding: ColumnEncoding = ColumnEncoding(EncodingKind.DirectV2)
  def bufferedBytes: Long = present.bufferedBytes + data.out.size
  protected def resetEncoders(): Unit =
    data = new RleV2Writer(signed = true, refCompat = rleCompat)
}

/** BYTE: PRESENT + DATA byte-RLE, DIRECT — ByteColumnWriter.go. */
final class ByteColumnWriter(id: Int) extends PrimitiveColumnWriter(id) {
  private var data = new ByteRleWriter()
  private val stats = new IntStatsBuilder
  protected def statsBuilder: StatsBuilder = stats

  def writeVec(v: ColVec): Unit = {
    present.appendVec(v.len, v.nulls)
    var i = 0
    while (i < v.len) {
      if (v.isNull(i)) stats.recordNull()
      else { data.writeByte(v.longs(i).toByte); stats.add(v.longs(i)) }
      i += 1
    }
  }
  protected def dataCheckpoint(): Array[Long] = {
    val (off, pend) = data.checkpoint(); Array(off.toLong, pend.toLong)
  }
  protected def flushEncoders(): Unit = data.flush()
  protected def valueStreams: Seq[StreamData] =
    Seq(StreamData(StreamKind.Data, columnId, data.out.toArray))
  protected def encoding: ColumnEncoding = ColumnEncoding(EncodingKind.Direct)
  def bufferedBytes: Long = present.bufferedBytes + data.out.size
  protected def resetEncoders(): Unit = data = new ByteRleWriter()
}

/** BOOLEAN: PRESENT + DATA bit stream, DIRECT — BooleanColumnWriter.go. */
final class BooleanColumnWriter(id: Int) extends PrimitiveColumnWriter(id) {
  private var data = new BooleanWriter()
  private val stats = new BooleanStatsBuilder
  protected def statsBuilder: StatsBuilder = stats

  def writeVec(v: ColVec): Unit = {
    present.appendVec(v.len, v.nulls)
    var i = 0
    while (i < v.len) {
      if (v.isNull(i)) stats.recordNull()
      else { val b = v.longs(i) != 0; data.writeBoolean(b); stats.add(b) }
      i += 1
    }
  }
  protected def dataCheckpoint(): Array[Long] = {
    val (off, bits) = data.checkpoint(); Array(off.toLong, bits.toLong)
  }
  protected def flushEncoders(): Unit = data.flush()
  protected def valueStreams: Seq[StreamData] =
    Seq(StreamData(StreamKind.Data, columnId, data.out.toArray))
  protected def encoding: ColumnEncoding = ColumnEncoding(EncodingKind.Direct)
  def bufferedBytes: Long = present.bufferedBytes + data.out.size
  protected def resetEncoders(): Unit = data = new BooleanWriter()
}

/** FLOAT/DOUBLE: PRESENT + DATA raw IEEE-754 LE, DIRECT. */
final class DoubleColumnWriter(id: Int) extends PrimitiveColumnWriter(id) {
  private var data = new ByteBuf(256)
  private val stats = new DoubleStatsBuilder
  protected def statsBuilder: StatsBuilder = stats

  def writeVec(v: ColVec): Unit = {
    present.appendVec(v.len, v.nulls)
    var i = 0
    while (i < v.len) {
      if (v.isNull(i)) stats.recordNull()
      else {
        val d = v.doubles(i)
        data.writeLongLE(java.lang.Double.doubleToLongBits(d))
        stats.add(d)
      }
      i += 1
    }
  }
  protected def dataCheckpoint(): Array[Long] = Array(data.size.toLong)
  protected def flushEncoders(): Unit = ()
  protected def valueStreams: Seq[StreamData] =
    Seq(StreamData(StreamKind.Data, columnId, data.toArray))
  protected def encoding: ColumnEncoding = ColumnEncoding(EncodingKind.Direct)
  def bufferedBytes: Long = present.bufferedBytes + data.size
  protected def resetEncoders(): Unit = data = new ByteBuf(256)
}

final class FloatColumnWriter(id: Int) extends PrimitiveColumnWriter(id) {
  private var data = new ByteBuf(256)
  private val stats = new DoubleStatsBuilder
  protected def statsBuilder: StatsBuilder = stats

  def writeVec(v: ColVec): Unit = {
    present.appendVec(v.len, v.nulls)
    var i = 0
    while (i < v.len) {
      if (v.isNull(i)) stats.recordNull()
      else {
        val f = v.doubles(i).toFloat
        data.writeIntLE(java.lang.Float.floatToIntBits(f))
        stats.add(f.toDouble)
      }
      i += 1
    }
  }
  protected def dataCheckpoint(): Array[Long] = Array(data.size.toLong)
  protected def flushEncoders(): Unit = ()
  protected def valueStreams: Seq[StreamData] =
    Seq(StreamData(StreamKind.Data, columnId, data.toArray))
  protected def encoding: ColumnEncoding = ColumnEncoding(EncodingKind.Direct)
  def bufferedBytes: Long = present.bufferedBytes + data.size
  protected def resetEncoders(): Unit = data = new ByteBuf(256)
}

object TimestampColumnWriter {
  /** 2015-01-01T00:00:00Z — the ORC timestamp base. The reference writer
    * mis-computes this as 0 while its reader uses the true value
    * (/root/reference/pkg/store/TimestampColumnWriter.go:17 vs
    * TimestampColumnReader.go:29-31); we use the spec value on both sides
    * (SURVEY.md §7.3 deviation note).
    */
  val Epoch2015Seconds: Long = 1420070400L

  /** Trailing-zero-suppressed nanos per the ORC spec
    * (TimestampColumnWriter.go:306-320 comment table).
    */
  def encodeNanos(nanos: Long): Long = {
    if (nanos == 0) 0L
    else if (nanos % 100 != 0) nanos << 3
    else {
      var n = nanos / 100
      var zeros = 2
      while (n % 10 == 0 && zeros < 7) { n /= 10; zeros += 1 }
      (n << 3) | zeros
    }
  }

  def decodeNanos(v: Long): Long = {
    val z = (v & 7).toInt
    var n = v >>> 3
    var i = 0
    while (i < z) { n *= 10; i += 1 }
    n
  }
}

/** TIMESTAMP: PRESENT + DATA seconds-since-2015 (RLEv2 signed) + SECONDARY
  * encodeNanos (RLEv2 unsigned), DIRECT_V2. Input micros since epoch UTC.
  */
final class TimestampColumnWriter(id: Int, rleCompat: Boolean = false)
    extends PrimitiveColumnWriter(id) {
  import TimestampColumnWriter._
  private var seconds = new RleV2Writer(signed = true, refCompat = rleCompat)
  private var nanos = new RleV2Writer(signed = false, refCompat = rleCompat)
  private val stats = new TimestampStatsBuilder
  protected def statsBuilder: StatsBuilder = stats

  def writeVec(v: ColVec): Unit = {
    present.appendVec(v.len, v.nulls)
    var i = 0
    while (i < v.len) {
      if (v.isNull(i)) stats.recordNull()
      else {
        val micros = v.longs(i)
        val sec = Math.floorDiv(micros, 1000000L)
        val ns = Math.floorMod(micros, 1000000L) * 1000L
        seconds.writeLong(sec - Epoch2015Seconds)
        nanos.writeLong(encodeNanos(ns))
        stats.addMillis(Math.floorDiv(micros, 1000L))
      }
      i += 1
    }
  }
  protected def dataCheckpoint(): Array[Long] = {
    val (o1, p1) = seconds.checkpoint()
    val (o2, p2) = nanos.checkpoint()
    Array(o1.toLong, p1.toLong, o2.toLong, p2.toLong)
  }
  protected def flushEncoders(): Unit = { seconds.flush(); nanos.flush() }
  protected def valueStreams: Seq[StreamData] = Seq(
    StreamData(StreamKind.Data, columnId, seconds.out.toArray),
    StreamData(StreamKind.Secondary, columnId, nanos.out.toArray))
  protected def encoding: ColumnEncoding = ColumnEncoding(EncodingKind.DirectV2)
  def bufferedBytes: Long = present.bufferedBytes + seconds.out.size + nanos.out.size
  protected def resetEncoders(): Unit = {
    seconds = new RleV2Writer(signed = true, refCompat = rleCompat)
    nanos = new RleV2Writer(signed = false, refCompat = rleCompat)
  }
}

/** DECIMAL: PRESENT + DATA varint unscaled + SECONDARY RLEv2 scale,
  * DIRECT_V2 — DecimalColumnWriter.go. p≤18 uses signed vlong; larger uses
  * zigzag'd BigInt varints (self-consistent encoding; reference uses an
  * equivalent Int128 varint, DecimalOutputStream.go:30-53).
  */
final class DecimalColumnWriter(id: Int, precision: Int, scale: Int,
    rleCompat: Boolean = false) extends PrimitiveColumnWriter(id) {
  private var data = new ByteBuf(256)
  private var scaleStream = new RleV2Writer(signed = true, refCompat = rleCompat)
  private val stats = new DecimalStatsBuilder
  protected def statsBuilder: StatsBuilder = stats

  def writeVec(v: ColVec): Unit = {
    present.appendVec(v.len, v.nulls)
    var i = 0
    while (i < v.len) {
      if (v.isNull(i)) stats.recordNull()
      else {
        if (precision <= 18) {
          data.writeVslong(v.longs(i))
          stats.add(BigDecimal(BigInt(v.longs(i)), scale))
        } else {
          writeBigVarint(v.bigs(i))
          stats.add(BigDecimal(v.bigs(i), scale))
        }
        scaleStream.writeLong(scale.toLong)
      }
      i += 1
    }
  }

  private def writeBigVarint(v0: BigInt): Unit = {
    var zz = if (v0 >= 0) v0 << 1 else (-v0 << 1) - 1
    while (zz > 127) {
      data.writeByte(0x80 | (zz & 0x7f).toInt)
      zz >>= 7
    }
    data.writeByte(zz.toInt)
  }

  protected def dataCheckpoint(): Array[Long] = {
    val (o, p) = scaleStream.checkpoint()
    Array(data.size.toLong, o.toLong, p.toLong)
  }
  protected def flushEncoders(): Unit = scaleStream.flush()
  protected def valueStreams: Seq[StreamData] = Seq(
    StreamData(StreamKind.Data, columnId, data.toArray),
    StreamData(StreamKind.Secondary, columnId, scaleStream.out.toArray))
  protected def encoding: ColumnEncoding = ColumnEncoding(EncodingKind.DirectV2)
  def bufferedBytes: Long = present.bufferedBytes + data.size + scaleStream.out.size
  protected def resetEncoders(): Unit = {
    data = new ByteBuf(256)
    scaleStream = new RleV2Writer(signed = true, refCompat = rleCompat)
  }
}

/** BINARY (and direct strings): PRESENT + LENGTH RLEv2 unsigned + DATA raw
  * bytes, DIRECT_V2 — SliceDirectColumnWriter.go.
  */
class BinaryColumnWriter(id: Int, stats: StatsBuilder, rleCompat: Boolean = false)
    extends PrimitiveColumnWriter(id) {
  protected var lengths = new RleV2Writer(signed = false, refCompat = rleCompat)
  protected var data = new ByteBuf(1024)
  protected def statsBuilder: StatsBuilder = stats

  def writeVec(v: ColVec): Unit = {
    present.appendVec(v.len, v.nulls)
    var i = 0
    if (v.packed != null) {
      while (i < v.len) {
        if (v.isNull(i)) stats.recordNull()
        else writeValue(v.packed, v.binOff(i), v.binLen(i))
        i += 1
      }
    } else {
      while (i < v.len) {
        if (v.isNull(i)) stats.recordNull()
        else writeValue(v.bins(i))
        i += 1
      }
    }
  }

  def writeValue(b: Array[Byte]): Unit = writeValue(b, 0, b.length)

  def writeValue(b: Array[Byte], off: Int, len: Int): Unit = {
    lengths.writeLong(len.toLong)
    data.writeBytes(b, off, len)
    stats match {
      case s: BinaryStatsBuilder => s.add(len)
      case s: StringStatsBuilder => s.add(b, off, len)
      case _ =>
    }
    if (bloom != null) bloom.addBytes(b, off, len)
  }

  def recordNullValue(): Unit = stats.recordNull()

  // replay hooks for dictionary→direct conversion
  def setBloomSpec(s: BloomSpec): Unit = bloomSpec = Some(s)
  def appendNull(): Unit = present.append(false)
  def appendNonNull(): Unit = present.append(true)

  protected def dataCheckpoint(): Array[Long] = {
    val (o, p) = lengths.checkpoint()
    Array(o.toLong, p.toLong, data.size.toLong)
  }
  protected def flushEncoders(): Unit = lengths.flush()
  protected def valueStreams: Seq[StreamData] = Seq(
    StreamData(StreamKind.Length, columnId, lengths.out.toArray),
    StreamData(StreamKind.Data, columnId, data.toArray))
  protected def encoding: ColumnEncoding = ColumnEncoding(EncodingKind.DirectV2)
  def bufferedBytes: Long = present.bufferedBytes + lengths.out.size + data.size
  protected def resetEncoders(): Unit = {
    lengths = new RleV2Writer(signed = false, refCompat = rleCompat)
    data = new ByteBuf(1024)
  }
}

/** LIST: PRESENT + LENGTH + recursive element — ListColumnWriter.go. */
final class ListColumnWriter(val columnId: Int, val elem: ColumnWriter,
    rleCompat: Boolean = false) extends ColumnWriter {
  private var present = new PresentWriter
  private val presentCps = new ArrayBuffer[(Int, Int)]
  private val lengthCps = new ArrayBuffer[(Int, Int)]
  private val rgStats = new ArrayBuffer[ColStats]
  private var lengths = new RleV2Writer(signed = false, refCompat = rleCompat)
  private val stats = new CountStatsBuilder
  private var closed = false

  def beginRowGroup(): Unit = {
    presentCps += present.checkpoint()
    lengthCps += lengths.checkpoint()
    elem.beginRowGroup()
  }
  def writeVec(v: ColVec): Unit = {
    present.appendVec(v.len, v.nulls)
    var i = 0
    while (i < v.len) {
      if (v.isNull(i)) stats.recordNull()
      else { lengths.writeLong(v.lengths(i).toLong); stats.add() }
      i += 1
    }
    elem.writeVec(v.children(0))
  }
  def finishRowGroup(): Unit = {
    rgStats += stats.build(); stats.reset()
    elem.finishRowGroup()
  }
  def close(): Unit = { lengths.flush(); elem.close(); closed = true }
  def encodings: Seq[(Int, ColumnEncoding)] =
    Seq(columnId -> ColumnEncoding(EncodingKind.DirectV2)) ++ elem.encodings
  def dataStreams: Seq[StreamData] = {
    require(closed)
    present.finish().map(b => StreamData(StreamKind.Present, columnId, b)).toSeq ++
      Seq(StreamData(StreamKind.Length, columnId, lengths.out.toArray)) ++ elem.dataStreams
  }
  def indexEntries: Seq[(Int, Seq[RowGroupIndexEntry])] = {
    val hasPresent = present.materialized
    val mine = rgStats.indices.map { i =>
      val p = if (hasPresent) Array(presentCps(i)._1.toLong, presentCps(i)._2.toLong)
      else Array.empty[Long]
      RowGroupIndexEntry(p ++ Array(lengthCps(i)._1.toLong, lengthCps(i)._2.toLong), rgStats(i))
    }
    Seq(columnId -> mine) ++ elem.indexEntries
  }
  def bloomFilters: Seq[(Int, Seq[BloomFilter])] = elem.bloomFilters
  def stripeStats: Seq[(Int, ColStats)] =
    Seq(columnId -> ColStats.mergeAll(rgStats)) ++ elem.stripeStats
  def bufferedBytes: Long = present.bufferedBytes + lengths.out.size + elem.bufferedBytes
  def reset(): Unit = {
    present = new PresentWriter
    presentCps.clear(); lengthCps.clear(); rgStats.clear()
    lengths = new RleV2Writer(signed = false, refCompat = rleCompat)
    closed = false
    elem.reset()
  }
}

/** MAP: PRESENT + LENGTH + recursive key/value — MapColumnWriter.go. */
final class MapColumnWriter(val columnId: Int, val key: ColumnWriter,
    val value: ColumnWriter, rleCompat: Boolean = false) extends ColumnWriter {
  private var present = new PresentWriter
  private val presentCps = new ArrayBuffer[(Int, Int)]
  private val lengthCps = new ArrayBuffer[(Int, Int)]
  private val rgStats = new ArrayBuffer[ColStats]
  private var lengths = new RleV2Writer(signed = false, refCompat = rleCompat)
  private val stats = new CountStatsBuilder
  private var closed = false

  def beginRowGroup(): Unit = {
    presentCps += present.checkpoint()
    lengthCps += lengths.checkpoint()
    key.beginRowGroup(); value.beginRowGroup()
  }
  def writeVec(v: ColVec): Unit = {
    present.appendVec(v.len, v.nulls)
    var i = 0
    while (i < v.len) {
      if (v.isNull(i)) stats.recordNull()
      else { lengths.writeLong(v.lengths(i).toLong); stats.add() }
      i += 1
    }
    key.writeVec(v.children(0))
    value.writeVec(v.children(1))
  }
  def finishRowGroup(): Unit = {
    rgStats += stats.build(); stats.reset()
    key.finishRowGroup(); value.finishRowGroup()
  }
  def close(): Unit = { lengths.flush(); key.close(); value.close(); closed = true }
  def encodings: Seq[(Int, ColumnEncoding)] =
    Seq(columnId -> ColumnEncoding(EncodingKind.DirectV2)) ++ key.encodings ++ value.encodings
  def dataStreams: Seq[StreamData] = {
    require(closed)
    present.finish().map(b => StreamData(StreamKind.Present, columnId, b)).toSeq ++
      Seq(StreamData(StreamKind.Length, columnId, lengths.out.toArray)) ++
      key.dataStreams ++ value.dataStreams
  }
  def indexEntries: Seq[(Int, Seq[RowGroupIndexEntry])] = {
    val hasPresent = present.materialized
    val mine = rgStats.indices.map { i =>
      val p = if (hasPresent) Array(presentCps(i)._1.toLong, presentCps(i)._2.toLong)
      else Array.empty[Long]
      RowGroupIndexEntry(p ++ Array(lengthCps(i)._1.toLong, lengthCps(i)._2.toLong), rgStats(i))
    }
    Seq(columnId -> mine) ++ key.indexEntries ++ value.indexEntries
  }
  def bloomFilters: Seq[(Int, Seq[BloomFilter])] = key.bloomFilters ++ value.bloomFilters
  def stripeStats: Seq[(Int, ColStats)] =
    Seq(columnId -> ColStats.mergeAll(rgStats)) ++ key.stripeStats ++ value.stripeStats
  def bufferedBytes: Long =
    present.bufferedBytes + lengths.out.size + key.bufferedBytes + value.bufferedBytes
  def reset(): Unit = {
    present = new PresentWriter
    presentCps.clear(); lengthCps.clear(); rgStats.clear()
    lengths = new RleV2Writer(signed = false, refCompat = rleCompat)
    closed = false
    key.reset(); value.reset()
  }
}

/** STRUCT: PRESENT only + recursive fields — StructColumnWriter.go. */
final class StructColumnWriter(val columnId: Int, val fields: Seq[ColumnWriter])
    extends ColumnWriter {
  private var present = new PresentWriter
  private val presentCps = new ArrayBuffer[(Int, Int)]
  private val rgStats = new ArrayBuffer[ColStats]
  private val stats = new CountStatsBuilder
  private var closed = false

  def beginRowGroup(): Unit = {
    presentCps += present.checkpoint()
    fields.foreach(_.beginRowGroup())
  }
  def writeVec(v: ColVec): Unit = {
    present.appendVec(v.len, v.nulls)
    if (v.nulls == null) {
      var r = 0
      while (r < v.len) { stats.add(); r += 1 }
    } else {
      var r = 0
      while (r < v.len) { if (v.nulls(r)) stats.recordNull() else stats.add(); r += 1 }
    }
    var i = 0
    while (i < fields.length) { fields(i).writeVec(v.children(i)); i += 1 }
  }
  def finishRowGroup(): Unit = {
    rgStats += stats.build(); stats.reset()
    fields.foreach(_.finishRowGroup())
  }
  def close(): Unit = { fields.foreach(_.close()); closed = true }
  def encodings: Seq[(Int, ColumnEncoding)] =
    Seq(columnId -> ColumnEncoding(EncodingKind.Direct)) ++ fields.flatMap(_.encodings)
  def dataStreams: Seq[StreamData] = {
    require(closed)
    present.finish().map(b => StreamData(StreamKind.Present, columnId, b)).toSeq ++
      fields.flatMap(_.dataStreams)
  }
  def indexEntries: Seq[(Int, Seq[RowGroupIndexEntry])] = {
    val hasPresent = present.materialized
    val mine = rgStats.indices.map { i =>
      val p = if (hasPresent) Array(presentCps(i)._1.toLong, presentCps(i)._2.toLong)
      else Array.empty[Long]
      RowGroupIndexEntry(p, rgStats(i))
    }
    Seq(columnId -> mine) ++ fields.flatMap(_.indexEntries)
  }
  def bloomFilters: Seq[(Int, Seq[BloomFilter])] = fields.flatMap(_.bloomFilters)
  def stripeStats: Seq[(Int, ColStats)] =
    Seq(columnId -> ColStats.mergeAll(rgStats)) ++ fields.flatMap(_.stripeStats)
  def bufferedBytes: Long = present.bufferedBytes + fields.map(_.bufferedBytes).sum
  def reset(): Unit = {
    present = new PresentWriter
    presentCps.clear(); rgStats.clear()
    closed = false
    fields.foreach(_.reset())
  }
}

/** UNION: PRESENT + DATA tag byte-RLE + per-alternative children, DIRECT.
  * WRITE support is a documented extension — the reference's writer panics
  * on unions (its reader semantics are in UnionColumnReader.go). Input vecs
  * use the EXPANDED struct shape (children(0) = tag dense over non-null
  * rows; children(i+1) = alternative i with nulls where the tag differs);
  * the writer compacts each alternative to its dense per-tag stream.
  */
final class UnionColumnWriter(val columnId: Int, val alts: Seq[ColumnWriter])
    extends ColumnWriter {
  private var present = new PresentWriter
  private var tags = new graft.core.rle.ByteRleWriter()
  private val presentCps = new ArrayBuffer[(Int, Int)]
  private val tagCps = new ArrayBuffer[(Int, Int)]
  private val rgStats = new ArrayBuffer[ColStats]
  private val stats = new CountStatsBuilder
  private var closed = false

  def beginRowGroup(): Unit = {
    presentCps += present.checkpoint()
    tagCps += tags.checkpoint()
    alts.foreach(_.beginRowGroup())
  }

  def writeVec(v: ColVec): Unit = {
    present.appendVec(v.len, v.nulls)
    val tagv = v.children(0)
    var i = 0
    var d = 0
    while (i < v.len) {
      if (v.isNull(i)) stats.recordNull()
      else {
        tags.writeByte(tagv.longs(d).toByte)
        stats.add()
        d += 1
      }
      i += 1
    }
    var t = 0
    while (t < alts.length) {
      alts(t).writeVec(compactAlt(tagv, v.children(t + 1), t))
      t += 1
    }
  }

  /** Rows of the expanded alternative vec whose tag equals `t`, dense. */
  private def compactAlt(tagv: ColVec, e: ColVec, t: Int): ColVec = {
    require(e.packed == null, "packed vecs not supported for union alternatives")
    val nn = tagv.len
    var count = 0
    var j = 0
    while (j < nn) { if (tagv.longs(j) == t) count += 1; j += 1 }
    val out = new ColVec(count)
    if (e.nulls != null) out.nulls = new Array[Boolean](count)
    if (e.longs != null) out.longs = new Array[Long](count)
    if (e.doubles != null) out.doubles = new Array[Double](count)
    if (e.bins != null) out.bins = new Array[Array[Byte]](count)
    if (e.bigs != null) out.bigs = new Array[BigInt](count)
    if (e.lengths != null) out.lengths = new Array[Int](count)
    out.children = e.children
    var k = 0
    j = 0
    while (j < nn) {
      if (tagv.longs(j) == t) {
        if (out.nulls != null) out.nulls(k) = e.nulls(j)
        if (out.longs != null) out.longs(k) = e.longs(j)
        if (out.doubles != null) out.doubles(k) = e.doubles(j)
        if (out.bins != null) out.bins(k) = e.bins(j)
        if (out.bigs != null) out.bigs(k) = e.bigs(j)
        if (out.lengths != null) out.lengths(k) = e.lengths(j)
        k += 1
      }
      j += 1
    }
    out
  }

  def finishRowGroup(): Unit = {
    rgStats += stats.build(); stats.reset()
    alts.foreach(_.finishRowGroup())
  }
  def close(): Unit = { tags.flush(); alts.foreach(_.close()); closed = true }
  def encodings: Seq[(Int, ColumnEncoding)] =
    Seq(columnId -> ColumnEncoding(EncodingKind.Direct)) ++ alts.flatMap(_.encodings)
  def dataStreams: Seq[StreamData] = {
    require(closed)
    present.finish().map(b => StreamData(StreamKind.Present, columnId, b)).toSeq ++
      Seq(StreamData(StreamKind.Data, columnId, tags.out.toArray)) ++
      alts.flatMap(_.dataStreams)
  }
  def indexEntries: Seq[(Int, Seq[RowGroupIndexEntry])] = {
    val hasPresent = present.materialized
    val mine = rgStats.indices.map { i =>
      val p = if (hasPresent) Array(presentCps(i)._1.toLong, presentCps(i)._2.toLong)
      else Array.empty[Long]
      RowGroupIndexEntry(p ++ Array(tagCps(i)._1.toLong, tagCps(i)._2.toLong), rgStats(i))
    }
    Seq(columnId -> mine) ++ alts.flatMap(_.indexEntries)
  }
  def bloomFilters: Seq[(Int, Seq[BloomFilter])] = alts.flatMap(_.bloomFilters)
  def stripeStats: Seq[(Int, ColStats)] =
    Seq(columnId -> ColStats.mergeAll(rgStats)) ++ alts.flatMap(_.stripeStats)
  def bufferedBytes: Long =
    present.bufferedBytes + tags.out.size + alts.map(_.bufferedBytes).sum
  def reset(): Unit = {
    present = new PresentWriter
    tags = new graft.core.rle.ByteRleWriter()
    presentCps.clear(); tagCps.clear(); rgStats.clear()
    closed = false
    alts.foreach(_.reset())
  }
}
