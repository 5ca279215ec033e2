package graft.core.file

import graft.core.columns._
import graft.core.io.ByteRd
import graft.core.rle._
import graft.core.fsst.FsstTable

/** Decompressed streams + encodings of one stripe, keyed (column, kind). */
final class StripeStreams(streams: Map[(Int, Int), Array[Byte]],
    encodings: Map[Int, ColumnEncoding]) {
  def apply(col: Int, kind: Int): Option[Array[Byte]] = streams.get((col, kind))
  def encoding(col: Int): ColumnEncoding = encodings.getOrElse(col, ColumnEncoding(0))
}

/** Hands out one ROW_INDEX entry's position values in writer emission order
  * — the reference's PositionProvider (pkg/store/Checkpoints.go:10-40).
  */
final class PositionCursor(positions: Array[Long]) {
  private var i = 0
  def next(): Long = { val v = positions(i); i += 1; v }
}

/** Streaming column decoder — mirror of the writers; role analog of the
  * reference's ColumnReaders (/root/reference/pkg/store/ColumnReaders.go).
  * skip() decodes-and-discards (cheap for RLE); seek() jumps every stream
  * of the subtree to a row-group checkpoint so skipped groups cost no
  * decode at all (reference StripeReader.go:182-215 + Checkpoints.go).
  */
trait ColumnReader {
  def columnId: Int
  def startStripe(s: StripeStreams): Unit
  def read(n: Int): ColVec
  def skip(n: Long): Unit
  /** entryOf(columnId) = that column's ROW_INDEX positions for the target
    * row group; position layout mirrors the writer's checkpoint order.
    */
  def seek(entryOf: Int => Array[Long]): Unit
}

object ColumnReader {
  def createTree(t: MothType, id: Int = 0): ColumnReader = {
    var next = id
    def create(t: MothType): ColumnReader = {
      val my = next
      next += 1
      t match {
        case MothType.TBoolean => new BoolColumnReader(my)
        case MothType.TByte => new ByteColumnReader(my)
        case MothType.TShort | MothType.TInt | MothType.TLong | MothType.TDate =>
          new LongColumnReader(my)
        case MothType.TTime => new LongColumnReader(my, microsToNanos = true)
        case MothType.TFloat => new FloatColumnReader(my)
        case MothType.TDouble => new DoubleColumnReader(my)
        case MothType.TTimestamp | MothType.TTimestampInstant => new TimestampColumnReader(my)
        case d: MothType.TDecimal => new DecimalColumnReader(my, d.precision)
        case MothType.TBinary => new StringColumnReader(my)
        case MothType.TString | _: MothType.TVarchar | _: MothType.TChar =>
          new StringColumnReader(my)
        case l: MothType.TList => new ListColumnReader(my, create(l.elem))
        case m: MothType.TMap => new MapColumnReader(my, create(m.key), create(m.value))
        case s: MothType.TStruct => new StructColumnReader(my, s.fields.map(f => create(f._2)))
        case u: MothType.TUnion => new UnionColumnReader(my, u.alts.map(create))
      }
    }
    create(t)
  }
}

abstract class PrimitiveColumnReader(val columnId: Int) extends ColumnReader {
  protected var present: BooleanReader = null

  protected def startValues(s: StripeStreams): Unit

  def startStripe(s: StripeStreams): Unit = {
    present = s(columnId, StreamKind.Present)
      .map(b => new BooleanReader(new ByteRd(b))).orNull
    startValues(s)
  }

  /** Fills v.nulls (or leaves null) and returns the non-null count. */
  protected def readPresent(v: ColVec, n: Int): Int = {
    if (present == null) return n
    val nulls = new Array[Boolean](n)
    var nonNull = 0
    var i = 0
    while (i < n) {
      val p = present.nextBoolean()
      nulls(i) = !p
      if (p) nonNull += 1
      i += 1
    }
    v.nulls = nulls
    nonNull
  }

  protected def skipPresent(n: Long): Long = {
    if (present == null) return n
    var nonNull = 0L
    var i = 0L
    while (i < n) {
      if (present.nextBoolean()) nonNull += 1
      i += 1
    }
    nonNull
  }

  final def seek(entryOf: Int => Array[Long]): Unit = {
    val pc = new PositionCursor(entryOf(columnId))
    if (present != null) present.seek(pc.next(), pc.next())
    seekValues(pc)
  }
  /** Position the value streams; consumes this column's remaining positions
    * in the writer's dataCheckpoint order.
    */
  protected def seekValues(pc: PositionCursor): Unit
}

final class LongColumnReader(id: Int, microsToNanos: Boolean = false)
    extends PrimitiveColumnReader(id) {
  private var data: RleV2Reader = null
  protected def startValues(s: StripeStreams): Unit =
    data = new RleV2Reader(new ByteRd(s(id, StreamKind.Data).getOrElse(Array.empty)), signed = true)

  def read(n: Int): ColVec = {
    val v = new ColVec(n)
    v.longs = new Array[Long](n)
    val nonNull = readPresent(v, n)
    if (nonNull == n) data.next(v.longs, 0, n)
    else {
      val tmp = new Array[Long](nonNull)
      data.next(tmp, 0, nonNull)
      var i = 0; var j = 0
      while (i < n) { if (!v.nulls(i)) { v.longs(i) = tmp(j); j += 1 }; i += 1 }
    }
    if (microsToNanos) {
      // TIME: disk stores micros-of-day, the vec carries Spark's nanos
      var i = 0
      while (i < n) { v.longs(i) = v.longs(i) * 1000L; i += 1 }
    }
    v
  }
  def skip(n: Long): Unit = data.skip(skipPresent(n))
  protected def seekValues(pc: PositionCursor): Unit = data.seek(pc.next(), pc.next())
}

final class ByteColumnReader(id: Int) extends PrimitiveColumnReader(id) {
  private var data: ByteRleReader = null
  protected def startValues(s: StripeStreams): Unit =
    data = new ByteRleReader(new ByteRd(s(id, StreamKind.Data).getOrElse(Array.empty)))

  def read(n: Int): ColVec = {
    val v = new ColVec(n)
    v.longs = new Array[Long](n)
    val nonNull = readPresent(v, n)
    val tmp = new Array[Byte](nonNull)
    data.next(tmp, 0, nonNull)
    var i = 0; var j = 0
    while (i < n) { if (!v.isNull(i)) { v.longs(i) = tmp(j).toLong; j += 1 }; i += 1 }
    v
  }
  def skip(n: Long): Unit = data.skip(skipPresent(n))
  protected def seekValues(pc: PositionCursor): Unit = data.seek(pc.next(), pc.next())
}

final class BoolColumnReader(id: Int) extends PrimitiveColumnReader(id) {
  private var data: BooleanReader = null
  protected def startValues(s: StripeStreams): Unit =
    data = new BooleanReader(new ByteRd(s(id, StreamKind.Data).getOrElse(Array.empty)))

  def read(n: Int): ColVec = {
    val v = new ColVec(n)
    v.longs = new Array[Long](n)
    readPresent(v, n)
    var i = 0
    while (i < n) {
      if (!v.isNull(i)) v.longs(i) = if (data.nextBoolean()) 1L else 0L
      i += 1
    }
    v
  }
  def skip(n: Long): Unit = data.skip(skipPresent(n))
  protected def seekValues(pc: PositionCursor): Unit = data.seek(pc.next(), pc.next())
}

final class DoubleColumnReader(id: Int) extends PrimitiveColumnReader(id) {
  private var data: ByteRd = null
  protected def startValues(s: StripeStreams): Unit =
    data = new ByteRd(s(id, StreamKind.Data).getOrElse(Array.empty))

  def read(n: Int): ColVec = {
    val v = new ColVec(n)
    v.doubles = new Array[Double](n)
    readPresent(v, n)
    var i = 0
    while (i < n) {
      if (!v.isNull(i)) v.doubles(i) = java.lang.Double.longBitsToDouble(data.readLongLE())
      i += 1
    }
    v
  }
  def skip(n: Long): Unit = data.skip((skipPresent(n) * 8).toInt)
  protected def seekValues(pc: PositionCursor): Unit = data.pos = pc.next().toInt
}

final class FloatColumnReader(id: Int) extends PrimitiveColumnReader(id) {
  private var data: ByteRd = null
  protected def startValues(s: StripeStreams): Unit =
    data = new ByteRd(s(id, StreamKind.Data).getOrElse(Array.empty))

  def read(n: Int): ColVec = {
    val v = new ColVec(n)
    v.doubles = new Array[Double](n)
    readPresent(v, n)
    var i = 0
    while (i < n) {
      if (!v.isNull(i)) v.doubles(i) = java.lang.Float.intBitsToFloat(data.readIntLE()).toDouble
      i += 1
    }
    v
  }
  def skip(n: Long): Unit = data.skip((skipPresent(n) * 4).toInt)
  protected def seekValues(pc: PositionCursor): Unit = data.pos = pc.next().toInt
}

final class TimestampColumnReader(id: Int) extends PrimitiveColumnReader(id) {
  import TimestampColumnWriter._
  private var seconds: RleV2Reader = null
  private var nanos: RleV2Reader = null
  protected def startValues(s: StripeStreams): Unit = {
    seconds = new RleV2Reader(new ByteRd(s(id, StreamKind.Data).getOrElse(Array.empty)), signed = true)
    nanos = new RleV2Reader(new ByteRd(s(id, StreamKind.Secondary).getOrElse(Array.empty)), signed = false)
  }

  def read(n: Int): ColVec = {
    val v = new ColVec(n)
    v.longs = new Array[Long](n)
    readPresent(v, n)
    var i = 0
    while (i < n) {
      if (!v.isNull(i)) {
        val sec = seconds.nextLong() + Epoch2015Seconds
        val ns = decodeNanos(nanos.nextLong())
        v.longs(i) = sec * 1000000L + ns / 1000L
      }
      i += 1
    }
    v
  }
  def skip(n: Long): Unit = {
    val k = skipPresent(n)
    seconds.skip(k); nanos.skip(k)
  }
  protected def seekValues(pc: PositionCursor): Unit = {
    seconds.seek(pc.next(), pc.next())
    nanos.seek(pc.next(), pc.next())
  }
}

final class DecimalColumnReader(id: Int, precision: Int) extends PrimitiveColumnReader(id) {
  private var data: ByteRd = null
  protected def startValues(s: StripeStreams): Unit =
    data = new ByteRd(s(id, StreamKind.Data).getOrElse(Array.empty))

  def read(n: Int): ColVec = {
    val v = new ColVec(n)
    readPresent(v, n)
    if (precision <= 18) {
      v.longs = new Array[Long](n)
      var i = 0
      while (i < n) { if (!v.isNull(i)) v.longs(i) = data.readVslong(); i += 1 }
    } else {
      v.bigs = new Array[BigInt](n)
      var i = 0
      while (i < n) { if (!v.isNull(i)) v.bigs(i) = readBigVarint(); i += 1 }
    }
    v
  }

  private def readBigVarint(): BigInt = {
    var zz = BigInt(0)
    var shift = 0
    var b = 0
    while ({ b = data.readByte(); (b & 0x80) != 0 }) {
      zz |= BigInt(b & 0x7f) << shift
      shift += 7
    }
    zz |= BigInt(b) << shift
    if (zz.testBit(0)) -((zz + 1) >> 1) else zz >> 1
  }

  def skip(n: Long): Unit = {
    val k = skipPresent(n)
    var i = 0L
    while (i < k) {
      while ((data.readByte() & 0x80) != 0) {}
      i += 1
    }
  }
  // positions: (data byte offset, scale-stream offset, scale pending) — the
  // scale stream is written but never read (scale is fixed by the type)
  protected def seekValues(pc: PositionCursor): Unit = data.pos = pc.next().toInt
}

/** STRING/VARCHAR/CHAR/BINARY — dispatches DIRECT_V2 | DICTIONARY_V2 |
  * DIRECT_FSST per the stripe's column encoding
  * (/root/reference/pkg/store/SliceColumnReader.go:48-61 analog).
  */
final class StringColumnReader(id: Int) extends PrimitiveColumnReader(id) {
  private var mode = EncodingKind.DirectV2
  private var lengths: RleV2Reader = null
  private var data: ByteRd = null
  private var dict: Array[Array[Byte]] = null
  private var fsst: FsstTable = null

  protected def startValues(s: StripeStreams): Unit = {
    mode = s.encoding(columnId).kind
    mode match {
      case EncodingKind.DictionaryV2 | EncodingKind.Dictionary =>
        val dictSize = s.encoding(columnId).dictionarySize
        val dictData = s(columnId, StreamKind.DictionaryData).getOrElse(Array.empty)
        val lenRd = new RleV2Reader(
          new ByteRd(s(columnId, StreamKind.Length).getOrElse(Array.empty)), signed = false)
        dict = new Array[Array[Byte]](dictSize)
        var off = 0
        var i = 0
        while (i < dictSize) {
          val l = lenRd.nextLong().toInt
          dict(i) = java.util.Arrays.copyOfRange(dictData, off, off + l)
          off += l
          i += 1
        }
        lengths = null
        data = null
        indices = new RleV2Reader(
          new ByteRd(s(columnId, StreamKind.Data).getOrElse(Array.empty)), signed = false)
      case EncodingKind.DirectFsst =>
        fsst = FsstTable.deserialize(s(columnId, StreamKind.DictionaryData).get)
        lengths = new RleV2Reader(
          new ByteRd(s(columnId, StreamKind.Length).getOrElse(Array.empty)), signed = false)
        data = new ByteRd(s(columnId, StreamKind.Data).getOrElse(Array.empty))
      case _ =>
        fsst = null
        lengths = new RleV2Reader(
          new ByteRd(s(columnId, StreamKind.Length).getOrElse(Array.empty)), signed = false)
        data = new ByteRd(s(columnId, StreamKind.Data).getOrElse(Array.empty))
    }
  }

  private var indices: RleV2Reader = null

  def read(n: Int): ColVec = {
    val v = new ColVec(n)
    v.bins = new Array[Array[Byte]](n)
    readPresent(v, n)
    var i = 0
    if (mode == EncodingKind.DictionaryV2 || mode == EncodingKind.Dictionary) {
      while (i < n) {
        if (!v.isNull(i)) v.bins(i) = dict(indices.nextLong().toInt)
        i += 1
      }
    } else if (mode == EncodingKind.DirectFsst) {
      while (i < n) {
        if (!v.isNull(i)) {
          val l = lengths.nextLong().toInt
          v.bins(i) = fsst.decodeToArray(data.buf, data.pos, l)
          data.skip(l)
        }
        i += 1
      }
    } else {
      while (i < n) {
        if (!v.isNull(i)) {
          val l = lengths.nextLong().toInt
          v.bins(i) = data.readBytes(l)
        }
        i += 1
      }
    }
    v
  }

  def skip(n: Long): Unit = {
    val k = skipPresent(n)
    if (mode == EncodingKind.DictionaryV2 || mode == EncodingKind.Dictionary) indices.skip(k)
    else {
      var i = 0L
      while (i < k) { data.skip(lengths.nextLong().toInt); i += 1 }
    }
  }
  protected def seekValues(pc: PositionCursor): Unit = {
    if (mode == EncodingKind.DictionaryV2 || mode == EncodingKind.Dictionary)
      indices.seek(pc.next(), pc.next())
    else {
      lengths.seek(pc.next(), pc.next())
      data.pos = pc.next().toInt
    }
  }
}

final class ListColumnReader(val columnId: Int, elem: ColumnReader) extends ColumnReader {
  private var present: BooleanReader = null
  private var lengths: RleV2Reader = null

  def startStripe(s: StripeStreams): Unit = {
    present = s(columnId, StreamKind.Present)
      .map(b => new BooleanReader(new ByteRd(b))).orNull
    lengths = new RleV2Reader(
      new ByteRd(s(columnId, StreamKind.Length).getOrElse(Array.empty)), signed = false)
    elem.startStripe(s)
  }

  def read(n: Int): ColVec = {
    val v = new ColVec(n)
    v.lengths = new Array[Int](n)
    if (present != null) {
      v.nulls = new Array[Boolean](n)
      var i = 0
      while (i < n) { v.nulls(i) = !present.nextBoolean(); i += 1 }
    }
    var total = 0
    var i = 0
    while (i < n) {
      if (!v.isNull(i)) { v.lengths(i) = lengths.nextLong().toInt; total += v.lengths(i) }
      i += 1
    }
    v.children = Array(elem.read(total))
    v
  }

  def skip(n: Long): Unit = {
    var nonNull = n
    if (present != null) {
      nonNull = 0
      var i = 0L
      while (i < n) { if (present.nextBoolean()) nonNull += 1; i += 1 }
    }
    var elems = 0L
    var i = 0L
    while (i < nonNull) { elems += lengths.nextLong(); i += 1 }
    elem.skip(elems)
  }

  def seek(entryOf: Int => Array[Long]): Unit = {
    val pc = new PositionCursor(entryOf(columnId))
    if (present != null) present.seek(pc.next(), pc.next())
    lengths.seek(pc.next(), pc.next())
    elem.seek(entryOf)
  }
}

final class MapColumnReader(val columnId: Int, key: ColumnReader, value: ColumnReader)
    extends ColumnReader {
  private var present: BooleanReader = null
  private var lengths: RleV2Reader = null

  def startStripe(s: StripeStreams): Unit = {
    present = s(columnId, StreamKind.Present)
      .map(b => new BooleanReader(new ByteRd(b))).orNull
    lengths = new RleV2Reader(
      new ByteRd(s(columnId, StreamKind.Length).getOrElse(Array.empty)), signed = false)
    key.startStripe(s); value.startStripe(s)
  }

  def read(n: Int): ColVec = {
    val v = new ColVec(n)
    v.lengths = new Array[Int](n)
    if (present != null) {
      v.nulls = new Array[Boolean](n)
      var i = 0
      while (i < n) { v.nulls(i) = !present.nextBoolean(); i += 1 }
    }
    var total = 0
    var i = 0
    while (i < n) {
      if (!v.isNull(i)) { v.lengths(i) = lengths.nextLong().toInt; total += v.lengths(i) }
      i += 1
    }
    v.children = Array(key.read(total), value.read(total))
    v
  }

  def skip(n: Long): Unit = {
    var nonNull = n
    if (present != null) {
      nonNull = 0
      var i = 0L
      while (i < n) { if (present.nextBoolean()) nonNull += 1; i += 1 }
    }
    var elems = 0L
    var i = 0L
    while (i < nonNull) { elems += lengths.nextLong(); i += 1 }
    key.skip(elems); value.skip(elems)
  }

  def seek(entryOf: Int => Array[Long]): Unit = {
    val pc = new PositionCursor(entryOf(columnId))
    if (present != null) present.seek(pc.next(), pc.next())
    lengths.seek(pc.next(), pc.next())
    key.seek(entryOf); value.seek(entryOf)
  }
}

final class StructColumnReader(val columnId: Int, val fields: Seq[ColumnReader])
    extends ColumnReader {
  private var present: BooleanReader = null

  def startStripe(s: StripeStreams): Unit = {
    present = s(columnId, StreamKind.Present)
      .map(b => new BooleanReader(new ByteRd(b))).orNull
    fields.foreach(_.startStripe(s))
  }

  def read(n: Int): ColVec = {
    val v = new ColVec(n)
    var nonNull = n
    if (present != null) {
      v.nulls = new Array[Boolean](n)
      nonNull = 0
      var i = 0
      while (i < n) {
        val p = present.nextBoolean()
        v.nulls(i) = !p
        if (p) nonNull += 1
        i += 1
      }
    }
    v.children = fields.map(_.read(nonNull)).toArray
    v
  }

  def skip(n: Long): Unit = {
    var nonNull = n
    if (present != null) {
      nonNull = 0
      var i = 0L
      while (i < n) { if (present.nextBoolean()) nonNull += 1; i += 1 }
    }
    fields.foreach(_.skip(nonNull))
  }

  def seek(entryOf: Int => Array[Long]): Unit = {
    if (present != null) {
      val pc = new PositionCursor(entryOf(columnId))
      present.seek(pc.next(), pc.next())
    }
    fields.foreach(_.seek(entryOf))
  }
}

/** UNION reader — tag byte stream selects the alternative per row
  * (/root/reference/pkg/store/UnionColumnReader.go:55-180). Emits the
  * EXPANDED struct shape: children(0) = tag (dense over non-null rows),
  * children(i+1) = alternative i spread over non-null rows with nulls where
  * the tag differs (the reference's RowBlock + UnpackLazyBlockLoader).
  */
final class UnionColumnReader(val columnId: Int, alts: Seq[ColumnReader])
    extends ColumnReader {
  private var present: BooleanReader = null
  private var tags: ByteRleReader = null

  def startStripe(s: StripeStreams): Unit = {
    present = s(columnId, StreamKind.Present)
      .map(b => new BooleanReader(new ByteRd(b))).orNull
    tags = new ByteRleReader(new ByteRd(s(columnId, StreamKind.Data).getOrElse(Array.empty)))
    alts.foreach(_.startStripe(s))
  }

  def read(n: Int): ColVec = {
    val v = new ColVec(n)
    var nonNull = n
    if (present != null) {
      v.nulls = new Array[Boolean](n)
      nonNull = 0
      var i = 0
      while (i < n) {
        val p = present.nextBoolean()
        v.nulls(i) = !p
        if (p) nonNull += 1
        i += 1
      }
    }
    val tagBytes = new Array[Byte](nonNull)
    tags.next(tagBytes, 0, nonNull)
    val tagVec = new ColVec(nonNull)
    tagVec.longs = new Array[Long](nonNull)
    val counts = new Array[Int](alts.length)
    var j = 0
    while (j < nonNull) {
      val t = tagBytes(j) & 0xff
      tagVec.longs(j) = t.toLong
      counts(t) += 1
      j += 1
    }
    val expanded = alts.indices.map { t =>
      expand(alts(t).read(counts(t)), tagBytes, t, nonNull)
    }
    v.children = (tagVec +: expanded).toArray
    v
  }

  /** Spread a dense per-tag vec over all non-null union rows (null where the
    * tag differs); nested children stay dense and aligned by construction.
    */
  private def expand(d: ColVec, tagBytes: Array[Byte], t: Int, nn: Int): ColVec = {
    val out = new ColVec(nn)
    out.nulls = new Array[Boolean](nn)
    if (d.longs != null) out.longs = new Array[Long](nn)
    if (d.doubles != null) out.doubles = new Array[Double](nn)
    if (d.bins != null) out.bins = new Array[Array[Byte]](nn)
    if (d.bigs != null) out.bigs = new Array[BigInt](nn)
    if (d.lengths != null) out.lengths = new Array[Int](nn)
    out.children = d.children
    var j = 0
    var k = 0
    while (j < nn) {
      if ((tagBytes(j) & 0xff) == t) {
        out.nulls(j) = d.isNull(k)
        if (out.longs != null) out.longs(j) = d.longs(k)
        if (out.doubles != null) out.doubles(j) = d.doubles(k)
        if (out.bins != null) out.bins(j) = d.bins(k)
        if (out.bigs != null) out.bigs(j) = d.bigs(k)
        if (out.lengths != null) out.lengths(j) = d.lengths(k)
        k += 1
      } else out.nulls(j) = true
      j += 1
    }
    out
  }

  def skip(n: Long): Unit = {
    var nonNull = n
    if (present != null) {
      nonNull = 0
      var i = 0L
      while (i < n) { if (present.nextBoolean()) nonNull += 1; i += 1 }
    }
    // tags must be decoded on skip: they decide each alternative's count
    val counts = new Array[Long](alts.length)
    var i = 0L
    while (i < nonNull) { counts(tags.nextByte() & 0xff) += 1; i += 1 }
    alts.indices.foreach(t => alts(t).skip(counts(t)))
  }

  def seek(entryOf: Int => Array[Long]): Unit = {
    val pc = new PositionCursor(entryOf(columnId))
    if (present != null) present.seek(pc.next(), pc.next())
    tags.seek(pc.next(), pc.next())
    alts.foreach(_.seek(entryOf))
  }
}
