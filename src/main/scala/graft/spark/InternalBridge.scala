package graft.spark

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.SpecializedGetters
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import graft.core.columns.ColVec

/** Tungsten-native encode path: appends values straight from reused
  * UnsafeRow/ArrayData getters into ColVec batch arrays — no external Row,
  * no String/Timestamp materialization, no boxing, and (for STRING/BINARY)
  * a PACKED payload buffer instead of one byte[] per value. Per-row garbage
  * here multiplies by 10^12 turns at target scale and throttles multi-core
  * scaling (allocation rate and cache traffic grow with executor threads).
  *
  * ZERO STEADY-STATE ALLOCATION: every appender owns oversized arrays that
  * are handed to the built ColVec by reference and REUSED for the next
  * batch. This relies on the ColVec contract (see ColVec doc): a vec is
  * only valid during the `write(v)` call that consumes it; downstream
  * keepers (dictionary entries, stats min/max) copy.
  *
  * All appenders extract by (getter, ordinal), so list/map/struct recursion
  * reuses the same code over ArrayData.
  */
object InternalBridge {

  def appenderFor(dt: DataType, cap: Int): ColAppender = dt match {
    case BooleanType => new LongAppender(cap, (g, i) => if (g.getBoolean(i)) 1L else 0L)
    case ByteType => new LongAppender(cap, (g, i) => g.getByte(i).toLong)
    case ShortType => new LongAppender(cap, (g, i) => g.getShort(i).toLong)
    case IntegerType | DateType => new LongAppender(cap, (g, i) => g.getInt(i).toLong)
    // TimestampType / TimestampNTZType are both micros-since-epoch longs
    // in the internal representation — no object round-trip.
    // TIME is a nanos-of-day long internally (Spark 4.1 TimeType)
    case LongType | TimestampType | TimestampNTZType | _: TimeType =>
      new LongAppender(cap, (g, i) => g.getLong(i))
    case FloatType => new DoubleAppender(cap, (g, i) => g.getFloat(i).toDouble)
    case DoubleType => new DoubleAppender(cap, (g, i) => g.getDouble(i))
    case StringType => new PackedAppender(cap, isString = true)
    case BinaryType => new PackedAppender(cap, isString = false)
    case d: DecimalType if d.precision <= 18 =>
      new LongAppender(cap, (g, i) => g.getDecimal(i, d.precision, d.scale).toUnscaledLong)
    case d: DecimalType => new BigAppender(cap, d.precision, d.scale)
    case a: ArrayType => new ListAppender(cap, appenderFor(a.elementType, cap))
    case m: MapType =>
      new MapAppender(cap, appenderFor(m.keyType, cap), appenderFor(m.valueType, cap))
    case s: StructType =>
      new StructAppender(cap, s.fields.map(f => appenderFor(f.dataType, cap)))
    case other => throw new IllegalArgumentException(s"unsupported Spark type $other")
  }

  /** Root builder: add() per InternalRow, build() per batch. */
  final class VecBuilder(schema: StructType, cap: Int) {
    private val cols = schema.fields.map(f => appenderFor(f.dataType, cap))
    private var n = 0

    def count: Int = n

    def add(r: InternalRow): Unit = {
      var c = 0
      while (c < cols.length) {
        if (r.isNullAt(c)) cols(c).addNull() else cols(c).add(r, c)
        c += 1
      }
      n += 1
    }

    def build(): ColVec = {
      val v = new ColVec(n)
      v.children = cols.map(_.build())
      n = 0
      v
    }
  }

  sealed abstract class ColAppender(cap: Int) {
    protected var n = 0
    protected var nulls = new Array[Boolean](math.max(cap, 16))
    protected var anyNull = false

    final def addNull(): Unit = {
      ensureNull()
      nulls(n) = true
      anyNull = true
      onAppend()
      n += 1
    }
    private def ensureNull(): Unit =
      if (n == nulls.length) nulls = java.util.Arrays.copyOf(nulls, n * 2)
    protected final def pushNotNull(): Unit = {
      ensureNull()
      nulls(n) = false
      onAppend()
      n += 1
    }
    /** Per-subclass bookkeeping at append time (index n); default none. */
    protected def onAppend(): Unit = {}

    def add(g: SpecializedGetters, ord: Int): Unit
    def build(): ColVec

    /** Hands the (possibly oversized, reused) nulls array by reference. */
    protected final def finishInto(v: ColVec): Unit = {
      if (anyNull) v.nulls = nulls
      anyNull = false
      n = 0
    }
  }

  final class LongAppender(cap: Int, extract: (SpecializedGetters, Int) => Long)
      extends ColAppender(cap) {
    private var a = new Array[Long](math.max(cap, 16))
    def add(g: SpecializedGetters, ord: Int): Unit = {
      if (n >= a.length) a = java.util.Arrays.copyOf(a, (n + 1) * 2)
      a(n) = extract(g, ord)
      pushNotNull()
    }
    def build(): ColVec = {
      val v = new ColVec(n)
      v.longs = a
      finishInto(v)
      v
    }
  }

  final class DoubleAppender(cap: Int, extract: (SpecializedGetters, Int) => Double)
      extends ColAppender(cap) {
    private var a = new Array[Double](math.max(cap, 16))
    def add(g: SpecializedGetters, ord: Int): Unit = {
      if (n >= a.length) a = java.util.Arrays.copyOf(a, (n + 1) * 2)
      a(n) = extract(g, ord)
      pushNotNull()
    }
    def build(): ColVec = {
      val v = new ColVec(n)
      v.doubles = a
      finishInto(v)
      v
    }
  }

  /** STRING/BINARY: one shared payload buffer + cumulative offsets.
    * Strings copy straight from Tungsten memory (UnsafeRow page or
    * ArrayData) into the pack — no intermediate byte[].
    */
  final class PackedAppender(cap: Int, isString: Boolean) extends ColAppender(cap) {
    private var buf = new Array[Byte](math.max(cap, 16) * 64)
    private var offs = new Array[Int](math.max(cap, 16) + 1)
    private var used = 0

    def add(g: SpecializedGetters, ord: Int): Unit = {
      if (isString) {
        val u = g.getUTF8String(ord)
        val nb = u.numBytes()
        ensureBuf(nb)
        u.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + used)
        used += nb
      } else {
        val b = g.getBinary(ord)
        ensureBuf(b.length)
        System.arraycopy(b, 0, buf, used, b.length)
        used += b.length
      }
      pushNotNull()
    }

    private def ensureBuf(more: Int): Unit =
      if (used + more > buf.length)
        buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, used + more))

    override protected def onAppend(): Unit = {
      if (n + 1 >= offs.length) offs = java.util.Arrays.copyOf(offs, (n + 2) * 2)
      offs(n + 1) = used
    }

    def build(): ColVec = {
      val v = new ColVec(n)
      v.packed = buf
      v.offs = offs
      used = 0
      finishInto(v)
      v
    }
  }

  final class BigAppender(cap: Int, precision: Int, scale: Int)
      extends ColAppender(cap) {
    private var a = new Array[BigInt](math.max(cap, 16))
    def add(g: SpecializedGetters, ord: Int): Unit = {
      if (n >= a.length) a = java.util.Arrays.copyOf(a, (n + 1) * 2)
      a(n) = BigInt(g.getDecimal(ord, precision, scale).toJavaBigDecimal.unscaledValue())
      pushNotNull()
    }
    def build(): ColVec = {
      val v = new ColVec(n)
      v.bigs = a
      finishInto(v)
      v
    }
  }

  final class ListAppender(cap: Int, elem: ColAppender) extends ColAppender(cap) {
    private var lens = new Array[Int](math.max(cap, 16))
    def add(g: SpecializedGetters, ord: Int): Unit = {
      val arr = g.getArray(ord)
      val m = arr.numElements()
      if (n >= lens.length) lens = java.util.Arrays.copyOf(lens, (n + 1) * 2)
      lens(n) = m
      var k = 0
      while (k < m) {
        if (arr.isNullAt(k)) elem.addNull() else elem.add(arr, k)
        k += 1
      }
      pushNotNull()
    }
    def build(): ColVec = {
      val v = new ColVec(n)
      v.lengths = lens
      v.children = Array(elem.build())
      finishInto(v)
      v
    }
  }

  final class MapAppender(cap: Int, key: ColAppender, value: ColAppender)
      extends ColAppender(cap) {
    private var lens = new Array[Int](math.max(cap, 16))
    def add(g: SpecializedGetters, ord: Int): Unit = {
      val map = g.getMap(ord)
      val ks = map.keyArray()
      val vs = map.valueArray()
      val m = map.numElements()
      if (n >= lens.length) lens = java.util.Arrays.copyOf(lens, (n + 1) * 2)
      lens(n) = m
      var k = 0
      while (k < m) {
        if (ks.isNullAt(k)) key.addNull() else key.add(ks, k)
        if (vs.isNullAt(k)) value.addNull() else value.add(vs, k)
        k += 1
      }
      pushNotNull()
    }
    def build(): ColVec = {
      val v = new ColVec(n)
      v.lengths = lens
      v.children = Array(key.build(), value.build())
      finishInto(v)
      v
    }
  }

  /** Struct children are dense over non-null parent rows (add() is only
    * called for non-null structs, matching the writer's PRESENT semantics).
    */
  final class StructAppender(cap: Int, fields: Array[ColAppender])
      extends ColAppender(cap) {
    def add(g: SpecializedGetters, ord: Int): Unit = {
      val st = g.getStruct(ord, fields.length)
      var c = 0
      while (c < fields.length) {
        if (st.isNullAt(c)) fields(c).addNull() else fields(c).add(st, c)
        c += 1
      }
      pushNotNull()
    }
    def build(): ColVec = {
      val v = new ColVec(n)
      v.children = fields.map(_.build())
      finishInto(v)
      v
    }
  }
}
