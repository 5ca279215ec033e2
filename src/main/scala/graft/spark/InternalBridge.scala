package graft.spark

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.SpecializedGetters
import org.apache.spark.sql.types._
import graft.core.columns.ColVec

/** Tungsten-native encode path: appends values straight from reused
  * UnsafeRow/ArrayData getters into ColVec batch arrays — no external Row,
  * no String/Timestamp materialization, no boxing. This is the hot path of
  * the distributed encoder: per-row garbage here multiplies by 10^12 turns
  * at target scale and throttles multi-core scaling (allocation-rate and
  * cache contention grow with executor threads).
  *
  * One appender tree per task; top-level batches are fixed-size, nested
  * children grow by doubling. All appenders extract by (getter, ordinal),
  * so list/map/struct recursion reuses the same code over ArrayData.
  */
object InternalBridge {

  def appenderFor(dt: DataType, cap: Int): ColAppender = dt match {
    case BooleanType => new LongAppender(cap, (g, i) => if (g.getBoolean(i)) 1L else 0L)
    case ByteType => new LongAppender(cap, (g, i) => g.getByte(i).toLong)
    case ShortType => new LongAppender(cap, (g, i) => g.getShort(i).toLong)
    case IntegerType | DateType => new LongAppender(cap, (g, i) => g.getInt(i).toLong)
    // TimestampType / TimestampNTZType are both micros-since-epoch longs
    // in the internal representation — no object round-trip.
    case LongType | TimestampType | TimestampNTZType =>
      new LongAppender(cap, (g, i) => g.getLong(i))
    case FloatType => new DoubleAppender(cap, (g, i) => g.getFloat(i).toDouble)
    case DoubleType => new DoubleAppender(cap, (g, i) => g.getDouble(i))
    case StringType => new BinsAppender(cap, (g, i) => g.getUTF8String(i).getBytes)
    case BinaryType => new BinsAppender(cap, (g, i) => g.getBinary(i))
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
    protected var nulls = new Array[Boolean](cap)
    protected var anyNull = false

    final def addNull(): Unit = {
      ensureNull()
      nulls(n) = true
      anyNull = true
      n += 1
    }
    private def ensureNull(): Unit =
      if (n == nulls.length) nulls = java.util.Arrays.copyOf(nulls, n * 2)
    protected final def pushNotNull(): Unit = { ensureNull(); nulls(n) = false; n += 1 }

    def add(g: SpecializedGetters, ord: Int): Unit
    def build(): ColVec

    protected final def finishInto(v: ColVec): Unit = {
      if (anyNull) v.nulls =
        if (nulls.length == n) nulls else java.util.Arrays.copyOf(nulls, n)
      nulls = new Array[Boolean](math.max(cap, 16))
      anyNull = false
      n = 0
    }
  }

  final class LongAppender(cap: Int, extract: (SpecializedGetters, Int) => Long)
      extends ColAppender(cap) {
    private var a = new Array[Long](cap)
    def add(g: SpecializedGetters, ord: Int): Unit = {
      if (n >= a.length) a = java.util.Arrays.copyOf(a, (n + 1) * 2)
      a(n) = extract(g, ord)
      pushNotNull()
    }
    def build(): ColVec = {
      val v = new ColVec(n)
      v.longs = if (a.length == n) a else java.util.Arrays.copyOf(a, n)
      a = new Array[Long](math.max(cap, 16))
      finishInto(v)
      v
    }
  }

  final class DoubleAppender(cap: Int, extract: (SpecializedGetters, Int) => Double)
      extends ColAppender(cap) {
    private var a = new Array[Double](cap)
    def add(g: SpecializedGetters, ord: Int): Unit = {
      if (n >= a.length) a = java.util.Arrays.copyOf(a, (n + 1) * 2)
      a(n) = extract(g, ord)
      pushNotNull()
    }
    def build(): ColVec = {
      val v = new ColVec(n)
      v.doubles = if (a.length == n) a else java.util.Arrays.copyOf(a, n)
      a = new Array[Double](math.max(cap, 16))
      finishInto(v)
      v
    }
  }

  final class BinsAppender(cap: Int, extract: (SpecializedGetters, Int) => Array[Byte])
      extends ColAppender(cap) {
    private var a = new Array[Array[Byte]](cap)
    def add(g: SpecializedGetters, ord: Int): Unit = {
      if (n >= a.length) a = java.util.Arrays.copyOf(a, (n + 1) * 2)
      a(n) = extract(g, ord)
      pushNotNull()
    }
    def build(): ColVec = {
      val v = new ColVec(n)
      v.bins = if (a.length == n) a else java.util.Arrays.copyOf(a, n)
      a = new Array[Array[Byte]](math.max(cap, 16))
      finishInto(v)
      v
    }
  }

  final class BigAppender(cap: Int, precision: Int, scale: Int)
      extends ColAppender(cap) {
    private var a = new Array[BigInt](cap)
    def add(g: SpecializedGetters, ord: Int): Unit = {
      if (n >= a.length) a = java.util.Arrays.copyOf(a, (n + 1) * 2)
      a(n) = BigInt(g.getDecimal(ord, precision, scale).toJavaBigDecimal.unscaledValue())
      pushNotNull()
    }
    def build(): ColVec = {
      val v = new ColVec(n)
      v.bigs = if (a.length == n) a else java.util.Arrays.copyOf(a, n)
      a = new Array[BigInt](math.max(cap, 16))
      finishInto(v)
      v
    }
  }

  final class ListAppender(cap: Int, elem: ColAppender) extends ColAppender(cap) {
    private var lens = new Array[Int](cap)
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
      v.lengths = if (lens.length == n) lens else java.util.Arrays.copyOf(lens, n)
      v.children = Array(elem.build())
      lens = new Array[Int](math.max(cap, 16))
      finishInto(v)
      v
    }
  }

  final class MapAppender(cap: Int, key: ColAppender, value: ColAppender)
      extends ColAppender(cap) {
    private var lens = new Array[Int](cap)
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
      v.lengths = if (lens.length == n) lens else java.util.Arrays.copyOf(lens, n)
      v.children = Array(key.build(), value.build())
      lens = new Array[Int](math.max(cap, 16))
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
