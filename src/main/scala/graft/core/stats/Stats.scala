package graft.core.stats

import java.util.Arrays

/** Column statistics — the reference's only aggregation machinery, with
  * exactly Spark's partial+final shape: per-row-group accumulate → stripe
  * merge → file merge. Semantics per the per-type StatisticsBuilder files
  * in /root/reference/pkg/store/metadata/.
  */
final case class ColStats(
    numValues: Long,
    hasNull: Boolean,
    intStats: Option[IntStats] = None,
    doubleStats: Option[DoubleStats] = None,
    stringStats: Option[StringStats] = None,
    boolStats: Option[Long] = None, // trueCount
    dateStats: Option[(Int, Int)] = None, // min/max days
    tsStats: Option[(Long, Long)] = None, // min/max millis UTC
    binarySum: Option[Long] = None,
    decimalStats: Option[(BigDecimal, BigDecimal)] = None
)

final case class IntStats(min: Long, max: Long, sum: Option[Long])
final case class DoubleStats(min: Double, max: Double, sum: Double)
/** min/max absent if longer than the stats limit (64B default) —
  * StringStatisticsBuilder.go:112-114. sum = total UTF-8 length.
  */
final case class StringStats(min: Option[Array[Byte]], max: Option[Array[Byte]], sum: Long)

object ColStats {
  val empty: ColStats = ColStats(0L, hasNull = false)

  def merge(a: ColStats, b: ColStats): ColStats = {
    def m2[T](x: Option[T], y: Option[T])(f: (T, T) => T): Option[T] = (x, y) match {
      case (Some(u), Some(v)) => Some(f(u, v))
      case (Some(u), None) if b.numValues == 0 => Some(u)
      case (None, Some(v)) if a.numValues == 0 => Some(v)
      case _ => None
    }
    ColStats(
      a.numValues + b.numValues,
      a.hasNull || b.hasNull,
      m2(a.intStats, b.intStats) { (x, y) =>
        IntStats(math.min(x.min, y.min), math.max(x.max, y.max),
          for (s1 <- x.sum; s2 <- y.sum; s <- safeAdd(s1, s2)) yield s)
      },
      m2(a.doubleStats, b.doubleStats) { (x, y) =>
        DoubleStats(math.min(x.min, y.min), math.max(x.max, y.max), x.sum + y.sum)
      },
      m2(a.stringStats, b.stringStats) { (x, y) =>
        StringStats(
          for (u <- x.min; v <- y.min) yield if (compareBytes(u, v) <= 0) u else v,
          for (u <- x.max; v <- y.max) yield if (compareBytes(u, v) >= 0) u else v,
          x.sum + y.sum)
      },
      m2(a.boolStats, b.boolStats)(_ + _),
      m2(a.dateStats, b.dateStats)((x, y) => (math.min(x._1, y._1), math.max(x._2, y._2))),
      m2(a.tsStats, b.tsStats)((x, y) => (math.min(x._1, y._1), math.max(x._2, y._2))),
      m2(a.binarySum, b.binarySum)(_ + _),
      m2(a.decimalStats, b.decimalStats)((x, y) => (x._1.min(y._1), x._2.max(y._2)))
    )
  }

  def mergeAll(xs: Iterable[ColStats]): ColStats =
    if (xs.isEmpty) empty else xs.reduce(merge)

  def safeAdd(a: Long, b: Long): Option[Long] = {
    val r = a + b
    if (((a ^ r) & (b ^ r)) < 0) None else Some(r)
  }

  def compareBytes(a: Array[Byte], b: Array[Byte]): Int =
    compareSlices(a, 0, a.length, b, 0, b.length)

  def compareSlices(a: Array[Byte], ao: Int, al: Int,
      b: Array[Byte], bo: Int, bl: Int): Int = {
    val n = math.min(al, bl)
    var i = 0
    while (i < n) {
      val c = (a(ao + i) & 0xff) - (b(bo + i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    al - bl
  }
}

/** Mutable accumulator — one per column writer, snapshot+reset per row group. */
sealed trait StatsBuilder {
  protected var nonNullCount = 0L
  protected var sawNull = false
  def recordNull(): Unit = sawNull = true
  def recordNulls(n: Int): Unit = if (n > 0) sawNull = true
  def build(): ColStats
  def reset(): Unit = { nonNullCount = 0; sawNull = false }
}

final class IntStatsBuilder extends StatsBuilder {
  private var min = Long.MaxValue
  private var max = Long.MinValue
  private var sum = 0L
  private var overflow = false

  def add(v: Long): Unit = {
    nonNullCount += 1
    if (v < min) min = v
    if (v > max) max = v
    val r = sum + v
    if (((sum ^ r) & (v ^ r)) < 0) overflow = true else sum = r
  }
  def build(): ColStats = ColStats(nonNullCount, sawNull,
    intStats = if (nonNullCount > 0) Some(IntStats(min, max, if (overflow) None else Some(sum))) else None)
  override def reset(): Unit = {
    super.reset(); min = Long.MaxValue; max = Long.MinValue; sum = 0; overflow = false
  }
}

final class DoubleStatsBuilder extends StatsBuilder {
  private var min = Double.PositiveInfinity
  private var max = Double.NegativeInfinity
  private var sum = 0.0
  private var sawNaN = false
  def add(v: Double): Unit = {
    nonNullCount += 1
    if (v.isNaN) sawNaN = true
    else {
      if (v < min) min = v
      if (v > max) max = v
    }
    sum += v
  }
  /** A NaN-bearing group DROPS its stats entirely: NaN sorts above every
    * value in Spark/engine comparison order, so a min/max envelope that
    * excluded it would let range predicates prune groups containing
    * matching NaN rows. (Same drop-don't-lie discipline as over-limit
    * strings.)
    */
  def build(): ColStats = ColStats(nonNullCount, sawNull,
    doubleStats = if (nonNullCount > 0 && !sawNaN) Some(DoubleStats(min, max, sum)) else None)
  override def reset(): Unit = {
    super.reset(); min = Double.PositiveInfinity; max = Double.NegativeInfinity
    sum = 0.0; sawNaN = false
  }
}

/** limit: stringStatisticsLimitInBytes, default 64
  * (/root/reference/pkg/store/MothWriterOptions.go:9); min/max dropped
  * (not truncated) when a value exceeds it.
  */
final class StringStatsBuilder(limit: Int = 64) extends StatsBuilder {
  private var min: Array[Byte] = null
  private var max: Array[Byte] = null
  private var dropped = false
  private var sum = 0L

  def add(v: Array[Byte]): Unit = add(v, 0, v.length)

  /** Slice form for packed vecs; min/max COPY on update — the backing
    * buffer is reused by the producer (ColVec contract).
    */
  def add(v: Array[Byte], off: Int, len: Int): Unit = {
    nonNullCount += 1
    sum += len
    if (!dropped) {
      if (len > limit) { dropped = true; min = null; max = null }
      else {
        if (min == null || ColStats.compareSlices(v, off, len, min, 0, min.length) < 0)
          min = java.util.Arrays.copyOfRange(v, off, off + len)
        if (max == null || ColStats.compareSlices(v, off, len, max, 0, max.length) > 0)
          max = java.util.Arrays.copyOfRange(v, off, off + len)
      }
    }
  }
  def build(): ColStats = ColStats(nonNullCount, sawNull,
    stringStats = if (nonNullCount > 0)
      Some(StringStats(Option(min).map(_.clone()), Option(max).map(_.clone()), sum))
    else None)
  override def reset(): Unit = { super.reset(); min = null; max = null; dropped = false; sum = 0 }
}

final class BooleanStatsBuilder extends StatsBuilder {
  private var trueCount = 0L
  def add(v: Boolean): Unit = { nonNullCount += 1; if (v) trueCount += 1 }
  def build(): ColStats = ColStats(nonNullCount, sawNull,
    boolStats = if (nonNullCount > 0) Some(trueCount) else None)
  override def reset(): Unit = { super.reset(); trueCount = 0 }
}

final class DateStatsBuilder extends StatsBuilder {
  private var min = Int.MaxValue
  private var max = Int.MinValue
  def add(days: Int): Unit = {
    nonNullCount += 1
    if (days < min) min = days
    if (days > max) max = days
  }
  def build(): ColStats = ColStats(nonNullCount, sawNull,
    dateStats = if (nonNullCount > 0) Some((min, max)) else None)
  override def reset(): Unit = { super.reset(); min = Int.MaxValue; max = Int.MinValue }
}

final class TimestampStatsBuilder extends StatsBuilder {
  private var min = Long.MaxValue
  private var max = Long.MinValue
  def addMillis(ms: Long): Unit = {
    nonNullCount += 1
    if (ms < min) min = ms
    if (ms > max) max = ms
  }
  def build(): ColStats = ColStats(nonNullCount, sawNull,
    tsStats = if (nonNullCount > 0) Some((min, max)) else None)
  override def reset(): Unit = { super.reset(); min = Long.MaxValue; max = Long.MinValue }
}

final class BinaryStatsBuilder extends StatsBuilder {
  private var sum = 0L
  def add(len: Int): Unit = { nonNullCount += 1; sum += len }
  def build(): ColStats = ColStats(nonNullCount, sawNull,
    binarySum = if (nonNullCount > 0) Some(sum) else None)
  override def reset(): Unit = { super.reset(); sum = 0 }
}

final class DecimalStatsBuilder extends StatsBuilder {
  private var min: BigDecimal = null
  private var max: BigDecimal = null
  def add(v: BigDecimal): Unit = {
    nonNullCount += 1
    if (min == null || v < min) min = v
    if (max == null || v > max) max = v
  }
  def build(): ColStats = ColStats(nonNullCount, sawNull,
    decimalStats = if (nonNullCount > 0) Some((min, max)) else None)
  override def reset(): Unit = { super.reset(); min = null; max = null }
}

/** Count-only builder for STRUCT/LIST/MAP containers. */
final class CountStatsBuilder extends StatsBuilder {
  def add(): Unit = nonNullCount += 1
  def build(): ColStats = ColStats(nonNullCount, sawNull)
}
