package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayOutputStream
import graft.core.columns._
import graft.core.columns.MothType._
import graft.core.compress.{Chunked, CompressionKind}
import graft.core.file._
import graft.core.stats.BloomFilter

class FileSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  /** Deterministic all-type test table. */
  def makeVec(n: Int, nullEvery: Int, seed: Int): (TStruct, ColVec) = {
    val r = new scala.util.Random(seed)
    val schema = TStruct(Seq(
      "b" -> TBoolean, "y" -> TByte, "i" -> TInt, "l" -> TLong,
      "f" -> TFloat, "d" -> TDouble, "dec" -> TDecimal(12, 2),
      "bigdec" -> TDecimal(30, 5),
      "s" -> TString, "bin" -> TBinary, "dt" -> TDate, "ts" -> TTimestamp,
      "arr" -> TList(TLong), "m" -> TMap(TString, TLong),
      "st" -> TStruct(Seq("x" -> TLong, "y" -> TString))
    ))
    def nullsFor(off: Int): Array[Boolean] =
      if (nullEvery == 0) null
      else Array.tabulate(n)(i => (i + off) % nullEvery == 0)

    val v = new ColVec(n)
    v.children = new Array[ColVec](15)
    def prim(idx: Int, off: Int)(fill: (ColVec, Array[Boolean]) => Unit): Unit = {
      val c = new ColVec(n)
      c.nulls = nullsFor(off)
      fill(c, c.nulls)
      v.children(idx) = c
    }
    prim(0, 1) { (c, _) => c.longs = Array.tabulate(n)(i => if (r.nextBoolean()) 1L else 0L) }
    prim(1, 2) { (c, _) => c.longs = Array.tabulate(n)(i => (r.nextInt(256) - 128).toLong) }
    prim(2, 3) { (c, _) => c.longs = Array.tabulate(n)(i => r.nextInt().toLong) }
    prim(3, 4) { (c, _) => c.longs = Array.tabulate(n)(_ => r.nextLong()) }
    prim(4, 5) { (c, _) => c.doubles = Array.tabulate(n)(_ => r.nextFloat().toDouble) }
    prim(5, 6) { (c, _) => c.doubles = Array.tabulate(n)(_ => r.nextDouble() * 1e6) }
    prim(6, 7) { (c, _) => c.longs = Array.tabulate(n)(_ => r.nextLong() % 100000000L) }
    prim(7, 8) { (c, _) => c.bigs = Array.tabulate(n)(_ => BigInt(r.nextLong()) * BigInt(r.nextInt(1000) + 1)) }
    prim(8, 9) { (c, _) =>
      val words = Array("alpha", "beta", "gamma", "delta", "epsilon")
      c.bins = Array.tabulate(n)(i => (words(r.nextInt(words.length)) * (1 + i % 3)).getBytes("UTF-8"))
    }
    prim(9, 10) { (c, _) => c.bins = Array.tabulate(n)(_ => Array.fill(r.nextInt(20))(r.nextInt(256).toByte)) }
    prim(10, 11) { (c, _) => c.longs = Array.tabulate(n)(_ => 18000L + r.nextInt(4000)) }
    prim(11, 12) { (c, _) => c.longs = Array.tabulate(n)(_ => 1735689600000000L + (r.nextLong() % 100000000000L)) }
    // list<long>
    locally {
      val c = new ColVec(n)
      c.nulls = nullsFor(13)
      c.lengths = Array.tabulate(n)(i => if (c.isNull(i)) 0 else r.nextInt(4))
      val total = (0 until n).map(i => if (c.isNull(i)) 0 else c.lengths(i)).sum
      val e = new ColVec(total)
      e.longs = Array.tabulate(total)(_ => r.nextLong() % 1000)
      c.children = Array(e)
      v.children(12) = c
    }
    // map<string,long>
    locally {
      val c = new ColVec(n)
      c.nulls = nullsFor(14)
      c.lengths = Array.tabulate(n)(i => if (c.isNull(i)) 0 else r.nextInt(3))
      val total = (0 until n).map(i => if (c.isNull(i)) 0 else c.lengths(i)).sum
      val k = new ColVec(total)
      k.bins = Array.tabulate(total)(j => s"key$j".getBytes("UTF-8"))
      val vv = new ColVec(total)
      vv.longs = Array.tabulate(total)(_ => r.nextLong() % 500)
      c.children = Array(k, vv)
      v.children(13) = c
    }
    // struct<x:long, y:string>
    locally {
      val c = new ColVec(n)
      c.nulls = nullsFor(15)
      val nonNull = (0 until n).count(i => !c.isNull(i))
      val x = new ColVec(nonNull)
      x.longs = Array.tabulate(nonNull)(_.toLong * 7)
      val y = new ColVec(nonNull)
      y.bins = Array.tabulate(nonNull)(j => s"nested-$j".getBytes("UTF-8"))
      c.children = Array(x, y)
      v.children(14) = c
    }
    (schema, v)
  }

  def roundtrip(schema: TStruct, vecs: Seq[ColVec], kind: CompressionKind.Value,
      opts: WriterOpts = WriterOpts()): (Array[Byte], Seq[ColVec]) = {
    val bos = new ByteArrayOutputStream()
    val w = new MothFileWriter(bos, schema, kind, opts)
    vecs.foreach(w.write)
    w.close()
    val bytes = bos.toByteArray
    val rd = MothFileReader.fromBytes(bytes)
    val out = rd.batches().toSeq
    (bytes, out)
  }

  def assertVecEqual(t: MothType, a: ColVec, b: Seq[ColVec]): Unit = {
    // flatten b batches and compare value by value via a cursor
    val flat = new VecCursor(t, b)
    var i = 0
    while (i < a.len) {
      flat.assertRow(t, a, i)
      i += 1
    }
    assert(flat.exhausted, "decoded more rows than written")
  }

  /** Cursor over a sequence of decoded ColVec batches. */
  final class VecCursor(t: MothType, batches: Seq[ColVec]) {
    private var bi = 0
    private var ri = 0
    // per-batch child cursors for nested values
    private var childPos = Array.fill(8)(0)

    def exhausted: Boolean = bi >= batches.length ||
      (bi == batches.length - 1 && ri >= batches(bi).len)

    def assertRow(t: MothType, expected: ColVec, ei: Int): Unit = {
      while (bi < batches.length && ri >= batches(bi).len) { bi += 1; ri = 0; childPos = Array.fill(8)(0) }
      assert(bi < batches.length, s"ran out of decoded rows at $ei")
      val v = batches(bi)
      compareRow(t, expected, ei, v, ri, childPos)
      ri += 1
    }

    private def compareRow(t: MothType, a: ColVec, ai: Int, b: ColVec, biRow: Int,
        bChildPos: Array[Int]): Unit = {
      val an = a.isNull(ai)
      val bn = b.isNull(biRow)
      assert(an == bn, s"null mismatch at row $ai ($t)")
      if (an) return
      t match {
        case TStruct(fields) =>
          // children dense: need positions of the non-null row index
          val aPos = countNonNullBefore(a, ai)
          val bPos = countNonNullBefore(b, biRow)
          fields.zipWithIndex.foreach { case ((_, ft), fi) =>
            compareDense(ft, a.children(fi), aPos, b.children(fi), bPos)
          }
        case TList(et) =>
          val aPos = countNonNullBefore(a, ai)
          val bPos = countNonNullBefore(b, biRow)
          assert(lengthAt(a, ai) == lengthAt(b, biRow), s"list length mismatch at $ai")
        case _ =>
          compareScalar(t, a, ai, b, biRow)
      }
    }

    private def countNonNullBefore(v: ColVec, i: Int): Int = {
      if (v.nulls == null) i
      else (0 until i).count(j => !v.nulls(j))
    }
    private def lengthAt(v: ColVec, i: Int): Int = v.lengths(i)

    private def compareDense(t: MothType, a: ColVec, ai: Int, b: ColVec, biv: Int): Unit =
      compareScalar(t, a, ai, b, biv)

    private def compareScalar(t: MothType, a: ColVec, ai: Int, b: ColVec, biv: Int): Unit = t match {
      case TBoolean | TByte | TShort | TInt | TLong | TDate | TTimestamp | TTimestampInstant =>
        assert(a.longs(ai) == b.longs(biv), s"$t value mismatch at $ai: ${a.longs(ai)} vs ${b.longs(biv)}")
      case TFloat | TDouble =>
        assert(java.lang.Double.doubleToLongBits(a.doubles(ai)) ==
          java.lang.Double.doubleToLongBits(b.doubles(biv)), s"$t mismatch at $ai")
      case TDecimal(p, _) if p <= 18 =>
        assert(a.longs(ai) == b.longs(biv), s"decimal mismatch at $ai")
      case TDecimal(_, _) =>
        assert(a.bigs(ai) == b.bigs(biv), s"bigdecimal mismatch at $ai")
      case TString | TBinary | _: TVarchar | _: TChar =>
        assert(java.util.Arrays.equals(a.bins(ai), b.bins(biv)),
          s"bytes mismatch at $ai: ${new String(a.bins(ai))} vs ${new String(b.bins(biv))}")
      case other => fail(s"unexpected scalar type $other")
    }
  }

  // === The real tests use full-table flattened comparison instead ===

  /** Flatten decoded batches into per-field scalar sequences for equality. */
  def flatten(t: TStruct, batches: Seq[ColVec]): Seq[Seq[Any]] = {
    def scalarSeq(ft: MothType, v: ColVec): Seq[Any] = ft match {
      case TFloat | TDouble => (0 until v.len).map(i => if (v.isNull(i)) null else v.doubles(i))
      case TString | TBinary | _: TVarchar | _: TChar =>
        (0 until v.len).map(i => if (v.isNull(i)) null else new String(v.bins(i).map(b => (b & 0xff).toChar)))
      case TDecimal(p, _) if p > 18 => (0 until v.len).map(i => if (v.isNull(i)) null else v.bigs(i))
      case l: TList =>
        var e = 0
        (0 until v.len).map { i =>
          if (v.isNull(i)) null
          else {
            val n = v.lengths(i)
            val vals = scalarSeq(l.elem, v.children(0)).slice(e, e + n)
            e += n
            vals
          }
        }
      case m: TMap =>
        var e = 0
        val ks = scalarSeq(m.key, v.children(0))
        val vs = scalarSeq(m.value, v.children(1))
        (0 until v.len).map { i =>
          if (v.isNull(i)) null
          else { val n = v.lengths(i); val r = ks.slice(e, e + n).zip(vs.slice(e, e + n)); e += n; r }
        }
      case s: TStruct =>
        var dense = 0
        val fieldSeqs = s.fields.zipWithIndex.map { case ((_, ft2), fi) => scalarSeq(ft2, v.children(fi)) }
        (0 until v.len).map { i =>
          if (v.isNull(i)) null
          else { val r = fieldSeqs.map(_(dense)); dense += 1; r }
        }
      case _ => (0 until v.len).map(i => if (v.isNull(i)) null else v.longs(i))
    }
    t.fields.zipWithIndex.map { case ((_, ft), fi) =>
      batches.flatMap(b => scalarSeq(ft, b.children(fi)))
    }
  }

  def fullCompare(schema: TStruct, written: Seq[ColVec], decoded: Seq[ColVec]): Unit = {
    val a = flatten(schema, written)
    val b = flatten(schema, decoded)
    schema.fields.zipWithIndex.foreach { case ((name, _), fi) =>
      assert(a(fi).size == b(fi).size, s"row count mismatch in $name")
      a(fi).zip(b(fi)).zipWithIndex.foreach { case ((x, y), row) =>
        assert(x == y, s"field $name row $row: $x != $y")
      }
    }
  }

  test("all-type file roundtrip, no nulls, ZLIB") {
    val (schema, v) = makeVec(3000, 0, 1)
    val (_, out) = roundtrip(schema, Seq(v), CompressionKind.ZLIB)
    fullCompare(schema, Seq(v), out)
  }

  test("all-type file roundtrip with nulls, all codecs") {
    val (schema, v) = makeVec(2000, 7, 2)
    for (kind <- Seq(CompressionKind.NONE, CompressionKind.SNAPPY, CompressionKind.LZ4,
      CompressionKind.ZSTD, CompressionKind.ZLIB)) {
      val (_, out) = roundtrip(schema, Seq(v), kind)
      fullCompare(schema, Seq(v), out)
    }
  }

  test("multi-stripe multi-rowgroup roundtrip with tiny limits") {
    val (schema, v) = makeVec(5000, 11, 3)
    val opts = WriterOpts(rowGroupMaxRowCount = 100, stripeMaxRowCount = 750,
      stripeMinBytes = 0, stripeMaxBytes = 1 << 20)
    val (bytes, out) = roundtrip(schema, Seq(v), CompressionKind.ZLIB, opts)
    fullCompare(schema, Seq(v), out)
    val rd = MothFileReader.fromBytes(bytes)
    assert(rd.footer.stripes.length == 7, s"expected 7 stripes, got ${rd.footer.stripes.length}")
    assert(rd.rowCount == 5000)
  }

  test("multiple write calls crossing row group boundaries") {
    val (schema, v1) = makeVec(777, 5, 4)
    val (_, v2) = makeVec(777, 5, 5)
    val (_, v3) = makeVec(1, 0, 6)
    val opts = WriterOpts(rowGroupMaxRowCount = 100, stripeMaxRowCount = 1000,
      stripeMinBytes = 0)
    val (_, out) = roundtrip(schema, Seq(v1, v2, v3), CompressionKind.ZLIB, opts)
    fullCompare(schema, Seq(v1, v2, v3), out)
  }

  test("empty file roundtrip") {
    val schema = TStruct(Seq("a" -> TLong))
    val (bytes, out) = roundtrip(schema, Nil, CompressionKind.ZLIB)
    assert(out.isEmpty || out.forall(_.len == 0))
    assert(MothFileReader.fromBytes(bytes).rowCount == 0)
  }

  test("TIME roundtrip: nanos-of-day in, micros on disk, iceberg type attribute") {
    val n = 5000
    val schema = TStruct(Seq("t" -> (TTime: MothType)))
    val v = new ColVec(n)
    val c = new ColVec(n)
    c.nulls = Array.tabulate(n)(_ % 13 == 0)
    // micro-aligned nanos (Spark TimeType precision 6): i-th microsecond of day
    c.longs = Array.tabulate(n)(i => (i.toLong * 7919L % 86400000000L) * 1000L)
    v.children = Array(c)
    val bos = new ByteArrayOutputStream()
    val w = new MothFileWriter(bos, schema, CompressionKind.ZLIB)
    w.write(v)
    w.close()
    val rd = MothFileReader.fromBytes(bos.toByteArray)
    // schema survives the footer: kind LONG + iceberg.long-type=TIME → TTime
    assert(rd.schema.fields.head._2 == TTime, s"got ${rd.schema.fields.head._2}")
    val out = rd.batches().toSeq
    assert(out.map(_.len).sum == n)
    var row = 0
    out.foreach { b =>
      (0 until b.len).foreach { i =>
        val col = b.children(0)
        assert(col.isNull(i) == (row % 13 == 0), s"null at $row")
        if (!col.isNull(i))
          assert(col.longs(i) == c.longs(row), s"time at $row")
        row += 1
      }
    }
  }

  test("UNION roundtrip: tags, per-alternative values, nulls, pruning seek") {
    // union<long, string> with nulls; expanded struct shape at the API
    val n = 10000
    val r = new scala.util.Random(77)
    val schema = TStruct(Seq("id" -> TLong, "u" -> TUnion(Seq(TLong, TString))))
    val id = new ColVec(n)
    id.longs = Array.tabulate(n)(_.toLong)
    val u = new ColVec(n)
    u.nulls = Array.tabulate(n)(i => i % 11 == 0)
    val nn = (0 until n).count(i => !u.nulls(i))
    val tagv = new ColVec(nn)
    tagv.longs = Array.tabulate(nn)(j => (j % 3 min 1).toLong) // tags 0,1,1,0,1,1,...
    val e0 = new ColVec(nn)
    e0.nulls = new Array[Boolean](nn)
    e0.longs = new Array[Long](nn)
    val e1 = new ColVec(nn)
    e1.nulls = new Array[Boolean](nn)
    e1.bins = new Array[Array[Byte]](nn)
    (0 until nn).foreach { j =>
      if (tagv.longs(j) == 0L) {
        e1.nulls(j) = true
        e0.longs(j) = r.nextLong() % 100000
      } else {
        e0.nulls(j) = true
        e1.bins(j) = s"alt1-$j-${r.nextInt(100)}".getBytes("UTF-8")
      }
    }
    u.children = Array(tagv, e0, e1)
    val v = new ColVec(n)
    v.children = Array(id, u)

    val bos = new ByteArrayOutputStream()
    val w = new MothFileWriter(bos, schema, CompressionKind.ZLIB,
      WriterOpts(rowGroupMaxRowCount = 1000))
    w.write(v)
    w.close()

    def checkRange(batches: Seq[ColVec], lo: Int, count: Int): Unit = {
      assert(batches.map(_.len).sum == count)
      var row = lo
      // walk batches row by row, tracking dense positions
      batches.foreach { b =>
        val bu = b.children(1)
        var dense = 0
        (0 until b.len).foreach { i =>
          assert(b.children(0).longs(i) == row.toLong, s"id at $row")
          val expNull = row % 11 == 0
          assert(bu.isNull(i) == expNull, s"union null at $row")
          if (!expNull) {
            // recompute this row's dense index within the FULL data
            val fullDense = (0 until row).count(x => x % 11 != 0)
            val expTag = (fullDense % 3) min 1
            assert(bu.children(0).longs(dense) == expTag.toLong, s"tag at $row")
            if (expTag == 0) {
              assert(!bu.children(1).isNull(dense) && bu.children(2).isNull(dense))
            } else {
              assert(bu.children(1).isNull(dense) && !bu.children(2).isNull(dense))
              assert(new String(bu.children(2).bins(dense), "UTF-8").startsWith(s"alt1-$fullDense-"))
            }
            dense += 1
          }
          row += 1
        }
      }
      assert(row == lo + count)
    }

    val full = MothFileReader.fromBytes(bos.toByteArray).batches().toSeq
    checkRange(full, 0, n)

    // row-group pruning with a predicate on id exercises union seek
    val rd = MothFileReader.fromBytes(bos.toByteArray)
    val pred = StatsPredicate(Seq(LongRangePred("id", Some(5000L), Some(5999L))))
    val pruned = rd.batches(predicate = pred).toSeq
    checkRange(pruned, 5000, 1000)
  }

  test("adaptive batch sizing: wide rows shrink the batch under maxBlockBytes") {
    val schema = TStruct(Seq("s" -> (TString: MothType)))
    val n = 4000
    val v = new ColVec(n)
    val c = new ColVec(n)
    val r = new scala.util.Random(3)
    val wide = new Array[Byte](64 * 1024) // 64KB rows: 8192-row batch = 512MB
    r.nextBytes(wide)
    c.bins = Array.fill(n)(wide)
    v.children = Array(c)
    val bos = new ByteArrayOutputStream()
    val w = new MothFileWriter(bos, schema, CompressionKind.NONE)
    w.write(v)
    w.close()
    val rd = MothFileReader.fromBytes(bos.toByteArray,
      ReaderOpts(maxBlockBytes = 1 << 20)) // 1MB cap → ≤16 wide rows per batch
    val sizes = rd.batches().map(_.len).toSeq
    assert(sizes.sum == n)
    assert(sizes.max <= 16, s"batch of wide rows too large: ${sizes.max}")
    // narrow rows still ramp up to the full batch size
    val idv = new ColVec(n)
    val idc = new ColVec(n)
    idc.longs = Array.tabulate(n)(_.toLong)
    idv.children = Array(idc)
    val bos2 = new ByteArrayOutputStream()
    val w2 = new MothFileWriter(bos2, TStruct(Seq("id" -> TLong)), CompressionKind.NONE)
    w2.write(idv)
    w2.close()
    val sizes2 = MothFileReader.fromBytes(bos2.toByteArray).batches().map(_.len).toSeq
    assert(sizes2.sum == n)
    // doubling ramp over 4000 rows: 1,2,4,...,1024, then the 1953 remainder
    assert(sizes2.max >= 1024, s"narrow rows should ramp up, max=${sizes2.max}")
  }

  test("date/double/decimal stats pruning at row-group level; NaN group never prunes") {
    val n = 8000
    val schema = TStruct(Seq("dt" -> TDate, "x" -> TDouble, "dec" -> TDecimal(12, 2)))
    def table(xs: Int => Double): ColVec = {
      val v = new ColVec(n)
      val dt = new ColVec(n); dt.longs = Array.tabulate(n)(i => 18000L + i / 10)
      val x = new ColVec(n); x.doubles = Array.tabulate(n)(xs)
      val dec = new ColVec(n); dec.longs = Array.tabulate(n)(i => i.toLong) // scale 2
      v.children = Array(dt, x, dec)
      v
    }
    // monotone columns, 8 row groups of 1000: each group spans a tight range
    val (bytes, _) = roundtrip(schema, Seq(table(i => i / 4.0)), CompressionKind.ZLIB,
      WriterOpts(rowGroupMaxRowCount = 1000))
    def decoded(bs: Array[Byte], pred: ColPredicate): Long = {
      val rd = MothFileReader.fromBytes(bs)
      rd.batches(predicate = StatsPredicate(Seq(pred))).map(_.len.toLong).sum
    }
    // DATE day bounds: days run 18000..18799, group g covers 18000+[100g,100g+99]
    assert(decoded(bytes, LongRangePred("dt", Some(18750L), None)) == 1000,
      "date lower bound must decode only the last group")
    assert(decoded(bytes, LongRangePred("dt", None, Some(17999L))) == 0)
    assert(decoded(bytes, LongEqPred("dt", 18005L)) == 1000)
    // DOUBLE bounds: x runs 0..1999.75, group g covers [250g, 250g+249.75]
    assert(decoded(bytes, DoubleRangePred("x", Some((1750.0, false)), None)) == 1000)
    assert(decoded(bytes, DoubleRangePred("x", None, Some((-1.0, true)))) == 0)
    // exclusive vs inclusive on an exact group boundary value (249.75 is
    // group 0's max): > max prunes the group, >= max keeps it
    assert(decoded(bytes, DoubleRangePred("x", Some((1999.75, false)), None)) == 0)
    assert(decoded(bytes, DoubleRangePred("x", Some((1999.75, true)), None)) == 1000)
    // DECIMAL bounds: values 0.00..79.99, group g covers [10g, 10g+9.99]
    assert(decoded(bytes, DecimalRangePred("dec", Some((BigDecimal("69.99"), false)), None)) == 1000)
    assert(decoded(bytes, DecimalRangePred("dec", None, Some((BigDecimal("-0.01"), true)))) == 0)
    // NaN discipline: group 1 holds a NaN, everything else is 0.0 — a bound
    // that refutes 0.0 must still decode the NaN group (NaN sorts above all
    // values in Spark, so it matches x > 100), and nothing else
    val (nanBytes, _) = roundtrip(schema,
      Seq(table(i => if (i == 1500) Double.NaN else 0.0)), CompressionKind.ZLIB,
      WriterOpts(rowGroupMaxRowCount = 1000))
    assert(decoded(nanBytes, DoubleRangePred("x", Some((100.0, true)), None)) == 1000,
      "the NaN-bearing group must never be pruned")
  }

  test("DiskRanges.merge coalesces within distance, respects read-size cap") {
    // adjacent + small gap merge
    assert(DiskRanges.merge(Seq((0L, 10L), (10L, 10L), (25L, 5L)), 5L, 1000L) ==
      Seq((0L, 30L)))
    // gap beyond distance stays split
    assert(DiskRanges.merge(Seq((0L, 10L), (100L, 10L)), 5L, 1000L) ==
      Seq((0L, 10L), (100L, 10L)))
    // cap is POST-merge: a merge whose RESULT would exceed maxReadSize is
    // rejected, so no emitted read is ever larger than the cap
    assert(DiskRanges.merge(Seq((0L, 100L), (100L, 100L), (200L, 100L)), 0L, 150L) ==
      Seq((0L, 100L), (100L, 100L), (200L, 100L)))
    assert(DiskRanges.merge(Seq((0L, 100L), (100L, 100L), (200L, 100L)), 0L, 200L) ==
      Seq((0L, 200L), (200L, 100L)))
    // every merged read respects the cap even with large gaps absorbed
    val merged = DiskRanges.merge(
      Seq((0L, 50L), (900L, 50L), (1800L, 50L), (2700L, 50L)), 1000L, 1000L)
    assert(merged.forall(_._2 <= 1000L), s"post-merge cap violated: $merged")
    // unsorted input is sorted first
    assert(DiskRanges.merge(Seq((20L, 10L), (0L, 10L)), 100L, 1000L) == Seq((0L, 30L)))
  }

  test("stream-level IO: 1-of-6-column projection reads <25% of stripe bytes") {
    // six equal-weight incompressible string columns, NONE codec: projecting
    // one column must fetch ~1/6 of the data bytes, not the whole stripe
    val schema = TStruct((0 until 6).map(i => s"c$i" -> (TString: MothType)))
    val n = 20000
    val r = new scala.util.Random(11)
    val v = new ColVec(n)
    v.children = Array.tabulate(6) { _ =>
      val c = new ColVec(n)
      c.bins = Array.tabulate(n)(_ => Array.fill(60)((33 + r.nextInt(90)).toByte))
      c
    }
    val bos = new ByteArrayOutputStream()
    val w = new MothFileWriter(bos, schema, CompressionKind.NONE)
    w.write(v)
    w.close()
    val bytes = bos.toByteArray
    // force the ranged path (no tiny-stripe whole read, no gap coalescing)
    val rd = MothFileReader.fromBytes(bytes,
      ReaderOpts(maxMergeDistance = 0L, tinyStripeThreshold = 0L))
    val tailBytes = rd.bytesRead
    val out = rd.batches(Some(Seq("c3"))).toSeq
    assert(out.map(_.len).sum == n)
    // decoded content must match what was written for the projected column
    val got = out.flatMap(b => (0 until b.len).map(i => b.children(0).bins(i).toSeq))
    assert(got == v.children(3).bins.map(_.toSeq).toSeq)
    val streamBytes = rd.bytesRead - tailBytes
    assert(streamBytes < bytes.length / 4,
      s"1-of-6 projection read $streamBytes of ${bytes.length} file bytes")
  }

  test("ranged-read fetch plan decodes identically to whole-stripe read") {
    val (schema, v) = makeVec(2000, 7, 3)
    val bos = new ByteArrayOutputStream()
    val w = new MothFileWriter(bos, schema, CompressionKind.ZLIB)
    w.write(v)
    w.close()
    val rd = MothFileReader.fromBytes(bos.toByteArray,
      ReaderOpts(maxMergeDistance = 0L, tinyStripeThreshold = 0L))
    fullCompare(schema, Seq(v), rd.batches().toSeq)
  }

  test("row-group pruning still works over ranged reads (index streams fetched)") {
    val schema = TStruct(Seq("id" -> TLong))
    val n = 10000
    val v = new ColVec(n)
    val c = new ColVec(n)
    c.longs = Array.tabulate(n)(_.toLong)
    v.children = Array(c)
    val bos = new ByteArrayOutputStream()
    val w = new MothFileWriter(bos, schema, CompressionKind.ZLIB,
      WriterOpts(rowGroupMaxRowCount = 100))
    w.write(v)
    w.close()
    val rd = MothFileReader.fromBytes(bos.toByteArray,
      ReaderOpts(maxMergeDistance = 0L, tinyStripeThreshold = 0L))
    val pred = StatsPredicate(Seq(LongRangePred("id", Some(5000L), Some(5099L))))
    val got = rd.batches(predicate = pred).toSeq.flatMap(b => b.children(0).longs.take(b.len))
    assert(got == (5000L to 5099L).toSeq)
  }

  test("checkpoint seek: single-group reads match full-read slices, all types") {
    // monotone id drives row-group selection; the rest exercises every
    // seek path (present bits, RLE pending, raw byte offsets, dict indices,
    // list lengths + child)
    val (schema, v) = makeVec(5000, 7, 21)
    val idCol = new ColVec(5000)
    idCol.longs = Array.tabulate(5000)(_.toLong)
    val full = MothType.TStruct(Seq("id" -> (TLong: MothType)) ++ schema.fields)
    val fv = new ColVec(5000)
    fv.children = idCol +: v.children
    val bos = new ByteArrayOutputStream()
    val w = new MothFileWriter(bos, full, CompressionKind.ZLIB,
      WriterOpts(rowGroupMaxRowCount = 250))
    w.write(fv)
    w.close()
    val bytes = bos.toByteArray
    val whole = MothFileReader.fromBytes(bytes).batches().toSeq
    val flatWhole = flatten(full, whole)
    for (g <- Seq(3, 7, 19)) { // 20 groups of 250
      val lo = g * 250L
      val rd = MothFileReader.fromBytes(bytes)
      val pred = StatsPredicate(Seq(LongRangePred("id", Some(lo), Some(lo + 249))))
      val got = rd.batches(predicate = pred).toSeq
      assert(got.map(_.len).sum == 250, s"group $g row count")
      val flatGot = flatten(full, got)
      // compare each flattened column's slice [g*250, g*250+250)
      flatWhole.indices.foreach { c =>
        assert(flatGot(c) == flatWhole(c).slice(g * 250, g * 250 + 250),
          s"group $g column $c mismatch")
      }
    }
  }

  test("checkpoint seek decodes <5% of values for a 1-of-100 row-group read") {
    val schema = TStruct(Seq("id" -> TLong, "s" -> TString))
    val n = 100000 // 100 groups of 1000
    val v = new ColVec(n)
    val id = new ColVec(n)
    id.longs = Array.tabulate(n)(_.toLong)
    val s = new ColVec(n)
    val r = new scala.util.Random(5)
    s.bins = Array.tabulate(n)(i => s"value-$i-${r.nextInt(1000)}".getBytes("UTF-8"))
    v.children = Array(id, s)
    val bos = new ByteArrayOutputStream()
    val w = new MothFileWriter(bos, schema, CompressionKind.ZLIB,
      WriterOpts(rowGroupMaxRowCount = 1000))
    w.write(v)
    w.close()
    val rd = MothFileReader.fromBytes(bos.toByteArray)
    val pred = StatsPredicate(Seq(LongRangePred("id", Some(50000L), Some(50999L))))
    graft.core.rle.RleV2Reader.totalDecoded.reset()
    graft.core.rle.RleV2Reader.instrumented = true
    val got = try rd.batches(predicate = pred).toSeq
      finally graft.core.rle.RleV2Reader.instrumented = false
    val decoded = graft.core.rle.RleV2Reader.totalDecoded.sum()
    assert(got.map(_.len).sum == 1000)
    assert(got.head.children(0).longs(0) == 50000L)
    // streams: id DATA (100k values) + s LENGTH (100k): full decode-skip
    // would decode ~200k; seeks should decode ~2k + checkpoint remainders
    assert(decoded < 10000L, s"decoded $decoded RLE values for a 1000-row read")
  }

  test("nested projection: one struct subfield decodes only that subtree") {
    val (schema, v) = makeVec(3000, 0, 13)
    val bos = new ByteArrayOutputStream()
    val w = new MothFileWriter(bos, schema, CompressionKind.NONE)
    w.write(v)
    w.close()
    val bytes = bos.toByteArray
    // full read for reference values of st.x
    val fullRead = MothFileReader.fromBytes(bytes).batches().toSeq
    val stIdx = schema.fields.indexWhere(_._1 == "st")
    val expectedX = fullRead.flatMap { b =>
      val st = b.children(stIdx)
      st.children(0).longs.take((0 until st.len).count(i => !st.isNull(i)))
    }
    // nested projection st.x with forced ranged IO: correct values + fewer bytes
    val proj = TStruct(Seq("st" -> TStruct(Seq("x" -> (TLong: MothType)))))
    val rd = MothFileReader.fromBytes(bytes,
      ReaderOpts(maxMergeDistance = 0L, tinyStripeThreshold = 0L))
    val tail = rd.bytesRead
    val out = rd.batchesProjected(proj).toSeq
    assert(out.map(_.len).sum == 3000)
    assert(out.head.children.length == 1 && out.head.children(0).children.length == 1)
    val gotX = out.flatMap { b =>
      val st = b.children(0)
      st.children(0).longs.take((0 until st.len).count(i => !st.isNull(i)))
    }
    assert(gotX == expectedX, "st.x values under nested projection")
    val ioBytes = rd.bytesRead - tail
    assert(ioBytes < bytes.length / 3,
      s"nested 1-subfield projection read $ioBytes of ${bytes.length}")
  }

  test("projection reads only requested fields") {
    val (schema, v) = makeVec(1000, 0, 7)
    val bos = new ByteArrayOutputStream()
    val w = new MothFileWriter(bos, schema, CompressionKind.ZLIB)
    w.write(v)
    w.close()
    val rd = MothFileReader.fromBytes(bos.toByteArray)
    val out = rd.batches(Some(Seq("i", "s"))).toSeq
    val projected = TStruct(schema.fields.filter(f => Seq("i", "s").contains(f._1)))
    assert(out.head.children.length == 2)
    val a = flatten(schema, Seq(v))
    val b = flatten(projected, out)
    assert(a(2) == b(0)) // "i"
    assert(a(8) == b(1)) // "s"
  }

  test("dictionary encoding kicks in for low-cardinality strings and roundtrips") {
    val schema = TStruct(Seq("s" -> TString))
    val n = 20000
    val roles = Array("user", "assistant", "system", "tool")
    val v = new ColVec(n)
    val c = new ColVec(n)
    c.bins = Array.tabulate(n)(i => roles(i % 4).getBytes("UTF-8"))
    v.children = Array(c)
    val (bytes, out) = roundtrip(schema, Seq(v), CompressionKind.NONE)
    fullCompare(schema, Seq(v), out)
    // encoded size must reflect dictionary compression (4 entries + 2-bit-ish indices)
    assert(bytes.length < n, s"dictionary should compress: ${bytes.length}")
  }

  test("high-cardinality strings fall back to direct (low dict ratio)") {
    val schema = TStruct(Seq("s" -> TString))
    val n = 30000
    val v = new ColVec(n)
    val c = new ColVec(n)
    val r = new scala.util.Random(9)
    c.bins = Array.tabulate(n)(i => s"unique-value-$i-${r.nextLong()}".getBytes("UTF-8"))
    v.children = Array(c)
    // low stripeMinBytes so the optimizer's low-ratio sweep can trigger
    val opts = WriterOpts(stripeMinBytes = 0, dictionaryMaxMemoryBytes = 64 * 1024)
    val (bytes, out) = roundtrip(schema, Seq(v), CompressionKind.NONE, opts)
    fullCompare(schema, Seq(v), out)
    val rd = MothFileReader.fromBytes(bytes)
    assert(rd.rowCount == n)
  }

  test("row-group pruning via long-range predicate") {
    val schema = TStruct(Seq("id" -> TLong))
    val n = 10000
    val v = new ColVec(n)
    val c = new ColVec(n)
    c.longs = Array.tabulate(n)(_.toLong) // monotone: each 100-row group has tight range
    v.children = Array(c)
    val bos = new ByteArrayOutputStream()
    val opts = WriterOpts(rowGroupMaxRowCount = 100)
    val w = new MothFileWriter(bos, schema, CompressionKind.ZLIB, opts)
    w.write(v)
    w.close()
    val rd = MothFileReader.fromBytes(bos.toByteArray)
    val pred = StatsPredicate(Seq(LongRangePred("id", Some(5000L), Some(5099L))))
    val out = rd.batches(predicate = pred).toSeq
    val got = out.flatMap(b => b.children(0).longs.take(b.len))
    assert(got == (5000L to 5099L).toSeq, s"pruned read got ${got.size} rows")
  }

  test("bloom filter pruning for string equality") {
    val schema = TStruct(Seq("s" -> TString))
    val n = 4000
    val v = new ColVec(n)
    val c = new ColVec(n)
    c.bins = Array.tabulate(n)(i => s"val-${i / 100}-x".getBytes("UTF-8")) // 40 distinct, grouped
    v.children = Array(c)
    val bos = new ByteArrayOutputStream()
    val opts = WriterOpts(rowGroupMaxRowCount = 100, bloomColumns = Set("s"))
    val w = new MothFileWriter(bos, schema, CompressionKind.ZLIB, opts)
    w.write(v)
    w.close()
    val rd = MothFileReader.fromBytes(bos.toByteArray)
    val out = rd.batches(predicate = StatsPredicate(Seq(StringEqPred("s", "val-7-x")))).toSeq
    val rows = out.map(_.len).sum
    assert(rows == 100, s"expected 1 row group (100 rows), got $rows")
    // absent value prunes everything
    val none = rd.batches(predicate = StatsPredicate(Seq(StringEqPred("s", "nope")))).toSeq
    assert(none.map(_.len).sum == 0)
  }

  test("predicate tree pruning: OR/AND, IN-style disjunction, null preds, string ranges") {
    // two columns: monotone id (tight per-group ranges), string grade with
    // nulls only in groups 0-4 (rows 0-499)
    val schema = TStruct(Seq("id" -> TLong, "grade" -> TString))
    val n = 2000
    val v = new ColVec(n)
    val idc = new ColVec(n)
    idc.longs = Array.tabulate(n)(_.toLong)
    val gc = new ColVec(n)
    gc.nulls = Array.tabulate(n)(i => i < 500 && i % 7 == 0)
    gc.bins = Array.tabulate(n)(i =>
      if (i < 500 && i % 7 == 0) null else f"g${i / 100}%03d".getBytes("UTF-8"))
    v.children = Array(idc, gc)
    val bos = new ByteArrayOutputStream()
    val w = new MothFileWriter(bos, schema, CompressionKind.ZLIB,
      WriterOpts(rowGroupMaxRowCount = 100, bloomColumns = Set("id")))
    w.write(v)
    w.close()
    val rd = MothFileReader.fromBytes(bos.toByteArray)
    def rows(p: StatsPredicate): Long =
      rd.batches(predicate = p).map(_.len.toLong).sum

    // IN-style disjunction of bloom-tested Eq leaves: 2 groups survive
    val in = StatsPredicate(Seq(OrPred(Seq(
      LongEqPred("id", 150L), LongEqPred("id", 1250L)))))
    assert(rows(in) == 200, s"IN disjunction should keep 2 groups")
    // OR across different columns: union of each branch's groups
    val orAcross = StatsPredicate(Seq(OrPred(Seq(
      LongRangePred("id", Some(0L), Some(99L)),
      StringEqPred("grade", "g015")))))
    assert(rows(orAcross) == 200, "OR across columns keeps both branches' groups")
    // AND inside OR: (id in group 3 AND grade g003) OR (id in group 12)
    val andInOr = StatsPredicate(Seq(OrPred(Seq(
      AndPred(Seq(LongRangePred("id", Some(300L), Some(399L)), StringEqPred("grade", "g003"))),
      LongRangePred("id", Some(1200L), Some(1299L))))))
    assert(rows(andInOr) == 200)
    // contradictory AND branch contributes nothing
    val deadBranch = StatsPredicate(Seq(OrPred(Seq(
      AndPred(Seq(LongRangePred("id", Some(300L), Some(399L)), StringEqPred("grade", "g013"))),
      LongRangePred("id", Some(1200L), Some(1299L))))))
    assert(rows(deadBranch) == 100)
    // IsNull prunes to the 5 groups that contain nulls
    assert(rows(StatsPredicate(Seq(IsNullPred("grade")))) == 500)
    // IsNotNull keeps everything here (no all-null group exists)
    assert(rows(StatsPredicate(Seq(IsNotNullPred("grade")))) == n)
    // string ranges against exact min/max stats
    assert(rows(StatsPredicate(Seq(StringRangePred("grade", Some(("g018", false)), None)))) == 100,
      "grade > 'g018' keeps only the last group")
    assert(rows(StatsPredicate(Seq(StringRangePred("grade", Some(("g018", true)), None)))) == 200)
    assert(rows(StatsPredicate(Seq(StringRangePred("grade", None, Some(("g001", false)))))) == 100,
      "grade < 'g001' keeps only group 0 (group 1's min IS g001, excluded)")
    assert(rows(StatsPredicate(Seq(StringRangePred("grade", None, Some(("g001", true)))))) == 200)
    // unknown column never prunes
    assert(rows(StatsPredicate(Seq(OrPred(Seq(LongEqPred("nope", 1L)))))) == n)
  }

  test("bloom filter unit: reference test vector semantics") {
    val bf = BloomFilter(10000, 0.05)
    bf.addBytes("ORC_STRING".getBytes("UTF-8"))
    bf.addLong(12345L)
    assert(bf.testBytes("ORC_STRING".getBytes("UTF-8")))
    assert(!bf.testBytes("ORC_STRING_not".getBytes("UTF-8")))
    assert(bf.testLong(12345L))
    assert(!bf.testLong(12346L))
  }

  test("FSST roundtrip and table serialization") {
    import graft.core.fsst._
    val values = Array.tabulate(500)(i => s"https://example.com/path/$i?session=abc$i".getBytes("UTF-8"))
    val sample = Fsst.sampleOf(values.iterator)
    val table = Fsst.train(sample)
    assert(table.symbols.nonEmpty)
    val ratio = Fsst.estimateRatio(table, sample)
    assert(ratio < 0.7, s"FSST should compress URLs well, got $ratio")
    val t2 = FsstTable.deserialize(table.serialize())
    values.foreach { v =>
      val enc = t2.encodeToArray(v)
      assert(java.util.Arrays.equals(t2.decodeToArray(enc, 0, enc.length), v))
    }
  }

  test("packed string/binary vecs produce byte-identical files to bins vecs") {
    val schema = TStruct(Seq(
      "lowcard" -> TString,  // exercises dictionary
      "highcard" -> TString, // exercises direct / FSST
      "bin" -> TBinary))
    val r = new scala.util.Random(7)
    val batches = 5
    val rowsPer = 4097 // crosses row-group boundaries mid-batch over batches
    def values(b: Int): (Array[Array[Byte]], Array[Array[Byte]], Array[Array[Byte]], Array[Boolean]) = {
      val rr = new scala.util.Random(100 + b)
      val nulls = Array.tabulate(rowsPer)(i => (i + b) % 11 == 0)
      val low = Array.tabulate(rowsPer)(i => if (nulls(i)) null else s"cat-${rr.nextInt(20)}".getBytes("UTF-8"))
      val high = Array.tabulate(rowsPer)(i => if (nulls(i)) null else s"https://host/x/${rr.nextLong()}".getBytes("UTF-8"))
      val bin = Array.tabulate(rowsPer)(i => if (nulls(i)) null else { val a = new Array[Byte](rr.nextInt(20)); rr.nextBytes(a); a })
      (low, high, bin, nulls)
    }
    def binsVec(b: Int): ColVec = {
      val (low, high, bin, nulls) = values(b)
      val v = new ColVec(rowsPer)
      def col(a: Array[Array[Byte]]): ColVec = {
        val c = new ColVec(rowsPer); c.nulls = nulls.clone(); c.bins = a; c
      }
      v.children = Array(col(low), col(high), col(bin))
      v
    }
    def packedVec(b: Int): ColVec = {
      val (low, high, bin, nulls) = values(b)
      val v = new ColVec(rowsPer)
      def col(a: Array[Array[Byte]]): ColVec = {
        val c = new ColVec(rowsPer); c.nulls = nulls.clone()
        // oversized reused-style buffer with slack, offsets cumulative
        val total = a.filter(_ != null).map(_.length).sum
        c.packed = new Array[Byte](total + 123)
        c.offs = new Array[Int](rowsPer + 64)
        var used = 0
        for (i <- 0 until rowsPer) {
          if (a(i) != null) { System.arraycopy(a(i), 0, c.packed, used, a(i).length); used += a(i).length }
          c.offs(i + 1) = used
        }
        c
      }
      v.children = Array(col(low), col(high), col(bin))
      v
    }
    def fileOf(mk: Int => ColVec): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val w = new MothFileWriter(bos, schema, CompressionKind.ZLIB,
        WriterOpts(bloomColumns = Set("lowcard", "highcard")))
      (0 until batches).foreach(b => w.write(mk(b)))
      w.close()
      bos.toByteArray
    }
    val a = fileOf(binsVec)
    val b = fileOf(packedVec)
    assert(java.util.Arrays.equals(a, b), "packed and bins files must be byte-identical")
    // decode and spot-check
    val rd = MothFileReader.fromBytes(b)
    val out = rd.batches().toSeq
    assert(out.map(_.len).sum == batches * rowsPer)
  }

  test("user metadata round-trips through the footer") {
    val schema = TStruct(Seq("x" -> TLong))
    val bos = new ByteArrayOutputStream()
    val w = new MothFileWriter(bos, schema, CompressionKind.ZLIB,
      WriterOpts(userMetadata = Map("pipeline" -> "graft-test", "snapshot" -> "s-42")))
    val v = new ColVec(10)
    v.children = Array({ val c = new ColVec(10); c.longs = Array.tabulate(10)(_.toLong); c })
    w.write(v)
    w.close()
    val rd = MothFileReader.fromBytes(bos.toByteArray)
    assert(rd.userMetadata("pipeline") == "graft-test")
    assert(rd.userMetadata("snapshot") == "s-42")
    assert(rd.userMetadata.contains("graft.writer.version"))
  }

  test("timestamp encodeNanos golden table") {
    import TimestampColumnWriter._
    // reference comment rows (TimestampColumnWriter.go:42-51)
    assert(encodeNanos(0L) == 0L)
    assert(encodeNanos(1000000L) == ((1L << 3) | 6L)) // 1 with 6 trailing zeros
    assert(encodeNanos(100000L) == ((1L << 3) | 5L))
    assert(encodeNanos(100L) == ((1L << 3) | 2L))
    assert(encodeNanos(1L) == (1L << 3))
    assert(encodeNanos(999999999L) == (999999999L << 3))
    for (ns <- Seq(0L, 1L, 10L, 100L, 1000L, 123456789L, 999999999L, 500000000L, 123000000L, 120000000L))
      assert(decodeNanos(encodeNanos(ns)) == ns, s"nanos $ns")
  }

  test("corrupt inputs fail fast, never hang: garbage file, truncated tail, zlib bombs") {
    val (schema, vec) = makeVec(500, 7, 31)
    val (bytes, _) = roundtrip(schema, Seq(vec), CompressionKind.ZLIB)

    // arbitrary non-MOTH bytes: postscript parse / magic check must throw
    intercept[Exception] {
      MothFileReader.fromBytes(Array.fill[Byte](100)(42)).batches().toSeq
    }
    // truncated tail (drop the last 5 bytes: psLen byte + postscript suffix)
    intercept[Exception] {
      MothFileReader.fromBytes(bytes.dropRight(5)).batches().toSeq
    }
    // flip the magic characters inside the postscript — the file must be
    // rejected at open, not misparsed. Magic sits just before the final
    // psLen byte's postscript region; corrupt the whole postscript span.
    val badMagic = bytes.clone()
    val psLen = badMagic(badMagic.length - 1) & 0xff
    for (i <- (badMagic.length - 1 - psLen) until (badMagic.length - 1))
      badMagic(i) = 'X'.toByte
    intercept[Exception] {
      MothFileReader.fromBytes(badMagic).batches().toSeq
    }

    // a zlib chunk that inflates past the decompress scratch buffer must
    // raise IOException instead of spinning (Chunked.ZlibCodec guard): one
    // framed chunk whose uncompressed size (300 KB) exceeds the declared
    // 256 KB chunk size
    val big = new Array[Byte](300 * 1024) // zeros compress tiny
    val defl = new java.util.zip.Deflater(4, true) // raw deflate, like the codec
    defl.setInput(big); defl.finish()
    val comp = new Array[Byte](64 * 1024)
    val clen = defl.deflate(comp)
    assert(defl.finished() && clen > 0 && clen < comp.length)
    val framed = new graft.core.io.ByteBuf(clen + 3)
    val hdr = clen << 1 // isOriginal=0
    framed.writeByte((hdr & 0xff).toByte)
    framed.writeByte(((hdr >> 8) & 0xff).toByte)
    framed.writeByte(((hdr >> 16) & 0xff).toByte)
    framed.writeBytes(comp, 0, clen)
    val ex = intercept[java.io.IOException] {
      Chunked.decompress(CompressionKind.ZLIB, framed.toArray, 0, framed.size,
        Chunked.DefaultChunkSize)
    }
    assert(ex.getMessage.contains("inflates past buffer"), ex.getMessage)

    // truncated zlib payload inside a valid frame: EOF, not a spin
    val good = new graft.core.io.ByteBuf(1024)
    Chunked.compress(CompressionKind.ZLIB, big, 0, 4096, good)
    intercept[Exception] {
      Chunked.decompress(CompressionKind.ZLIB, good.toArray, 0, good.size - 6,
        Chunked.DefaultChunkSize)
    }
  }

  test("huge single values: multi-chunk strings beyond the batch byte cap roundtrip") {
    // a 20MB value spans ~80 compression chunks and alone exceeds the
    // reader's 16MB decoded-bytes batch cap — the adaptive sizing must
    // degrade to 1-row batches, not truncate or blow up
    val r = new scala.util.Random(5L)
    val big1 = Array.fill(20 << 20)((r.nextInt(26) + 'a').toByte) // compressible-ish
    val big2 = Array.fill(17 << 20)(r.nextInt(256).toByte) // incompressible
    val schema = TStruct(Seq("id" -> TLong, "blob" -> TBinary))
    val n = 6
    val v = new ColVec(n)
    val idc = new ColVec(n); idc.longs = Array.tabulate(n)(_.toLong)
    val bc = new ColVec(n)
    bc.bins = Array[Array[Byte]](big1, "tiny".getBytes, Array.empty,
      big2, "x".getBytes, big1.take(1000))
    bc.nulls = Array(false, false, true, false, false, false)
    v.children = Array(idc, bc)
    for (kind <- Seq(CompressionKind.NONE, CompressionKind.ZLIB)) {
      val (_, out) = roundtrip(schema, Seq(v), kind)
      assert(out.map(_.len).sum == n)
      val ids = out.flatMap(b => b.children(0).longs.take(b.len))
      assert(ids == (0L until n), s"$kind: ids differ")
      val blobs = out.flatMap { b =>
        (0 until b.len).map { i =>
          val c = b.children(1)
          if (c.isNull(i)) null
          else if (c.packed != null) java.util.Arrays.copyOfRange(
            c.packed, c.binOff(i), c.binOff(i) + c.binLen(i))
          else c.bins(i)
        }
      }
      assert(blobs.length == n)
      (0 until n).foreach { i =>
        if (bc.nulls(i)) assert(blobs(i) == null, s"$kind row $i: null lost")
        else assert(java.util.Arrays.equals(blobs(i), bc.bins(i)),
          s"$kind row $i: blob bytes differ (${blobs(i).length} vs ${bc.bins(i).length})")
      }
    }
  }

  test("fuzz: random nested schemas roundtrip across codecs and tiny row groups") {
    val r = new scala.util.Random(20260818L)

    def randScalar(): MothType = Seq[MothType](
      TBoolean, TByte, TShort, TInt, TLong, TFloat, TDouble,
      TDecimal(12, 2), TDecimal(30, 5), TString, TBinary, TDate, TTimestamp
    )(r.nextInt(13))

    def randType(depth: Int): MothType =
      if (depth <= 0 || r.nextInt(3) == 0) randScalar()
      else r.nextInt(3) match {
        case 0 => TList(randType(depth - 1))
        case 1 => TMap(randScalar(), randType(depth - 1))
        case _ => TStruct((1 to 1 + r.nextInt(3)).map(i => s"f$i" -> randType(depth - 1)))
      }

    // vec for `t` with `n` rows following the writer's layout conventions:
    // list/map lengths are 0 on null rows, struct children are DENSE over
    // the parent's non-null rows
    def randVec(t: MothType, n: Int, nullP: Int): ColVec = {
      val c = new ColVec(n)
      if (nullP > 0) {
        val a = Array.tabulate(n)(_ => r.nextInt(100) < nullP)
        if (a.exists(identity)) c.nulls = a
      }
      t match {
        case TBoolean => c.longs = Array.tabulate(n)(_ => r.nextInt(2).toLong)
        case TByte => c.longs = Array.tabulate(n)(_ => (r.nextInt(256) - 128).toLong)
        case TShort => c.longs = Array.tabulate(n)(_ => (r.nextInt(65536) - 32768).toLong)
        case TInt => c.longs = Array.tabulate(n)(_ => r.nextInt().toLong)
        case TLong => c.longs = Array.tabulate(n)(_ => r.nextLong())
        case TDate => c.longs = Array.tabulate(n)(_ => (15000 + r.nextInt(8000)).toLong)
        case TTimestamp =>
          c.longs = Array.tabulate(n)(_ => 1735689600000000L + (r.nextLong() % 50000000000L))
        case TFloat => c.doubles = Array.tabulate(n)(_ => r.nextFloat().toDouble)
        case TDouble => c.doubles = Array.tabulate(n)(_ => r.nextDouble() * 1e8 - 5e7)
        case TDecimal(p, _) if p <= 18 =>
          c.longs = Array.tabulate(n)(_ => r.nextLong() % 10000000000L)
        case TDecimal(_, _) =>
          c.bigs = Array.tabulate(n)(_ => BigInt(r.nextLong()) * BigInt(1 + r.nextInt(100000)))
        case TString =>
          val w = Array("ra", "rho", "sigma", "tau", "", "omega-long-tail-value")
          c.bins = Array.tabulate(n)(_ => (w(r.nextInt(w.length)) * (1 + r.nextInt(2))).getBytes("UTF-8"))
        case TBinary =>
          c.bins = Array.tabulate(n)(_ => Array.fill(r.nextInt(12))(r.nextInt(256).toByte))
        case l: TList =>
          c.lengths = Array.tabulate(n)(i => if (c.isNull(i)) 0 else r.nextInt(4))
          val total = (0 until n).map(c.lengths(_)).sum
          c.children = Array(randVec(l.elem, total, if (r.nextBoolean()) 10 else 0))
        case m: TMap =>
          c.lengths = Array.tabulate(n)(i => if (c.isNull(i)) 0 else r.nextInt(3))
          val total = (0 until n).map(c.lengths(_)).sum
          c.children = Array(randVec(m.key, total, 0), randVec(m.value, total, 10))
        case s: TStruct =>
          val dense = (0 until n).count(i => !c.isNull(i))
          c.children = s.fields.map { case (_, ft) =>
            randVec(ft, dense, if (r.nextBoolean()) 10 else 0)
          }.toArray
        case other => fail(s"generator does not emit $other")
      }
      c
    }

    for (round <- 0 until 25) {
      val schema = TStruct((1 to 1 + r.nextInt(4)).map(i => s"c$i" -> randType(2)))
      val n = 200 + r.nextInt(600)
      val v = randVec(schema, n, 0) // top-level rows are never null (nullP=0)
      val kind = Seq(CompressionKind.NONE, CompressionKind.ZLIB, CompressionKind.SNAPPY,
        CompressionKind.LZ4, CompressionKind.ZSTD)(round % 5)
      val opts =
        if (r.nextBoolean()) WriterOpts(rowGroupMaxRowCount = 64, stripeMaxRowCount = 256,
          stripeMinBytes = 0)
        else WriterOpts()
      try {
        val (_, out) = roundtrip(schema, Seq(v), kind, opts)
        fullCompare(schema, Seq(v), out)
      } catch {
        case e: Throwable =>
          fail(s"fuzz round $round failed for schema $schema (n=$n, $kind): ${e.getMessage}")
      }
    }
  }
}
