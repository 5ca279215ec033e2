package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import graft.core.columns.ColVec

/** Direct edge-case coverage for the verify-and-tag sort checker: the
  * footer sort tag must only ever be written for data that really is
  * non-decreasing (ascending, NULLS FIRST) on the key columns — including
  * across batch boundaries, on ties, and for every key family.
  */
class SortCheckerSpec extends AnyFunSuite {

  private def longVec(xs: Seq[java.lang.Long]): ColVec = {
    val c = new ColVec(xs.length)
    c.longs = xs.map(x => if (x == null) 0L else x.longValue()).toArray
    if (xs.exists(_ == null)) c.nulls = xs.map(_ == null).toArray
    c
  }

  private def strVec(xs: Seq[String]): ColVec = {
    val c = new ColVec(xs.length)
    c.bins = xs.map(x => if (x == null) Array.empty[Byte] else x.getBytes("UTF-8")).toArray
    if (xs.exists(_ == null)) c.nulls = xs.map(_ == null).toArray
    c
  }

  private def dblVec(xs: Seq[Double]): ColVec = {
    val c = new ColVec(xs.length)
    c.doubles = xs.toArray
    c
  }

  private def batch(cols: ColVec*): ColVec = {
    val v = new ColVec(cols.head.len)
    v.children = cols.toArray
    v
  }

  test("sorted longs across batches: ok; regression at a batch boundary: not ok") {
    val ck = new MothSpark.SortChecker(Array(0))
    ck.update(batch(longVec(Seq(1L, 2L, 2L, 5L))))
    ck.update(batch(longVec(Seq(5L, 7L))))
    assert(ck.ok, "non-decreasing with ties must pass")
    ck.update(batch(longVec(Seq(6L)))) // 6 < previous batch's last (7)
    assert(!ck.ok, "a boundary regression must fail")
  }

  test("within-batch regression fails") {
    val ck = new MothSpark.SortChecker(Array(0))
    ck.update(batch(longVec(Seq(1L, 3L, 2L))))
    assert(!ck.ok)
  }

  test("nulls first: leading nulls ok, null AFTER a value fails") {
    val ok = new MothSpark.SortChecker(Array(0))
    ok.update(batch(longVec(Seq(null, null, 1L, 2L))))
    assert(ok.ok)
    val bad = new MothSpark.SortChecker(Array(0))
    bad.update(batch(longVec(Seq(1L, null))))
    assert(!bad.ok, "NULLS FIRST: a null after a value is out of order")
  }

  test("two keys: secondary ordered within primary ties, resets on new primary") {
    val ck = new MothSpark.SortChecker(Array(0, 1))
    ck.update(batch(strVec(Seq("a", "a", "b", "b")), longVec(Seq(1L, 2L, 0L, 9L))))
    assert(ck.ok, "secondary may restart when the primary advances")
    ck.update(batch(strVec(Seq("b")), longVec(Seq(3L)))) // b/3 after b/9
    assert(!ck.ok)
  }

  test("string ordering is unsigned-byte lexicographic, prefix rule holds") {
    val ck = new MothSpark.SortChecker(Array(0))
    ck.update(batch(strVec(Seq("ab", "abc", "b"))))
    assert(ck.ok, "a prefix sorts before its extension")
    val bad = new MothSpark.SortChecker(Array(0))
    bad.update(batch(strVec(Seq("10", "9")))) // bytes: '1' < '9' so this IS sorted
    assert(bad.ok, "byte order, not numeric order, is the contract")
    val bad2 = new MothSpark.SortChecker(Array(0))
    bad2.update(batch(strVec(Seq("9", "10"))))
    assert(!bad2.ok, "numeric-looking strings in numeric order are NOT byte-sorted")
  }

  test("doubles ordered; empty batches ignored") {
    val ck = new MothSpark.SortChecker(Array(0))
    ck.update(batch(dblVec(Seq(-1.5, 0.0, 2.25))))
    ck.update(batch(dblVec(Nil)))
    ck.update(batch(dblVec(Seq(2.25, 3.0))))
    assert(ck.ok)
    ck.update(batch(dblVec(Seq(2.9))))
    assert(!ck.ok)
  }

  test("property: checker agrees with a naive sortedness oracle over random 2-key batch splits") {
    val rnd = new scala.util.Random(42)
    def cmpRow(a: (Option[Long], Option[String]), b: (Option[Long], Option[String])): Int = {
      val k1 = (a._1, b._1) match {
        case (None, None) => 0
        case (None, _) => -1
        case (_, None) => 1
        case (Some(x), Some(y)) => java.lang.Long.compare(x, y)
      }
      if (k1 != 0) k1
      else (a._2, b._2) match {
        case (None, None) => 0
        case (None, _) => -1
        case (_, None) => 1
        case (Some(x), Some(y)) =>
          graft.core.stats.ColStats.compareBytes(x.getBytes("UTF-8"), y.getBytes("UTF-8"))
      }
    }
    var sortedSeen = 0
    var unsortedSeen = 0
    for (_ <- 0 until 400) {
      val n = 1 + rnd.nextInt(30)
      var rows = Seq.fill(n)((
        if (rnd.nextInt(6) == 0) None else Some(rnd.nextInt(8).toLong),
        if (rnd.nextInt(6) == 0) None
        else Some((0 until rnd.nextInt(3)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)))
      if (rnd.nextBoolean()) rows = rows.sortWith((a, b) => cmpRow(a, b) < 0)
      val expectSorted = rows.zip(rows.drop(1)).forall { case (a, b) => cmpRow(a, b) <= 0 }
      // random batch split, including empty batches
      val ck = new MothSpark.SortChecker(Array(0, 1))
      var rest = rows
      while (rest.nonEmpty || rnd.nextInt(4) == 0) {
        val take = math.min(rest.length, rnd.nextInt(6))
        val (h, t) = rest.splitAt(take)
        ck.update(batch(longVec(h.map(_._1.map(java.lang.Long.valueOf).orNull)),
          strVec(h.map(_._2.orNull))))
        rest = t
        if (rest.isEmpty && rnd.nextInt(4) != 0) rest = Nil
      }
      assert(ck.ok == expectSorted,
        s"checker=${ck.ok} oracle=$expectSorted rows=$rows")
      if (expectSorted) sortedSeen += 1 else unsortedSeen += 1
    }
    assert(sortedSeen > 50 && unsortedSeen > 50,
      s"generator imbalance: sorted=$sortedSeen unsorted=$unsortedSeen")
  }

  test("sortTagEligible: scalar families in, wide decimals and containers out") {
    import org.apache.spark.sql.types._
    assert(MothSpark.sortTagEligible(LongType))
    assert(MothSpark.sortTagEligible(StringType))
    assert(MothSpark.sortTagEligible(DateType))
    assert(MothSpark.sortTagEligible(DecimalType(18, 2)))
    assert(!MothSpark.sortTagEligible(DecimalType(30, 5)),
      "wide decimal varint bytes are not order-preserving")
    assert(!MothSpark.sortTagEligible(ArrayType(LongType)))
    assert(!MothSpark.sortTagEligible(StructType(Seq(StructField("x", LongType)))))
  }
}
