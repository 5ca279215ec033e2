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
