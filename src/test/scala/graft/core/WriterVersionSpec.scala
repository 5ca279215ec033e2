package graft.core

import java.io.ByteArrayOutputStream
import org.scalatest.funsuite.AnyFunSuite
import graft.core.columns.{ColVec, MothType}
import graft.core.columns.MothType._
import graft.core.compress.CompressionKind
import graft.core.file._

/** Writer-version gating of double-stats pruning (round-5 ADVICE, medium):
  * files written before version 2 may carry NaN-lying double min/max (the
  * old DoubleStatsBuilder silently excluded NaN, so [1.0, 2.0, NaN] reports
  * max=2.0 and `d > 5.0` — true for NaN in Spark's ordering — would wrongly
  * prune the group). Readers must only trust double stats at version >= 2.
  */
class WriterVersionSpec extends AnyFunSuite {

  private def writeDoubles(vals: Array[Double]): Array[Byte] = {
    val schema = TStruct(Seq("d" -> (TDouble: MothType)))
    val v = new ColVec(vals.length)
    val c = new ColVec(vals.length)
    c.doubles = vals
    v.children = Array(c)
    val bos = new ByteArrayOutputStream()
    val w = new MothFileWriter(bos, schema, CompressionKind.ZLIB)
    w.write(v)
    w.close()
    bos.toByteArray
  }

  /** Re-tag a parsed tail with a given graft.writer.version. */
  private def withVersion(bytes: Array[Byte], ver: Option[String]): MothFileReader = {
    val tail = MothFileReader.parseTail(new ArraySource(bytes))
    val meta = tail.footer.userMetadata - "graft.writer.version" ++
      ver.map(v => "graft.writer.version" -> v.getBytes("UTF-8"))
    new MothFileReader(new ArraySource(bytes),
      preParsed = tail.copy(footer = tail.footer.copy(userMetadata = meta)))
  }

  // a predicate the (NaN-free) stats refute: d > 5.0 over values [1.0, 2.0]
  private val gt5 = StatsPredicate(Seq(
    DoubleRangePred("d", lower = Some((5.0, false)), upper = None)))

  test("writer stamps version 2; reader parses it") {
    val rd = MothFileReader.fromBytes(writeDoubles(Array(1.0, 2.0)))
    assert(rd.writerVersion == 2)
    assert(rd.trustDoubleStats)
  }

  test("v2 file: double-range pruning applies (refuted group skipped)") {
    val rd = withVersion(writeDoubles(Array(1.0, 2.0)), Some("2"))
    assert(rd.batchesProjected(rd.schema, gt5).map(_.len).sum == 0)
  }

  test("v1 file: double stats untrusted, rows NOT pruned (candidate scan)") {
    // simulate an old file whose group really held a NaN the v1 stats lied
    // about: stats say max=2.0 but the reader must still hand rows back for
    // Spark's residual filter
    val rd = withVersion(writeDoubles(Array(1.0, 2.0)), Some("1"))
    assert(!rd.trustDoubleStats)
    assert(rd.batchesProjected(rd.schema, gt5).map(_.len).sum == 2)
  }

  test("missing version metadata reads as 1 (pre-versioning files)") {
    val rd = withVersion(writeDoubles(Array(1.0, 2.0)), None)
    assert(rd.writerVersion == 1)
    assert(rd.batchesProjected(rd.schema, gt5).map(_.len).sum == 2)
  }

  test("v1 file: non-double pruning still applies") {
    // long stats were never NaN-afflicted: an old file still prunes on them
    val schema = TStruct(Seq("x" -> (TLong: MothType)))
    val v = new ColVec(3)
    val c = new ColVec(3)
    c.longs = Array(1L, 2L, 3L)
    v.children = Array(c)
    val bos = new ByteArrayOutputStream()
    val w = new MothFileWriter(bos, schema, CompressionKind.ZLIB)
    w.write(v)
    w.close()
    val rd = withVersion(bos.toByteArray, Some("1"))
    val pred = StatsPredicate(Seq(LongRangePred("x", Some(100L), None)))
    assert(rd.batchesProjected(rd.schema, pred).map(_.len).sum == 0)
  }

  test("StatsPredicate: untrusted double stats never refute, And/Or composed") {
    import graft.core.stats.{ColStats, DoubleStats, IntStats}
    val stats = ColStats(numValues = 2, hasNull = false,
      doubleStats = Some(DoubleStats(1.0, 2.0, 3.0)))
    def m(p: StatsPredicate, trust: Boolean) =
      p.matches(_ => Some(1), _ => Some(stats), _ => None, trust)
    assert(!m(gt5, trust = true))
    assert(m(gt5, trust = false))
    // Or(refutableDouble, refutableLong): untrusted double branch keeps the
    // whole Or alive even though the long branch is refuted
    val or = StatsPredicate(Seq(OrPred(Seq(
      DoubleRangePred("d", Some((5.0, false)), None),
      LongRangePred("d", Some(100L), None)))))
    val both = ColStats(numValues = 2, hasNull = false,
      doubleStats = Some(DoubleStats(1.0, 2.0, 3.0)),
      intStats = Some(IntStats(1L, 3L, Some(6L))))
    assert(!or.matches(_ => Some(1), _ => Some(both), _ => None, true))
    assert(or.matches(_ => Some(1), _ => Some(both), _ => None, false))
  }
}
