package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayOutputStream
import graft.core.columns.{ColVec, MothType, WriterOpts}
import graft.core.columns.MothType._
import graft.core.compress.CompressionKind
import graft.core.file._

/** End-to-end randomized equivalence: a pruned read over a real MOTH file
  * (row-group pruning + checkpoint seeks + bloom tests) must return every
  * row-level-matching row (no false prune), only rows that exist in the
  * file with their exact values (seek-decode correctness), in file order.
  * Data shapes cycle sorted / clustered / random so pruning is actually
  * exercised, not just vacuously true.
  */
class PrunedReadEquivalenceSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(77L)

  private def strAt(c: ColVec, i: Int): String =
    if (c.isNull(i)) null
    else if (c.packed != null) new String(c.packed, c.binOff(i), c.binLen(i), "UTF-8")
    else new String(c.bins(i), "UTF-8")

  private def rowTruth(p: ColPredicate, id: Long, s: String): Boolean = p match {
    case AndPred(ps) => ps.forall(rowTruth(_, id, s))
    case OrPred(ps) => ps.exists(rowTruth(_, id, s))
    case LongRangePred(_, lo, hi) => lo.forall(_ <= id) && hi.forall(_ >= id)
    case LongEqPred(_, v) => id == v
    case StringEqPred(_, v) => s != null && s == v
    case StringRangePred(_, lo, hi) => s != null && {
      val b = s.getBytes("UTF-8")
      lo.forall { case (v, incl) =>
        val c = stats.ColStats.compareBytes(b, v.getBytes("UTF-8"))
        if (incl) c >= 0 else c > 0
      } && hi.forall { case (v, incl) =>
        val c = stats.ColStats.compareBytes(b, v.getBytes("UTF-8"))
        if (incl) c <= 0 else c < 0
      }
    }
    case IsNullPred(_) => s == null
    case IsNotNullPred(_) => s != null
    case _ => true
  }

  test("pruned reads return exactly the surviving groups' rows, values intact, order kept") {
    var anyPruning = 0
    for (round <- 0 until 18) {
      val n = 1500 + rnd.nextInt(1500)
      val shape = round % 3
      val ids: Array[Long] = shape match {
        case 0 => Array.tabulate(n)(i => i * 3L) // sorted, tight groups
        case 1 => // clustered: blocks of one value-neighborhood
          Array.tabulate(n)(i => (i / 256) * 1000L + rnd.nextInt(50))
        case _ => Array.fill(n)(rnd.nextLong() % 100000L) // random, wide groups
      }
      val pool = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
      val strs: Array[String] = Array.tabulate(n)(i =>
        if (rnd.nextInt(8) == 0) null
        else pool(if (shape == 0) (i / 512) % pool.length else rnd.nextInt(pool.length)))

      val v = new ColVec(n)
      val idc = new ColVec(n); idc.longs = ids
      val sc = new ColVec(n)
      sc.bins = strs.map(x => if (x == null) Array.empty[Byte] else x.getBytes("UTF-8"))
      if (strs.exists(_ == null)) sc.nulls = strs.map(_ == null)
      v.children = Array(idc, sc)

      val codec = Seq(CompressionKind.NONE, CompressionKind.ZLIB,
        CompressionKind.LZ4)(round % 3)
      val withBloom = rnd.nextBoolean()
      val bos = new ByteArrayOutputStream()
      val w = new MothFileWriter(bos, TStruct(Seq("id" -> TLong, "s" -> TString)),
        codec, WriterOpts(rowGroupMaxRowCount = 128,
          bloomColumns = if (withBloom) Set("s") else Set.empty))
      w.write(v)
      w.close()
      val bytes = bos.toByteArray

      def leaf(): ColPredicate = rnd.nextInt(6) match {
        case 0 => LongEqPred("id", ids(rnd.nextInt(n)))
        case 1 =>
          val a = ids(rnd.nextInt(n)); val b = ids(rnd.nextInt(n))
          LongRangePred("id", Some(math.min(a, b)), Some(math.max(a, b) - rnd.nextInt(2)))
        case 2 => LongRangePred("id", Some(ids(rnd.nextInt(n))), None)
        case 3 => StringEqPred("s", if (rnd.nextBoolean()) pool(rnd.nextInt(pool.length)) else "missing")
        case 4 => StringRangePred("s", Some(("b", true)), Some(("e", false)))
        case _ => if (rnd.nextBoolean()) IsNullPred("s") else IsNotNullPred("s")
      }
      val pred: ColPredicate = rnd.nextInt(4) match {
        case 0 => AndPred(Seq(leaf(), leaf()))
        case 1 => OrPred(Seq(leaf(), leaf()))
        case _ => leaf()
      }

      val rdFull = MothFileReader.fromBytes(bytes)
      val full = rdFull.batches().toSeq.flatMap { b =>
        (0 until b.len).map(i => (b.children(0).longs(i), strAt(b.children(1), i)))
      }
      assert(full.map(_._1) == ids.toSeq, s"round $round: full read ids differ")

      val rdP = MothFileReader.fromBytes(bytes)
      val pruned = rdP.batches(predicate = StatsPredicate(Seq(pred))).toSeq.flatMap { b =>
        (0 until b.len).map(i => (b.children(0).longs(i), strAt(b.children(1), i)))
      }
      // (1) soundness: every truth-matching row is present with its value
      val want = full.filter { case (id, s) => rowTruth(pred, id, s) }
      val prunedSet = pruned.groupBy(identity).view.mapValues(_.size).toMap
      want.groupBy(identity).foreach { case (row, ws) =>
        assert(prunedSet.getOrElse(row, 0) >= ws.size,
          s"round $round: row $row pruned away under $pred")
      }
      // (2) subset + order: pruned rows are a subsequence of the full read
      var cursor = 0
      pruned.foreach { row =>
        var i = cursor
        while (i < full.length && full(i) != row) i += 1
        assert(i < full.length, s"round $round: pruned read surfaced alien row $row")
        cursor = i + 1
      }
      if (pruned.length < full.length) anyPruning += 1
    }
    assert(anyPruning >= 6, s"pruning exercised in only $anyPruning/18 rounds")
    info(s"pruning active in $anyPruning/18 rounds")
  }
}
