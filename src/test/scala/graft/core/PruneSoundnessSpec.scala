package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.file._
import graft.core.stats._

/** Randomized soundness property for stats/bloom pruning — the single most
  * safety-critical invariant of the engine: if ANY row in a unit satisfies
  * the predicate, `StatsPredicate.matches` must answer true (pruning may
  * only ever be conservative; a false prune is a silent wrong answer).
  *
  * Row-level truth mirrors Spark comparison semantics (NaN sorts above
  * everything; strings compare as unsigned bytes). -0.0 is excluded from
  * the double generator: Spark folds -0.0 == 0.0 while IEEE total order
  * does not, and the engine never receives -0.0 keys from Spark untouched.
  */
class PruneSoundnessSpec extends AnyFunSuite {

  private val Iters = 800
  private val rnd = new scala.util.Random(20260818L)

  private def dCmp(a: Double, b: Double): Int = java.lang.Double.compare(a, b)

  // row-level truth of a leaf over one generated column
  private def rowMatches(p: LeafPred, vs: Seq[Option[Any]]): Boolean = p match {
    case LongRangePred(_, lo, hi) => vs.exists {
      case Some(v: Long) => lo.forall(_ <= v) && hi.forall(_ >= v)
      case _ => false
    }
    case LongEqPred(_, x) => vs.exists { case Some(v: Long) => v == x; case _ => false }
    case DoubleRangePred(_, lo, hi) => vs.exists {
      case Some(v: Double) =>
        lo.forall { case (b, incl) => if (incl) dCmp(v, b) >= 0 else dCmp(v, b) > 0 } &&
          hi.forall { case (b, incl) => if (incl) dCmp(v, b) <= 0 else dCmp(v, b) < 0 }
      case _ => false
    }
    case DecimalRangePred(_, lo, hi) => vs.exists {
      case Some(v: BigDecimal) =>
        lo.forall { case (b, incl) => if (incl) v >= b else v > b } &&
          hi.forall { case (b, incl) => if (incl) v <= b else v < b }
      case _ => false
    }
    case StringEqPred(_, x) =>
      vs.exists { case Some(v: String) => v == x; case _ => false }
    case StringRangePred(_, lo, hi) => vs.exists {
      case Some(v: String) =>
        val b = v.getBytes("UTF-8")
        lo.forall { case (s, incl) =>
          val c = ColStats.compareBytes(b, s.getBytes("UTF-8"))
          if (incl) c >= 0 else c > 0
        } && hi.forall { case (s, incl) =>
          val c = ColStats.compareBytes(b, s.getBytes("UTF-8"))
          if (incl) c <= 0 else c < 0
        }
      case _ => false
    }
    case LongInPred(_, sorted) => vs.exists {
      case Some(v: Long) => java.util.Arrays.binarySearch(sorted, v) >= 0
      case _ => false
    }
    case StringInPred(_, sortedUtf8) => vs.exists {
      case Some(v: String) =>
        sortedUtf8.exists(java.util.Arrays.equals(_, v.getBytes("UTF-8")))
      case _ => false
    }
    case IsNullPred(_) => vs.exists(_.isEmpty)
    case IsNotNullPred(_) => vs.exists(_.nonEmpty)
  }

  private def rowMatches(p: ColPredicate, vs: Seq[Option[Any]]): Boolean = p match {
    case AndPred(ps) => // one row satisfying every conjunct
      vs.indices.exists(i => ps.forall(c => rowMatches(c, Seq(vs(i)))))
    case OrPred(ps) => ps.exists(rowMatches(_, vs))
    case leaf: LeafPred => rowMatches(leaf, vs)
  }

  private sealed trait Kind
  private case object KLong extends Kind
  private case object KDate extends Kind
  private case object KTs extends Kind
  private case object KDouble extends Kind
  private case object KDecimal extends Kind
  private case object KString extends Kind

  private def genDouble(): Double = rnd.nextInt(6) match {
    case 0 => Double.NaN
    case 1 => rnd.nextInt(21) - 10.0 // small ints → collisions with bounds
    case _ =>
      val v = (rnd.nextDouble() - 0.5) * 2000.0
      if (v == 0.0) 1.0 else v // no -0.0/0.0 edge
  }

  private def genString(): String = {
    val n = if (rnd.nextInt(10) == 0) 70 + rnd.nextInt(20) else rnd.nextInt(8)
    (0 until n).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
  }

  test("random units + random predicate trees: a matching row is never pruned") {
    var pruned = 0L
    var kept = 0L
    for (iter <- 0 until Iters) {
      val kind = Seq(KLong, KDate, KTs, KDouble, KDecimal, KString)(rnd.nextInt(6))
      val n = rnd.nextInt(60)
      // narrow domains so bounds regularly straddle the data
      val vs: Seq[Option[Any]] = Seq.fill(n) {
        if (rnd.nextInt(100) < 15) None
        else Some(kind match {
          case KLong => (rnd.nextInt(200) - 100).toLong
          case KDate => (19000 + rnd.nextInt(60)).toLong // epoch days
          case KTs => 1700000000000L + rnd.nextInt(100000).toLong
          case KDouble => genDouble()
          case KDecimal => BigDecimal(rnd.nextInt(2000) - 1000, 2)
          case KString => genString()
        })
      }
      // stats through the REAL builders (incl. NaN-drop / 64B-limit rules)
      val (stats, bloomOpt) = kind match {
        case KLong =>
          val b = new IntStatsBuilder
          val bl = BloomFilter(64, 0.05)
          vs.foreach { case Some(v: Long) => b.add(v); bl.addLong(v); case _ => b.recordNull() }
          (b.build(), if (rnd.nextBoolean()) Some(bl) else None)
        case KDate =>
          val b = new DateStatsBuilder
          vs.foreach { case Some(v: Long) => b.add(v.toInt); case _ => b.recordNull() }
          (b.build(), None)
        case KTs =>
          val b = new TimestampStatsBuilder
          vs.foreach { case Some(v: Long) => b.addMillis(v); case _ => b.recordNull() }
          (b.build(), None)
        case KDouble =>
          val b = new DoubleStatsBuilder
          vs.foreach { case Some(v: Double) => b.add(v); case _ => b.recordNull() }
          (b.build(), None)
        case KDecimal =>
          val b = new DecimalStatsBuilder
          vs.foreach { case Some(v: BigDecimal) => b.add(v); case _ => b.recordNull() }
          (b.build(), None)
        case KString =>
          val b = new StringStatsBuilder()
          val bl = BloomFilter(64, 0.05)
          vs.foreach {
            case Some(v: String) => b.add(v.getBytes("UTF-8")); bl.addBytes(v.getBytes("UTF-8"))
            case _ => b.recordNull()
          }
          (b.build(), if (rnd.nextBoolean()) Some(bl) else None)
      }

      def someVal[T](pick: => T): T = {
        val present = vs.flatten
        if (present.nonEmpty && rnd.nextBoolean())
          present(rnd.nextInt(present.size)).asInstanceOf[T]
        else pick
      }
      def longBound(): Long = kind match {
        case KDate => 19000L + rnd.nextInt(70) - 5
        case KTs => 1700000000000L + rnd.nextInt(120000) - 10000
        case _ => (rnd.nextInt(240) - 120).toLong
      }
      def leaf(): LeafPred = kind match {
        case KLong | KDate | KTs => rnd.nextInt(5) match {
          case 0 => LongEqPred("c", someVal(longBound()))
          case 1 => LongRangePred("c", Some(longBound()), None)
          case 2 => LongRangePred("c", None, Some(longBound()))
          case 3 =>
            val (a, b) = (longBound(), longBound())
            LongRangePred("c", Some(math.min(a, b)), Some(math.max(a, b)))
          case _ => // sorted-membership (large-IN path), mixing real values in
            val k = 1 + rnd.nextInt(6)
            val values = Seq.fill(k)(someVal(longBound()))
            LongInPred("c", values.distinct.sorted.toArray)
        }
        case KDouble =>
          val (a, b) = (genDouble(), genDouble())
          def fin(x: Double) = if (x.isNaN) 0.0 else x
          rnd.nextInt(3) match {
            case 0 => DoubleRangePred("c", Some((fin(a), rnd.nextBoolean())), None)
            case 1 => DoubleRangePred("c", None, Some((fin(a), rnd.nextBoolean())))
            case _ =>
              val (lo, hi) = (math.min(fin(a), fin(b)), math.max(fin(a), fin(b)))
              DoubleRangePred("c", Some((lo, rnd.nextBoolean())), Some((hi, rnd.nextBoolean())))
          }
        case KDecimal =>
          val a = BigDecimal(rnd.nextInt(2400) - 1200, 2)
          val b = BigDecimal(rnd.nextInt(2400) - 1200, 2)
          DecimalRangePred("c",
            Some((a.min(b), rnd.nextBoolean())), Some((a.max(b), rnd.nextBoolean())))
        case KString => rnd.nextInt(4) match {
          case 0 => StringEqPred("c", someVal(genString()))
          case 1 => StringRangePred("c", Some((genString(), rnd.nextBoolean())), None)
          case 2 => StringRangePred("c",
            Some((genString(), rnd.nextBoolean())), Some((genString(), rnd.nextBoolean())))
          case _ => // sorted-membership over UTF-8 bytes (unsigned order)
            val k = 1 + rnd.nextInt(6)
            val values = Seq.fill(k)(someVal(genString())).distinct
            StringInPred("c", values.map(_.getBytes("UTF-8")).sortWith(
              graft.core.stats.ColStats.compareBytes(_, _) < 0).toArray)
        }
      }
      def nullLeaf(): LeafPred = if (rnd.nextBoolean()) IsNullPred("c") else IsNotNullPred("c")
      def tree(): ColPredicate = rnd.nextInt(10) match {
        case 0 => AndPred(Seq.fill(1 + rnd.nextInt(2))(leaf()) :+ nullLeaf())
        case 1 => OrPred(Seq.fill(2 + rnd.nextInt(2))(leaf()))
        case 2 => nullLeaf()
        case 3 => AndPred(Seq(OrPred(Seq(leaf(), leaf())), leaf()))
        case _ => leaf()
      }

      val pred = tree()
      val sp = StatsPredicate(Seq(pred))
      val matches = sp.matches(_ => Some(0), _ => Some(stats), _ => bloomOpt)
      val truth = rowMatches(pred, vs)
      assert(!(truth && !matches),
        s"FALSE PRUNE iter=$iter kind=$kind pred=$pred\n values=$vs\n stats=$stats")
      if (!matches) pruned += 1 else kept += 1
    }
    // non-vacuity: the generator must actually exercise pruning
    assert(pruned > Iters / 20, s"pruning barely exercised: pruned=$pruned kept=$kept")
    info(s"pruned=$pruned kept=$kept over $Iters units")
  }
}
