package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.columns.{ColVec, MothType, WriterOpts}
import graft.core.columns.MothType._
import graft.core.compress.CompressionKind
import graft.core.file._

/** Executor-parallel safety: on a real cluster every core plans and reads
  * through the shared per-JVM parsed-tail LRU concurrently. 16 threads
  * hammering cached opens, pruned reads and full reads over a small file
  * set must produce exactly-correct results with zero exceptions — a torn
  * LRU or shared-state race here would corrupt query results at scale.
  */
class ConcurrentReadSpec extends AnyFunSuite {

  test("16 threads x cached open/prune/read over 8 files: correct sums, no races") {
    val dir = java.nio.file.Files.createTempDirectory("graft-conc")
    val nFiles = 8
    val rowsPer = 4000
    val expected = new Array[Long](nFiles)
    val paths = (0 until nFiles).map { f =>
      val p = dir.resolve(f"part-$f%02d.moth")
      val os = new java.io.BufferedOutputStream(java.nio.file.Files.newOutputStream(p))
      val w = new MothFileWriter(os, TStruct(Seq("id" -> TLong, "s" -> TString)),
        CompressionKind.ZLIB, WriterOpts(rowGroupMaxRowCount = 256))
      val v = new ColVec(rowsPer)
      val idc = new ColVec(rowsPer)
      idc.longs = Array.tabulate(rowsPer)(i => f * 100000L + i)
      val sc = new ColVec(rowsPer)
      sc.bins = Array.tabulate(rowsPer)(i => s"f$f-row$i".getBytes("UTF-8"))
      v.children = Array(idc, sc)
      w.write(v)
      w.close(); os.close()
      expected(f) = idc.longs.sum
      p.toString
    }

    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val done = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (0 until 16).map { t =>
      new Thread(() => {
        try {
          val rnd = new scala.util.Random(t)
          for (iter <- 0 until 30) {
            val f = rnd.nextInt(nFiles)
            val rd = MothFileReader.fromPathCached(paths(f))
            try {
              rnd.nextInt(3) match {
                case 0 => // full read: sum must match
                  val sum = rd.batches().map(b =>
                    (0 until b.len).map(b.children(0).longs(_)).sum).sum
                  assert(sum == expected(f), s"thread $t iter $iter: sum mismatch file $f")
                case 1 => // pruned read of one 256-row group
                  val lo = f * 100000L + rnd.nextInt(rowsPer - 256)
                  val pred = StatsPredicate(Seq(
                    LongRangePred("id", Some(lo), Some(lo + 10))))
                  val got = rd.batches(predicate = pred).map(_.len).sum
                  assert(got >= 11 && got <= 512,
                    s"thread $t iter $iter: pruned read got $got rows")
                case _ => // footer-only access (planning path)
                  assert(rd.rowCount == rowsPer)
                  assert(rd.footer.stripes.nonEmpty)
              }
            } finally rd.close()
          }
          done.incrementAndGet()
        } catch { case e: Throwable => errors.add(e) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(errors.isEmpty, s"concurrent read failures: ${errors.peek()}")
    assert(done.get() == 16, s"only ${done.get()}/16 threads completed")
  }
}
