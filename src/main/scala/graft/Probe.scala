package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc phase profiler for the encode pipeline. */
object Probe {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("readfiles")) { readFilesProbe(args(1)); return }
    if (args.headOption.contains("purecore")) {
      pureCoreScaling(args.lift(1).map(_.toInt).getOrElse(8)); return
    }
    val cpus = args.headOption.getOrElse("8").toInt
    val turns = args.lift(1).map(_.toLong).getOrElse(500000L)
    // identical partitioning at every parallelism level (as in Bench)
    val parts = args.lift(2).map(_.toInt).getOrElse(24)
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-probe")
      .config("spark.sql.session.timeZone", "UTC")
    sys.env.getOrElse("SPARK_GRAFT_EXTRA_CONF", "").split(',').filter(_.contains('='))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        val wall = sc.stageInfo.completionTime.getOrElse(0L) -
          sc.stageInfo.submissionTime.getOrElse(0L)
        println(f"    stage ${sc.stageInfo.stageId}%3d ${sc.stageInfo.name.takeWhile(_ != ' ')}%-18s " +
          f"wall=${wall / 1000.0}%6.1fs cpu=${m.executorCpuTime / 1e9}%6.1fs " +
          f"run=${m.executorRunTime / 1000.0}%6.1fs gc=${m.jvmGCTime / 1000.0}%5.1fs " +
          f"spillMem=${m.memoryBytesSpilled >> 20}%dMB spillDisk=${m.diskBytesSpilled >> 20}%dMB " +
          f"fetchWait=${m.shuffleReadMetrics.fetchWaitTime / 1000.0}%.1fs " +
          f"shufWrite=${m.shuffleWriteMetrics.writeTime / 1e9}%.1fs " +
          f"deserial=${m.executorDeserializeTime / 1000.0}%.1fs resultSer=${m.resultSerializationTime / 1000.0}%.1fs")
      }
    })
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }
    def time[A](name: String)(f: => A): A = {
      val g0 = gcMillis
      val t0 = System.nanoTime()
      val r = f
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[$cpus cores] $name: $secs%.2f s (gc ${(gcMillis - g0) / 1000.0}%.1f s)")
      r
    }
    val df = graft.spark.TranscriptGen.transcripts(spark, turns, partitions = parts)
    time("gen+count warmup")(df.count())
    time("gen+count")(df.count())
    val salted = graft.spark.TranscriptGen.withSalt(df)
    val shuffled = salted
      .repartitionByRange(parts, col("conv_id"), col("salt"), col("turn_idx"))
      .sortWithinPartitions(col("conv_id"), col("turn_idx")).drop("salt")
    time("gen+shuffle+sort+count")(shuffled.count())
    // decomposition: shuffle+sort+row-conversion only (drain, no encode)
    locally {
      import org.apache.spark.sql.Encoders
      val sch = shuffled.schema
      time("shuffled drain, no encode") {
        shuffled.mapPartitions { rows =>
          var n = 0L; var h = 0L
          while (rows.hasNext) { val r = rows.next(); if (r != null) h += 1; n += 1 }
          Iterator.single(n + (h & 0))
        }(Encoders.scalaLong).collect()
      }
      // encode CPU without file IO
      time("shuffled encode -> null sink") {
        shuffled.mapPartitions { rows =>
          val res = graft.spark.MothSpark.encodeRows(sch, rows,
            java.io.OutputStream.nullOutputStream(),
            graft.core.compress.CompressionKind.ZLIB,
            graft.core.columns.WriterOpts())
          Iterator.single(res.rows)
        }(Encoders.scalaLong).collect()
      }
    }
    val tmp = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "probe").toString
    time("full encode job") {
      graft.spark.MothSpark.writeFiles(shuffled, tmp, "probe",
        graft.core.compress.CompressionKind.ZLIB,
        graft.core.columns.WriterOpts(), Seq("conv_id", "turn_idx"))
    }
    // encode without shuffle (straight from generator partitions)
    val tmp2 = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "probe2").toString
    time("encode, no shuffle") {
      graft.spark.MothSpark.writeFiles(df, tmp2, "probe2",
        graft.core.compress.CompressionKind.ZLIB,
        graft.core.columns.WriterOpts(), Nil)
    }
    def rm(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles().foreach(rm); p.delete()
    }
    rm(new java.io.File(tmp)); rm(new java.io.File(tmp2))
    spark.stop()
  }

  /** Pure-engine thread-scaling probe (no Spark): K threads each encode a
    * distinct 250k-turn slice straight through MothFileWriter. Separates
    * engine cache/alloc contention from Spark shuffle/sort machinery.
    */
  def pureCoreScaling(maxThreads: Int): Unit = {
    import graft.core.columns._
    import graft.core.file.MothFileWriter
    import graft.core.compress.CompressionKind
    val schema = MothType.TStruct(Seq(
      "conv_id" -> MothType.TString, "turn_idx" -> MothType.TInt,
      "role" -> MothType.TString, "text" -> MothType.TString,
      "tool" -> MothType.TString, "ts" -> MothType.TTimestampInstant))
    // build per-thread batch sets (distinct data, built once, excluded from timing)
    def batchesFor(tid: Int): Array[ColVec] = {
      val r = new scala.util.Random(900 + tid)
      Array.tabulate(245)(bi => {
        val n = 1024
        val v = new ColVec(n)
        def strCol(f: Int => Array[Byte]): ColVec = {
          val c = new ColVec(n); c.bins = Array.tabulate(n)(f); c
        }
        val conv = strCol(i => f"conv-${tid * 100000 + bi * 4 + i / 256}%012d".getBytes)
        val turn = { val c = new ColVec(n); c.longs = Array.tabulate(n)(i => (i % 256).toLong); c }
        val role = strCol(i => graft.spark.TranscriptGen.Roles(r.nextInt(4)).getBytes)
        val text = strCol { i =>
          val sb = new StringBuilder
          var w = 0
          val nw = r.nextInt(200)
          while (w < nw && sb.length < 2000) {
            sb.append(graft.spark.TranscriptGen.Vocab(r.nextInt(2048))).append(' ')
            w += 1
          }
          sb.result().getBytes
        }
        val tool = strCol(i => s"tool-${r.nextInt(30)}".getBytes)
        val ts = { val c = new ColVec(n); c.longs = Array.tabulate(n)(i => 1735689600000000L + r.nextInt(1 << 30).toLong); c }
        v.children = Array(conv, turn, role, text, tool, ts)
        v
      })
    }
    def run(k: Int): (Double, Double) = {
      val data = Array.tabulate(k)(batchesFor)
      val cpuBean = java.lang.management.ManagementFactory.getThreadMXBean
      val cpus = new java.util.concurrent.atomic.AtomicLong
      val t0 = System.nanoTime()
      val threads = Array.tabulate(k) { tid =>
        val th = new Thread(() => {
          val c0 = cpuBean.getCurrentThreadCpuTime
          var rep = 0
          while (rep < 2) { // ~500k turns per thread
            val w = new MothFileWriter(java.io.OutputStream.nullOutputStream(),
              schema, CompressionKind.ZLIB)
            data(tid).foreach(w.write)
            w.close()
            rep += 1
          }
          cpus.addAndGet(cpuBean.getCurrentThreadCpuTime - c0)
        })
        th.start(); th
      }
      threads.foreach(_.join())
      ((System.nanoTime() - t0) / 1e9, cpus.get / 1e9)
    }
    run(2) // JIT warmup
    for (k <- Seq(2, maxThreads)) {
      val (wall, cpu) = run(k)
      val turns = k * 2L * 245 * 1024
      println(f"purecore k=$k wall=$wall%.2fs cpuTotal=$cpu%.1fs cpuPerTurn=${cpu * 1e9 / turns}%.0fns turnsPerSec=${turns / wall}%.0f")
    }
  }

  /** Decode a MOTH directory via MothSpark.readFiles and check the per-turn
    * ordering invariant (turn_idx resets to 0 and increments per conv).
    */
  def readFilesProbe(dir: String): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.spark.MothSpark.readFiles(spark, dir)
    println("schema: " + df.schema.simpleString)
    println("rows: " + df.count())
    // in-file order must already be (conv_id, turn_idx); validate per file
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    val bad = df.withColumn("rn", row_number().over(w) - 1)
      .filter(col("rn") =!= col("turn_idx")).count()
    println(s"turn-order violations: $bad")
    val sample = df.orderBy("conv_id", "turn_idx").limit(3).collect().mkString(" | ")
    println("head: " + sample.take(300))
    spark.stop()
  }
}
