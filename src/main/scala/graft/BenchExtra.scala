package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Measurement-only harness for optimization work (guide §1): times each
  * declared query in isolation with the noop sink, counts Spark jobs/stages
  * per query (scheduler overhead is the dominant cost for the small-input
  * rows), and dumps `.explain("formatted")` for every query to
  * plans/<tag>/<name>_<suffix>.txt. Does NOT touch Bench.scala's frozen
  * methodology or any committed BENCH state.
  *
  * Usage: sbt "runMain graft.BenchExtra [suffix] [queryFilter...]"
  *   SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench.
  *   SPARK_GRAFT_PLANS_TAG: plans subdir (default r06)
  *   SPARK_GRAFT_REPEATS: timing repeats per query (default 1)
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLANS_TAG", "r06")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "1").toInt
    val suffix = args.headOption.getOrElse("before")
    val filter = args.drop(1).toSet

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // per-query job/stage/task counters via listener
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val verbose = sys.env.contains("SPARK_GRAFT_JOBLOG")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs += 1; stages += j.stageInfos.size
        jobStart.put(j.jobId, System.nanoTime())
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = jobStart.remove(j.jobId)
        if (t0 != 0L && verbose)
          jobLog.add(f"    job ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%6.3f s")
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        tasks += 1
    })

    // warmup (same as Bench)
    try {
      spark.range(100000).selectExpr("sum(id)").collect()
      graft.spark.MothSpark.roundtrip(
        spark.read.parquet(s"$sfDir/nation.parquet")).count()
    } catch { case _: Throwable => }

    val plansDir = Paths.get(s"plans/$tag")
    Files.createDirectories(plansDir)

    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => filter.isEmpty || filter.exists(n.contains) }

    val rows = selected.map { case (name, fn) =>
      spark.sparkContext.setJobDescription(name)
      // capture plan (built fresh; building may run side-effect jobs for
      // the dsv2/streaming queries — that's fine, the timing below rebuilds)
      try {
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(plansDir.resolve(s"${name}_$suffix.txt"), plan)
      } catch { case e: Throwable =>
        Files.writeString(plansDir.resolve(s"${name}_$suffix.txt"),
          s"explain failed: $e")
      }
      val times = (1 to repeats).map { _ =>
        jobs = 0; stages = 0; tasks = 0
        jobLog.clear()
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case _: Throwable =>
          try fn(spark, sfDir).count() catch { case _: Throwable => }
        }
        (System.nanoTime() - t0) / 1e9
      }
      val best = times.min
      println(f"QE $name%-28s ${best}%7.3f s  (jobs=$jobs stages=$stages tasks=$tasks)${
        if (repeats > 1) times.map(t => f"$t%.2f").mkString("  [", ",", "]") else ""}")
      if (verbose) jobLog.forEach(l => println(l))
      name -> best
    }
    println(f"QE TOTAL ${rows.map(_._2).sum}%.2f s over ${rows.size} queries")
    spark.stop()
  }
}
