package graft

import org.apache.spark.sql.SparkSession

/** Child-JVM benchmark worker: warmup encode, then the timed encode.
  * Prints `BENCHCHILD <secs> <rows> <rawBytes> <fileBytes>`.
  */
object BenchChild {
  def main(args: Array[String]): Unit = {
    val Array(cpusS, turnsS, outDir, partsS) = args
    val cpus = cpusS.toInt
    val turns = turnsS.toLong
    val parts = partsS.toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-child-$cpus")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      graft.spark.EncodeJob.run(spark, Map(
        "out" -> s"$outDir-warmup", "turns" -> math.max(turns / 10, 50000L).toString,
        "partitions" -> parts.toString, "codec" -> "zlib", "seed" -> "7"))
      System.gc()
      val t0 = System.nanoTime()
      val summary = graft.spark.EncodeJob.run(spark, Map(
        "out" -> outDir, "turns" -> turns.toString,
        "partitions" -> parts.toString, "codec" -> "zlib"))
      val secs = (System.nanoTime() - t0) / 1e9
      def grab(k: String): Long = {
        val m = java.util.regex.Pattern.compile("\"" + k + "\":(\\d+)").matcher(summary)
        if (m.find()) m.group(1).toLong else 0L
      }
      println(f"BENCHCHILD $secs%.3f ${grab("rows")} ${grab("rawBytes")} ${grab("fileBytes")}")
    } finally spark.stop()
  }
}
