package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc phase profiler for the encode pipeline. */
object Probe {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("readfiles")) { readFilesProbe(args(1)); return }
    val cpus = args.headOption.getOrElse("8").toInt
    val turns = 500000L
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus * 2)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[$cpus cores] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val df = graft.spark.TranscriptGen.transcripts(spark, turns, partitions = cpus * 2)
    time("gen+count")(df.count())
    time("gen+count again")(df.count())
    val salted = graft.spark.TranscriptGen.withSalt(df)
    val shuffled = salted
      .repartitionByRange(cpus * 2, col("conv_id"), col("salt"), col("turn_idx"))
      .sortWithinPartitions(col("conv_id"), col("turn_idx")).drop("salt")
    time("gen+shuffle+sort+count")(shuffled.count())
    val tmp = java.nio.file.Files.createTempDirectory("probe").toString
    time("full encode job") {
      graft.spark.MothSpark.writeFiles(shuffled, tmp, "probe",
        graft.core.compress.CompressionKind.ZLIB,
        graft.core.columns.WriterOpts(), Seq("conv_id", "turn_idx"))
    }
    // encode without shuffle (straight from generator partitions)
    val tmp2 = java.nio.file.Files.createTempDirectory("probe2").toString
    time("encode, no shuffle") {
      graft.spark.MothSpark.writeFiles(df, tmp2, "probe2",
        graft.core.compress.CompressionKind.ZLIB,
        graft.core.columns.WriterOpts(), Nil)
    }
    spark.stop()
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
