package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** CLI drive of the streaming moth source (verify-skill surface):
  * writes two waves of MOTH files, streams the directory with a
  * checkpointed AvailableNow query between the waves, and prints the
  * per-run row counts — run 2 must see only wave-2 files.
  *
  * Usage: `sbt -batch "runMain graft.spark.StreamDemo"`.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("moth-stream-demo").toString
    val ckpt = java.nio.file.Files.createTempDirectory("moth-stream-ckpt").toString

    def writeWave(lo: Int, hi: Int): Unit =
      (lo until hi).map(i => (i.toLong, s"turn-$i")).toDF("id", "text")
        .repartition(2).write.format("moth").mode("append").save(dir)

    def streamOnce(): Long = {
      @volatile var n = 0L
      val q = spark.readStream.format("moth")
        .schema(spark.read.format("moth").load(dir).schema).load(dir)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          n += df.count(); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      n
    }

    writeWave(0, 10000)
    val run1 = streamOnce()
    writeWave(10000, 12500)
    val run2 = streamOnce()
    println(s"run1=$run1 run2=$run2 exactlyOnce=${run1 == 10000L && run2 == 2500L}")

    // stateful ops drive: sessionize a three-batch transcript stream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val turnEnc: org.apache.spark.sql.Encoder[TranscriptGen.Turn] =
      org.apache.spark.sql.Encoders.product[TranscriptGen.Turn]
    val in = MemoryStream[TranscriptGen.Turn]
    val q = StreamingOps.sessionize(spark, in.toDF(), gapMs = 60000L)
      .writeStream.format("memory").queryName("demo_sessions")
      .outputMode("append").start()
    def t(conv: String, i: Int, sec: Long) = TranscriptGen.Turn(conv, i, "user",
      s"t$i", "", new java.sql.Timestamp(1700000000000L + sec * 1000))
    in.addData(t("cA", 0, 0), t("cA", 1, 5), t("cB", 0, 2))
    q.processAllAvailable()
    in.addData(t("cC", 0, 600))
    q.processAllAvailable()
    in.addData(t("cC", 1, 610))
    q.processAllAvailable()
    q.stop()
    val closed = spark.sql("SELECT conv_id, turns FROM demo_sessions ORDER BY conv_id")
      .collect().map(r => s"${r.getString(0)}:${r.getLong(1)}").mkString(",")
    println(s"closedSessions=$closed")
    spark.stop()
  }
}
