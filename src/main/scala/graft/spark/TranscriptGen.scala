package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic multi-turn transcripts table per FIXTURES.md F1 /
  * BASELINE.json input_hint: (conv_id string, turn_idx int, role string,
  * text string, tool string, ts timestamp). Seeded per conversation, so any
  * partitioning of the conv-id range yields identical rows — resume and
  * N-vs-4N runs see the same data.
  */
object TranscriptGen {
  val Roles = Array("user", "assistant", "system", "tool")
  val Tools = Array.tabulate(30)(i => s"tool-$i")
  val Vocab: Array[String] = {
    val r = new scala.util.Random(7351)
    Array.tabulate(2048)(i => {
      val len = 2 + r.nextInt(10)
      (0 until len).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    })
  }

  /** Conversation length: zipf-ish 1..50 with a 1% heavy tail. At bench
    * scales the tail is 10k–200k turns (FIXTURES.md) scaled by `tailScale`.
    */
  def convLength(convIdx: Long, seed: Long, tailScale: Double): Int = {
    val r = new scala.util.Random(seed * 1000003L + convIdx)
    if (r.nextInt(100) == 0) {
      val full = 10000 + r.nextInt(190000)
      math.max(100, (full * tailScale).toInt)
    } else 1 + (50 / (1 + r.nextInt(7))) // crude zipf over 1..50
  }

  final case class Turn(conv_id: String, turn_idx: Int, role: String,
      text: String, tool: String, ts: java.sql.Timestamp)

  /** Generates ~numTurns turns across conversations; fully deterministic. */
  def transcripts(spark: SparkSession, numTurns: Long, seed: Long = 42L,
      tailScale: Double = 0.02, partitions: Int = 0): DataFrame = {
    import spark.implicits._
    // mean length ≈ 15 (zipf) + 1% * 200000*tailScale
    val meanLen = 15.0 + 0.01 * 200000 * tailScale / 2
    val numConvs = math.max(1L, (numTurns / meanLen).toLong)
    val parts = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    spark.range(0, numConvs, 1, parts).flatMap { convIdx =>
      val len = convLength(convIdx, seed, tailScale)
      val r = new scala.util.Random(seed * 7919L + convIdx * 31L)
      val convId = f"conv-$convIdx%012d"
      val t0 = 1735689600000000L + (convIdx % 86400) * 1000000L * 37L
      var ts = t0
      (0 until len).map { turn =>
        ts += (1 + r.nextInt(300)).toLong * 1000000L + r.nextInt(1000).toLong * 1000L
        val role = Roles(if (turn == 0) 0 else r.nextInt(4))
        val nWords = r.nextInt(200)
        val sb = new StringBuilder
        var w = 0
        while (w < nWords && sb.length < 2000) {
          sb.append(Vocab(r.nextInt(Vocab.length))).append(' ')
          w += 1
        }
        val text = if (r.nextInt(100) == 0) null
          else if (r.nextInt(50) == 0) ""
          else sb.result()
        val tool = if (r.nextInt(100) < 85) null else Tools(r.nextInt(Tools.length))
        val micros = ts
        Turn(convId, turn, role, text, tool, {
          val t = new java.sql.Timestamp(micros / 1000L)
          t.setNanos((micros % 1000000L).toInt * 1000)
          t
        })
      }
    }.toDF()
  }

  /** The skew-breaking salt (north rule): contiguous turn blocks of a heavy
    * conversation get distinct salts while (conv_id, turn_idx) order inside
    * a block — and therefore inside a stripe — is preserved. Short
    * conversations always salt to 0.
    */
  def withSalt(df: DataFrame, saltBlockRows: Int = 65536): DataFrame =
    df.withColumn("salt", (col("turn_idx") / saltBlockRows).cast("int"))
}
