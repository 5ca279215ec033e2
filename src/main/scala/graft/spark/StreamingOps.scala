package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful Structured Streaming operators over transcript streams — the
  * analytics face of the streaming axis next to the MOTH source/sink:
  * watermarked windowed aggregation and custom per-conversation state via
  * flatMapGroupsWithState. Both run on the engine's streaming source
  * (`readStream.format("moth")`) or any other transcript stream.
  */
object StreamingOps {

  /** Turns per (5-minute event-time window, role), late data bounded by a
    * 10-minute watermark — the canonical `withWatermark` + `groupBy(window)`
    * shape: state for a window is dropped once the watermark passes its end,
    * so long-running intake queries hold bounded state at any scale.
    */
  def turnsPerWindow(stream: DataFrame,
      window: String = "5 minutes", watermark: String = "10 minutes"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("role"))
      .agg(count(lit(1)).as("turns"))
      .select(col("window.start").as("win_start"), col("role"), col("turns"))

  /** One finished-conversation row per conversation: conv_id, turn count,
    * first/last event time. A conversation is "finished" when no turn
    * arrives for `gapMs` of event time (session-gap semantics) — the
    * flatMapGroupsWithState pattern for custom state the built-in windowed
    * aggregates can't express. State per key is three longs, emitted and
    * dropped on timeout, so a 10^9-conversation stream holds only
    * still-open conversations in the state store.
    */
  final case class ConvState(turns: Long, firstTs: Long, lastTs: Long)
  final case class ConvSummary(conv_id: String, turns: Long,
      first_ts: java.sql.Timestamp, last_ts: java.sql.Timestamp)

  def sessionize(spark: SparkSession, stream: DataFrame,
      gapMs: Long = 30 * 60 * 1000L): Dataset[ConvSummary] = {
    import spark.implicits._
    stream
      .withWatermark("ts", s"${gapMs / 1000} seconds")
      .select("conv_id", "ts").as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[ConvState, ConvSummary](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (convId: String, rows: Iterator[(String, java.sql.Timestamp)],
            state: GroupState[ConvState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ConvSummary(convId, s.turns,
              new java.sql.Timestamp(s.firstTs), new java.sql.Timestamp(s.lastTs)))
          } else {
            var s = state.getOption.getOrElse(ConvState(0L, Long.MaxValue, Long.MinValue))
            rows.foreach { case (_, ts) =>
              val t = ts.getTime
              s = ConvState(s.turns + 1, math.min(s.firstTs, t), math.max(s.lastTs, t))
            }
            state.update(s)
            state.setTimeoutTimestamp(s.lastTs + gapMs)
            Iterator.empty
          }
      }
  }
}
