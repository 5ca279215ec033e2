package graft.spark

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.core.columns.WriterOpts
import graft.core.compress.CompressionKind

/** Structured Streaming sink for the MOTH encoder: `readStream → transforms
  * → writeStream` per the Spark-first design. Each micro-batch goes through
  * the SAME pipeline as the batch job (range partition on the sort key →
  * sortWithinPartitions → per-partition encode with manifests) into
  * `out/batch-<epochId>/`.
  *
  * Exactly-once: Structured Streaming replays a failed epoch with the same
  * epochId; `MothSpark.writeFiles` is idempotent per (snapshotId,
  * partition) — the manifest carries `stream:batch=<epochId>`, so replayed
  * partitions are skipped and half-written files (never renamed from .tmp)
  * are rewritten. This is the streaming face of the north rule's resumable
  * per-partition lineage checkpointing.
  *
  * The reference has no streaming surface (SURVEY.md §2.7); this is the
  * engine's Spark-native extension point for continuous transcript intake.
  */
object StreamingEncode {

  /** Attach the encoder as a foreachBatch sink.
    * @param keyCols ordering key, e.g. ("conv_id", "turn_idx")
    */
  def sink(stream: DataFrame, out: String, partitions: Int,
      keyCols: Seq[String],
      compression: CompressionKind.Value = CompressionKind.ZLIB,
      opts: WriterOpts = WriterOpts()): DataStreamWriter[Row] = {
    val keys = keyCols.map(col)
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val arranged =
          if (keyCols.isEmpty) batch
          else batch
            .repartitionByRange(partitions, keys: _*)
            .sortWithinPartitions(keys: _*)
        MothSpark.writeFiles(arranged, f"$out/batch-$epochId%05d",
          s"stream:batch=$epochId", compression, opts, keyCols)
        ()
      }
  }
}
