package graft.spark.source

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import graft.core.file.StatsPredicate

/** Streaming face of the moth format:
  * `spark.readStream.format("moth").schema(s).load(dir)`.
  *
  * File-arrival micro-batch source (the FileStreamSource pattern): an offset
  * is the sorted set of file names processed so far; each micro-batch reads
  * exactly the files that appeared since the previous offset, through the
  * same PartitionReaderFactory as the batch scan (columnar path, stream-level
  * projection, stats pruning). Offsets persist in the query checkpoint, so a
  * restarted query resumes from the last committed file set — pairs with the
  * epoch-id MOTH sink (graft.spark.StreamingEncode) for end-to-end
  * exactly-once file streaming.
  *
  * Admission control: `option("maxFilesPerTrigger", n)` caps each
  * micro-batch at n new files — at 100 TB a backlog of 100k files must
  * drain as bounded batches, not one giant one. Under
  * `Trigger.AvailableNow` the end file set is snapshotted at query start
  * (SupportsTriggerAvailableNow) and drained in maxFiles-sized batches.
  *
  * Files must be immutable once visible (the MOTH writers rename
  * task-attempt-private tmp files into place atomically, so a query watching
  * a MOTH output directory never sees a partial file). The offset grows with
  * the file count — names only, ~50 B per file — which matches what Spark's
  * own file source keeps in its file-stream log.
  */
class MothMicroBatchStream(path: String, required: StructType,
    predicate: StatsPredicate, maxFilesPerTrigger: Option[Int] = None)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private def currentFiles(): Seq[String] = {
    // Hadoop FileSystem listing (any scheme); names only — the offset and
    // log store names relative to the watched directory
    try graft.core.file.Sources.listMoth(path)
      .map(f => new org.apache.hadoop.fs.Path(f).getName).sorted
    catch { case _: java.io.FileNotFoundException => Nil }
  }

  /** Trigger.AvailableNow end-bound: everything visible at query start. */
  @volatile private var availableNowCap: Option[Set[String]] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(currentFiles().toSet)

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  override def initialOffset(): Offset = MothStreamOffset(Nil)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val seen = start.asInstanceOf[MothStreamOffset].files.toSet
    val visible = availableNowCap match {
      case Some(cap) => currentFiles().filter(cap)
      case None => currentFiles()
    }
    val fresh = visible.filterNot(seen)
    val take = limit match {
      case m: ReadMaxFiles => fresh.take(m.maxFiles())
      case _ => fresh
    }
    MothStreamOffset((seen ++ take).toSeq.sorted)
  }

  override def reportLatestOffset(): Offset = MothStreamOffset(currentFiles())

  override def deserializeOffset(json: String): Offset =
    MothStreamOffset(MothStreamOffset.parse(json))
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[MothStreamOffset].files.toSet
    val fresh = end.asInstanceOf[MothStreamOffset].files.filterNot(seen)
    fresh.map { n =>
      MothInputPartition(new org.apache.hadoop.fs.Path(path, n).toString, 0L, Long.MaxValue)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    MothReaderFactory(required, predicate)
}

/** Offset = sorted file names seen so far, serialized as a JSON string
  * array (the checkpoint offset-log format).
  */
case class MothStreamOffset(files: Seq[String]) extends Offset {
  override def json(): String =
    files.map(MothStreamOffset.quote).mkString("[", ",", "]")
}

object MothStreamOffset {
  def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Minimal JSON string-array parser (handles escaped quotes/backslashes —
    * file names are user-controlled).
    */
  def parse(json: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < json.length) {
      if (json(i) == '"') {
        val sb = new StringBuilder
        i += 1
        while (json(i) != '"') {
          if (json(i) == '\\') {
            i += 1
            json(i) match {
              case 'u' => sb += Integer.parseInt(json.substring(i + 1, i + 5), 16).toChar; i += 4
              case c => sb += c
            }
          } else sb += json(i)
          i += 1
        }
        out += sb.toString
      }
      i += 1
    }
    out.toSeq
  }
}
