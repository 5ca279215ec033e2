package graft.core.file

import java.io.OutputStream
import scala.collection.mutable.ArrayBuffer
import graft.core.columns._
import graft.core.compress.{Chunked, CompressionKind}
import graft.core.io.ByteBuf
import graft.core.stats.ColStats

/** Nested-aware ColVec slicing — needed when a batch crosses a row-group or
  * stripe boundary (children are dense over non-null parent rows).
  */
object ColVecOps {
  def slice(t: MothType, v: ColVec, from: Int, len: Int): ColVec = {
    if (from == 0 && len == v.len) return v
    val out = new ColVec(len)
    if (v.nulls != null) out.nulls = java.util.Arrays.copyOfRange(v.nulls, from, from + len)
    if (v.longs != null) out.longs = java.util.Arrays.copyOfRange(v.longs, from, from + len)
    if (v.doubles != null) out.doubles = java.util.Arrays.copyOfRange(v.doubles, from, from + len)
    if (v.bins != null) out.bins = java.util.Arrays.copyOfRange(v.bins, from, from + len)
    if (v.packed != null) {
      // share the payload buffer; offsets stay absolute into it
      out.packed = v.packed
      out.offs = java.util.Arrays.copyOfRange(v.offs, from, from + len + 1)
    }
    if (v.bigs != null) out.bigs = java.util.Arrays.copyOfRange(v.bigs, from, from + len)
    if (v.lengths != null) out.lengths = java.util.Arrays.copyOfRange(v.lengths, from, from + len)
    t match {
      case s: MothType.TStruct =>
        val nnBefore = countNonNull(v, 0, from)
        val nnIn = countNonNull(v, from, len)
        out.children = s.fields.indices.map { i =>
          slice(s.fields(i)._2, v.children(i), nnBefore, nnIn)
        }.toArray
      case l: MothType.TList =>
        val (eBefore, eIn) = elemRange(v, from, len)
        out.children = Array(slice(l.elem, v.children(0), eBefore, eIn))
      case m: MothType.TMap =>
        val (eBefore, eIn) = elemRange(v, from, len)
        out.children = Array(
          slice(m.key, v.children(0), eBefore, eIn),
          slice(m.value, v.children(1), eBefore, eIn))
      case u: MothType.TUnion =>
        // expanded shape: tag + alternatives are all dense over non-null rows
        val nnBefore = countNonNull(v, 0, from)
        val nnIn = countNonNull(v, from, len)
        val parts = (MothType.TByte: MothType) +: u.alts
        out.children = parts.indices.map { i =>
          slice(parts(i), v.children(i), nnBefore, nnIn)
        }.toArray
      case _ =>
    }
    out
  }

  private def countNonNull(v: ColVec, from: Int, len: Int): Int = {
    if (v.nulls == null) return len
    var c = 0
    var i = from
    while (i < from + len) { if (!v.nulls(i)) c += 1; i += 1 }
    c
  }

  private def elemRange(v: ColVec, from: Int, len: Int): (Int, Int) = {
    var before = 0
    var i = 0
    while (i < from) { if (!v.isNull(i)) before += v.lengths(i); i += 1 }
    var in = 0
    while (i < from + len) { if (!v.isNull(i)) in += v.lengths(i); i += 1 }
    (before, in)
  }

  /** Logical (uncompressed) data size estimate for metrics/flush policy. */
  def logicalBytes(t: MothType, v: ColVec, from: Int, len: Int): Long = {
    var total = 0L
    t match {
      case _: MothType.TStruct | _: MothType.TList | _: MothType.TMap | _: MothType.TUnion =>
      case MothType.TBoolean | MothType.TByte => total += len
      case MothType.TShort => total += 2L * len
      case MothType.TInt | MothType.TFloat | MothType.TDate => total += 4L * len
      case _: MothType.TDecimal => total += 8L * len
      case _ if v.packed != null =>
        total += v.offs(from + len) - v.offs(from)
      case _ if v.bins != null =>
        var i = from
        while (i < from + len) { if (!v.isNull(i) && v.bins(i) != null) total += v.bins(i).length; i += 1 }
      case _ => total += 8L * len
    }
    t match {
      case s: MothType.TStruct =>
        val nnB = countNonNull(v, 0, from)
        val nnI = countNonNull(v, from, len)
        s.fields.indices.foreach(i => total += logicalBytes(s.fields(i)._2, v.children(i), nnB, nnI))
      case l: MothType.TList =>
        val (eB, eI) = elemRange(v, from, len)
        total += logicalBytes(l.elem, v.children(0), eB, eI) + 4L * len
      case m: MothType.TMap =>
        val (eB, eI) = elemRange(v, from, len)
        total += logicalBytes(m.key, v.children(0), eB, eI) +
          logicalBytes(m.value, v.children(1), eB, eI) + 4L * len
      case u: MothType.TUnion =>
        val nnB = countNonNull(v, 0, from)
        val nnI = countNonNull(v, from, len)
        total += 1L * len // tag byte per row
        u.alts.indices.foreach(i =>
          total += logicalBytes(u.alts(i), v.children(i + 1), nnB, nnI))
      case _ =>
    }
    total
  }
}

/** Per-stripe metrics surfaced in manifests (north rule: lineage + metrics). */
final case class StripeMetrics(rows: Long, rawBytes: Long, compressedBytes: Long,
    flushReason: String, encodings: Map[Int, String])

final case class FileWriteResult(rows: Long, bytes: Long, stripes: Seq[StripeMetrics],
    fileStats: Seq[ColStats])

/** MOTH file writer — stripe/row-group assembly per
  * /root/reference/pkg/store/MothWriter.go:122-312 (chunking, flush
  * triggers MAX_BYTES/MAX_ROWS/DICTIONARY_FULL, data streams sorted by
  * ascending size, Metadata+Footer+PostScript tail). Single-threaded by
  * design: one instance per Spark partition task.
  */
final class MothFileWriter(out: OutputStream, schema: MothType.TStruct,
    compression: CompressionKind.Value, opts0: WriterOpts = WriterOpts()) {

  private val opts = opts0.copy(codec = compression)
  private val root = ColumnWriter.createTree(schema, opts)
  private val optimizer = new DictionaryOptimizer(
    ColumnWriter.dictionaryWriters(root),
    opts.stripeMinBytes, opts.stripeMaxBytes, opts.stripeMaxRowCount,
    opts.dictionaryMaxMemoryBytes)

  private var offset = 0L
  private var headerWritten = false
  private val stripeInfos = new ArrayBuffer[Meta.StripeInfo]
  private val stripeStatsList = new ArrayBuffer[Seq[ColStats]]
  private val stripeMetrics = new ArrayBuffer[StripeMetrics]
  private var stripeRows = 0
  private var stripeRawBytes = 0L
  private var rgRows = 0
  private var fileRows = 0L
  private var peakRetained = 0L
  private var closed = false
  private var extraMetadata: Map[String, String] = Map.empty

  /** Add a footer userMetadata entry after construction (e.g. a verified
    * sort-order tag that is only known once all rows were observed).
    * Must be called before close().
    */
  def addUserMetadata(key: String, value: String): Unit = {
    require(!closed)
    extraMetadata += (key -> value)
  }

  def write(v: ColVec): Unit = {
    require(!closed)
    var pos = 0
    while (pos < v.len) {
      if (rgRows == 0) root.beginRowGroup()
      val n = math.min(v.len - pos,
        math.min(opts.rowGroupMaxRowCount - rgRows, opts.stripeMaxRowCount - stripeRows))
      root.writeVec(ColVecOps.slice(schema, v, pos, n))
      stripeRawBytes += ColVecOps.logicalBytes(schema, v, pos, n)
      rgRows += n; stripeRows += n; fileRows += n; pos += n
      if (rgRows == opts.rowGroupMaxRowCount) {
        root.finishRowGroup()
        rgRows = 0
        optimizer.optimize(root.bufferedBytes, stripeRows)
      }
      val buffered = root.bufferedBytes
      if (buffered > peakRetained) peakRetained = buffered
      if (stripeRows >= opts.stripeMaxRowCount) flushStripe("MAX_ROWS")
      else if (buffered > opts.stripeMaxBytes) flushStripe("MAX_BYTES")
      else if (optimizer.isFull(buffered)) flushStripe("DICTIONARY_FULL")
    }
  }

  def close(): FileWriteResult = {
    require(!closed)
    flushStripe("CLOSED")
    if (!headerWritten) writeHeader()
    val contentLength = offset
    // Metadata (per-stripe stats)
    val metaBuf = Meta.writeMetadata(stripeStatsList.toSeq)
    val metaCompressed = compressBuf(metaBuf)
    writeBytes(metaCompressed)
    // Footer with merged file stats
    val nCols = MothType.columnCount(schema)
    val fileStats = (0 until nCols).map { c =>
      ColStats.mergeAll(stripeStatsList.map(_(c)))
    }
    // version 2: DoubleStatsBuilder drops min/max for NaN-bearing groups, so
    // double-range pruning against these stats is sound. Files reporting
    // version 1 (or none) may carry NaN-lying double stats (the old builder
    // silently excluded NaN from min/max) — readers must not double-prune them.
    val userMeta = (opts.userMetadata ++ extraMetadata + ("graft.writer.version" -> "2"))
      .map { case (k, v) => k -> v.getBytes("UTF-8") }
    val footer = Meta.FooterMsg(Meta.Magic.length.toLong, contentLength,
      stripeInfos.toSeq, Meta.flattenTypes(schema), fileRows, fileStats,
      opts.rowGroupMaxRowCount, userMeta)
    val footerCompressed = compressBuf(Meta.writeFooter(footer))
    writeBytes(footerCompressed)
    val ps = Meta.PostScriptMsg(footerCompressed.length.toLong, compression.id,
      opts.compressionChunkSize.toLong, Meta.FormatVersion,
      metaCompressed.length.toLong, Meta.WriterVersion, "MOTH")
    val psBytes = Meta.writePostScript(ps).toArray
    require(psBytes.length < 255, "postscript too large")
    writeBytes(psBytes)
    out.write(psBytes.length)
    offset += 1
    out.flush()
    closed = true
    FileWriteResult(fileRows, offset, stripeMetrics.toSeq, fileStats)
  }

  def bytesWritten: Long = offset
  def bufferedBytes: Long = root.bufferedBytes
  /** High-water mark of encoder retained bytes — the reference's
    * GetRetainedBytes observable (e.g. LongOutputStreamV2.go:506-508),
    * surfaced so task-memory budgets can be tuned from metrics.
    */
  def peakRetainedBytes: Long = peakRetained

  private def writeHeader(): Unit = {
    out.write(Meta.Magic)
    offset += Meta.Magic.length
    headerWritten = true
  }

  private def writeBytes(b: Array[Byte]): Unit = { out.write(b); offset += b.length }

  private def compressBuf(b: ByteBuf): Array[Byte] = {
    val o = new ByteBuf(b.size / 2 + 64)
    Chunked.compress(compression, b.array, 0, b.size, o, opts.compressionChunkSize)
    o.toArray
  }

  private def flushStripe(reason: String): Unit = {
    if (stripeRows == 0) return
    if (rgRows > 0) { root.finishRowGroup(); rgRows = 0 }
    optimizer.finalOptimize(root.bufferedBytes)
    root.close()
    if (!headerWritten) writeHeader()
    val stripeOffset = offset

    // index streams: ROW_INDEX per column, then BLOOM_FILTER_UTF8
    val indexStreams = new ArrayBuffer[(Meta.StreamInfo, Array[Byte])]
    root.indexEntries.sortBy(_._1).foreach { case (col, entries) =>
      val bytes = compressBuf(Meta.writeRowIndex(entries))
      indexStreams += ((Meta.StreamInfo(StreamKind.RowIndex, col, bytes.length.toLong), bytes))
    }
    root.bloomFilters.sortBy(_._1).foreach { case (col, blooms) =>
      if (blooms.nonEmpty) {
        val bytes = compressBuf(Meta.writeBloomIndex(blooms))
        indexStreams += ((Meta.StreamInfo(StreamKind.BloomFilterUtf8, col, bytes.length.toLong), bytes))
      }
    }
    // data streams, compressed, sorted ascending by size (MothWriter.go:240)
    val dataStreams = root.dataStreams.map { sd =>
      val o = new ByteBuf(sd.bytes.length / 2 + 64)
      Chunked.compress(compression, sd.bytes, 0, sd.bytes.length, o, opts.compressionChunkSize)
      val bytes = o.toArray
      (Meta.StreamInfo(sd.kind, sd.column, bytes.length.toLong), bytes)
    }.sortBy(_._2.length)

    indexStreams.foreach { case (_, b) => writeBytes(b) }
    val indexLength = offset - stripeOffset
    dataStreams.foreach { case (_, b) => writeBytes(b) }
    val dataLength = offset - stripeOffset - indexLength

    val encodings = root.encodings.sortBy(_._1)
    val sf = Meta.StripeFooterMsg(
      (indexStreams.map(_._1) ++ dataStreams.map(_._1)).toSeq,
      encodings.map(_._2), "UTC")
    val sfBytes = compressBuf(Meta.writeStripeFooter(sf))
    writeBytes(sfBytes)

    stripeInfos += Meta.StripeInfo(stripeOffset, indexLength, dataLength,
      sfBytes.length.toLong, stripeRows.toLong)
    val stripeStats = root.stripeStats.sortBy(_._1).map(_._2)
    stripeStatsList += stripeStats
    stripeMetrics += StripeMetrics(stripeRows.toLong, stripeRawBytes,
      offset - stripeOffset, reason,
      encodings.map { case (c, e) => c -> encodingName(e) }.toMap)

    root.reset()
    optimizer.reset()
    stripeRows = 0
    stripeRawBytes = 0
  }

  private def encodingName(e: ColumnEncoding): String = e.kind match {
    case EncodingKind.Direct => "DIRECT"
    case EncodingKind.Dictionary => s"DICTIONARY(${e.dictionarySize})"
    case EncodingKind.DirectV2 => "DIRECT_V2"
    case EncodingKind.DictionaryV2 => s"DICTIONARY_V2(${e.dictionarySize})"
    case EncodingKind.DirectFsst => "DIRECT_FSST"
    case _ => "UNKNOWN"
  }
}
