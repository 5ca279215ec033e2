package graft.core.columns

import graft.core.rle.BooleanWriter

/** Null-mask stream, materialized lazily on the first null: a column (or
  * stripe prefix) with no nulls costs one counter, and if the whole stripe
  * has no nulls the PRESENT stream is omitted entirely. Semantics per
  * /root/reference/pkg/store/PresentOutputStream.go:27-83.
  */
final class PresentWriter {
  private var writer: BooleanWriter = null
  private var leadingNonNulls = 0 // trues seen before materialization

  def materialized: Boolean = writer != null

  def append(nonNull: Boolean): Unit = {
    if (writer == null) {
      if (nonNull) { leadingNonNulls += 1; return }
      materialize()
    }
    writer.writeBoolean(nonNull)
  }

  /** Bulk append from a vec's null mask (nulls may be null = all non-null). */
  def appendVec(len: Int, nulls: Array[Boolean]): Unit = {
    if (nulls == null) {
      if (writer == null) leadingNonNulls += len
      else writer.writeBooleans(len, v = true)
    } else {
      var i = 0
      while (i < len) { append(!nulls(i)); i += 1 }
    }
  }

  private def materialize(): Unit = {
    writer = new BooleanWriter()
    // backfill: all-true prefix; byte-RLE collapses it to ~2B/1040 rows
    writer.writeBooleans(leadingNonNulls, v = true)
  }

  /** Checkpoint (byteOff, pendingBits); analytic while unmaterialized so
    * earlier row-group positions stay exact if a null appears later.
    */
  def checkpoint(): (Int, Int) = {
    if (writer != null) writer.checkpoint()
    else {
      val fullBytes = leadingNonNulls / 8
      val flushedGroups = fullBytes / 130 // ByteRle MaxRepeat
      (flushedGroups * 2, (fullBytes % 130) * 8 + leadingNonNulls % 8)
    }
  }

  /** None ⇒ no nulls anywhere: suppress the stream. */
  def finish(): Option[Array[Byte]] = {
    if (writer == null) None
    else { writer.flush(); Some(writer.out.toArray) }
  }

  def bufferedBytes: Long = if (writer == null) 0L else writer.out.size.toLong
}
