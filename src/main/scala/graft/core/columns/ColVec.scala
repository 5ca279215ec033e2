package graft.core.columns

/** Columnar value batch handed to column writers — role analog of the
  * reference's `Block` (/root/reference/pkg/spi/block/Block.go), redesigned
  * as one flat container (no per-type class hierarchy: the writer knows its
  * type). A vec never crosses a row-group boundary.
  *
  * Field use by type:
  *   - BOOLEAN/BYTE/SHORT/INT/LONG/DATE(days)/DECIMAL(p≤18 unscaled): longs
  *   - TIMESTAMP: longs = micros since epoch UTC
  *   - FLOAT/DOUBLE: doubles
  *   - STRING/VARCHAR/CHAR/BINARY: bins (UTF-8 / raw bytes)
  *   - DECIMAL(p>18): bigs = unscaled BigInt
  *   - LIST: lengths + children(0)=elements; MAP: lengths + children(0)=keys,
  *     children(1)=values; STRUCT: children = fields (same len, nulls here)
  */
final class ColVec(var len: Int) {
  var nulls: Array[Boolean] = null // null ⇒ no nulls in this vec
  var longs: Array[Long] = null
  var doubles: Array[Double] = null
  var bins: Array[Array[Byte]] = null
  var bigs: Array[BigInt] = null
  var lengths: Array[Int] = null
  var children: Array[ColVec] = null

  /** Packed alternative to `bins` for STRING/BINARY (the encode hot path):
    * one shared payload buffer + len+1 cumulative offsets — no per-value
    * array. Writers must accept either form. Arrays may be OVERSIZED
    * (capacity > len) and REUSED by the producer across batches: a vec is
    * only valid during the `write(v)` call that consumes it; anything kept
    * longer (dictionary entries, stats min/max) must copy.
    */
  var packed: Array[Byte] = null
  var offs: Array[Int] = null

  @inline def isNull(i: Int): Boolean = nulls != null && nulls(i)
  @inline def binOff(i: Int): Int = offs(i)
  @inline def binLen(i: Int): Int = offs(i + 1) - offs(i)

  /** Approximate decoded bytes of this batch (drives the reader's adaptive
    * batch sizing — analog of Block.GetSizeInBytes in
    * MothRecordReader.go:222-227).
    */
  def approxBytes: Long = {
    var total = 0L
    if (longs != null) total += 8L * len
    if (doubles != null) total += 8L * len
    if (bigs != null) total += 24L * len
    if (lengths != null) total += 4L * len
    if (packed != null && offs != null && len > 0) total += (offs(len) - offs(0)).toLong
    else if (bins != null) {
      var i = 0
      while (i < len) { if (bins(i) != null) total += bins(i).length + 16; i += 1 }
    }
    if (nulls != null) total += len
    if (children != null) { var i = 0; while (i < children.length) { total += children(i).approxBytes; i += 1 } }
    total
  }
}

/** MOTH logical types (kind ids per the proto Type.Kind enum,
  * /root/reference/pkg/store/proto/moth_proto.proto Type message).
  */
sealed abstract class MothType(val kind: Int) {
  def children: Seq[MothType] = Nil
  def fieldNames: Seq[String] = Nil
}
object MothType {
  case object TBoolean extends MothType(0)
  case object TByte extends MothType(1)
  case object TShort extends MothType(2)
  case object TInt extends MothType(3)
  case object TLong extends MothType(4)
  case object TFloat extends MothType(5)
  case object TDouble extends MothType(6)
  case object TString extends MothType(7)
  case object TBinary extends MothType(8)
  case object TTimestamp extends MothType(9)
  final case class TList(elem: MothType) extends MothType(10) {
    override def children: Seq[MothType] = Seq(elem)
  }
  final case class TMap(key: MothType, value: MothType) extends MothType(11) {
    override def children: Seq[MothType] = Seq(key, value)
  }
  final case class TStruct(fields: Seq[(String, MothType)]) extends MothType(12) {
    override def children: Seq[MothType] = fields.map(_._2)
    override def fieldNames: Seq[String] = fields.map(_._1)
  }

  /** ORC UNION (kind 13): a tag byte stream selects one of the alternative
    * subtypes per row. At the ColVec/API boundary a union is EXPANDED to its
    * struct mapping — children(0) = tag (dense over non-null rows),
    * children(i+1) = alternative i spread to struct-dense layout (null
    * where the tag differs) — matching how the reference surfaces unions as
    * Trino RowBlocks (/root/reference/pkg/store/UnionColumnReader.go:153-180).
    * The reference is read-only for unions (its writer panics); our writer
    * support is a documented extension.
    */
  final case class TUnion(alts: Seq[MothType]) extends MothType(13) {
    override def children: Seq[MothType] = alts
  }
  final case class TDecimal(precision: Int, scale: Int) extends MothType(14)
  case object TDate extends MothType(15)

  /** TIME-of-day. No ORC kind exists: it travels as a LONG column of
    * microseconds-since-midnight tagged `iceberg.long-type=TIME` — the
    * Iceberg-ORC convention the reference dispatches on
    * (pkg/store/ColumnReaders.go:15, TimeColumnWriter.go:30-32). ColVec
    * carries NANOS-of-day (Spark TimeType's internal representation);
    * writer/reader convert at the stream boundary.
    */
  case object TTime extends MothType(4)
  final case class TVarchar(maxLen: Int) extends MothType(16)
  final case class TChar(len: Int) extends MothType(17)
  case object TTimestampInstant extends MothType(18)

  /** Pre-order flattened column count (self + descendants) — ORC column ids. */
  def columnCount(t: MothType): Int = 1 + t.children.map(columnCount).sum
}

/** Stream kinds per proto Stream.Kind. */
object StreamKind {
  val Present = 0
  val Data = 1
  val Length = 2
  val DictionaryData = 3
  val Secondary = 5
  val RowIndex = 6
  val BloomFilterUtf8 = 8
}

/** Column encoding kinds per proto ColumnEncoding.Kind, plus our documented
  * extension DIRECT_FSST=4 (FSST-compressed direct strings; the table rides
  * in a DICTIONARY_DATA stream). FSST is a north-rule extension — it does
  * not exist in the reference (SURVEY.md preamble).
  */
object EncodingKind {
  val Direct = 0
  val Dictionary = 1
  val DirectV2 = 2
  val DictionaryV2 = 3
  val DirectFsst = 4
}

final case class ColumnEncoding(kind: Int, dictionarySize: Int = 0)

/** One finished (still uncompressed) stream of a stripe. */
final case class StreamData(kind: Int, column: Int, bytes: Array[Byte])

/** One row-group index entry for one column: seek positions per stream (in
  * the column's emission order) + that row group's stats.
  */
final case class RowGroupIndexEntry(positions: Array[Long], stats: graft.core.stats.ColStats)
