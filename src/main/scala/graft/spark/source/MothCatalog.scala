package graft.spark.source

import java.util.{Map => JMap}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.core.file.Sources

/** The moth bucket function: `bucket(n, cols...) = pmod(xxhash64(cols), n)`
  * with Spark's own per-type xxhash64 semantics (seed 42, chained across
  * columns, nulls skipped). THREE places must agree on this definition —
  * the write-side placement expression (`pmod(xxhash64(col), n)` in SQL),
  * the writer's verify-and-tag check, and the catalog function Spark uses
  * for storage-partitioned join compatibility (and, with v2 bucketing
  * shuffles enabled, to hash the unbucketed side) — which is why it is
  * Spark's hash and not a private one.
  */
object MothBucket {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  val Seed = 42L

  /** Types the bucket tag supports (the physical long/bytes families the
    * engine's ColVec carries losslessly and Spark's xxhash64 defines).
    */
  def eligible(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType | StringType => true
    case _ => false
  }

  /** One chained hash step, matching XxHash64's per-type dispatch. */
  def hashValue(v: Any, dt: DataType, seed: Long): Long = dt match {
    case ByteType => XXH64.hashInt(v.asInstanceOf[Byte].toInt, seed)
    case ShortType => XXH64.hashInt(v.asInstanceOf[Short].toInt, seed)
    case IntegerType | DateType => XXH64.hashInt(v.asInstanceOf[Int], seed)
    case LongType => XXH64.hashLong(v.asInstanceOf[Long], seed)
    case StringType => XXH64.hashUTF8String(v.asInstanceOf[UTF8String], seed)
    case _ => throw new IllegalArgumentException(s"bucket: unsupported type $dt")
  }

  def bucketOf(hash: Long, n: Int): Int = (((hash % n) + n) % n).toInt

  /** Footer userMetadata keys carrying a VERIFIED bucket layout. */
  val ColsKey = "moth.bucket.cols"
  val CountKey = "moth.bucket.count"
  val IdKey = "moth.bucket.id"

  /** Streaming verifier that every row of a write task hashes to ONE
    * bucket; `observed` is that bucket (-1 for an empty task).
    */
  final class Verifier(n: Int, idx: Array[(Int, DataType)]) {
    var ok = true
    var observed: Int = -1
    def update(row: InternalRow): Unit = {
      if (!ok) return
      var h = Seed
      var i = 0
      while (i < idx.length) {
        val (j, dt) = idx(i)
        if (!row.isNullAt(j)) h = hashValue(row.get(j, dt), dt, h)
        i += 1
      }
      val b = bucketOf(h, n)
      if (observed == -1) observed = b
      else if (observed != b) ok = false
    }
  }
}

/** `bucket` as a catalog V2 function — what lets Catalyst resolve the
  * `bucket(n, col)` transform the moth scan reports as its
  * KeyGroupedPartitioning, making two co-bucketed moth tables join WITHOUT
  * a shuffle on either side (storage-partitioned join). Bound per argument
  * type; the canonical name ties compatibility to the (function, input
  * type) pair exactly like the per-file tags do.
  */
object MothBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, cols...): pmod(xxhash64(cols...), n) — moth bucket placement"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length >= 2,
      s"bucket expects (numBuckets, cols...), got $inputType")
    require(inputType.fields.head.dataType == IntegerType,
      s"bucket: first argument must be INT numBuckets, got ${inputType.fields.head.dataType}")
    val dts = inputType.fields.tail.map(_.dataType)
    dts.foreach(dt => require(MothBucket.eligible(dt), s"bucket: unsupported column type $dt"))
    MothBucketBound(dts.toSeq)
  }
}

final case class MothBucketBound(dts: Seq[DataType]) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = (IntegerType +: dts).toArray
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String =
    s"moth.bucket(${dts.map(_.catalogString).mkString(",")})"
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    var h = MothBucket.Seed
    var i = 0
    while (i < dts.length) {
      // xxhash64 semantics: null arguments leave the running hash unchanged
      if (!input.isNullAt(i + 1))
        h = MothBucket.hashValue(input.get(i + 1, dts(i)), dts(i), h)
      i += 1
    }
    Integer.valueOf(MothBucket.bucketOf(h, n))
  }
}

/** Minimal directory-per-table catalog over any Hadoop FileSystem:
  * `spark.sql.catalog.<name> = graft.spark.source.MothCatalog` with
  * `spark.sql.catalog.<name>.warehouse = <dir>`; table `name.ns.tbl` maps
  * to `<dir>/ns/tbl` of .moth files. Exists primarily so bucketed moth
  * tables resolve through a FunctionCatalog — Catalyst only honors a
  * scan's bucket-transform partitioning when the relation's catalog can
  * bind the transform's function, which a bare path read never can.
  */
class MothCatalog extends TableCatalog with FunctionCatalog {
  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"moth catalog '$name' requires option 'warehouse'"))
  }
  override def name(): String = catalogName

  private def dirOf(ident: Identifier): String =
    (warehouse +: ident.namespace().toSeq :+ ident.name()).mkString("/")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = (warehouse +: namespace.toSeq).mkString("/")
    val p = new Path(dir)
    val fs = p.getFileSystem(Sources.conf)
    if (!fs.exists(p)) Array.empty
    else fs.listStatus(p).filter(_.isDirectory)
      .map(s => Identifier.of(namespace, s.getPath.getName))
  }

  override def tableExists(ident: Identifier): Boolean =
    MothTable.listMothOrEmpty(dirOf(ident)).nonEmpty

  override def loadTable(ident: Identifier): Table = {
    val dir = dirOf(ident)
    val files = MothTable.listMothOrEmpty(dir)
    if (files.isEmpty)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    new MothTable(dir, MothTable.schemaOf(files))
  }

  /** Creates the table directory; the schema materializes with the first
    * write (moth footers are the schema authority, like a path-based read).
    */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    val dir = dirOf(ident)
    Sources.mkdirs(dir)
    new MothTable(dir, schema)
  }

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table =
    throw new UnsupportedOperationException("moth catalog: ALTER TABLE unsupported")

  override def dropTable(ident: Identifier): Boolean = {
    val p = new Path(dirOf(ident))
    val fs = p.getFileSystem(Sources.conf)
    fs.exists(p) && fs.delete(p, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("moth catalog: RENAME TABLE unsupported")

  // ---- FunctionCatalog ----
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array.empty, "bucket"))

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.name().equalsIgnoreCase("bucket")) MothBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)
}
