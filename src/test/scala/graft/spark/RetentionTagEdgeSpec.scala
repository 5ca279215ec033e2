package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.compress.CompressionKind
import graft.core.columns.WriterOpts
import graft.core.file.StatsPredicate
import graft.spark.source.{MothMicroBatchStream, MothScan, MothScanBuilder, MothStreamOpts}

/** Edge cases of the round-4 surfaces: source retention in `delete` mode,
  * stream-option validation, mixed sort tags degrading conservatively, and
  * the writer's post-construction metadata contract.
  */
class RetentionTagEdgeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-edge-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-edge").toString

  test("streaming cleanSource=delete: processed files removed, results complete, restart-safe") {
    val s = spark
    import s.implicits._
    val watch = tmpDir() + "/in"
    val ckpt = tmpDir() + "/ckpt"
    def addFile(lo: Long): Unit =
      (lo until lo + 100L).toDF("v").coalesce(1)
        .write.format("moth").mode("append").save(watch)
    (0 until 8).foreach(i => addFile(i * 100L))
    val schema = spark.read.format("moth").load(watch).schema
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def run(): Unit = {
      val q = spark.readStream.format("moth").schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("cleanSource", "delete")
        .option("logCompactInterval", "2")
        .load(watch)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.as[Long].collect().foreach(seen.add); ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run()
    assert(seen.size == 800, s"all rows must arrive exactly once, got ${seen.size}")
    val remaining = new java.io.File(watch).listFiles((_, n) => n.endsWith(".moth"))
    info(s"remaining=${remaining.length}")
    assert(remaining.length <= 4,
      s"watched dir must stay bounded (~2 compact intervals), has ${remaining.length}")
    // restart: deleted files live on in the seen-set log — never re-admitted
    (8 until 10).foreach(i => addFile(i * 100L))
    run()
    assert(seen.size == 1000,
      s"restart must process exactly the two new files, got ${seen.size}")
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSeq.sorted == (0L until 1000L))
  }

  test("stream option validation fails fast: bad mode, missing archive dir, nested archive dir") {
    val s = spark
    import s.implicits._
    val watch = tmpDir() + "/in"
    (0L until 10L).toDF("v").coalesce(1).write.format("moth").mode("append").save(watch)
    val schema = spark.read.format("moth").load(watch).schema
    def mk(opts: MothStreamOpts): Unit = {
      new MothMicroBatchStream(watch, schema, StatsPredicate(Nil), opts, tmpDir())
      ()
    }
    intercept[IllegalArgumentException] { mk(MothStreamOpts(cleanSource = "bogus")) }
    intercept[IllegalArgumentException] { mk(MothStreamOpts(cleanSource = "archive")) }
    intercept[IllegalArgumentException] {
      mk(MothStreamOpts(cleanSource = "archive", archiveDir = Some(watch + "/arch")))
    }
    // a valid configuration constructs fine
    mk(MothStreamOpts(cleanSource = "archive", archiveDir = Some(tmpDir() + "/arch")))
    mk(MothStreamOpts(cleanSource = "delete"))
  }

  test("mixed sort tags: one untagged file disables ordering/topN, results stay exact") {
    import org.apache.spark.sql.execution.{SortExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.connector.expressions.{Expressions, NullOrdering, SortDirection}
    def allNodes(p: SparkPlan): Seq[SparkPlan] =
      (p +: p.children.flatMap(allNodes)) ++ (p match {
        case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
        case q: QueryStageExec => allNodes(q.plan)
        case _ => Nil
      })
    val d = tmpDir() + "/mixed"
    val sorted = TranscriptGen.transcripts(spark, 8000, seed = 21)
    MothSpark.writeFiles(
      sorted.repartition(2, col("conv_id")).sortWithinPartitions("conv_id", "turn_idx"),
      d, "mx", CompressionKind.ZLIB, WriterOpts(), Seq("conv_id", "turn_idx"))
    // sanity: before the append the table IS tagged and orders are elided
    val before = spark.read.format("moth").load(d)
      .sortWithinPartitions("conv_id", "turn_idx")
    before.collect()
    assert(allNodes(before.queryExecution.executedPlan)
      .collect { case se: SortExec => se }.isEmpty,
      "uniformly tagged table must report its ordering")
    // append one UNSORTED (hence untagged) file through the DSv2 writer
    val extra = TranscriptGen.transcripts(spark, 2000, seed = 22)
    extra.coalesce(1).write.format("moth").mode("append").save(d)
    // ordering no longer reported: the per-partition sort is back
    val after = spark.read.format("moth").load(d)
      .sortWithinPartitions("conv_id", "turn_idx")
    after.collect()
    assert(allNodes(after.queryExecution.executedPlan)
      .collect { case se: SortExec => se }.nonEmpty,
      "a mixed-tag table must NOT report an ordering")
    // topN pushdown refuses the mixed table
    val schema = spark.read.format("moth").load(d).schema
    val b = new MothScanBuilder(d, schema)
    assert(!b.pushTopN(Array(Expressions.sort(Expressions.column("conv_id"),
      SortDirection.ASCENDING, NullOrdering.NULLS_FIRST)), 10))
    // and the answers stay exact either way
    val got = spark.read.format("moth").load(d)
      .orderBy("conv_id", "turn_idx").limit(9)
      .select(concat_ws("#", col("conv_id"), col("turn_idx")))
      .collect().map(_.getString(0)).toSeq
    val expect = sorted.unionAll(extra)
      .orderBy("conv_id", "turn_idx").limit(9)
      .select(concat_ws("#", col("conv_id"), col("turn_idx")))
      .collect().map(_.getString(0)).toSeq
    assert(got == expect)
  }

  test("runtime-filter In beyond the Or-of-Eq cap prunes via sorted membership") {
    val s = spark
    import s.implicits._
    val d = tmpDir() + "/rfcap"
    (0L until 5000L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(3).write.format("moth").mode("append").save(d)
    val schema = spark.read.format("moth").load(d).schema
    val base = new MothScanBuilder(d, schema).build().asInstanceOf[MothScan]
    val all = base.planInputPartitions().length
    assert(all >= 3)
    // an over-Or-cap (but under MaxInListSorted) key set that intersects
    // every file's envelope plans everything — conservative, no false prune
    val scan = new MothScanBuilder(d, schema).build().asInstanceOf[MothScan]
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("k",
        (0 until 2000).map(i => java.lang.Long.valueOf(i * 2L)).toArray[Any])))
    assert(scan.planInputPartitions().length == all,
      "an intersecting large key set must keep every split")
    // ...while a large REFUTING key set (every key outside the table's
    // range) prunes everything via one binary search per file
    val scan3 = new MothScanBuilder(d, schema).build().asInstanceOf[MothScan]
    scan3.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("k",
        (0 until 2000).map(i => java.lang.Long.valueOf(100000L + i)).toArray[Any])))
    assert(scan3.planInputPartitions().isEmpty,
      "a refuting large key set must prune at planning time")
    // beyond MaxInListSorted the filter stops pruning entirely
    val scan4 = new MothScanBuilder(d, schema).build().asInstanceOf[MothScan]
    scan4.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("k",
        (0 until graft.spark.source.MothFilters.MaxInListSorted + 1)
          .map(i => java.lang.Long.valueOf(100000L + i)).toArray[Any])))
    assert(scan4.planInputPartitions().length == all,
      "an over-MaxInListSorted key set must leave the plan untouched")
    // a small runtime key set DOES prune files whose stats refute it
    val scan2 = new MothScanBuilder(d, schema).build().asInstanceOf[MothScan]
    scan2.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("k", Array[Any](java.lang.Long.valueOf(-1L)))))
    assert(scan2.planInputPartitions().length < all,
      "a refutable runtime key set must prune at planning time")
  }

  test("a runtime filter disables a pushed limit's capped plan") {
    val s = spark
    import s.implicits._
    val d = tmpDir() + "/limrf"
    (0L until 3000L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(3).write.format("moth").mode("append").save(d)
    val schema = spark.read.format("moth").load(d).schema
    val b = new MothScanBuilder(d, schema)
    assert(b.pushLimit(5))
    val scan = b.build().asInstanceOf[MothScan]
    assert(scan.planInputPartitions().length == 1,
      "pushed limit alone plans a single covering split")
    // a runtime key set arriving later makes footer row counts
    // non-authoritative: the capped plan must be abandoned...
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("k", Array[Any](java.lang.Long.valueOf(2999L)))))
    val planned = scan.planInputPartitions()
    assert(planned.length >= 1,
      "the split holding the key must survive")
    // ...and a REFUTING key set prunes everything instead of keeping the
    // limit's first-stripe split alive
    val b2 = new MothScanBuilder(d, schema)
    assert(b2.pushLimit(5))
    val scan2 = b2.build().asInstanceOf[MothScan]
    scan2.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("k", Array[Any](java.lang.Long.valueOf(-7L)))))
    assert(scan2.planInputPartitions().isEmpty,
      "a refuting runtime filter must prune every split, limit or not")
  }

  test("planning-time pruning holds at a many-file table: only matching files become tasks") {
    val s = spark
    import s.implicits._
    val d = tmpDir() + "/many"
    // ~64 files with DISJOINT key ranges (file-level stats can only refute
    // a window when the per-file envelopes don't interleave)
    (0L until 64000L).map(i => (i, i / 1000L)).toDF("k", "bucket")
      .repartitionByRange(64, col("k"))
      .sortWithinPartitions("k")
      .write.format("moth").mode("append").save(d)
    val files = new java.io.File(d).listFiles((_, n) => n.endsWith(".moth"))
    assert(files.length >= 32, s"expected ~64 files, got ${files.length}")
    val schema = spark.read.format("moth").load(d).schema
    val b = new MothScanBuilder(d, schema)
    b.pushFilters(Array(
      org.apache.spark.sql.sources.GreaterThanOrEqual("k", 10000L),
      org.apache.spark.sql.sources.LessThan("k", 12000L)))
    val planned = b.build().asInstanceOf[MothScan].planInputPartitions()
    assert(planned.nonEmpty && planned.length <= 6,
      s"a 2k-row key window over 64 range-disjoint files must plan a handful " +
        s"of tasks, got ${planned.length}")
    // and the full query over Catalyst is exact
    val got = spark.read.format("moth").load(d)
      .filter(col("k") >= 10000L && col("k") < 12000L).agg(sum("k")).as[Long].head()
    assert(got == (10000L until 12000L).sum)
  }

  test("addUserMetadata after close is rejected") {
    val out = new java.io.ByteArrayOutputStream()
    import graft.core.columns.MothType
    val schema = MothType.TStruct(Seq("a" -> (MothType.TLong: MothType)))
    val w = new graft.core.file.MothFileWriter(
      out, schema, CompressionKind.NONE, WriterOpts())
    w.addUserMetadata("k", "v") // before close: fine
    w.close()
    intercept[IllegalArgumentException] { w.addUserMetadata("k2", "v2") }
  }
}
