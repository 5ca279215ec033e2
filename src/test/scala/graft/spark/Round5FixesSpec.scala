package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import graft.core.file.StatsPredicate
import graft.spark.source.{MothMicroBatchStream, MothStreamOpts, MothTable}

/** Round-5 ADVICE fixes at the Spark layer: archive-dir true-ancestry
  * containment, and the memoized parallel commonSortTag probe.
  */
class Round5FixesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-round5")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-r5").toString

  private def mkStream(watched: String, archive: String): MothMicroBatchStream =
    new MothMicroBatchStream(watched, new org.apache.spark.sql.types.StructType(),
      StatsPredicate.True,
      MothStreamOpts(cleanSource = "archive", archiveDir = Some(archive)),
      checkpointLocation = tmpDir())

  test("archive containment: sibling dir with shared name prefix is ACCEPTED") {
    val root = tmpDir()
    val watched = s"$root/in"
    new java.io.File(watched).mkdirs()
    // raw startsWith would reject this legitimate sibling
    mkStream(watched, s"$root/in-archive")
  }

  test("archive containment: nested dir rejected under every spelling") {
    val root = tmpDir()
    val watched = s"$root/in"
    new java.io.File(watched).mkdirs()
    for (nested <- Seq(
        s"$watched/arch",       // plain nesting
        s"$watched/arch/",      // trailing slash
        s"$watched",            // the watched dir itself
        s"$watched/",           // itself, trailing slash
        s"file:$watched/arch")) // scheme-qualified form of a nested dir
      assertThrows[IllegalArgumentException](mkStream(watched, nested))
  }

  test("commonSortTag: memoized per listing, invalidated when files change") {
    val dir = tmpDir()
    val df = spark.range(100).selectExpr("id AS k", "cast(id AS string) AS s")
      .coalesce(1).sortWithinPartitions("k")
    df.write.format("moth").option("sortedBy", "k").mode("append").save(dir)
    assert(MothTable.commonSortTag(dir).contains(Seq("k")))
    // second probe serves from the memo (same listing)
    assert(MothTable.commonSortTag(dir).contains(Seq("k")))
    // a new UNTAGGED file changes the listing: memo must invalidate and the
    // agreement check must now fail
    df.write.format("moth").mode("append").save(dir)
    assert(MothTable.commonSortTag(dir).isEmpty)
  }
}
