package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: `graft.Verify <sfDir> <outDir>` must emit one
  * parquet directory per SparkEntry query plus a parseable
  * `oracle_sql.json` whose keys equal the query set — this is the exact
  * surface the round gate consumes, so a refactor that breaks arg
  * parsing, the per-query dump, or the hand-rolled JSON escaping fails
  * here instead of zeroing a round's correctness table.
  */
class VerifyContractSpec extends AnyFunSuite {

  test("Verify.main dumps every query and a parseable oracle_sql.json") {
    val out = java.nio.file.Files.createTempDirectory("graft-verify").toString
    Verify.main(Array("/root/testdata/sf0.01", out))

    val names = SparkEntry.queries.keySet
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == names,
      s"missing dumps: ${names -- dirs}; unexpected: ${dirs -- names}")
    // every dump holds at least one parquet part with rows
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("verify-contract")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      names.foreach { n =>
        val c = spark.read.parquet(s"$out/$n").count()
        assert(c > 0, s"query $n dumped an empty result")
      }
      // oracle_sql.json: strict JSON (the driver uses python json.load),
      // keys exactly the query names, every value non-empty SQL
      val j = spark.read.option("multiLine", "true").json(s"$out/oracle_sql.json")
      assert(j.columns.toSet == names,
        s"oracle keys mismatch: ${names.diff(j.columns.toSet)} / ${j.columns.toSet.diff(names)}")
      val row = j.head()
      j.columns.foreach { c =>
        val sql = row.getString(row.fieldIndex(c))
        assert(sql != null && sql.trim.nonEmpty, s"empty oracle SQL for $c")
      }
    } finally spark.stop()
  }
}
