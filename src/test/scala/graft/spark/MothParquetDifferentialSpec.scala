package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Randomized differential through the FULL Catalyst path: the same table
  * read via `format("moth")` and via parquet must agree under random
  * filter/projection combinations — exercising DSv2 filter conversion,
  * planning-time pruning, residual filtering, and the vectorized scan
  * against Spark's own reference reader.
  */
class MothParquetDifferentialSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var mothDir: String = _
  private val pqPath = "/root/testdata/sf0.001/orders.parquet"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-diff-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    mothDir = java.nio.file.Files.createTempDirectory("graft-diff").toString + "/orders"
    spark.read.parquet(pqPath).repartition(3)
      .write.format("moth").mode("append").save(mothDir)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("random filter/projection stacks agree between moth and parquet") {
    val rnd = new scala.util.Random(8L)
    val keys = spark.read.parquet(pqPath)
      .select("o_orderkey").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect()
    val statuses = Array("O", "F", "P", "ZZZ")
    val prios = Array("1-URGENT", "3-MEDIUM", "5-LOW", "nope")

    def randPred(): Column = rnd.nextInt(8) match {
      case 0 => col("o_orderkey") === keys(rnd.nextInt(keys.length))
      case 1 => col("o_orderkey") > keys(rnd.nextInt(keys.length))
      case 2 => col("o_orderkey").isin(Seq.fill(1 + rnd.nextInt(5))(
        keys(rnd.nextInt(keys.length))): _*)
      case 3 => col("o_orderstatus") === statuses(rnd.nextInt(statuses.length))
      case 4 => col("o_totalprice") > (rnd.nextDouble() * 400000.0)
      case 5 => col("o_orderdate") >=
        lit(s"199${rnd.nextInt(9)}-0${1 + rnd.nextInt(9)}-01").cast("timestamp")
      case 6 => col("o_orderpriority") < prios(rnd.nextInt(prios.length))
      case _ => col("o_custkey") <= keys(rnd.nextInt(keys.length)) / 2
    }

    val allCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    var nonEmpty = 0
    for (round <- 0 until 24) {
      var pred = randPred()
      if (rnd.nextBoolean()) pred = if (rnd.nextBoolean()) pred && randPred() else pred || randPred()
      val proj = rnd.shuffle(allCols).take(1 + rnd.nextInt(allCols.size))
      def run(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.filter(pred).select(proj.map(col): _*)
          .collect().map(_.mkString("|")).toSeq.sorted
      val m = run(spark.read.format("moth").load(mothDir))
      val p = run(spark.read.parquet(pqPath))
      assert(m == p,
        s"round $round: moth/parquet diverge under $pred proj=$proj " +
          s"(moth=${m.size} rows, parquet=${p.size})\nmoth head: ${m.take(3)}\n" +
          s"parquet head: ${p.take(3)}")
      if (m.nonEmpty) nonEmpty += 1
    }
    assert(nonEmpty >= 8, s"predicates matched rows in only $nonEmpty/24 rounds")
    info(s"$nonEmpty/24 rounds returned rows; all agreed")
  }

  test("events (timestamps) and documents (dictionary text) agree under random predicates") {
    val rnd = new scala.util.Random(9L)
    def differential(name: String, preds: () => Column, rounds: Int): Int = {
      val pq = s"/root/testdata/sf0.001/$name.parquet"
      val md = java.nio.file.Files.createTempDirectory("graft-diff2").toString + s"/$name"
      spark.read.parquet(pq).repartition(2).write.format("moth").mode("append").save(md)
      var nonEmpty = 0
      for (round <- 0 until rounds) {
        var p = preds()
        if (rnd.nextBoolean()) p = if (rnd.nextBoolean()) p && preds() else p || preds()
        def run(df: org.apache.spark.sql.DataFrame): Seq[String] =
          df.filter(p).collect().map(_.mkString("|")).toSeq.sorted
        val m = run(spark.read.format("moth").load(md))
        val q = run(spark.read.parquet(pq))
        assert(m == q, s"$name round $round diverged under $p " +
          s"(moth=${m.size}, parquet=${q.size})")
        if (m.nonEmpty) nonEmpty += 1
      }
      nonEmpty
    }
    val types = Array("click", "view", "purchase", "scroll", "absent")
    val e = differential("events", () => rnd.nextInt(4) match {
      case 0 => col("ts") >= lit(s"2024-0${1 + rnd.nextInt(9)}-15 0${rnd.nextInt(10)}:00:00")
        .cast("timestamp")
      case 1 => col("event_type") === types(rnd.nextInt(types.length))
      case 2 => col("value") < (rnd.nextDouble() * 100.0)
      case _ => col("user_id") % 7 === rnd.nextInt(7)
    }, 16)
    val langs = Array("en", "de", "fr", "xx")
    val d = differential("documents", () => rnd.nextInt(4) match {
      case 0 => col("lang") === langs(rnd.nextInt(langs.length))
      case 1 => col("n_chars") > (rnd.nextInt(2000) + 100)
      case 2 => col("text").startsWith("the")
      case _ => col("source") >= "s"
    }, 16)
    assert(e >= 5 && d >= 5, s"too few non-empty rounds: events=$e docs=$d")
    info(s"non-empty rounds: events=$e/16 documents=$d/16; all agreed")
  }
}
