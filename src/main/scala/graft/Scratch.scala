package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling main for optimization work; not part of any bench. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scratch")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.spark.TextOps

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"TIME $name%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    time("warmup emb.count")(emb.count())
    time("emb.count again")(emb.count())

    val planted = emb.filter(col("vec_id") % 5 === 0)
      .withColumn("vec_id", col("vec_id") + 100000L)
    val all = emb.unionByName(planted)
    time("union count")(all.count())
    time("union count 2")(all.count())

    import spark.implicits._
    val ds = all.select("vec_id", "embedding").as[(Long, Seq[Float])]
    time("encoder only")(ds.mapPartitions(_.map(_._1)).toDF("x").count())
    time("encoder only 2")(ds.mapPartitions(_.map(_._1)).toDF("x").count())
    time("encoder+seqaccess")(ds.mapPartitions(_.map { case (id, v) =>
      var s = 0.0; var i = 0; while (i < v.length) { s += v(i); i += 1 }; id + s.toLong
    }).toDF("x").count())
    time("encoder+seqaccess 2")(ds.mapPartitions(_.map { case (id, v) =>
      var s = 0.0; var i = 0; while (i < v.length) { s += v(i); i += 1 }; id + s.toLong
    }).toDF("x").count())
    time("gauss build")(ds.mapPartitions { it =>
      var hyper: Array[Array[Array[Double]]] = null
      it.map { case (id, v) =>
        if (hyper == null) {
          val rnd = new scala.util.Random(4242)
          hyper = Array.fill(4, 8, v.length)(rnd.nextGaussian())
        }
        id
      }
    }.toDF("x").count())
    val keyed = TextOps.lshBuckets(spark, all)
    time("lshBuckets count")(keyed.count())
    time("lshBuckets count 2")(keyed.count())
    time("lshBuckets count 3")(keyed.count())

    val okBuckets = keyed.groupBy("table", "bucket")
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz").between(2, 256))
      .select("table", "bucket")
    time("okBuckets count")(okBuckets.count())
    time("okBuckets count 2")(okBuckets.count())

    spark.stop()
  }
}
