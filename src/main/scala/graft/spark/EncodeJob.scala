package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.columns.WriterOpts
import graft.core.compress.CompressionKind

/** spark-submit entry point: encode a transcripts table (generated, or any
  * parquet input) into per-partition MOTH files with lineage manifests.
  *
  * Pipeline (north rule): typed Dataset → salt heavy conversations →
  * range-partitioned shuffle keeping (conv_id, salt, turn_idx) contiguous →
  * sortWithinPartitions → mapPartitions(single-threaded stripe encoder) →
  * per-partition file + manifest; driver merges metrics. Resume = re-run
  * with the same args; partitions with a valid manifest are skipped.
  *
  * Usage:
  *   EncodeJob --out DIR [--turns N | --input PARQUET_DIR]
  *     [--partitions P] [--codec zlib|snappy|lz4|zstd|none]
  *     [--cpus N] [--partitioning range|hash] [--salt-block K] [--seed S]
  *
  * `hash` partitioning assigns pid = pmod(xxhash64(conv_id) + salt, P)
  * explicitly — fully deterministic across restarts (byte-identical
  * resume); `range` (default) uses Catalyst's repartitionByRange, which
  * balances better but samples bounds.
  */
object EncodeJob {
  def main(args: Array[String]): Unit = {
    val a = parseArgs(args)
    val cpus = a.getOrElse("cpus", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName("graft-encode")
      .config("spark.sql.shuffle.partitions", a.getOrElse("partitions", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val result = run(spark, a)
      println(result)
    } finally spark.stop()
  }

  def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect { case Array(k, v) if k.startsWith("--") => k.drop(2) -> v }.toMap

  /** probe(k) = smallest int v with Spark's HashPartitioning placement
    * pmod(murmur3_32(v, seed 42), P) == k — so `repartition(P, remap(pid))`
    * puts pid k exactly on partition k. Expected probes per slot ≈ P
    * (coupon collector ≈ P·lnP total; P ≤ a few thousand ⇒ microseconds).
    */
  def identityProbeValues(partitions: Int): Array[Int] = {
    val out = new Array[Int](partitions)
    val found = new Array[Boolean](partitions)
    var remaining = partitions
    var v = 0
    while (remaining > 0) {
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(v, 42)
      val slot = ((h % partitions) + partitions) % partitions
      if (!found(slot)) { found(slot) = true; out(slot) = v; remaining -= 1 }
      v += 1
    }
    out
  }

  def run(spark: SparkSession, a: Map[String, String]): String = {
    val out = a.getOrElse("out", sys.error("--out required"))
    val partitions = a.getOrElse("partitions", spark.sparkContext.defaultParallelism.toString).toInt
    val codec = CompressionKind.withName(a.getOrElse("codec", "zlib").toUpperCase)
    val saltBlock = a.getOrElse("salt-block", "65536").toInt
    val seed = a.getOrElse("seed", "42").toLong
    val mode = a.getOrElse("partitioning", "range")

    val (input, snapshotId) = a.get("input") match {
      case Some(path) =>
        (spark.read.parquet(path), s"parquet:$path")
      case None =>
        val turns = a.getOrElse("turns", "1000000").toLong
        (TranscriptGen.transcripts(spark, turns, seed), s"gen:seed=$seed:turns=${a.getOrElse("turns", "1000000")}")
    }

    val salted = TranscriptGen.withSalt(input, saltBlock)
    val shuffled = mode match {
      case "hash" =>
        // Fully deterministic placement, pure Catalyst: pid k → partition k.
        // repartition(P, expr) uses HashPartitioning = pmod(murmur3(expr,
        // seed 42), P), which is content-deterministic but NOT the identity
        // (≈1/e of partitions would stay empty and some get 2-3 pids). So
        // remap each pid to a precomputed probe value v_k with
        // murmur3(v_k) % P = k: placement becomes exactly pid → partition
        // pid with zero empty partitions, no sampling pass (unlike
        // repartitionByRange, whose sampled bounds are RDD-id-seeded and
        // NOT stable across re-runs) and no RDD hop. Byte-identical resume
        // (north rule) holds because every operator here is content-hashed.
        val remap = EncodeJob.identityProbeValues(partitions)
        val withPid = salted.withColumn("__pid",
          pmod(xxhash64(col("conv_id")) + col("salt"), lit(partitions)).cast("int"))
        withPid
          .withColumn("__rp", element_at(lit(remap), col("__pid") + 1))
          .repartition(partitions, col("__rp"))
          .sortWithinPartitions(col("conv_id"), col("turn_idx"))
          .drop("__pid", "__rp", "salt")
      case _ =>
        salted
          .repartitionByRange(partitions, col("conv_id"), col("salt"), col("turn_idx"))
          .sortWithinPartitions(col("conv_id"), col("turn_idx"))
          .drop("salt")
    }

    val t0 = System.nanoTime()
    val manifests = MothSpark.writeFiles(shuffled, out,
      s"$snapshotId:p=$partitions:codec=$codec:mode=$mode",
      codec, WriterOpts(), firstKeyCols = Seq("conv_id", "turn_idx"))
    val secs = (System.nanoTime() - t0) / 1e9
    val rows = manifests.map(_.rows).sum
    val raw = manifests.map(_.rawBytes).sum
    val bytes = manifests.map(_.fileBytes).sum
    val summary =
      s"""{"rows":$rows,"rawBytes":$raw,"fileBytes":$bytes,""" +
        f""""ratio":${if (bytes == 0) 0.0 else raw.toDouble / bytes}%.3f,""" +
        f""""seconds":$secs%.2f,"turnsPerSec":${rows / secs}%.0f,""" +
        s""""partitions":${manifests.size},"codec":"$codec","mode":"$mode"}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$out/_SUMMARY.json"), summary)
    summary
  }
}
