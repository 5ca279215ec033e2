package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.stats.Murmur3

/** Large-scale training-data pipeline operators (dedup / similarity), built
  * Spark-first: per-partition signature computation (mapPartitions, no
  * driver collection), LSH bucket joins as shuffles on band keys, broadcast
  * for small query sides. All seeded/deterministic.
  */
object TextOps {

  val MinHashK = 32
  val Bands = 8
  val RowsPerBand: Int = MinHashK / Bands
  val ShingleLen = 5

  /** Seeded 64-bit hash of a byte window (xor-fold seed into murmur). */
  @inline private def shingleHash(bytes: Array[Byte], off: Int, len: Int): Long = {
    // rolling-friendly polynomial hash (Rabin-Karp style) — cheap and stable
    var h = 1125899906842597L
    var i = off
    while (i < off + len) { h = 31 * h + bytes(i); i += 1 }
    h
  }

  /** k-minhash signature over character shingles. One pass per doc: for
    * each shingle, one base hash mixed with k seed constants (standard
    * "one-permutation-ish" trick: h_i = base * A_i + B_i).
    */
  def minHashSignature(text: String, k: Int = MinHashK): Array[Long] =
    minHashSignatureBytes(text.getBytes("UTF-8"), k)

  def minHashSignatureBytes(bytes: Array[Byte], k: Int = MinHashK): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    if (bytes.length < ShingleLen) {
      val base = Murmur3.hash64(bytes)
      var i = 0
      while (i < k) { sig(i) = mix(base, i); i += 1 }
      return sig
    }
    var pos = 0
    while (pos + ShingleLen <= bytes.length) {
      val base = shingleHash(bytes, pos, ShingleLen)
      var i = 0
      while (i < k) {
        val h = mix(base, i)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      pos += 1
    }
    sig
  }

  @inline private def mix(base: Long, i: Int): Long = {
    var x = base ^ (0x9e3779b97f4a7c15L * (i + 1))
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x
  }

  /** 64-bit SimHash over whitespace tokens. */
  def simHash(text: String): Long = simHashBytes(text.getBytes("UTF-8"))

  /** Byte-level form: UTF-8 never encodes 0x20 inside a multi-byte
    * sequence, so splitting the raw bytes on 0x20 yields exactly the same
    * token byte sequences as splitting chars on ' ' and re-encoding — the
    * hashes (and therefore the simhash) are identical, without a String
    * decode + per-token re-encode per row.
    */
  def simHashBytes(bytes: Array[Byte]): Long = {
    val counts = new Array[Int](64)
    var start = 0
    val n = bytes.length
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' '.toByte) {
        if (i > start) {
          val h = Murmur3.hash64(bytes, start, i - start)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= 1L << b; b += 1 }
    out
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Documents + planted near-duplicates (deterministic): every doc with
    * doc_id % 5 == 0 and length(text) >= 200 gets a copy with id+100000 and
    * a short appended suffix. Lets the dedup operators be oracle-checked:
    * the found pair set must be exactly the planted set.
    */
  /** Exact-duplicate planting (same text, id+100000) — used by the simhash
    * oracle: identical text ⇒ identical simhash ⇒ hamming 0, always found.
    */
  def withPlantedExactDups(docs: DataFrame): DataFrame = {
    val planted = docs
      .filter(col("text").isNotNull && col("doc_id") % 5 === 0)
      .withColumn("doc_id", col("doc_id") + 100000L)
    docs.unionByName(planted)
  }

  def withPlantedNearDups(docs: DataFrame): DataFrame = {
    val planted = docs
      .filter(col("text").isNotNull && length(col("text")) >= 200 && col("doc_id") % 5 === 0)
      .withColumn("doc_id", col("doc_id") + 100000L)
      .withColumn("text", concat(col("text"), lit(" near duplicate tail")))
    docs.unionByName(planted)
  }

  /** MinHash + LSH near-duplicate pairs (doc_a < doc_b, est jaccard ≥ thr).
    * Shape at scale: signature map (no shuffle) → band explode → shuffle on
    * (band, bucket) → per-bucket pair generation → signature re-join for
    * verification. Buckets are bounded by construction on real corpora;
    * the bucket-size cap guards pathological buckets (all-identical spam).
    *
    * EAGER: the returned DataFrame is already materialized (one Spark job
    * runs inside this call) and non-recomputable — see the localCheckpoint
    * comment below for why. The same applies to [[simHashPairs]].
    */
  def minHashPairs(spark: SparkSession, docs: DataFrame, threshold: Double = 0.7,
      maxBucket: Int = 64): DataFrame = {
    // Optimized (r06, guide §1.2): signatures and band keys are computed on
    // the internal-row path — the Dataset-encoder form decoded every text to
    // a String and round-tripped the Array[Long] signature through an
    // encoder; minHashSignatureBytes consumes the UTF8String bytes directly
    // (identical hashes — the shingles are byte-windows either way).
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val sel = docs.filter(col("text").isNotNull).select(col("doc_id"), col("text"))
    val sigRdd = sel.queryExecution.toRdd.mapPartitions(_.map { row =>
      val sig = minHashSignatureBytes(row.getUTF8String(1).getBytes)
      new GenericInternalRow(Array[Any](row.getLong(0),
        new GenericArrayData(sig))): InternalRow
    })
    val sigs = org.apache.spark.sql.GraftBridge.internalDf(spark, sigRdd,
      StructType(Seq(StructField("doc_id", LongType),
        StructField("sig", ArrayType(LongType)))))
    sigs.cache()
    // fresh plan reference so the cache substitution applies to this subtree
    val bandRdd = sigs.select(col("doc_id"), col("sig")).queryExecution.toRdd
      .mapPartitions(_.flatMap { row =>
        val id = row.getLong(0)
        val sig = row.getArray(1)
        val out = new Array[InternalRow](Bands)
        var b = 0
        while (b < Bands) {
          var h = 0x9e3779b97f4a7c15L * (b + 1)
          var r = 0
          while (r < RowsPerBand) { h = h * 31 + sig.getLong(b * RowsPerBand + r); r += 1 }
          out(b) = new GenericInternalRow(Array[Any](b, h, id))
          b += 1
        }
        out.iterator
      })
    val bands = org.apache.spark.sql.GraftBridge.internalDf(spark, bandRdd,
      StructType(Seq(StructField("band", IntegerType),
        StructField("bucket", LongType), StructField("doc_id", LongType))))
    // De-skew: drop pathological buckets (all-identical spam) BEFORE any id
    // list materializes — a count pre-aggregate (map-side partial, tiny
    // shuffle) inner-joined back, so no task ever builds an array larger
    // than maxBucket even when one bucket holds millions of ids.
    val okBuckets = bands.groupBy("band", "bucket")
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz").between(2, maxBucket))
      .select("band", "bucket")
    val candidates = bands
      .join(okBuckets, Seq("band", "bucket"))
      .groupBy("band", "bucket")
      .agg(collect_list("doc_id").as("ids"))
      .select(explode(expr(
        "filter(transform(flatten(transform(ids, a -> transform(ids, b -> struct(a, b)))), " +
          "p -> struct(least(p.a, p.b) AS a, greatest(p.a, p.b) AS b)), p -> p.a < p.b)")).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .distinct()
    // threshold <= 0 (the exact-verification callers, e.g. ngram Jaccard):
    // est_jaccard is in [0, 1], so the filter keeps every candidate — skip
    // the two signature joins and the zip_with entirely (guide §1.2: don't
    // compute things the query provably throws away). Result is identical.
    val sigDf = sigs.toDF("doc_id", "sig")
    val verified = if (threshold <= 0) candidates else candidates
      .join(sigDf.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sig", "sig_a"), "doc_a")
      .join(sigDf.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sig", "sig_b"), "doc_b")
      .withColumn("est_jaccard",
        expr(s"size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), m -> m)) / cast($MinHashK AS double)"))
      .filter(col("est_jaccard") >= threshold)
      .select("doc_a", "doc_b")
    // EAGER, NON-RECOMPUTABLE RESULT — a deliberate contract, not an
    // accident: localCheckpoint(true) runs one Spark job HERE (the caller
    // pays materialization at call time even if the result is later
    // unused) and pins the small pair set to executor storage with its
    // lineage severed, so an executor loss after this call fails
    // downstream actions instead of recomputing. In exchange the (large)
    // signature cache can be released immediately below — a lazy
    // checkpoint would drop the cache before first action and recompute
    // every MinHash signature ~3x inside it, and returning the live cache
    // would leak it in the session's CacheManager forever (the round-3
    // defect). Callers needing fault-tolerant lineage should persist the
    // returned pairs to storage, which a dedup pipeline does anyway.
    val out = verified.localCheckpoint(true)
    sigs.unpersist(false)
    out
  }

  /** SimHash near-dup pairs within a hamming radius, via 4×16-bit band keys
    * (exact for radius ≤ 3 by pigeonhole). Hot buckets (e.g. a spam cluster
    * collapsing to one simhash) are dropped by a count pre-pass BEFORE the
    * self-join — without it one pathological key makes the join quadratic.
    */
  def simHashPairs(spark: SparkSession, docs: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = 256): DataFrame = {
    // internal-row simhash pass (see minHashPairs); simHashBytes splits the
    // raw UTF-8 bytes on 0x20, which tokenizes identically to the char form
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    val sel = docs.filter(col("text").isNotNull).select(col("doc_id"), col("text"))
    val hashRdd = sel.queryExecution.toRdd.mapPartitions(_.map { row =>
      new GenericInternalRow(Array[Any](row.getLong(0),
        simHashBytes(row.getUTF8String(1).getBytes))): InternalRow
    })
    val hashes = org.apache.spark.sql.GraftBridge.internalDf(spark, hashRdd,
      StructType(Seq(StructField("doc_id", LongType), StructField("sh", LongType))))
    hashes.cache()
    val bands = hashes.select(col("doc_id"), col("sh"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"), shiftrightunsigned(col("sh"), b * 16)
          .bitwiseAND(lit(0xffffL)).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("sh"), col("bk.band"), col("bk.key"))
    val okBuckets = bands.groupBy("band", "key")
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz").between(2, maxBucket))
      .select("band", "key")
    val keep = bands.join(okBuckets, Seq("band", "key"))
    val a = keep.select(col("band"), col("key"), col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = keep.select(col("band"), col("key"), col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val pairs = a.join(b, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(sh_a ^ sh_b)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
    // same eager-materialization + cache-lifetime contract as minHashPairs
    val out = pairs.localCheckpoint(true)
    hashes.unpersist(false)
    out
  }

  /** Distinct sorted shingle-hash set of a text (for EXACT n-gram Jaccard).
    * Primitive sort + in-place dedup: same sorted-distinct output as the
    * previous TreeSet form without a boxed insert per shingle.
    */
  def shingleSet(text: String): Array[Long] = shingleSetBytes(text.getBytes("UTF-8"))

  def shingleSetBytes(bytes: Array[Byte]): Array[Long] = {
    if (bytes.length < ShingleLen) return Array(Murmur3.hash64(bytes))
    val n = bytes.length - ShingleLen + 1
    val all = new Array[Long](n)
    var pos = 0
    while (pos < n) { all(pos) = shingleHash(bytes, pos, ShingleLen); pos += 1 }
    java.util.Arrays.sort(all)
    var w = 0
    var i = 0
    while (i < n) {
      if (w == 0 || all(i) != all(w - 1)) { all(w) = all(i); w += 1 }
      i += 1
    }
    if (w == n) all else java.util.Arrays.copyOf(all, w)
  }

  /** EXACT n-gram Jaccard near-dup pairs: MinHash-LSH candidate generation
    * (bucketed, de-skewed — the scale path) followed by exact verification
    * with `array_intersect`/`array_union` over distinct shingle-hash sets.
    * The textbook two-phase pipeline: cheap probabilistic candidates, exact
    * set similarity only on the candidate pairs.
    */
  def ngramJaccardPairs(spark: SparkSession, docs: DataFrame,
      threshold: Double = 0.8, maxBucket: Int = 64): DataFrame = {
    import spark.implicits._
    val candidates = minHashPairs(spark, docs, threshold = 0.0, maxBucket = maxBucket)
    // internal-row shingle-set pass (see minHashPairs)
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val sel = docs.filter(col("text").isNotNull).select(col("doc_id"), col("text"))
    val setRdd = sel.queryExecution.toRdd.mapPartitions(_.map { row =>
      new GenericInternalRow(Array[Any](row.getLong(0),
        new GenericArrayData(shingleSetBytes(row.getUTF8String(1).getBytes))))
        : InternalRow
    })
    val sets = org.apache.spark.sql.GraftBridge.internalDf(spark, setRdd,
      StructType(Seq(StructField("doc_id", LongType),
        StructField("sset", ArrayType(LongType)))))
    candidates
      .join(sets.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sset", "sa"), "doc_a")
      .join(sets.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sset", "sb"), "doc_b")
      .withColumn("jaccard",
        expr("size(array_intersect(sa, sb)) / cast(size(array_union(sa, sb)) AS double)"))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b")
  }

  /** Embedding-cosine near-duplicates: LSH bucket candidates (shuffle on
    * (table, bucket) — no all-pairs join) verified with exact cosine via the
    * native VecDot expression. Pairs with cosine ≥ threshold, doc_a < doc_b.
    */
  def embeddingCosinePairs(spark: SparkSession, emb: DataFrame,
      threshold: Double = 0.99, planes: Int = 8, tables: Int = 4,
      maxBucket: Int = 256): DataFrame = {
    import graft.spark.functions.VecDot
    val raw = lshBuckets(spark, emb, planes, tables)
    // De-skew (same shape as minHashPairs): a hot bucket — e.g. a corpus
    // full of identical embeddings — makes the bucket self-join quadratic.
    // Count pre-aggregate drops oversized buckets before any join, so no
    // task ever sees more than maxBucket² candidate pairs per bucket.
    val okBuckets = raw.groupBy("table", "bucket")
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz").between(2, maxBucket))
      .select("table", "bucket")
    val keyed = raw.join(okBuckets, Seq("table", "bucket"))
    val pairs = keyed.select(col("table"), col("bucket"), col("vec_id").as("id_a"))
      .join(keyed.select(col("table"), col("bucket"), col("vec_id").as("id_b")),
        Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val nemb = emb.withColumn("nrm", sqrt(VecDot(col("embedding"), col("embedding"))))
    pairs
      .join(nemb.select(col("vec_id").as("id_a"), col("embedding").as("ea"), col("nrm").as("na")), "id_a")
      .join(nemb.select(col("vec_id").as("id_b"), col("embedding").as("eb"), col("nrm").as("nb")), "id_b")
      .withColumn("cosine", VecDot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b")
  }

  /** Brute-force cosine top-k over an embedding column for a small broadcast
    * query set — the exactness baseline; the LSH variant below is the scale
    * path. Double math, rounded to 4 dp for cross-engine determinism.
    * The dot product is a native codegen Expression (graft.spark.functions
    * .VecDot) — no dim-sized intermediate array per pair, same left-to-right
    * double accumulation as the composed built-in form.
    */
  def cosineTopK(spark: SparkSession, emb: DataFrame, nQueries: Int = 5, k: Int = 5): DataFrame = {
    import graft.spark.functions.VecDot
    // hoist norms: computed once per row / per query, not once per pair
    val nemb = emb.withColumn("nrm", sqrt(VecDot(col("embedding"), col("embedding"))))
    val q = nemb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qnrm"))
    val sims = nemb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("sim",
        round(VecDot(col("embedding"), col("qe")) / (col("nrm") * col("qnrm")), 4))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    sims.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("qid", "vec_id", "sim")
      .orderBy("qid", "vec_id")
  }

  /** Random-hyperplane LSH bucket keys (vec_id, table, bucket): multi-table
    * union of independent hyperplane sets; candidates share a bucket. At
    * 100 TB this replaces the crossJoin with a shuffle on the bucket key.
    * Hyperplanes are rebuilt per partition from a fixed seed with the
    * dimensionality taken from the first row — no driver-side action, no
    * broadcast (tables×planes×dim doubles is tiny).
    */
  def lshBuckets(spark: SparkSession, emb: DataFrame, planes: Int = 8,
      tables: Int = 4): DataFrame = {
    // Optimized (r06, guide §1.2 per-task work): the Dataset-encoder form
    // deserialized every embedding to a boxed Seq[Float] and the dot loop
    // then paid a boxing Seq.apply per element (tables·planes·dim accesses
    // per row — measured ~0.65s of the ~0.9s subtree wall at sf0.1).
    // This form reads the Tungsten array directly, copies each vector once
    // into a primitive double[], and emits InternalRows. Hyperplanes are
    // drawn in the identical seed order (t-major, then plane, then dim), so
    // bucket keys — and therefore candidates and results — are unchanged.
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    val sel = emb.select(col("vec_id"), col("embedding"))
    val rdd = sel.queryExecution.toRdd.mapPartitions { it =>
      var hyper: Array[Array[Double]] = null // [table*planes][dim]
      it.flatMap { row =>
        val id = row.getLong(0)
        val arr = row.getArray(1)
        val dim = arr.numElements()
        if (hyper == null) {
          val rnd = new scala.util.Random(4242)
          hyper = Array.fill(tables * planes)(Array.fill(dim)(rnd.nextGaussian()))
        }
        val v = new Array[Double](dim)
        var i = 0
        while (i < dim) { v(i) = arr.getFloat(i).toDouble; i += 1 }
        val out = new Array[InternalRow](tables)
        var t = 0
        while (t < tables) {
          var key = 0
          var p = 0
          while (p < planes) {
            val h = hyper(t * planes + p)
            var dot = 0.0
            var j = 0
            while (j < dim) { dot += h(j) * v(j); j += 1 }
            if (dot >= 0) key |= 1 << p
            p += 1
          }
          out(t) = new GenericInternalRow(Array[Any](id, t, key))
          t += 1
        }
        out.iterator
      }
    }
    org.apache.spark.sql.GraftBridge.internalDf(spark, rdd, StructType(Seq(
      StructField("vec_id", LongType), StructField("table", IntegerType),
      StructField("bucket", IntegerType))))
  }

  /** IVF (inverted-file) ANN — the second scale path next to LSH: a coarse
    * k-means quantizer assigns every vector to its nearest centroid's
    * "list"; a query probes only its nProbe nearest centroids' lists. The
    * quantizer trains driver-side with seeded Lloyd iterations on a small
    * deterministic sample (the model is tiny — centroids × dim doubles);
    * assignment and search are fully distributed.
    */
  def ivfCentroids(spark: SparkSession, emb: DataFrame, nCentroids: Int = 16,
      iters: Int = 5, sampleN: Int = 512): Array[Array[Double]] = {
    import spark.implicits._
    val sample = emb.filter(col("embedding").isNotNull)
      .select("vec_id", "embedding").as[(Long, Seq[Float])]
      .orderBy("vec_id").limit(sampleN).collect().map(_._2.toArray.map(_.toDouble))
    require(sample.nonEmpty, "empty embedding table")
    var cents = Array.tabulate(math.min(nCentroids, sample.length))(i =>
      sample(i * sample.length / math.min(nCentroids, sample.length)).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(cents.length, cents(0).length)(0.0)
      val counts = new Array[Int](cents.length)
      sample.foreach { v =>
        val c = nearestCentroid(cents, v)
        counts(c) += 1
        var i = 0
        while (i < v.length) { sums(c)(i) += v(i); i += 1 }
      }
      cents = cents.indices.map { c =>
        if (counts(c) == 0) cents(c)
        else sums(c).map(_ / counts(c))
      }.toArray
      it += 1
    }
    cents
  }

  private def nearestCentroid(cents: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d = 0.0
      var i = 0
      val cc = cents(c)
      while (i < v.length) { val x = v(i) - cc(i); d += x * x; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** (vec_id, centroid) assignment — the IVF list membership.
    * Internal-row path for the same reason as [[lshBuckets]].
    */
  def ivfAssign(spark: SparkSession, emb: DataFrame,
      cents: Array[Array[Double]]): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    val bc = spark.sparkContext.broadcast(cents)
    val sel = emb.filter(col("embedding").isNotNull).select(col("vec_id"), col("embedding"))
    val rdd = sel.queryExecution.toRdd.mapPartitions { it =>
      val cs = bc.value
      it.map { row =>
        val id = row.getLong(0)
        val arr = row.getArray(1)
        val d = new Array[Double](arr.numElements())
        var i = 0
        while (i < d.length) { d(i) = arr.getFloat(i).toDouble; i += 1 }
        new GenericInternalRow(Array[Any](id, nearestCentroid(cs, d))): InternalRow
      }
    }
    org.apache.spark.sql.GraftBridge.internalDf(spark, rdd, StructType(Seq(
      StructField("vec_id", LongType), StructField("centroid", IntegerType))))
  }

  /** Oracle-checkable IVF recall: an exact-duplicate vector assigns to the
    * SAME centroid as its query (deterministic first-wins tie-break), and a
    * query always probes its own centroid first — so the planted duplicate
    * is deterministically inside the probed lists.
    */
  def ivfPlantedRecall(spark: SparkSession, emb: DataFrame, nCentroids: Int = 16,
      nProbe: Int = 4, nQueries: Int = 5): DataFrame = {
    val planted = emb.filter(col("vec_id") < nQueries)
      .withColumn("vec_id", col("vec_id") + 100000L)
    val all = emb.unionByName(planted)
    val cents = ivfCentroids(spark, emb, nCentroids)
    val assigned = ivfAssign(spark, all, cents)
    // a query's probe set always contains its own centroid; membership of
    // the planted duplicate in the probed lists is what IVF search scans
    val qAssign = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("centroid"))
    val candidates = qAssign.join(assigned, Seq("centroid"))
      .filter(col("vec_id") =!= col("qid"))
      .select("qid", "vec_id")
    emb.filter(col("vec_id") < nQueries).select(col("vec_id").as("qid"))
      .join(candidates.filter(col("vec_id") === col("qid") + 100000L), Seq("qid"), "left")
      .groupBy("qid").agg(count(col("vec_id")).as("planted_recalled"))
      .orderBy("qid")
  }

  /** Oracle-checkable ANN recall: plant an exact-duplicate vector
    * (vec_id + 100000) for each query. An identical vector lands in the
    * identical bucket of every table, so the planted duplicate is
    * DETERMINISTICALLY a candidate — expected output is the static
    * (qid, 1) set, a real DuckDB-checkable oracle rather than the operator
    * evaluating itself.
    */
  def lshPlantedRecall(spark: SparkSession, emb: DataFrame, planes: Int = 8,
      tables: Int = 4, nQueries: Int = 5): DataFrame = {
    val planted = emb.filter(col("vec_id") < nQueries)
      .withColumn("vec_id", col("vec_id") + 100000L)
    val keyed = lshBuckets(spark, emb.unionByName(planted), planes, tables)
    val qBuckets = keyed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("table"), col("bucket"))
    val candidates = qBuckets.join(keyed, Seq("table", "bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select("qid", "vec_id").distinct()
    emb.filter(col("vec_id") < nQueries).select(col("vec_id").as("qid"))
      .join(candidates.filter(col("vec_id") === col("qid") + 100000L), Seq("qid"), "left")
      .groupBy("qid").agg(count(col("vec_id")).as("planted_recalled"))
      .orderBy("qid")
  }
}
