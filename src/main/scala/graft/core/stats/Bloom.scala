package graft.core.stats

/** UTF8 bloom filter per ORC spec (BLOOM_FILTER_UTF8 streams).
  *
  * Semantics per /root/reference/pkg/store/metadata/BloomFilter.go:26-136
  * (optimal bits/hash-count formulas, combined-hash probing, Thomas Wang
  * long hash). Deviation: the reference's Go Murmur3 tail switch dropped
  * Java's case fallthrough (BloomFilter.go:236-255), mis-hashing byte
  * strings whose length % 8 ∈ {2..7}; we implement the spec-correct
  * Murmur3_x64_128-derived 64-bit hash (seed 104729) so our filters are
  * ORC-interoperable. Self-consistency (write+test) is what round-trip
  * correctness requires; both hold here.
  */
final class BloomFilter private (val bits: Array[Long], val numHashFunctions: Int) {
  val numBits: Int = bits.length * 64

  def addBytes(v: Array[Byte]): Unit =
    addHash(if (v == null) BloomFilter.NullHashcode else Murmur3.hash64(v))

  def addBytes(v: Array[Byte], off: Int, len: Int): Unit =
    addHash(Murmur3.hash64(v, off, len))

  def addLong(v: Long): Unit = addHash(BloomFilter.longHash(v))

  def addDouble(v: Double): Unit = addLong(java.lang.Double.doubleToLongBits(v))

  def testBytes(v: Array[Byte]): Boolean =
    testHash(if (v == null) BloomFilter.NullHashcode else Murmur3.hash64(v))

  def testLong(v: Long): Boolean = testHash(BloomFilter.longHash(v))

  def testDouble(v: Double): Boolean = testLong(java.lang.Double.doubleToLongBits(v))

  private def addHash(hash64: Long): Unit = {
    val hash1 = hash64.toInt
    val hash2 = (hash64 >>> 32).toInt
    var i = 1
    while (i <= numHashFunctions) {
      var combined = hash1 + i * hash2
      if (combined < 0) combined = ~combined
      val pos = combined % numBits
      bits(pos >>> 6) |= 1L << (pos & 63)
      i += 1
    }
  }

  private def testHash(hash64: Long): Boolean = {
    val hash1 = hash64.toInt
    val hash2 = (hash64 >>> 32).toInt
    var i = 1
    while (i <= numHashFunctions) {
      var combined = hash1 + i * hash2
      if (combined < 0) combined = ~combined
      val pos = combined % numBits
      if ((bits(pos >>> 6) & (1L << (pos & 63))) == 0) return false
      i += 1
    }
    true
  }

  def isEmpty: Boolean = bits.forall(_ == 0L)
}

object BloomFilter {
  val NullHashcode: Long = 2862933555777941757L

  def apply(expectedEntries: Long, fpp: Double): BloomFilter = {
    val nb = optimalNumOfBits(expectedEntries, fpp)
    val numBits = nb + (64 - nb % 64)
    new BloomFilter(new Array[Long](numBits / 64),
      optimalNumOfHashFunctions(expectedEntries, numBits))
  }

  def fromBits(bits: Array[Long], numHashFunctions: Int): BloomFilter =
    new BloomFilter(bits, numHashFunctions)

  private def optimalNumOfHashFunctions(n: Long, m: Long): Int =
    math.max(1, math.round((m.toDouble / n) * math.log(2)).toInt)

  private def optimalNumOfBits(n: Long, p: Double): Int =
    (-n * math.log(p) / (math.log(2) * math.log(2))).toInt

  /** Thomas Wang 64-bit integer hash — BloomFilter.go:127-137. */
  def longHash(key0: Long): Long = {
    var key = key0
    key = (~key) + (key << 21)
    key ^= (key >>> 24)
    key = (key + (key << 3)) + (key << 8)
    key ^= (key >>> 14)
    key = (key + (key << 2)) + (key << 4)
    key ^= (key >>> 28)
    key += (key << 31)
    key
  }
}

/** Murmur3 64-bit (x64_128 first word), seed 104729 — ORC's utf8 bloom hash. */
object Murmur3 {
  private val C1 = 0x87c37b91114253d5L
  private val C2 = 0x4cf5ad432745937fL
  private val DefaultSeed = 104729

  def hash64(data: Array[Byte]): Long = hash64(data, 0, data.length)

  def hash64(data: Array[Byte], off: Int, len: Int): Long = {
    var hash = DefaultSeed.toLong
    val fastLimit = off + len - 8 + 1
    var current = off
    while (current < fastLimit) {
      var k = (data(current) & 0xffL) |
        ((data(current + 1) & 0xffL) << 8) |
        ((data(current + 2) & 0xffL) << 16) |
        ((data(current + 3) & 0xffL) << 24) |
        ((data(current + 4) & 0xffL) << 32) |
        ((data(current + 5) & 0xffL) << 40) |
        ((data(current + 6) & 0xffL) << 48) |
        ((data(current + 7) & 0xffL) << 56)
      current += 8
      k *= C1
      k = java.lang.Long.rotateLeft(k, 31)
      k *= C2
      hash ^= k
      hash = java.lang.Long.rotateLeft(hash, 27) * 5 + 0x52dce729L
    }
    // tail with spec-correct fallthrough
    var k = 0L
    val tail = off + len - current
    if (tail >= 7) k ^= (data(current + 6) & 0xffL) << 48
    if (tail >= 6) k ^= (data(current + 5) & 0xffL) << 40
    if (tail >= 5) k ^= (data(current + 4) & 0xffL) << 32
    if (tail >= 4) k ^= (data(current + 3) & 0xffL) << 24
    if (tail >= 3) k ^= (data(current + 2) & 0xffL) << 16
    if (tail >= 2) k ^= (data(current + 1) & 0xffL) << 8
    if (tail >= 1) {
      k ^= data(current) & 0xffL
      k *= C1
      k = java.lang.Long.rotateLeft(k, 31)
      k *= C2
      hash ^= k
    }
    hash ^= len.toLong
    fmix64(hash)
  }

  private def fmix64(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33
    h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33
    h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }
}
