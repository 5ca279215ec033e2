package graft.core.fsst

import scala.collection.mutable.ArrayBuffer
import graft.core.io.{ByteBuf, ByteRd}

/** FSST — Fast Static Symbol Table string compression (Boncz, Neumann,
  * Leis; VLDB 2020). No counterpart exists in the reference (SURVEY.md:
  * `grep fsst` = 0 hits); implemented from the paper as the north-rule
  * extension. Up to 255 symbols of 1–8 bytes; code 255 = escape + literal
  * byte. Encoding stays random-access per value (each string is encoded
  * independently against the shared table).
  */
final class FsstTable(val symbols: Array[Array[Byte]]) {
  require(symbols.length <= 255)

  // first-byte index; within a bucket, longest symbols first (greedy match)
  private[fsst] val buckets: Array[Array[Int]] = {
    val tmp = Array.fill(256)(new ArrayBuffer[Int])
    var i = 0
    while (i < symbols.length) { tmp(symbols(i)(0) & 0xff) += i; i += 1 }
    tmp.map(b => b.toArray.sortBy(id => -symbols(id).length))
  }

  // fast matcher (paper §4): single-byte code table + 2-byte-prefix index
  // for longer symbols, so the common path does one or two array loads
  private val oneByteCode: Array[Int] = {
    val t = Array.fill(256)(-1)
    var i = 0
    while (i < symbols.length) {
      if (symbols(i).length == 1) t(symbols(i)(0) & 0xff) = i
      i += 1
    }
    t
  }
  private val twoBytePrefix: Array[Array[Int]] = {
    val t = new Array[Array[Int]](65536)
    val tmp = new java.util.HashMap[Integer, ArrayBuffer[Int]]()
    var i = 0
    while (i < symbols.length) {
      val s = symbols(i)
      if (s.length >= 2) {
        val k = ((s(0) & 0xff) << 8) | (s(1) & 0xff)
        tmp.computeIfAbsent(k, _ => new ArrayBuffer[Int]) += i
      }
      i += 1
    }
    tmp.forEach { (k, v) => t(k) = v.toArray.sortBy(id => -symbols(id).length) }
    t
  }

  def encode(src: Array[Byte], out: ByteBuf): Unit = encode(src, 0, src.length, out)

  def encode(src: Array[Byte], off: Int, len: Int, out: ByteBuf): Unit = {
    var pos = off
    val n = off + len
    while (pos < n) {
      var matched = -1
      if (pos + 1 < n) {
        val cands = twoBytePrefix(((src(pos) & 0xff) << 8) | (src(pos + 1) & 0xff))
        if (cands != null) {
          var bi = 0
          while (matched < 0 && bi < cands.length) {
            val sym = symbols(cands(bi))
            if (sym.length <= n - pos && startsWith(src, pos, sym)) matched = cands(bi)
            bi += 1
          }
        }
      }
      if (matched < 0) matched = oneByteCode(src(pos) & 0xff)
      if (matched >= 0) {
        out.writeByte(matched)
        pos += symbols(matched).length
      } else {
        out.writeByte(255)
        out.writeByte(src(pos) & 0xff)
        pos += 1
      }
    }
  }

  def encodeToArray(src: Array[Byte]): Array[Byte] = {
    val out = new ByteBuf(src.length + 8)
    encode(src, out)
    out.toArray
  }

  def decode(src: Array[Byte], off: Int, len: Int, out: ByteBuf): Unit = {
    var pos = off
    val end = off + len
    while (pos < end) {
      val code = src(pos) & 0xff
      pos += 1
      if (code == 255) { out.writeByte(src(pos) & 0xff); pos += 1 }
      else out.writeBytes(symbols(code))
    }
  }

  def decodeToArray(src: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val out = new ByteBuf(len * 3 + 8)
    decode(src, off, len, out)
    out.toArray
  }

  private def startsWith(src: Array[Byte], pos: Int, sym: Array[Byte]): Boolean = {
    var i = 0
    while (i < sym.length) {
      if (src(pos + i) != sym(i)) return false
      i += 1
    }
    true
  }

  /** Serialization: [numSymbols u8] then per symbol [len u8][bytes]. */
  def serialize(): Array[Byte] = {
    val out = new ByteBuf(64)
    out.writeByte(symbols.length)
    symbols.foreach { s => out.writeByte(s.length); out.writeBytes(s) }
    out.toArray
  }
}

object FsstTable {
  def deserialize(bytes: Array[Byte]): FsstTable = {
    val rd = new ByteRd(bytes)
    val n = rd.readByte()
    val syms = Array.fill(n) {
      val len = rd.readByte()
      rd.readBytes(len)
    }
    new FsstTable(syms)
  }
}

object Fsst {
  val MaxSymbols = 255
  val MaxSymbolLen = 8
  val DefaultIterations = 5
  val SampleTarget = 16 * 1024 // paper: ~16KB sample suffices

  /** Greedy iterative symbol-table construction on a byte sample (the
    * paper's bottom-up algorithm: each round, compress the sample with the
    * current table, count code and adjacent-code-pair frequencies, and keep
    * the highest-gain symbols & concatenations for the next round).
    */
  def train(sample: Array[Byte], iterations: Int = DefaultIterations): FsstTable = {
    var table = new FsstTable(Array.empty)
    if (sample.isEmpty) return table
    var iter = 0
    while (iter < iterations) {
      table = nextTable(table, sample, last = iter == iterations - 1)
      iter += 1
    }
    table
  }

  /** Builds a sample from a value iterator (cap ~16KB). */
  def sampleOf(values: Iterator[Array[Byte]]): Array[Byte] = {
    val out = new ByteBuf(SampleTarget)
    while (values.hasNext && out.size < SampleTarget) {
      val v = values.next()
      out.writeBytes(v, 0, math.min(v.length, SampleTarget - out.size))
    }
    out.toArray
  }

  /** Compressed-size / raw-size on the sample — codec auto-select input. */
  def estimateRatio(table: FsstTable, sample: Array[Byte]): Double = {
    if (sample.isEmpty) return 1.0
    val out = new ByteBuf(sample.length + 16)
    table.encode(sample, out)
    out.size.toDouble / sample.length
  }

  private def nextTable(table: FsstTable, sample: Array[Byte], last: Boolean): FsstTable = {
    val nSyms = table.symbols.length
    // pseudo-codes: 0..nSyms-1 = symbols, 256+b = escaped byte b
    val count1 = new java.util.HashMap[Int, Long]()
    val count2 = new java.util.HashMap[Long, Long]()
    var pos = 0
    var prev = -1
    val n = sample.length
    while (pos < n) {
      // greedy match against current table (inline to also see escapes)
      var code = -1
      var symLen = 1
      var bi = 0
      val bucket = table.buckets(sample(pos) & 0xff)
      while (code < 0 && bi < bucket.length) {
        val sid = bucket(bi)
        val sym = table.symbols(sid)
        if (sym.length <= n - pos && prefixEq(sample, pos, sym)) { code = sid; symLen = sym.length }
        bi += 1
      }
      val effective = if (code >= 0) code else 256 + (sample(pos) & 0xff)
      count1.merge(effective, 1L, _ + _)
      if (prev >= 0) count2.merge(prev.toLong << 32 | effective.toLong, 1L, _ + _)
      prev = effective
      pos += symLen
    }

    def bytesOf(c: Int): Array[Byte] =
      if (c >= 256) Array((c - 256).toByte) else table.symbols(c)

    // candidate gains
    val gains = new java.util.HashMap[String, (Array[Byte], Long)]()
    def addCandidate(bytes: Array[Byte], gain: Long): Unit = {
      if (bytes.length <= MaxSymbolLen) {
        val k = new String(bytes.map(b => (b & 0xff).toChar))
        val cur = gains.get(k)
        if (cur == null) gains.put(k, (bytes, gain))
        else gains.put(k, (bytes, cur._2 + gain))
      }
    }
    count1.forEach { (c, f) =>
      val b = bytesOf(c)
      addCandidate(b, f * b.length)
    }
    if (!last) {
      // pair concatenations only feed later rounds
      count2.forEach { (k, f) =>
        val a = bytesOf((k >>> 32).toInt)
        val b = bytesOf((k & 0xffffffffL).toInt)
        if (a.length + b.length <= MaxSymbolLen)
          addCandidate(a ++ b, f * (a.length + b.length))
      }
    }
    val top = gains.values().toArray(Array.empty[(Array[Byte], Long)])
      .sortBy(-_._2)
      .take(MaxSymbols)
      .map(_._1)
    new FsstTable(top)
  }

  private def prefixEq(src: Array[Byte], pos: Int, sym: Array[Byte]): Boolean = {
    var i = 0
    while (i < sym.length) {
      if (src(pos + i) != sym(i)) return false
      i += 1
    }
    true
  }
}
