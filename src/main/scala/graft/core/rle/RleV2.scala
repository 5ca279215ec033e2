package graft.core.rle

import graft.core.io.{BitCodec, ByteBuf, ByteRd}
import BitCodec._

/** ORC RLE v2 integer encoder — SHORT_REPEAT | DIRECT | PATCHED_BASE | DELTA,
  * chosen per ≤512-value chunk by the ORC cost heuristic.
  *
  * Semantics follow the reference's `LongOutputStreamV2`
  * (/root/reference/pkg/store/LongOutputStreamV2.go:96-474) which is the ORC
  * v1 spec; implementation is written fresh. Two deliberate deviations,
  * both strictly size-reducing and spec-legal (our reader and any ORC reader
  * decode them):
  *   - spec-correct `percentileBits` re-enables PATCHED_BASE (see BitCodec);
  *   - a 512-long run of one value emits DELTA(fixedDelta=0) rather than the
  *     reference's DIRECT fallback (LongOutputStreamV2.go:135-137 routes
  *     all-equal chunks through determineEncoding, which can't pick DELTA
  *     when initialDelta == 0).
  */
final class RleV2Writer(val signed: Boolean, val out: ByteBuf = new ByteBuf(128),
    refCompat: Boolean = false) {
  import RleV2._
  // refCompat reproduces the reference's exact (buggier, never smaller)
  // encoding choices — int-truncated percentileBits (PATCHED_BASE dead,
  // LongOutputStreamV2.go:563) and no DELTA for all-equal chunks
  // (LongOutputStreamV2.go:213-225 requires initialDelta != 0). Used by the
  // size-parity test to prove default output ≤ reference-equivalent output.

  private val literals = new Array[Long](MaxScope)
  private val zigzagLits = new Array[Long](MaxScope)
  private val baseReduced = new Array[Long](MaxScope)
  private val adjDeltas = new Array[Long](MaxScope)

  private var numLiterals = 0
  private var prevDelta = 0L
  private var fixedRunLength = 0
  private var variableRunLength = 0

  // scratch populated by determineEncoding for the write methods
  private var min = 0L
  private var isFixedDelta = true
  private var fixedDelta = 0L
  private var bitsDeltaMax = 0
  private var zzBits100p = 0
  private var zzBits90p = 0
  private var brBits95p = 0
  private var brBits100p = 0
  private var patchWidth = 0
  private var patchGapWidth = 0
  private var patchLength = 0
  private var gapVsPatchList: Array[Long] = null

  /** Number of values accepted but not yet encoded to [[out]]. */
  def pendingCount: Int = numLiterals

  def writeLong(value: Long): Unit = {
    if (numLiterals == 0) { initLiterals(value); return }
    if (numLiterals == 1) {
      prevDelta = value - literals(0)
      literals(1) = value
      numLiterals = 2
      if (value == literals(0)) { fixedRunLength = 2; variableRunLength = 0 }
      else { fixedRunLength = 0; variableRunLength = 2 }
      return
    }
    if (prevDelta == 0 && value == literals(numLiterals - 1)) {
      // continuing a fixed run
      literals(numLiterals) = value
      numLiterals += 1
      if (variableRunLength > 0) fixedRunLength = 2
      fixedRunLength += 1
      if (fixedRunLength >= MinRepeat && variableRunLength > 0) {
        // flush the variable tail, keeping the trailing MinRepeat repeats
        numLiterals -= MinRepeat
        variableRunLength -= MinRepeat - 1
        val tail = new Array[Long](MinRepeat)
        System.arraycopy(literals, numLiterals, tail, 0, MinRepeat)
        writeValues(determineEncoding())
        var i = 0
        while (i < MinRepeat) { literals(numLiterals) = tail(i); numLiterals += 1; i += 1 }
      }
      if (fixedRunLength == MaxScope) writeValues(determineEncoding())
      return
    }
    // run broken by a different value
    if (fixedRunLength >= MinRepeat) {
      if (fixedRunLength <= MaxShortRepeat) writeValues(Enc.ShortRepeat)
      else { isFixedDelta = true; fixedDelta = 0L; writeValues(Enc.Delta) }
    }
    if (fixedRunLength > 0 && fixedRunLength < MinRepeat) {
      if (value != literals(numLiterals - 1)) {
        variableRunLength = fixedRunLength
        fixedRunLength = 0
      }
    }
    if (numLiterals == 0) initLiterals(value)
    else {
      prevDelta = value - literals(numLiterals - 1)
      literals(numLiterals) = value
      numLiterals += 1
      variableRunLength += 1
      if (variableRunLength == MaxScope) writeValues(determineEncoding())
    }
  }

  def flush(): Unit = {
    if (numLiterals == 0) return
    if (variableRunLength != 0) { writeValues(determineEncoding()); return }
    require(fixedRunLength != 0, "literals disagree with run length counters")
    if (fixedRunLength < MinRepeat) {
      variableRunLength = fixedRunLength
      fixedRunLength = 0
      writeValues(determineEncoding())
    } else if (fixedRunLength <= MaxShortRepeat) {
      writeValues(Enc.ShortRepeat)
    } else {
      isFixedDelta = true; fixedDelta = 0L
      writeValues(Enc.Delta)
    }
  }

  /** Stream checkpoint: (bytes flushed so far, values pending in the buffer).
    * Seek = position at byte offset, then decode-and-skip pending count.
    */
  def checkpoint(): (Int, Int) = (out.size, numLiterals)

  private def initLiterals(v: Long): Unit = {
    literals(0) = v
    numLiterals = 1
    fixedRunLength = 1
    variableRunLength = 1
  }

  private def determineEncoding(): Int = {
    var i = 0
    if (signed) {
      while (i < numLiterals) { zigzagLits(i) = zigzag(literals(i)); i += 1 }
    } else {
      System.arraycopy(literals, 0, zigzagLits, 0, numLiterals)
    }
    zzBits100p = pctBits(zigzagLits, numLiterals, 1.0)
    if (numLiterals <= MinRepeat) return Enc.Direct

    var isIncreasing = true
    var isDecreasing = true
    isFixedDelta = true
    min = literals(0)
    var max = literals(0)
    val initialDelta = literals(1) - literals(0)
    var currDelta = initialDelta
    var deltaMax = 0L
    adjDeltas(0) = initialDelta
    i = 1
    while (i < numLiterals) {
      val l1 = literals(i)
      val l0 = literals(i - 1)
      currDelta = l1 - l0
      if (l1 < min) min = l1
      if (l1 > max) max = l1
      isIncreasing &&= l0 <= l1
      isDecreasing &&= l0 >= l1
      isFixedDelta &&= currDelta == initialDelta
      if (i > 1) {
        val a = math.abs(currDelta)
        adjDeltas(i - 1) = a
        if (a > deltaMax) deltaMax = a
      }
      i += 1
    }
    // overflow-unsafe subtraction → DIRECT
    if (((max ^ min) & ((max - min) ^ max)) < 0) return Enc.Direct
    if (isFixedDelta && (initialDelta != 0 || !refCompat)) {
      fixedDelta = initialDelta; return Enc.Delta
    }
    if (initialDelta != 0) {
      bitsDeltaMax = findClosestNumBits(deltaMax)
      if (isIncreasing || isDecreasing) return Enc.Delta
    }
    zzBits90p = pctBits(zigzagLits, numLiterals, 0.9)
    if (zzBits100p - zzBits90p <= 1) return Enc.Direct
    i = 0
    while (i < numLiterals) { baseReduced(i) = literals(i) - min; i += 1 }
    brBits95p = pctBits(baseReduced, numLiterals, 0.95)
    brBits100p = pctBits(baseReduced, numLiterals, 1.0)
    if (brBits100p == brBits95p) Enc.Direct else Enc.PatchedBase
  }

  /** percentileBits with the reference's int truncation when refCompat:
    * `length * int32(1.0-p)` = 0 makes every percentile the 100th.
    */
  private def pctBits(data: Array[Long], n: Int, p: Double): Int =
    if (refCompat) percentileBits(data, 0, n, 1.0)
    else percentileBits(data, 0, n, p)

  private def writeValues(encoding: Int): Unit = {
    if (numLiterals == 0) return
    encoding match {
      case Enc.ShortRepeat => writeShortRepeat()
      case Enc.Direct      => writeDirect()
      case Enc.PatchedBase => writePatchedBase()
      case _               => writeDelta()
    }
    clearState()
  }

  // NB: fixedRunLength/variableRunLength are NOT cleared here — each write
  // method resets only the counter it consumed (the tail-preservation path
  // in writeLong re-appends MinRepeat literals and relies on fixedRunLength
  // surviving the flush), per LongOutputStreamV2.go clearEncoder.
  private def clearState(): Unit = {
    numLiterals = 0
    prevDelta = 0
    fixedDelta = 0
    zzBits90p = 0; zzBits100p = 0; brBits95p = 0; brBits100p = 0
    bitsDeltaMax = 0
    patchWidth = 0; patchGapWidth = 0; patchLength = 0
    gapVsPatchList = null
    min = 0
    isFixedDelta = true
  }

  private def writeShortRepeat(): Unit = {
    val repeatVal = if (signed) zigzag(literals(0)) else literals(0)
    val numBits = findClosestNumBits(repeatVal)
    val numBytes = if (numBits % 8 == 0) numBits >>> 3 else (numBits >>> 3) + 1
    var header = Enc.ShortRepeat << 6
    header |= (numBytes - 1) << 3
    header |= numLiterals - MinRepeat
    out.writeByte(header)
    out.writeBE(repeatVal, numBytes)
    fixedRunLength = 0
  }

  private def writeDirect(): Unit = {
    val fixedBits = closestAlignedFixedBits(zzBits100p)
    val ebw = encodeBitWidth(fixedBits) << 1
    val length = numLiterals - 1
    out.writeByte((Enc.Direct << 6) | ebw | ((length >>> 8) & 1))
    out.writeByte(length & 0xff)
    writeInts(zigzagLits, 0, numLiterals, fixedBits, out)
    variableRunLength = 0
  }

  private def writeDelta(): Unit = {
    var fixedBits = closestAlignedFixedBits(bitsDeltaMax)
    var ebw = 0
    if (!isFixedDelta) {
      if (fixedBits == 1) fixedBits = 2
      ebw = encodeBitWidth(fixedBits) << 1
    }
    val length = numLiterals - 1
    out.writeByte((Enc.Delta << 6) | ebw | ((length >>> 8) & 1))
    out.writeByte(length & 0xff)
    if (signed) out.writeVslong(literals(0)) else out.writeVulong(literals(0))
    if (isFixedDelta) out.writeVslong(fixedDelta)
    else {
      out.writeVslong(adjDeltas(0))
      writeInts(adjDeltas, 1, numLiterals - 2, fixedBits, out)
    }
    if (isFixedDelta && fixedRunLength > MinRepeat) fixedRunLength = 0
    else variableRunLength = 0
  }

  private def writePatchedBase(): Unit = {
    preparePatchedBlob()
    val fb = brBits95p
    val efb = encodeBitWidth(fb) << 1
    val length = numLiterals - 1
    val isNegative = min < 0
    var base = if (isNegative) -min else min
    val baseWidth = findClosestNumBits(base) + 1
    val baseBytes = if (baseWidth % 8 == 0) baseWidth / 8 else baseWidth / 8 + 1
    if (isNegative) base |= 1L << (baseBytes * 8 - 1)
    out.writeByte((Enc.PatchedBase << 6) | efb | ((length >>> 8) & 1))
    out.writeByte(length & 0xff)
    out.writeByte(((baseBytes - 1) << 5) | encodeBitWidth(patchWidth))
    out.writeByte(((patchGapWidth - 1) << 5) | patchLength)
    out.writeBE(base, baseBytes)
    writeInts(baseReduced, 0, numLiterals, closestFixedBits(fb), out)
    writeInts(gapVsPatchList, 0, gapVsPatchList.length,
      closestFixedBits(patchGapWidth + patchWidth), out)
    variableRunLength = 0
  }

  private def preparePatchedBlob(): Unit = {
    var maskV = (1L << brBits95p) - 1
    patchLength = math.ceil(numLiterals * 0.05).toInt
    val gapList = new Array[Int](patchLength)
    val patchList = new Array[Long](patchLength)
    patchWidth = closestFixedBits(brBits100p - brBits95p)
    if (patchWidth == 64) {
      patchWidth = 56
      brBits95p = 8
      maskV = (1L << brBits95p) - 1
    }
    var gapIdx = 0
    var prev = 0
    var maxGap = 0
    var i = 0
    while (i < numLiterals) {
      if (baseReduced(i) > maskV) {
        val gap = i - prev
        if (gap > maxGap) maxGap = gap
        prev = i
        gapList(gapIdx) = gap
        patchList(gapIdx) = baseReduced(i) >>> brBits95p
        gapIdx += 1
        baseReduced(i) &= maskV
      }
      i += 1
    }
    patchLength = gapIdx
    patchGapWidth =
      if (maxGap == 0 && patchLength != 0) 1
      else findClosestNumBits(maxGap.toLong)
    if (patchGapWidth > 8) {
      // gaps > 255 are split with filler entries (gap=255, patch=0)
      patchGapWidth = 8
      if (maxGap == 511) patchLength += 2 else patchLength += 1
    }
    gapVsPatchList = new Array[Long](patchLength)
    var srcIdx = 0
    var dstIdx = 0
    while (dstIdx < patchLength) {
      var g = gapList(srcIdx)
      val p = patchList(srcIdx)
      srcIdx += 1
      while (g > 255) {
        gapVsPatchList(dstIdx) = 255L << patchWidth
        dstIdx += 1
        g -= 255
      }
      gapVsPatchList(dstIdx) = (g.toLong << patchWidth) | p
      dstIdx += 1
    }
  }
}

object RleV2 {
  final val MaxScope = 512
  final val MinRepeat = 3
  final val MaxShortRepeat = 10

  object Enc {
    final val ShortRepeat = 0
    final val Direct = 1
    final val PatchedBase = 2
    final val Delta = 3
  }

  /** Decode `count` values from `in` into `dst`. */
  def read(in: ByteRd, signed: Boolean, dst: Array[Long], offset: Int, count: Int): Unit = {
    val r = new RleV2Reader(in, signed)
    r.next(dst, offset, count)
  }
}

/** Streaming ORC RLE v2 decoder over a positioned reader. */
final class RleV2Reader(in: ByteRd, signed: Boolean) {
  import RleV2._

  private val chunk = new Array[Long](MaxScope)
  private var chunkLen = 0
  private var chunkPos = 0

  /** Total values decoded from the byte stream (instrumentation: proves
    * checkpoint seeks avoid decode work, vs decode-and-discard skips).
    */
  var valuesDecoded: Long = 0L

  /** Reposition at a writer checkpoint (bytes flushed, values pending in the
    * encoder buffer at checkpoint time): jump the cursor, reset run state,
    * decode only the ≤511 pending values.
    */
  def seek(off: Long, pending: Long): Unit = {
    in.pos = off.toInt
    chunkLen = 0
    chunkPos = 0
    skip(pending)
  }

  def next(dst: Array[Long], offset: Int, count: Int): Unit = {
    var produced = 0
    while (produced < count) {
      if (chunkPos >= chunkLen) readChunk()
      val n = math.min(count - produced, chunkLen - chunkPos)
      System.arraycopy(chunk, chunkPos, dst, offset + produced, n)
      chunkPos += n
      produced += n
    }
  }

  def nextLong(): Long = {
    if (chunkPos >= chunkLen) readChunk()
    val v = chunk(chunkPos); chunkPos += 1; v
  }

  def skip(count: Long): Unit = {
    var remaining = count
    while (remaining > 0) {
      if (chunkPos >= chunkLen) readChunk()
      val n = math.min(remaining, (chunkLen - chunkPos).toLong).toInt
      chunkPos += n
      remaining -= n
    }
  }

  private def readChunk(): Unit = {
    val first = in.readByte()
    (first >>> 6) match {
      case Enc.ShortRepeat => readShortRepeat(first)
      case Enc.Direct      => readDirect(first)
      case Enc.PatchedBase => readPatchedBase(first)
      case _               => readDelta(first)
    }
    chunkPos = 0
    valuesDecoded += chunkLen
    if (RleV2Reader.instrumented) RleV2Reader.totalDecoded.add(chunkLen.toLong)
  }

  private def readShortRepeat(first: Int): Unit = {
    val numBytes = ((first >>> 3) & 0x07) + 1
    val len = (first & 0x07) + MinRepeat
    var v = in.readBE(numBytes)
    if (signed) v = BitCodec.unZigzag(v)
    var i = 0
    while (i < len) { chunk(i) = v; i += 1 }
    chunkLen = len
  }

  private def readDirect(first: Int): Unit = {
    val width = BitCodec.decodeBitWidth((first >>> 1) & 0x1f)
    val len = ((first & 1) << 8 | in.readByte()) + 1
    BitCodec.readInts(chunk, 0, len, width, in)
    if (signed) {
      var i = 0
      while (i < len) { chunk(i) = BitCodec.unZigzag(chunk(i)); i += 1 }
    }
    chunkLen = len
  }

  private def readDelta(first: Int): Unit = {
    val widthOrd = (first >>> 1) & 0x1f
    val len = ((first & 1) << 8 | in.readByte()) + 1
    val base = if (signed) in.readVslong() else in.readVulong()
    val firstDelta = in.readVslong()
    chunk(0) = base
    if (widthOrd == 0) {
      // fixed delta
      var i = 1
      while (i < len) { chunk(i) = chunk(i - 1) + firstDelta; i += 1 }
    } else {
      val width = BitCodec.decodeBitWidth(widthOrd)
      chunk(1) = base + firstDelta
      val sign = if (firstDelta < 0) -1L else 1L
      BitCodec.readInts(chunk, 2, len - 2, width, in)
      var i = 2
      while (i < len) { chunk(i) = chunk(i - 1) + sign * chunk(i); i += 1 }
    }
    chunkLen = len
  }

  private def readPatchedBase(first: Int): Unit = {
    val width = BitCodec.decodeBitWidth((first >>> 1) & 0x1f)
    val len = ((first & 1) << 8 | in.readByte()) + 1
    val third = in.readByte()
    val fourth = in.readByte()
    val baseBytes = ((third >>> 5) & 0x07) + 1
    val patchWidth = BitCodec.decodeBitWidth(third & 0x1f)
    val patchGapWidth = ((fourth >>> 5) & 0x07) + 1
    val patchListLen = fourth & 0x1f
    var base = in.readBE(baseBytes)
    val signMask = 1L << (baseBytes * 8 - 1)
    if ((base & signMask) != 0) base = -(base & (signMask - 1))
    BitCodec.readInts(chunk, 0, len, BitCodec.closestFixedBits(width), in)
    val gvp = new Array[Long](patchListLen)
    BitCodec.readInts(gvp, 0, patchListLen,
      BitCodec.closestFixedBits(patchGapWidth + patchWidth), in)
    var pos = 0
    var i = 0
    val patchMask = if (patchWidth >= 64) -1L else (1L << patchWidth) - 1
    while (i < patchListLen) {
      val gap = (gvp(i) >>> patchWidth).toInt
      val patch = gvp(i) & patchMask
      pos += gap
      if (patch != 0) chunk(pos) |= patch << width
      i += 1
    }
    i = 0
    while (i < len) { chunk(i) += base; i += 1 }
    chunkLen = len
  }
}

object RleV2Reader {
  /** Test/diagnostic hook: when instrumented, every reader accumulates its
    * decoded-value count here (proves checkpoint seeks skip decode work).
    */
  @volatile var instrumented: Boolean = false
  val totalDecoded = new java.util.concurrent.atomic.LongAdder
}
