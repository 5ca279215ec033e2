package graft.core.rle

import graft.core.io.{ByteBuf, ByteRd}

/** ORC byte-level RLE: control ∈ [0,127] ⇒ run of control+3 copies of the
  * next byte; control ∈ [-128,-1] ⇒ −control literal bytes follow.
  * Semantics per /root/reference/pkg/store/ByteOutputStream.go:42-83.
  */
final class ByteRleWriter(val out: ByteBuf = new ByteBuf(64)) {
  private val MinRepeat = 3
  private val MaxLiteral = 128
  private val MaxRepeat = 127 + MinRepeat

  private val literals = new Array[Byte](MaxLiteral)
  private var numLiterals = 0
  private var repeat = false
  private var tailRunLength = 0

  def pendingCount: Int = numLiterals

  def writeByte(b: Byte): Unit = {
    if (numLiterals == 0) {
      literals(0) = b; numLiterals = 1; tailRunLength = 1
    } else if (repeat) {
      if (b == literals(0)) {
        numLiterals += 1
        if (numLiterals == MaxRepeat) flushGroup()
      } else {
        flushGroup()
        literals(0) = b; numLiterals = 1; tailRunLength = 1
      }
    } else {
      if (b == literals(numLiterals - 1)) tailRunLength += 1 else tailRunLength = 1
      if (tailRunLength == MinRepeat) {
        if (numLiterals + 1 == MinRepeat) {
          repeat = true
          numLiterals += 1
        } else {
          numLiterals -= MinRepeat - 1
          flushGroup()
          literals(0) = b
          repeat = true
          numLiterals = MinRepeat
        }
      } else {
        literals(numLiterals) = b; numLiterals += 1
        if (numLiterals == MaxLiteral) flushGroup()
      }
    }
  }

  def writeBytes(bs: Array[Byte], off: Int, len: Int): Unit = {
    var i = off
    while (i < off + len) { writeByte(bs(i)); i += 1 }
  }

  def flush(): Unit = if (numLiterals > 0) flushGroup()

  /** (bytes flushed, values pending). */
  def checkpoint(): (Int, Int) = (out.size, pendingCount)

  private def flushGroup(): Unit = {
    if (repeat) {
      out.writeByte(numLiterals - MinRepeat)
      out.writeByte(literals(0) & 0xff)
    } else {
      out.writeByte(-numLiterals & 0xff)
      out.writeBytes(literals, 0, numLiterals)
    }
    repeat = false; numLiterals = 0; tailRunLength = 0
  }
}

final class ByteRleReader(in: ByteRd) {
  private var runLength = 0
  private var runValue: Byte = 0
  private var literalCount = 0

  def nextByte(): Byte = {
    while (runLength == 0 && literalCount == 0) readHeader()
    if (runLength > 0) { runLength -= 1; runValue }
    else { literalCount -= 1; in.readByte().toByte }
  }

  def next(dst: Array[Byte], off: Int, len: Int): Unit = {
    var produced = 0
    while (produced < len) {
      if (runLength > 0) {
        val n = math.min(len - produced, runLength)
        java.util.Arrays.fill(dst, off + produced, off + produced + n, runValue)
        runLength -= n; produced += n
      } else if (literalCount > 0) {
        val n = math.min(len - produced, literalCount)
        in.readInto(dst, off + produced, n)
        literalCount -= n; produced += n
      } else readHeader()
    }
  }

  def skip(count: Long): Unit = {
    var remaining = count
    while (remaining > 0) {
      if (runLength > 0) {
        val n = math.min(remaining, runLength.toLong).toInt
        runLength -= n; remaining -= n
      } else if (literalCount > 0) {
        val n = math.min(remaining, literalCount.toLong).toInt
        in.skip(n); literalCount -= n; remaining -= n
      } else readHeader()
    }
  }

  /** Reposition at a writer checkpoint (bytes flushed, values pending): jump
    * the stream cursor and decode only the in-group remainder.
    */
  def seek(off: Long, pending: Long): Unit = {
    in.pos = off.toInt
    runLength = 0
    literalCount = 0
    skip(pending)
  }

  private def readHeader(): Unit = {
    val control = in.readSignedByte()
    if (control >= 0) { runLength = control + 3; runValue = in.readByte().toByte }
    else literalCount = -control
  }
}

/** Boolean stream: MSB-first bit-packing into bytes, bytes then byte-RLE'd.
  * Per /root/reference/pkg/store/BooleanOutputStream.go:36-103.
  */
final class BooleanWriter(val byteRle: ByteRleWriter = new ByteRleWriter()) {
  private var current = 0
  private var bitsInCurrent = 0

  def out: ByteBuf = byteRle.out

  def writeBoolean(v: Boolean): Unit = {
    current <<= 1
    if (v) current |= 1
    bitsInCurrent += 1
    if (bitsInCurrent == 8) { byteRle.writeByte(current.toByte); current = 0; bitsInCurrent = 0 }
  }

  def writeBooleans(count: Int, v: Boolean): Unit = {
    var i = 0
    while (i < count) { writeBoolean(v); i += 1 }
  }

  def flush(): Unit = {
    if (bitsInCurrent > 0) {
      current <<= (8 - bitsInCurrent)
      byteRle.writeByte(current.toByte)
      current = 0; bitsInCurrent = 0
    }
    byteRle.flush()
  }

  /** (bytes flushed, bit-values pending since that offset). */
  def checkpoint(): (Int, Int) =
    (byteRle.out.size, byteRle.pendingCount * 8 + bitsInCurrent)
}

final class BooleanReader(in: ByteRd) {
  private val byteRle = new ByteRleReader(in)
  private var current = 0
  private var bitsLeft = 0

  def nextBoolean(): Boolean = {
    if (bitsLeft == 0) { current = byteRle.nextByte() & 0xff; bitsLeft = 8 }
    bitsLeft -= 1
    ((current >>> bitsLeft) & 1) != 0
  }

  def skip(bits: Long): Unit = {
    val fromCurrent = math.min(bits, bitsLeft.toLong).toInt
    bitsLeft -= fromCurrent
    var remaining = bits - fromCurrent
    if (remaining > 0) {
      byteRle.skip(remaining / 8)
      remaining %= 8
      var i = 0L
      while (i < remaining) { nextBoolean(); i += 1 }
    }
  }

  /** Reposition at a writer checkpoint (bytes flushed, bit-values pending). */
  def seek(off: Long, pendingBits: Long): Unit = {
    byteRle.seek(off, 0L)
    current = 0
    bitsLeft = 0
    skip(pendingBits)
  }
}

/** ORC RLE v1 — needed only to decode DICTIONARY(v1)-tagged files; our
  * writer always emits v2. Per /root/reference/pkg/store/LongOutputStreamV1.go.
  */
final class RleV1Writer(signed: Boolean, val out: ByteBuf = new ByteBuf(64)) {
  private val MinRepeat = 3
  private val MaxDelta = 127
  private val MinDelta = -128
  private val MaxLiterals = 128

  private val literals = new Array[Long](MaxLiterals)
  private var numLiterals = 0
  private var delta = 0L
  private var repeat = false
  private var tailRunLength = 0

  def writeLong(v: Long): Unit = {
    if (numLiterals == 0) {
      literals(0) = v; numLiterals = 1; tailRunLength = 1
    } else if (repeat) {
      if (v == literals(0) + delta * numLiterals) numLiterals += 1
      else { flushRepeat(); literals(0) = v; numLiterals = 1; tailRunLength = 1 }
      if (numLiterals == MaxLiterals + MinRepeat - 1) flushRepeat()
    } else {
      if (tailRunLength == 1) {
        delta = v - literals(numLiterals - 1)
        if (delta < MinDelta || delta > MaxDelta) tailRunLength = 1
        else tailRunLength = 2
      } else if (v == literals(numLiterals - 1) + delta) tailRunLength += 1
      else {
        delta = v - literals(numLiterals - 1)
        if (delta < MinDelta || delta > MaxDelta) tailRunLength = 1
        else tailRunLength = 2
      }
      if (tailRunLength == MinRepeat) {
        if (numLiterals + 1 == MinRepeat) {
          repeat = true
          numLiterals += 1
        } else {
          numLiterals -= MinRepeat - 1
          val base = literals(numLiterals)
          flushLiterals()
          literals(0) = base
          repeat = true
          numLiterals = MinRepeat
        }
      } else {
        literals(numLiterals) = v
        numLiterals += 1
        if (numLiterals == MaxLiterals) flushLiterals()
      }
    }
  }

  def flush(): Unit = {
    if (numLiterals != 0) {
      if (repeat) flushRepeat() else flushLiterals()
    }
  }

  private def writeVal(v: Long): Unit =
    if (signed) out.writeVslong(v) else out.writeVulong(v)

  private def flushRepeat(): Unit = {
    out.writeByte(numLiterals - MinRepeat)
    out.writeByte(delta.toInt & 0xff)
    writeVal(literals(0))
    numLiterals = 0; repeat = false; tailRunLength = 0; delta = 0
  }

  private def flushLiterals(): Unit = {
    out.writeByte(-numLiterals & 0xff)
    var i = 0
    while (i < numLiterals) { writeVal(literals(i)); i += 1 }
    numLiterals = 0; tailRunLength = 0
  }
}

final class RleV1Reader(in: ByteRd, signed: Boolean) {
  private var runLength = 0
  private var runValue = 0L
  private var runDelta = 0L
  private var literalCount = 0

  private def readVal(): Long = if (signed) in.readVslong() else in.readVulong()

  def nextLong(): Long = {
    if (runLength > 0) { val v = runValue; runValue += runDelta; runLength -= 1; v }
    else if (literalCount > 0) { literalCount -= 1; readVal() }
    else {
      val control = in.readSignedByte()
      if (control >= 0) {
        runLength = control + 3
        runDelta = in.readSignedByte().toLong
        runValue = readVal()
      } else literalCount = -control
      nextLong()
    }
  }

  def next(dst: Array[Long], off: Int, len: Int): Unit = {
    var i = 0
    while (i < len) { dst(off + i) = nextLong(); i += 1 }
  }

  def skip(count: Long): Unit = {
    var i = 0L
    while (i < count) { nextLong(); i += 1 }
  }
}
