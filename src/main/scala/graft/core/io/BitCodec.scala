package graft.core.io

/** Bit-width arithmetic + big-endian bit packing shared by the RLEv2 codec.
  *
  * Behavior per the ORC v1 spec as implemented by the reference
  * (/root/reference/pkg/store/LongOutputStreamV2.go:547-737 and
  * LongBitPacker.go). One deliberate deviation: `percentileBits` uses the
  * spec/Java semantics `(int)(length * (1 - p))` — the reference's Go port
  * truncates `int32(1.0-p)` to 0 (LongOutputStreamV2.go:563), which makes
  * every percentile behave like the 100th and leaves PATCHED_BASE dead code.
  * We implement the correct cost model (strictly better compression).
  */
object BitCodec {

  /** Closest fixed-bit count from the FixedBitSizes ladder: 1..24,26,28,30,32,40,48,56,64. */
  def closestFixedBits(n: Int): Int = {
    if (n == 0) 1
    else if (n <= 24) n
    else if (n <= 26) 26
    else if (n <= 28) 28
    else if (n <= 30) 30
    else if (n <= 32) 32
    else if (n <= 40) 40
    else if (n <= 48) 48
    else if (n <= 56) 56
    else 64
  }

  /** Byte-aligned widths used by DIRECT/DELTA packing: 1,2,4,8,16,24,32,40,48,56,64. */
  def closestAlignedFixedBits(n: Int): Int = {
    if (n <= 1) 1
    else if (n <= 2) 2
    else if (n <= 4) 4
    else if (n <= 8) 8
    else if (n <= 16) 16
    else if (n <= 24) 24
    else if (n <= 32) 32
    else if (n <= 40) 40
    else if (n <= 48) 48
    else if (n <= 56) 56
    else 64
  }

  /** Number of bits required for the (unsigned) value, snapped to the ladder. */
  def findClosestNumBits(value: Long): Int = {
    var count = 0
    var v = value
    while (v != 0) { count += 1; v >>>= 1 }
    closestFixedBits(count)
  }

  /** 5-bit header encoding of a fixed-bit width (FixedBitSizes ordinal). */
  def encodeBitWidth(n0: Int): Int = {
    val n = closestFixedBits(n0)
    if (n <= 24) n - 1
    else if (n == 26) 24
    else if (n == 28) 25
    else if (n == 30) 26
    else if (n == 32) 27
    else if (n == 40) 28
    else if (n == 48) 29
    else if (n == 56) 30
    else 31
  }

  /** Inverse of [[encodeBitWidth]]. */
  def decodeBitWidth(ord: Int): Int = {
    if (ord <= 23) ord + 1
    else ord match {
      case 24 => 26
      case 25 => 28
      case 26 => 30
      case 27 => 32
      case 28 => 40
      case 29 => 48
      case 30 => 56
      case _  => 64
    }
  }

  def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  def unZigzag(v: Long): Long = (v >>> 1) ^ -(v & 1L)

  /** Bits needed to hold the p-th percentile of the data's bit widths
    * (spec-correct Java semantics — see class doc).
    */
  def percentileBits(data: Array[Long], offset: Int, length: Int, p: Double): Int = {
    val hist = new Array[Int](32)
    var i = offset
    while (i < offset + length) {
      hist(encodeBitWidth(findClosestNumBits(data(i)))) += 1
      i += 1
    }
    var perLen = (length * (1.0 - p)).toInt
    var j = hist.length - 1
    while (j >= 0) {
      perLen -= hist(j)
      if (perLen < 0) return decodeBitWidth(j)
      j -= 1
    }
    0
  }

  private def mask(bits: Int): Long = if (bits >= 64) -1L else (1L << bits) - 1

  /** Big-endian (MSB-first) bit packing of `len` values at `bitSize` bits
    * each, per the ORC spec bit layout. Fast byte paths for aligned widths.
    */
  def writeInts(input: Array[Long], offset: Int, len: Int, bitSize: Int, out: ByteBuf): Unit = {
    if (len <= 0) return
    bitSize match {
      case 8 =>
        var i = 0
        while (i < len) { out.writeByte((input(offset + i) & 0xff).toInt); i += 1 }
      case 16 =>
        var i = 0
        while (i < len) { out.writeBE(input(offset + i), 2); i += 1 }
      case 24 =>
        var i = 0
        while (i < len) { out.writeBE(input(offset + i), 3); i += 1 }
      case 32 =>
        var i = 0
        while (i < len) { out.writeBE(input(offset + i), 4); i += 1 }
      case 40 =>
        var i = 0
        while (i < len) { out.writeBE(input(offset + i), 5); i += 1 }
      case 48 =>
        var i = 0
        while (i < len) { out.writeBE(input(offset + i), 6); i += 1 }
      case 56 =>
        var i = 0
        while (i < len) { out.writeBE(input(offset + i), 7); i += 1 }
      case 64 =>
        var i = 0
        while (i < len) { out.writeBE(input(offset + i), 8); i += 1 }
      case _ =>
        var current = 0
        var bitsLeft = 8
        var i = 0
        while (i < len) {
          val value = input(offset + i)
          var bitsToWrite = bitSize
          while (bitsToWrite > bitsLeft) {
            current |= ((value >>> (bitsToWrite - bitsLeft)) & mask(bitsLeft)).toInt
            bitsToWrite -= bitsLeft
            out.writeByte(current)
            current = 0
            bitsLeft = 8
          }
          bitsLeft -= bitsToWrite
          current |= ((value & mask(bitsToWrite)) << bitsLeft).toInt
          if (bitsLeft == 0) { out.writeByte(current); current = 0; bitsLeft = 8 }
          i += 1
        }
        if (bitsLeft != 8) out.writeByte(current)
    }
  }

  /** Decode-side mirror of [[writeInts]]. */
  def readInts(dst: Array[Long], offset: Int, len: Int, bitSize: Int, in: ByteRd): Unit = {
    if (len <= 0) return
    bitSize match {
      case 8 =>
        var i = 0
        while (i < len) { dst(offset + i) = in.readByte().toLong; i += 1 }
      case 16 =>
        var i = 0
        while (i < len) { dst(offset + i) = in.readBE(2); i += 1 }
      case 24 =>
        var i = 0
        while (i < len) { dst(offset + i) = in.readBE(3); i += 1 }
      case 32 =>
        var i = 0
        while (i < len) { dst(offset + i) = in.readBE(4); i += 1 }
      case 40 =>
        var i = 0
        while (i < len) { dst(offset + i) = in.readBE(5); i += 1 }
      case 48 =>
        var i = 0
        while (i < len) { dst(offset + i) = in.readBE(6); i += 1 }
      case 56 =>
        var i = 0
        while (i < len) { dst(offset + i) = in.readBE(7); i += 1 }
      case 64 =>
        var i = 0
        while (i < len) { dst(offset + i) = in.readBE(8); i += 1 }
      case _ =>
        var current = 0
        var bitsLeft = 0
        var i = 0
        while (i < len) {
          var result = 0L
          var bitsToRead = bitSize
          while (bitsToRead > bitsLeft) {
            result <<= bitsLeft
            result |= current & mask(bitsLeft)
            bitsToRead -= bitsLeft
            current = in.readByte()
            bitsLeft = 8
          }
          if (bitsToRead > 0) {
            result <<= bitsToRead
            bitsLeft -= bitsToRead
            result |= (current >> bitsLeft) & mask(bitsToRead)
          }
          dst(offset + i) = result
          i += 1
        }
    }
  }
}
