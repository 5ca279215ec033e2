package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.core.io.{BitCodec, ByteBuf, ByteRd}
import graft.core.rle._
import graft.core.compress.{Chunked, CompressionKind}

class RleSpec extends AnyFunSuite {

  /** Manual forAll: the scalatest-scalacheck bridge isn't on the classpath. */
  def checkAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private def rleV2Encode(xs: Array[Long], signed: Boolean): Array[Byte] = {
    val w = new RleV2Writer(signed)
    xs.foreach(w.writeLong)
    w.flush()
    w.out.toArray
  }

  private def rleV2Decode(bytes: Array[Byte], signed: Boolean, n: Int): Array[Long] = {
    val dst = new Array[Long](n)
    RleV2.read(new ByteRd(bytes), signed, dst, 0, n)
    dst
  }

  private def rt(xs: Array[Long], signed: Boolean): Unit = {
    val enc = rleV2Encode(xs, signed)
    assert(rleV2Decode(enc, signed, xs.length).toSeq == xs.toSeq,
      s"roundtrip failed signed=$signed n=${xs.length}")
  }

  test("varint roundtrip edge values") {
    val vals = Seq(0L, 1L, -1L, 127L, 128L, 1L << 62, -(1L << 62), Long.MaxValue, Long.MinValue)
    val buf = new ByteBuf()
    vals.foreach(buf.writeVslong)
    val rd = new ByteRd(buf.toArray)
    vals.foreach(v => assert(rd.readVslong() == v))
    val buf2 = new ByteBuf()
    val uvals = Seq(0L, 1L, 127L, 128L, 16383L, 16384L, Long.MaxValue, -1L)
    uvals.foreach(buf2.writeVulong)
    val rd2 = new ByteRd(buf2.toArray)
    uvals.foreach(v => assert(rd2.readVulong() == v))
  }

  test("bit packing roundtrip all ladder widths") {
    val widths = Seq(1, 2, 3, 4, 5, 7, 8, 11, 13, 16, 17, 23, 24, 26, 28, 30, 32, 40, 48, 56, 64)
    val rnd = new scala.util.Random(7)
    for (w <- widths) {
      val n = 129
      val maxV = if (w >= 64) -1L else (1L << w) - 1
      val xs = Array.fill(n)(rnd.nextLong() & maxV)
      val buf = new ByteBuf()
      BitCodec.writeInts(xs, 0, n, w, buf)
      val dst = new Array[Long](n)
      BitCodec.readInts(dst, 0, n, w, new ByteRd(buf.toArray))
      assert(dst.toSeq == xs.toSeq, s"width $w")
    }
  }

  test("RLEv2 golden: ORC spec short repeat [10000 x5] unsigned") {
    val enc = rleV2Encode(Array.fill(5)(10000L), signed = false)
    assert(enc.toSeq == Seq(0x0a, 0x27, 0x10).map(_.toByte))
  }

  test("RLEv2 golden: ORC spec direct [23713,43806,57005,48879] unsigned") {
    val enc = rleV2Encode(Array(23713L, 43806L, 57005L, 48879L), signed = false)
    assert(enc.toSeq == Seq(0x5e, 0x03, 0x5c, 0xa1, 0xab, 0x1e, 0xde, 0xad, 0xbe, 0xef).map(_.toByte))
  }

  test("RLEv2 golden: ORC spec delta [2,3,5,7,11,13,17,19,23,29] unsigned") {
    val enc = rleV2Encode(Array(2L, 3, 5, 7, 11, 13, 17, 19, 23, 29), signed = false)
    assert(enc.toSeq == Seq(0xc6, 0x09, 0x02, 0x02, 0x22, 0x42, 0x42, 0x46).map(_.toByte))
  }

  test("RLEv2 patched base triggers and roundtrips") {
    // 96 small values + 4 huge outliers (≤5%) → PATCHED_BASE
    val xs = Array.tabulate(100)(i => if (i % 25 == 24) 1000000L + i else (i % 17).toLong)
    // shuffle determinism: fixed permutation to break monotonicity
    val perm = new scala.util.Random(3).shuffle((0 until 100).toList).toArray
    val data = perm.map(xs)
    val enc = rleV2Encode(data, signed = false)
    assert((enc(0) & 0xff) >>> 6 == RleV2.Enc.PatchedBase, f"first byte ${enc(0)}%02x")
    assert(rleV2Decode(enc, signed = false, 100).toSeq == data.toSeq)
  }

  test("RLEv2 patched base with negative min roundtrips") {
    val xs = Array.tabulate(100)(i => if (i == 50) 1L << 40 else (i % 13).toLong - 6)
    val enc = rleV2Encode(xs, signed = true)
    assert(rleV2Decode(enc, signed = true, 100).toSeq == xs.toSeq)
  }

  test("RLEv2 patch gap > 255 roundtrips") {
    // one outlier at the very start, one at the end → gap 510 > 255
    val xs = Array.tabulate(512) { i =>
      if (i == 0 || i == 510) 1L << 33 else (i % 7).toLong
    }
    val enc = rleV2Encode(xs, signed = false)
    assert(rleV2Decode(enc, signed = false, 512).toSeq == xs.toSeq)
  }

  test("RLEv2 long constant run emits fixed delta and roundtrips") {
    val xs = Array.fill(512)(42L)
    val enc = rleV2Encode(xs, signed = false)
    assert((enc(0) & 0xff) >>> 6 == RleV2.Enc.Delta)
    assert(enc.length <= 5)
    assert(rleV2Decode(enc, signed = false, 512).toSeq == xs.toSeq)
  }

  test("RLEv2 adversarial shapes roundtrip") {
    val shapes = Seq[Array[Long]](
      Array(),
      Array(7L),
      Array(7L, 7L),
      Array(7L, 7L, 7L),
      Array.tabulate(513)(_.toLong),
      Array.tabulate(511)(i => -i.toLong),
      Array.tabulate(512)(i => (i % 2).toLong), // sawtooth
      Array.tabulate(1000)(i => i.toLong * 3 + 1), // fixed delta long
      Array(Long.MaxValue, Long.MinValue, 0L, -1L, 1L),
      Array.tabulate(300)(i => if (i % 100 == 0) Long.MaxValue / 2 else i.toLong),
      Array.fill(2000)(5L) ++ Array.tabulate(100)(_.toLong) ++ Array.fill(4)(9L)
    )
    for (xs <- shapes; signed <- Seq(true, false)) {
      if (signed || xs.forall(_ >= 0) || xs.isEmpty) rt(xs, signed)
      else rt(xs.map(math.abs), signed)
    }
  }

  test("RLEv2 property: random mixed-regime arrays roundtrip (signed)") {
    val gen = for {
      n <- Gen.chooseNum(0, 1500)
      mode <- Gen.chooseNum(0, 4)
      xs <- Gen.listOfN(n, mode match {
        case 0 => Gen.chooseNum(-10L, 10L)
        case 1 => Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)
        case 2 => Gen.frequency(19 -> Gen.chooseNum(0L, 100L), 1 -> Gen.chooseNum(1L << 40, 1L << 50))
        case 3 => Gen.const(123456L)
        case _ => Gen.chooseNum(-3L, 3L)
      })
    } yield xs.toArray
    checkAll(gen) { xs => rt(xs, signed = true) }
  }

  test("RLEv2 skip") {
    val xs = Array.tabulate(3000)(i => (i * i % 997).toLong)
    val enc = rleV2Encode(xs, signed = false)
    val r = new RleV2Reader(new ByteRd(enc), signed = false)
    r.skip(1234)
    val dst = new Array[Long](100)
    r.next(dst, 0, 100)
    assert(dst.toSeq == xs.slice(1234, 1334).toSeq)
  }

  test("byte RLE roundtrip") {
    val rnd = new scala.util.Random(11)
    val xs = (Array.fill(300)(5.toByte) ++ Array.fill(200)(rnd.nextInt(256).toByte)
      ++ Array.fill(2)(9.toByte) ++ Array.fill(130)(1.toByte))
    val w = new ByteRleWriter()
    w.writeBytes(xs, 0, xs.length)
    w.flush()
    val r = new ByteRleReader(new ByteRd(w.out.toArray))
    val dst = new Array[Byte](xs.length)
    r.next(dst, 0, xs.length)
    assert(dst.toSeq == xs.toSeq)
  }

  test("boolean stream roundtrip + skip") {
    val rnd = new scala.util.Random(13)
    val xs = Array.fill(5000)(rnd.nextInt(10) != 0) ++ Array.fill(1000)(true)
    val w = new BooleanWriter()
    xs.foreach(w.writeBoolean)
    w.flush()
    val r = new BooleanReader(new ByteRd(w.out.toArray))
    xs.foreach(v => assert(r.nextBoolean() == v))
    val r2 = new BooleanReader(new ByteRd(w.out.toArray))
    r2.skip(4999)
    assert(r2.nextBoolean() == xs(4999))
  }

  test("RLEv1 roundtrip") {
    val xs = Array.tabulate(1000)(i => (i % 100).toLong * 7) ++
      Array.fill(500)(3L) ++ Array.tabulate(300)(i => i.toLong * 1000)
    for (signed <- Seq(true, false)) {
      val w = new RleV1Writer(signed)
      xs.foreach(w.writeLong)
      w.flush()
      val r = new RleV1Reader(new ByteRd(w.out.toArray), signed)
      val dst = new Array[Long](xs.length)
      r.next(dst, 0, xs.length)
      assert(dst.toSeq == xs.toSeq, s"signed=$signed")
    }
  }

  test("size parity: default encoding ≤ reference-equivalent encoding, decodes identically") {
    // refCompat reproduces the reference writer's exact encoding choices
    // (int-truncated percentileBits kills PATCHED_BASE; all-equal chunks go
    // DIRECT not DELTA). The north rule's "≤ reference compressed size" gate
    // at the integer-stream level: for every distribution, the default
    // writer's bytes must be ≤ the reference-equivalent bytes — never >.
    val rnd = new scala.util.Random(99)
    def encode(xs: Array[Long], signed: Boolean, compat: Boolean): Array[Byte] = {
      val w = new RleV2Writer(signed, refCompat = compat)
      xs.foreach(w.writeLong)
      w.flush()
      w.out.toArray
    }
    val fixtures: Seq[(String, Boolean, Array[Long])] = Seq(
      ("all-equal 2048 (dict/salt runs)", false, Array.fill(2048)(7L)),
      ("monotone turn_idx", true, Array.tabulate(5000)(_.toLong)),
      ("ts deltas with jitter", true,
        Array.iterate(1735689600L, 5000)(t => t + 1 + rnd.nextInt(300))),
      ("small values with rare outliers (patched-base)", false,
        Array.tabulate(4000)(i => if (i % 100 == 17) 1L << 40 else rnd.nextInt(64).toLong)),
      ("uniform random", true, Array.fill(3000)(rnd.nextLong() >> 16)),
      ("string lengths zipf-ish", false,
        Array.fill(5000)((1 + 2000 / (1 + rnd.nextInt(50))).toLong)),
      ("dictionary indices low-card", false, Array.fill(8000)(rnd.nextInt(4).toLong))
    )
    var strictlySmaller = 0
    fixtures.foreach { case (name, signed, xs) =>
      val dflt = encode(xs, signed, compat = false)
      val compat = encode(xs, signed, compat = true)
      assert(dflt.length <= compat.length,
        s"$name: default ${dflt.length}B > reference-equivalent ${compat.length}B")
      if (dflt.length < compat.length) strictlySmaller += 1
      // both are spec-ORC: our reader decodes each back to the input
      assert(rleV2Decode(dflt, signed, xs.length).toSeq == xs.toSeq, s"$name default decode")
      assert(rleV2Decode(compat, signed, xs.length).toSeq == xs.toSeq, s"$name compat decode")
    }
    assert(strictlySmaller >= 2,
      "expected the all-equal and outlier fixtures to be strictly smaller than reference")
    // property sweep: no distribution may make the default writer bigger
    checkAll(Gen.containerOfN[Array, Long](513,
      Gen.oneOf(Gen.choose(-100L, 100L), Gen.choose(Long.MinValue / 4, Long.MaxValue / 4),
        Gen.const(42L))), n = 100) { xs =>
      for (signed <- Seq(true, false)) {
        val in = if (signed) xs else xs.map(_.abs)
        assert(encode(in, signed, compat = false).length <=
          encode(in, signed, compat = true).length)
      }
    }
  }

  test("chunked compression roundtrip all codecs") {
    val rnd = new scala.util.Random(17)
    val compressible = Array.fill(700000)((rnd.nextInt(4) + 'a').toByte)
    val incompressible = Array.fill(300000)(rnd.nextInt(256).toByte)
    for (kind <- Seq(CompressionKind.NONE, CompressionKind.ZLIB, CompressionKind.SNAPPY,
      CompressionKind.LZ4, CompressionKind.ZSTD)) {
      for (data <- Seq(compressible, incompressible, Array.empty[Byte])) {
        val out = new ByteBuf()
        Chunked.compress(kind, data, 0, data.length, out)
        val back = Chunked.decompress(kind, out.array, 0, out.size)
        assert(back.toSeq == data.toSeq, s"$kind n=${data.length}")
        if (kind != CompressionKind.NONE && (data eq compressible))
          assert(out.size < data.length * 7 / 10, s"$kind should compress")
      }
    }
  }
}
