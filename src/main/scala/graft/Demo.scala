package graft

import graft.core.io.{ByteBuf, ByteRd}
import graft.core.rle._
import graft.core.compress.{Chunked, CompressionKind}

/** CLI demo driver (role analog of the reference's demo at
  * /root/reference/pkg/main/main.go): exercises the public codec API
  * end-to-end and prints sizes + round-trip status.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    // transcript-ish turn_idx column: 1000 conversations of ramps 0..k
    val turnIdx = (0 until 1000).flatMap(c => 0 to (c % 37)).map(_.toLong).toArray
    val w = new RleV2Writer(signed = true)
    turnIdx.foreach(w.writeLong)
    w.flush()
    val enc = w.out.toArray
    val dst = new Array[Long](turnIdx.length)
    RleV2.read(new ByteRd(enc), signed = true, dst, 0, turnIdx.length)
    println(s"RLEv2: ${turnIdx.length} longs (${turnIdx.length * 8} raw bytes) -> " +
      s"${enc.length} bytes, roundtrip=${dst.sameElements(turnIdx)}")

    val text = ("the quick brown fox jumps over the lazy dog. " * 20000).getBytes("UTF-8")
    for (kind <- Seq(CompressionKind.ZLIB, CompressionKind.SNAPPY, CompressionKind.LZ4, CompressionKind.ZSTD)) {
      val cbuf = new ByteBuf()
      Chunked.compress(kind, text, 0, text.length, cbuf)
      val back = Chunked.decompress(kind, cbuf.array, 0, cbuf.size)
      println(f"$kind chunked: ${text.length} -> ${cbuf.size} bytes " +
        f"(${text.length.toDouble / cbuf.size}%.1fx), roundtrip=${java.util.Arrays.equals(back, text)}")
    }

    val extremes = Array(Long.MinValue, Long.MaxValue, 0L, -1L, Long.MinValue + 1)
    val w2 = new RleV2Writer(signed = true); extremes.foreach(w2.writeLong); w2.flush()
    val d2 = new Array[Long](5)
    RleV2.read(new ByteRd(w2.out.toArray), signed = true, d2, 0, 5)
    println(s"int64 extremes roundtrip=${d2.sameElements(extremes)}")

    val cbuf = new ByteBuf()
    Chunked.compress(CompressionKind.ZLIB, text, 0, text.length, cbuf)
    try {
      Chunked.decompress(CompressionKind.ZLIB, cbuf.array, 0, cbuf.size / 2)
      println("truncated stream: NO ERROR (bad)")
    } catch {
      case e: Exception => println(s"truncated stream -> ${e.getClass.getSimpleName} (good)")
    }

    demoMothFile()
  }

  /** End-to-end MOTH file on disk: transcripts-shaped table → write →
    * read-back equality, projection, predicate pruning, corrupt-file probes.
    */
  private def demoMothFile(): Unit = {
    import graft.core.columns._
    import graft.core.columns.MothType._
    import graft.core.file._
    val schema = TStruct(Seq(
      "conv_id" -> TString, "turn_idx" -> TInt, "role" -> TString,
      "text" -> TString, "tool" -> TString, "ts" -> TTimestamp))
    val n = 120000
    val rnd = new scala.util.Random(1234)
    val roles = Array("user", "assistant", "system", "tool")
    val convId = new ColVec(n); convId.bins = new Array[Array[Byte]](n)
    val turnIdx = new ColVec(n); turnIdx.longs = new Array[Long](n)
    val role = new ColVec(n); role.bins = new Array[Array[Byte]](n)
    val text = new ColVec(n); text.bins = new Array[Array[Byte]](n)
    val tool = new ColVec(n); tool.bins = new Array[Array[Byte]](n); tool.nulls = new Array[Boolean](n)
    val ts = new ColVec(n); ts.longs = new Array[Long](n)
    var conv = 0; var turn = 0; var convLen = 1 + rnd.nextInt(50)
    var t0 = 1735689600000000L
    var rawText = 0L
    for (i <- 0 until n) {
      if (turn >= convLen) { conv += 1; turn = 0; convLen = 1 + rnd.nextInt(50); t0 += rnd.nextInt(100000).toLong * 1000 }
      convId.bins(i) = f"conv-$conv%012d".getBytes("UTF-8")
      turnIdx.longs(i) = turn.toLong
      role.bins(i) = roles(turn % 4).getBytes("UTF-8")
      text.bins(i) = (s"turn $turn of conversation $conv: " + ("lorem ipsum dolor sit amet " * (1 + rnd.nextInt(8)))).getBytes("UTF-8")
      rawText += text.bins(i).length
      tool.nulls(i) = rnd.nextInt(100) < 85
      tool.bins(i) = if (tool.nulls(i)) null else s"tool-${rnd.nextInt(30)}".getBytes("UTF-8")
      ts.longs(i) = t0 + turn.toLong * 1000000L
      turn += 1
    }
    val vec = new ColVec(n)
    vec.children = Array(convId, turnIdx, role, text, tool, ts)

    val path = java.nio.file.Files.createTempFile("graft-demo", ".moth").toString
    val fos = new java.io.FileOutputStream(path)
    val w = new MothFileWriter(fos, schema, CompressionKind.ZLIB,
      WriterOpts(bloomColumns = Set("role")))
    val tW0 = System.nanoTime()
    w.write(vec)
    val res = w.close()
    fos.close()
    val wSecs = (System.nanoTime() - tW0) / 1e9
    val logical = ColVecOps.logicalBytes(schema, vec, 0, n)
    println(f"MOTH write: $n rows, logical $logical%,d B -> file ${res.bytes}%,d B " +
      f"(${logical.toDouble / res.bytes}%.2fx), ${n / wSecs}%,.0f rows/s, " +
      s"stripes=${res.stripes.map(_.flushReason).mkString(",")} " +
      s"encodings=${res.stripes.head.encodings.toSeq.sortBy(_._1).map(_._2).mkString("|")}")

    val rd = MothFileReader.fromPath(path)
    val tR0 = System.nanoTime()
    val batches = rd.batches().toSeq
    val rSecs = (System.nanoTime() - tR0) / 1e9
    var ok = true
    var row = 0
    for (b <- batches; i <- 0 until b.len) {
      ok &&= java.util.Arrays.equals(b.children(0).bins(i), convId.bins(row))
      ok &&= b.children(1).longs(i) == turnIdx.longs(row)
      ok &&= java.util.Arrays.equals(b.children(3).bins(i), text.bins(row))
      ok &&= b.children(4).isNull(i) == tool.nulls(row)
      ok &&= b.children(5).longs(i) == ts.longs(row)
      row += 1
    }
    println(f"MOTH read: $row rows in $rSecs%.2fs (${row / rSecs}%,.0f rows/s), bit-identical=$ok")

    // selective pruned read on ts (monotone ⇒ tight row-group ranges):
    // row groups outside the range are SEEKED past (no decode) and only
    // the projected column's byte ranges are fetched
    val tsLo = ts.longs(n / 2) / 1000L // ts stats are epoch millis
    val tsHi = ts.longs(n / 2 + 999) / 1000L + 1
    val rd2 = MothFileReader.fromPath(path,
      ReaderOpts(maxMergeDistance = 0, tinyStripeThreshold = 0))
    graft.core.rle.RleV2Reader.totalDecoded.reset()
    graft.core.rle.RleV2Reader.instrumented = true
    val pruned = try rd2.batches(Some(Seq("turn_idx", "ts")),
        StatsPredicate(Seq(LongRangePred("ts", Some(tsLo), Some(tsHi))))).toSeq
      finally graft.core.rle.RleV2Reader.instrumented = false
    println(f"pruned projected read (ts range, 2 of 6 cols): " +
      f"${pruned.map(_.len).sum}%,d rows decoded of $n%,d, " +
      f"${graft.core.rle.RleV2Reader.totalDecoded.sum()}%,d RLE values decoded, " +
      f"${rd2.bytesRead}%,d of ${res.bytes}%,d file bytes fetched")
    rd2.close()

    // nested projection + columnar surfaces are exercised in SparkSuite;
    // here show the bloom path: role='assistant' exists, role='nope' prunes
    val bloomHit = rd.batches(Some(Seq("role")),
      StatsPredicate(Seq(StringEqPred("role", "nope")))).map(_.len).sum
    println(s"bloom-pruned read (role='nope'): $bloomHit rows decoded (expect 0)")

    // probe: corrupt magic
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val bad = bytes.clone()
    bad(bad.length - 2) = 'X'.toByte // inside magic of postscript
    try {
      MothFileReader.fromBytes(bad)
      println("corrupt magic: NO ERROR (bad)")
    } catch { case e: Exception => println(s"corrupt magic -> ${e.getClass.getSimpleName}: ${e.getMessage} (good)") }
    // probe: truncated file
    try {
      MothFileReader.fromBytes(java.util.Arrays.copyOf(bytes, bytes.length / 3)).batches().foreach(_ => ())
      println("truncated file: decoded without error (ambiguous)")
    } catch { case e: Exception => println(s"truncated file -> ${e.getClass.getSimpleName} (good)") }
    java.nio.file.Files.delete(java.nio.file.Paths.get(path))
  }
}
