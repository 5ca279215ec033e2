package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The bench's persisted quiet-state must be keyed to the build: a state
  * written by a different (or unknown) build is archived and never merged,
  * so a regressed build cannot inherit a faster build's converged scaling
  * number (VERDICT r3 "what's wrong" #1).
  */
class BenchStateSpec extends AnyFunSuite {
  import scala.jdk.CollectionConverters._

  private val fpA = "aaaaaaaaaaaaaaaa"
  private val fpB = "bbbbbbbbbbbbbbbb"

  test("matching fingerprint loads; histories and confirmed round-trip") {
    val dir = Files.createTempDirectory("bench-state")
    val p = dir.resolve("quiet_state.json")
    val st = Bench.QuietState(2000000L, 2, 2.76, List(28.90, 29.10),
      List(8.07, 8.30), Some((28.90, 8.07, 0.895, "2026-08-16T00:00:00Z")),
      "2026-08-16T00:00:00Z", fpA)
    st.save(p)
    val back = Bench.QuietState.load(p, 2000000L, 2, fpA)
    assert(back.isDefined)
    assert(back.get.fp == fpA)
    assert(back.get.histN == List(28.90, 29.10))
    assert(back.get.confirmed.map(_._3).contains(0.895))
  }

  test("foreign fingerprint: state archived, not merged, later loads see nothing") {
    val dir = Files.createTempDirectory("bench-state")
    val p = dir.resolve("quiet_state.json")
    Bench.QuietState(2000000L, 2, 2.76, List(28.90, 29.10), List(8.07, 8.30),
      None, "2026-08-16T00:00:00Z", fpA).save(p)
    assert(Bench.QuietState.load(p, 2000000L, 2, fpB).isEmpty,
      "a state from another build must not load")
    assert(!Files.exists(p), "the live state file must be archived away")
    val archived = Files.list(dir).iterator().asScala.map(_.getFileName.toString).toSeq
    assert(archived.exists(_.startsWith("quiet_state.json.stale-" + fpA)),
      s"expected an archived stale file, found $archived")
    assert(Bench.QuietState.load(p, 2000000L, 2, fpB).isEmpty)
  }

  test("legacy state without a fingerprint counts as foreign") {
    val dir = Files.createTempDirectory("bench-state")
    val p = dir.resolve("quiet_state.json")
    // round-3-era format: no "fp" field
    Files.writeString(p,
      """{"turns":2000000,"coresN":2,"ratio":2.76,"histN":[28.90],"hist4N":[8.07],"ts":"x"}""")
    assert(Bench.QuietState.load(p, 2000000L, 2, fpA).isEmpty)
    assert(!Files.exists(p))
  }

  test("decode histories round-trip; absent in old states reads as empty") {
    val dir = Files.createTempDirectory("bench-state")
    val p = dir.resolve("quiet_state.json")
    Bench.QuietState(2000000L, 2, 2.76, List(25.12), List(7.12), None,
      "2026-08-18T00:00:00Z", fpA, decN = List(7.94, 8.08), dec4N = List(2.15)).save(p)
    val back = Bench.QuietState.load(p, 2000000L, 2, fpA).get
    assert(back.decN == List(7.94, 8.08) && back.dec4N == List(2.15))
    // a round-4-era state (no decN/dec4N) still loads, with empty decode
    Files.writeString(p,
      s"""{"turns":2000000,"coresN":2,"ratio":2.76,"fp":"$fpA","histN":[26.02],"hist4N":[7.18],"ts":"x"}""")
    val old = Bench.QuietState.load(p, 2000000L, 2, fpA).get
    assert(old.decN.isEmpty && old.dec4N.isEmpty)
  }

  test("QueryState: fp-keyed load/save, foreign fp archived, sf mismatch ignored") {
    val dir = Files.createTempDirectory("bench-qstate")
    val p = dir.resolve("query_state.json")
    val qs = Map("q1_agg" -> 1.234, "roundtrip_nation" -> 0.342)
    Bench.QueryState(fpA, "/data/sf0.1", qs, "2026-08-18T00:00:00Z").save(p)
    val back = Bench.QueryState.load(p, fpA, "/data/sf0.1")
    assert(back.exists(_.queries == Map("q1_agg" -> 1.234, "roundtrip_nation" -> 0.342)))
    // a different sf must not serve this file's minima
    assert(Bench.QueryState.load(p, fpA, "/data/sf0.01").isEmpty)
    assert(Files.exists(p), "sf mismatch must not archive the state")
    // a foreign build's state is archived unread
    assert(Bench.QueryState.load(p, fpB, "/data/sf0.1").isEmpty)
    assert(!Files.exists(p))
    val archived = Files.list(dir).iterator().asScala.map(_.getFileName.toString).toSeq
    assert(archived.exists(_.startsWith("query_state.json.stale-" + fpA)), s"$archived")
  }

  test("buildFingerprint reflects file content and is stable") {
    val root = Files.createTempDirectory("fp-src")
    Files.writeString(root.resolve("A.scala"), "object A")
    Files.createDirectories(root.resolve("sub"))
    Files.writeString(root.resolve("sub/B.scala"), "object B")
    val fp1 = Bench.buildFingerprint(root)
    val fp1Again = Bench.buildFingerprint(root)
    assert(fp1 == fp1Again, "fingerprint must be deterministic")
    assert(fp1.length == 16 && fp1 != "unknown")
    Files.writeString(root.resolve("sub/B.scala"), "object B { val x = 1 }")
    assert(Bench.buildFingerprint(root) != fp1,
      "changing a source file must change the fingerprint")
    // a missing source root must FAIL, not key state to a shared sentinel
    assertThrows[IllegalArgumentException](
      Bench.buildFingerprint(root.resolve("missing")))
  }
}
