package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench runner's calm-box regression gate — pure comparator +
  * prior-artifact parser (no Spark): the gate that would have caught
  * round-8's q92 11.8 s noise artifact before it shipped. */
class BenchGateSpec extends AnyFunSuite {

  test("parsePriorQueries reads a raw bench line") {
    val line = """{"metric":"total","value":9.5,"unit":"sec","passes":3,""" +
      """"queries":{"q01":0.285,"q92":2.602,"qs1":3.210},"sf":"/x"}"""
    assert(Bench.parsePriorQueries(line) ==
      Map("q01" -> 0.285, "q92" -> 2.602, "qs1" -> 3.210))
  }

  test("parsePriorQueries reads the driver wrapper's escaped, twice-emitted tail") {
    // the driver artifact wraps the line in a "tail" string with escaped
    // quotes, often front-truncated and containing the line twice — only
    // the LAST queries object is guaranteed complete
    val tail = """{"n": 8, "rc": 0, "tail": "211},\"sf\":\"x\"}\n""" +
      """{\"metric\":\"total\",\"value\":1.0,\"passes\":2,""" +
      """\"queries\":{\"q92\":2.602,\"q55\":4.571},\"sf\":\"x\"}"}"""
    assert(Bench.parsePriorQueries(tail) ==
      Map("q92" -> 2.602, "q55" -> 4.571))
  }

  test("parsePriorQueries is forgiving: garbage disarms the gate") {
    assert(Bench.parsePriorQueries("").isEmpty)
    assert(Bench.parsePriorQueries("{\"no\":\"queries\"}").isEmpty)
    assert(Bench.parsePriorQueries("\"queries\":{").isEmpty)
    assert(Bench.parsePriorQueries("\"queries\":{\"q1\":not_a_number}").isEmpty)
  }

  test("salvage: a tail truncated PAST the queries marker still yields a partial prior") {
    // round 10 read exactly this shape: the driver's 2,000-char stdout
    // tail started mid-map — no "queries":{ marker anywhere — and the
    // gate silently disarmed for the whole round. Intact "qNN":secs
    // pairs are recoverable by shape; the leading fragment cut mid-key
    // ("30," below) must NOT produce a bogus entry.
    val tail = """{"n": 9, "rc": 0, "tail": "30,\"q04\":0.443,\"q05\":0.252,""" +
      """\"qs1\":3.210,\"q06\":0.115},\"sf\":\"/x\"}"}"""
    assert(Bench.parsePriorQueries(tail) ==
      Map("q04" -> 0.443, "q05" -> 0.252, "qs1" -> 3.210, "q06" -> 0.115))
    // non-query numeric fields ("n", "rc", "value") never salvage as keys
    val noisy = """"value":9.9,"cpus":32,\"q92\":2.602"""
    assert(Bench.parsePriorQueries(noisy) == Map("q92" -> 2.602))
    // marker present but map head truncated away the closing brace:
    // salvage what's intact after the marker
    assert(Bench.parsePriorQueries("\"queries\":{\"q7\":1.25,\"q8\":0.5") ==
      Map("q7" -> 1.25, "q8" -> 0.5))
  }

  test("newestPrior sorts rounds numerically, not lexicographically") {
    assert(Bench.newestPrior(Seq("BENCH_r09.json", "BENCH_r10.json"))
      .contains("BENCH_r10.json"))
    // the unpadded / >99-round cases a filename sort gets wrong
    assert(Bench.newestPrior(Seq("BENCH_r9.json", "BENCH_r10.json"))
      .contains("BENCH_r10.json"))
    assert(Bench.newestPrior(Seq("BENCH_r99.json", "BENCH_r100.json"))
      .contains("BENCH_r100.json"))
    assert(Bench.newestPrior(Seq("BENCH_LOCAL.json", "other.txt")).isEmpty)
  }

  test("a BENCH_LOCAL-style self-emitted line round-trips through the prior parser") {
    val line = """{"metric":"total","value":12.3,"unit":"sec","passes":3,""" +
      """"reruns":0,"singles":0,"settled":2,"queries":{"q1":0.5,"qs1":3.4},"sf":"/x"}"""
    assert(Bench.parsePriorQueries(line) == Map("q1" -> 0.5, "qs1" -> 3.4))
  }

  test("compactQueries: slowest-first under budget, omission accounted, compact tail parses") {
    // round-12 fix: the full line outgrew the harness's 2000-byte
    // stdout tail in round 9 ("parsed": null three rounds). The compact
    // twin packs the slowest entries that fit and reports what it drops.
    val pieces = (1 to 200).map(i => (s""""q$i":$i.000""", i.toDouble))
    val (qs, shown, rest) = Bench.compactQueries(pieces, 300)
    assert(qs.length <= 300)
    assert(qs.startsWith("{\"q200\":200.000")) // slowest leads
    assert(shown > 0 && shown < 200)
    // omitted seconds exactly complement the shown ones
    val shownSum = "\"q(\\d+)\"".r.findAllMatchIn(qs).map(_.group(1).toInt).sum
    assert(math.abs(rest - (pieces.map(_._2).sum - shownSum)) < 1e-6)
    // the object is itself valid prior-parser input (intact pairs)
    val parsed = Bench.parsePriorQueries("\"queries\":" + qs)
    assert(parsed.size == shown && parsed("q200") == 200.0)
    // everything fits → nothing dropped
    val (all, n, r) = Bench.compactQueries(pieces.take(3), 300)
    assert(n == 3 && r == 0.0 && all.contains("\"q1\":1.000"))
  }

  test("regressedKeys flags fleet-relative regressions; uniform box swings never flag") {
    // calm fleet at ~1.05x with two genuine regressions
    val prior = (1 to 10).map(i => s"q$i" -> 1.0).toMap + ("qz" -> 0.0)
    val calm = (1 to 10).map(i => s"q$i" ->
        (if (i == 2) 3.01 else if (i == 3) 5.0 else 1.05)).toMap ++
      Map("q99" -> 99.0, "qz" -> 1.0) // new entry / zero prior: never flag
    assert(Bench.regressedKeys(calm, prior) == Seq("q2", "q3"))
    assert(Bench.regressedKeys(calm, prior, factor = 4.0) == Seq("q3"))
    // a uniform 2x box-state swing (the round-10 afternoon shape) names
    // NOBODY: every entry moved with the fleet
    val swung = (1 to 10).map(i => s"q$i" -> 2.0).toMap
    assert(Bench.boxDrift(swung, prior) == 2.0)
    assert(Bench.regressedKeys(swung, prior).isEmpty)
    // ...but a genuine outlier still stands out ON the slow box
    assert(Bench.regressedKeys(swung + ("q7" -> 7.0), prior) == Seq("q7"))
    // a globally FASTER run never loosens the per-entry gate
    val fast = (1 to 10).map(i => s"q$i" ->
      (if (i == 4) 1.8 else 0.5)).toMap
    assert(Bench.boxDrift(fast, prior) == 1.0)
    assert(Bench.regressedKeys(fast, prior) == Seq("q4"))
    // empty prior disarms
    assert(Bench.regressedKeys(calm, Map.empty).isEmpty)
  }

  test("capped drift norm: a fleet-wide REAL slowdown beyond the cap still flags") {
    // round-10 ADVICE: uncapped, a regression hitting >= half the keys
    // set norm to the regression ratio itself and the gate went blind.
    // A uniform 4x slowdown exceeds MaxDriftNorm (2.0) and must flag
    // every key (4.0 > 1.0 * 1.5 * 2.0).
    val prior = (1 to 10).map(i => s"q$i" -> 1.0).toMap
    val slow4x = (1 to 10).map(i => s"q$i" -> 4.0).toMap
    assert(Bench.boxDrift(slow4x, prior) == 4.0) // uncapped observable
    assert(Bench.regressedKeys(slow4x, prior) == (1 to 10).map(i => s"q$i").sorted)
    // at exactly the cap nothing flags — 2x stays attributed to the box
    val slow2x = (1 to 10).map(i => s"q$i" -> 2.0).toMap
    assert(Bench.regressedKeys(slow2x, prior).isEmpty)
  }

  test("closing-artifact self-defense: a 1.5-boxdrift or min-2-incomplete run is refused") {
    // round-12 finding 2: BENCH_r12 (passes 0, singles 21, boxdrift
    // 1.52) was stamped as the closing number. Each of those conditions
    // must now name the artifact invalid on its own...
    assert(Bench.invalidReason(2, 0, Some(1.5)).exists(_.contains("boxdrift")))
    assert(Bench.invalidReason(0, 21, Some(1.52)).isDefined)
    assert(Bench.invalidReason(0, 0, None).exists(_.contains("passes=0")))
    assert(Bench.invalidReason(2, 3, None).exists(_.contains("singles=3")))
    // ...while a clean min-2 run with tolerable drift stamps normally
    // (no prior => no drift estimate => the drift clause cannot fire)
    assert(Bench.invalidReason(2, 0, Some(1.1)).isEmpty)
    assert(Bench.invalidReason(3, 0, None).isEmpty)
    assert(Bench.invalidReason(2, 0, Some(Bench.MaxCleanDrift)).isEmpty)
  }

  test("priorUsable: invalid or passes<2 artifacts never arm the gate; pre-flag artifacts do") {
    // self-marked invalid (raw line or driver-wrapper escaping)
    assert(!Bench.priorUsable("""{"passes":3,"invalid":true,"queries":{}}"""))
    assert(!Bench.priorUsable("""{"tail": "{\"passes\":3,\"invalid\":true}"}"""))
    // BENCH_r12's shape: passes 0 — contention garbage, skip it
    assert(!Bench.priorUsable("""{"metric":"total","passes":0,"queries":{"q1":19.8}}"""))
    assert(!Bench.priorUsable("""{"tail": "{\"passes\":2}\n{\"passes\":0}"}""")) // last emit wins
    // clean min-2 artifact arms; artifacts predating the field are trusted
    assert(Bench.priorUsable("""{"metric":"total","passes":2,"queries":{"q1":0.2}}"""))
    assert(Bench.priorUsable("""{"metric":"total","queries":{"q1":0.2}}"""))
  }

  test("priorUsable: single-run minima (singles>0) never arm the gate (round-13 ADVICE)") {
    // passes>=2 but singles>0: min-of-1 cold times present — invalidReason
    // refuses to stamp such a run, so the gate must refuse to trust one
    assert(!Bench.priorUsable(
      """{"metric":"total","passes":2,"singles":15,"queries":{"q1":0.2}}"""))
    assert(!Bench.priorUsable("""{"tail": "{\"passes\":2,\"singles\":1}"}"""))
    // singles==0 arms; artifacts predating the singles field are trusted
    assert(Bench.priorUsable(
      """{"metric":"total","passes":2,"singles":0,"queries":{"q1":0.2}}"""))
    // last emit wins, same as passes
    assert(!Bench.priorUsable("""{"tail": "{\"singles\":0}\n{\"singles\":3}"}"""))
  }

  test("invalidReason formats drift with Locale.ROOT (round-13 ADVICE)") {
    val dfltLocale = java.util.Locale.getDefault
    java.util.Locale.setDefault(java.util.Locale.GERMANY) // comma-decimal
    try {
      val r = Bench.invalidReason(2, 0, Some(1.52))
      assert(r.contains("boxdrift 1.520 exceeds 1.25"))
    } finally java.util.Locale.setDefault(dfltLocale)
  }

  test("localEmitTarget: a narrow or invalid run cannot displace a graded-clean closing artifact") {
    def line(keys: Int, invalid: Boolean = false, sf: String = "/root/testdata/sf0.1",
             singles: Int = 0): String = {
      val qs = (1 to keys).map(i => s""""q$i":0.5""").mkString(",")
      val inv = if (invalid) ""","invalid":true,"invalid_reason":"boxdrift"""" else ""
      s"""{"metric":"total","value":1.0,"passes":2,"singles":$singles$inv,"queries":{$qs},"sf":"$sf"}"""
    }
    val clean193 = line(193)
    // the round-13 failure, byte for byte: a 3-key spot-run (itself
    // invalid) must land in BENCH_SPOT.json, keeping the closing artifact
    assert(Bench.localEmitTarget(line(3, invalid = true), Some(clean193))
      == "BENCH_SPOT.json")
    // ...and even a CLEAN narrow run is a spot-run, not a closing number
    assert(Bench.localEmitTarget(line(3), Some(clean193)) == "BENCH_SPOT.json")
    // an invalid full-width run still must not displace a clean artifact
    assert(Bench.localEmitTarget(line(193, invalid = true), Some(clean193))
      == "BENCH_SPOT.json")
    // a clean singles>0 run is not clean either (min-of-1 upper bounds)
    assert(Bench.localEmitTarget(line(193, singles = 2), Some(clean193))
      == "BENCH_SPOT.json")
    // a clean dev run at ANOTHER SF must not displace the sf0.1 closing one
    assert(Bench.localEmitTarget(line(193, sf = "/root/testdata/sf0.01"),
      Some(clean193)) == "BENCH_SPOT.json")
    // a clean, same-SF, wider-or-equal run IS the new closing artifact
    assert(Bench.localEmitTarget(line(193), Some(clean193)) == "BENCH_LOCAL.json")
    assert(Bench.localEmitTarget(line(195), Some(clean193)) == "BENCH_LOCAL.json")
    // no existing artifact, or a dirty one: write freely
    assert(Bench.localEmitTarget(line(3), None) == "BENCH_LOCAL.json")
    assert(Bench.localEmitTarget(line(3), Some(line(193, invalid = true)))
      == "BENCH_LOCAL.json")
    // operator override wins unconditionally
    assert(Bench.localEmitTarget(line(3, invalid = true), Some(clean193),
      force = true) == "BENCH_LOCAL.json")
    // a clean existing artifact PREDATING the sf field is trusted as
    // same-scale (round-14 ADVICE: strict Option equality made a
    // legacy artifact unreplaceable by any clean full-width run)
    val legacyNoSf = clean193.replaceAll(""","sf":"[^"]*"""", "")
    assert(!legacyNoSf.contains("\"sf\""))
    assert(Bench.localEmitTarget(line(193), Some(legacyNoSf))
      == "BENCH_LOCAL.json")
    // ...while a narrow run still cannot displace it
    assert(Bench.localEmitTarget(line(3), Some(legacyNoSf))
      == "BENCH_SPOT.json")
  }

  test("contentionVerdict: the round-14 spiral trips the fast-abort, cold passes and narrow runs do not") {
    val prior = (1 to 50).map(i => s"q$i" -> 1.0).toMap
    def mins(ratio: Double, n: Int = 50): Map[String, Double] =
      (1 to n).map(i => s"q$i" -> ratio).toMap

    // NO verdict before one completed pass, however loud the numbers:
    // round 15 measured a CALM box's first 16 entries at median 4.14x
    // their min-of-3 priors (pure JVM/page-cache warm-up — the same
    // run's complete pass read 1.04x), and the round-15 mid-pass-0
    // probe turned that into a self-abort that cost the whole run
    assert(Bench.contentionVerdict(mins(5.0), prior, passesDone = 0).isEmpty)
    // the round-14 driver window, in miniature: untouched keys reading
    // many-x after a full pass — catastrophic, abort
    assert(Bench.contentionVerdict(mins(5.0), prior, passesDone = 1).isDefined)
    // ...but a pass-1-only verdict needs a WARM pass: a short subset
    // run finishes its whole first pass inside JVM warm-up (measured
    // median 2.65x over a calm 16-entry BENCH_ONLY pass), so under
    // MinWarmPassSec there is no verdict yet — pass 2's min-of-2
    // coverage takes over from there at the MaxCleanDrift bar
    assert(Bench.contentionVerdict(mins(5.0), prior, passesDone = 1,
      measuredWallSec = 60.0).isEmpty)
    assert(Bench.contentionVerdict(mins(5.0), prior, passesDone = 1,
      measuredWallSec = 600.0).isDefined)
    assert(Bench.contentionVerdict(mins(5.0), prior, passesDone = 2,
      measuredWallSec = 60.0).isDefined)
    // a COLD first pass (~1.3x median) must NOT abort — min-of-2 absorbs it
    assert(Bench.contentionVerdict(mins(1.3), prior, passesDone = 1).isEmpty)
    // ...but the same drift AFTER min-2 coverage means the window is
    // lost: the artifact could never grade clean, so stop spending
    assert(Bench.contentionVerdict(mins(1.3), prior, passesDone = 2).isDefined)
    // a clean run never aborts at any pass count
    assert(Bench.contentionVerdict(mins(1.05), prior, passesDone = 3).isEmpty)
    // too few shared keys (narrow BENCH_ONLY run / no prior): no verdict
    assert(Bench.contentionVerdict(mins(5.0, n = 3), prior, passesDone = 2).isEmpty)
    assert(Bench.contentionVerdict(mins(5.0), Map.empty, passesDone = 2).isEmpty)
    // the verdict reason lands in invalid_reason via the aborted param,
    // taking priority so the artifact names WHY it stopped
    val reason = Bench.contentionVerdict(mins(5.0), prior, 1).get
    assert(Bench.invalidReason(3, 0, Some(1.0), Some(reason))
      .exists(r => r.startsWith("contention-abort: ") && r.contains("boxdrift")))
    // Locale-proof formatting (the invalidReason discipline)
    val dflt = java.util.Locale.getDefault
    java.util.Locale.setDefault(java.util.Locale.GERMANY)
    try assert(Bench.contentionVerdict(mins(1.3), prior, 2).get.contains("1.300"))
    finally java.util.Locale.setDefault(dflt)
  }
}
