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

  test("regressedKeys flags >factor regressions only, sorted; new keys never flag") {
    val prior = Map("q1" -> 1.0, "q2" -> 2.0, "q3" -> 0.5, "qz" -> 0.0)
    val current = Map(
      "q1" -> 1.49,  // within 1.5x: fine
      "q2" -> 3.01,  // just over 1.5x: flag
      "q3" -> 5.0,   // 10x: flag
      "q9" -> 99.0,  // new entry, no prior: never flags
      "qz" -> 1.0)   // zero prior: never flags (division guard)
    assert(Bench.regressedKeys(current, prior) == Seq("q2", "q3"))
    // a looser factor clears the marginal one
    assert(Bench.regressedKeys(current, prior, factor = 4.0) == Seq("q3"))
    // empty prior disarms
    assert(Bench.regressedKeys(current, Map.empty).isEmpty)
  }
}
