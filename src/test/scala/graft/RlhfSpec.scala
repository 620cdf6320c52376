package graft

import org.apache.spark.sql.functions._
import graft.llm.Rlhf

/** Semantic properties of the RLHF-stage constructors ([[graft.llm.Rlhf]]):
  * Bradley–Terry recovers planted dominance orders, multiplicative
  * weights shift mass to the hardest domain, group advantages are
  * zero-sum and variance-gated, rejection sampling keeps exactly the
  * top-k with deterministic ties. The queries (q176–q179) pin the
  * fixed-point arithmetic against DuckDB; these pin the SEMANTICS. */
class RlhfSpec extends SparkSpec {
  import spark.implicits._

  test("bradleyTerry: planted dominance chain recovers the order; sweep loser reads 0") {
    // A(1) beats B(2) 3x, B beats C(3) 3x, A beats C 3x; D(4) loses
    // every game it plays. Expect s(A) > s(B) > s(C) > s(D) = 0 and the
    // per-round max-normalization pinning the top item at scale.
    val games = Seq(
      (1L, 2L), (1L, 2L), (1L, 2L),
      (2L, 3L), (2L, 3L), (2L, 3L),
      (1L, 3L), (1L, 3L), (1L, 3L),
      (1L, 4L), (2L, 4L), (3L, 4L)
    ).toDF("winner_id", "loser_id")
    val s = Rlhf.bradleyTerry(games, iters = 8)
      .as[(Long, Long)].collect().toMap
    assert(s(1L) == 1000000L, "undefeated top item must sit at scale")
    assert(s(1L) > s(2L) && s(2L) > s(3L) && s(3L) > s(4L))
    assert(s(4L) == 0L, "an all-loser's MM numerator is 0 wins")
  }

  test("bradleyTerry: symmetric records tie; result is deterministic across runs") {
    // A and B split 2-2: identical sufficient statistics, equal scores.
    val games = Seq((1L, 2L), (1L, 2L), (2L, 1L), (2L, 1L))
      .toDF("winner_id", "loser_id")
    val r1 = Rlhf.bradleyTerry(games, iters = 8).as[(Long, Long)].collect().toMap
    val r2 = Rlhf.bradleyTerry(games, iters = 8).as[(Long, Long)].collect().toMap
    assert(r1 == r2)
    assert(r1(1L) == r1(2L), "symmetric record must score equal")
  }

  test("domainMixtureMW: mass shifts to the hardest domain; uniform losses stay uniform") {
    // mid must START above the uniform mixture mean (533k) to ever see
    // positive excess — the mean only rises as hard gains weight
    val dl = Seq(("easy", 100000L), ("mid", 600000L), ("hard", 900000L))
      .toDF("domain", "loss_ppm")
    val w = Rlhf.domainMixtureMW(dl, iters = 10, etaPpm = 300000L)
      .select("domain", "weight_ppm").as[(String, Long)].collect().toMap
    assert(w("hard") > w("mid") && w("mid") > w("easy"))
    assert(w.values.sum <= 1000000L, "shares are floor-divided ppm")
    val flat = Seq(("a", 400000L), ("b", 400000L), ("c", 400000L))
      .toDF("domain", "loss_ppm")
    val wf = Rlhf.domainMixtureMW(flat, iters = 10)
      .select("domain", "weight_ppm").as[(String, Long)].collect().toMap
    assert(wf.values.toSet.size == 1, "no excess anywhere -> weights stay equal")
  }

  test("groupAdvantages: zero-sum per group, zero-variance groups dropped whole") {
    val rows = Seq(
      ("g1", 1L, 100L), ("g1", 2L, 300L), ("g1", 3L, 200L),
      ("g2", 4L, 500L), ("g2", 5L, 500L) // zero variance -> dropped
    ).toDF("group_id", "item_id", "reward_ppm")
    val out = Rlhf.groupAdvantages(rows)
      .select("group_id", "item_id", "adv_scaled")
      .as[(String, Long, Long)].collect()
    assert(out.forall(_._1 == "g1"), "zero-variance group must vanish")
    assert(out.map(_._3).sum == 0L, "n*(r - mean) sums to 0 per group")
    // best response carries the largest advantage
    assert(out.maxBy(_._3)._2 == 2L)
  }

  test("rejectionSample: top-k per group, ties to the lower id, variance gate") {
    val rows = Seq(
      ("g1", 1L, 100L), ("g1", 2L, 900L), ("g1", 3L, 900L), ("g1", 4L, 50L),
      ("g2", 5L, 7L), ("g2", 6L, 7L) // zero variance -> dropped
    ).toDF("group_id", "item_id", "reward_ppm")
    val out = Rlhf.rejectionSample(rows, k = 2)
      .select("group_id", "item_id", "rnk")
      .as[(String, Long, Long)].collect().sortBy(_._3)
    assert(out.map(_._1).forall(_ == "g1"))
    assert(out.toSeq == Seq(("g1", 2L, 1L), ("g1", 3L, 2L)),
      "equal rewards must rank by ascending item id")
  }

  test("btState fold == one-shot fit; a replayed batch double-counts additively") {
    val b1 = Seq((1L, 2L), (1L, 2L), (2L, 3L), (1L, 4L))
      .toDF("winner_id", "loser_id")
    val b2 = Seq((1L, 2L), (3L, 2L), (2L, 4L), (3L, 4L))
      .toDF("winner_id", "loser_id")
    // fold of the two batch states must fit bit-identically to the
    // one-shot fit of the concatenated history — including the (1,2)
    // pair whose games span both batches
    val oneShot = Rlhf.bradleyTerry(b1.unionAll(b2), iters = 8)
      .as[(Long, Long)].collect().toMap
    val folded = Rlhf.fitFromState(
        Rlhf.mergeBtState(Seq(Rlhf.btState(b1), Rlhf.btState(b2))), iters = 8)
      .as[(Long, Long)].collect().toMap
    assert(folded == oneShot, "state fold must equal the one-shot fit")
    // replayed batch: merging b1's state twice == state of b1 ++ b1
    // (pure additive statistic — games and wins_lo both double)
    val replayed = Rlhf.mergeBtState(Seq(Rlhf.btState(b1), Rlhf.btState(b1)))
      .as[(Long, Long, Long, Long)].collect().toSet
    val doubled = Rlhf.btState(b1.unionAll(b1))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(replayed == doubled)
  }

  test("klBestOfN: the KL penalty can flip the winner; every group emits; ties deterministic") {
    val rows = Seq(
      // g1: item 1 has the best raw reward but a huge KL penalty —
      // at beta=0.5 its objective (900k - 450k) loses to item 2's
      // (800k - 25k); plain rejection sampling would pick item 1
      ("g1", 1L, 900000L, 900000L), ("g1", 2L, 800000L, 50000L),
      // g2: zero variance everywhere — best-of-n still picks (lower id)
      ("g2", 3L, 5L, 0L), ("g2", 4L, 5L, 0L)
    ).toDF("group_id", "item_id", "reward_ppm", "kl_ppm")
    val out = Rlhf.klBestOfN(rows, betaPpm = 500000L, k = 1)
      .select("group_id", "item_id", "obj_ppm")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(("g1", 2L, 775000L), ("g2", 3L, 5L)))
    // beta=0 degenerates to pure reward argmax
    val raw = Rlhf.klBestOfN(rows, betaPpm = 0L, k = 1)
      .select("group_id", "item_id").as[(String, Long)].collect().toMap
    assert(raw("g1") == 1L)
  }

  test("fitFromState: count-gated local fit == distributed rounds on randomized states") {
    // round-13 judge task 2: small states fit on the driver (the CC
    // maxLocalEdges discipline) — the local BigInt/Long arithmetic
    // must be bit-identical to the distributed MM rounds, not merely
    // close. Seeded random tournaments, several shapes.
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 1 to 4) {
      val nItems = 3 + rnd.nextInt(12)
      val nGames = 5 + rnd.nextInt(60)
      val games = Seq.fill(nGames) {
        val a = 1L + rnd.nextInt(nItems)
        var b = 1L + rnd.nextInt(nItems)
        while (b == a) b = 1L + rnd.nextInt(nItems)
        (a, b)
      }.toDF("winner_id", "loser_id")
      val state = Rlhf.btState(games)
      val local = Rlhf.fitFromState(state, iters = 8)
        .as[(Long, Long)].collect().toMap
      val dist = Rlhf.fitFromState(state, iters = 8, maxLocalPairs = 0)
        .as[(Long, Long)].collect().toMap
      assert(local == dist, s"trial $trial: local fit diverged from distributed")
    }
  }

  test("domainMixtureMW: count-gated local MW == distributed rounds on randomized losses") {
    val rnd = new scala.util.Random(43L)
    for (trial <- 1 to 4) {
      val dl = (1 to (2 + rnd.nextInt(10)))
        .map(i => (s"d$i", rnd.nextLong(1000001L))).toDF("domain", "loss_ppm")
      val local = Rlhf.domainMixtureMW(dl, iters = 10, etaPpm = 300000L)
        .as[(String, Long, Long)].collect().toSet
      val dist = Rlhf.domainMixtureMW(dl, iters = 10, etaPpm = 300000L,
          maxLocalDomains = 0)
        .as[(String, Long, Long)].collect().toSet
      assert(local == dist, s"trial $trial: local MW diverged from distributed")
    }
  }
}
