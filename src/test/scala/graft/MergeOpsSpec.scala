package graft

import graft.operators.MergeOps

/** LWW merge invariants — the property the reference only spot-checks
  * (webhooks.test.ts:202-284): the final state is independent of event
  * arrival order and of duplicate delivery, and same-timestamp replays
  * never overwrite (strict `<`, postgres.ts:203). Property-style with a
  * seeded generator (the scalacheck-scalatest bridge isn't on the
  * offline classpath). */
class MergeOpsSpec extends SparkSpec {
  import spark.implicits._

  test("lwwLatest is permutation- and duplication-invariant (20 seeded trials)") {
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { _ =>
      val base = Seq.fill(12)((
        Seq("a", "b", "c")(rnd.nextInt(3)),
        (1 + rnd.nextInt(5)).toLong,
        rnd.nextInt(100))).distinct
      val shuffled = rnd.shuffle(base) ++ base.take(3)
      def state(xs: Seq[(String, Long, Int)]) =
        MergeOps.lwwLatest(xs.toDF("id", "ts", "v"), Seq("id"), Seq("ts", "v"))
          .select("id", "ts", "v").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
          .sortBy(_._1).toSeq
      assert(state(base) == state(shuffled))
    }
  }

  test("mergeGuarded applies strictly-newer rows only") {
    val target = Seq(("a", 5L, "old"), ("b", 5L, "old")).toDF("id", "ts", "v")
    val source = Seq(("a", 6L, "new"), ("b", 5L, "same-ts"), ("c", 1L, "insert"))
      .toDF("id", "ts", "v")
    val out = MergeOps.mergeGuarded(target, source, "id", "ts")
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(out == Map("a" -> "new", "b" -> "old", "c" -> "insert"))
  }

  test("mergeGuarded is idempotent (replaying the same batch is a no-op)") {
    val target = Seq(("a", 5L, "x")).toDF("id", "ts", "v")
    val src = Seq(("a", 7L, "y"), ("b", 2L, "z")).toDF("id", "ts", "v")
    val once = MergeOps.mergeGuarded(target, src, "id", "ts")
    val twice = MergeOps.mergeGuarded(once, src, "id", "ts")
    assert(once.orderBy("id").collect().toSeq == twice.orderBy("id").collect().toSeq)
  }

  test("missingKeys = candidate ids absent from table (J1)") {
    val cands = Seq(("x", 1), ("y", 2), ("z", 3), ("x", 4), (null, 5))
      .toDF("fk", "n")
    val table = Seq("x").toDF("id")
    val missing = MergeOps.missingKeys(cands, "fk", table, "id")
      .as[String].collect().sorted
    assert(missing.toSeq == Seq("y", "z"))
  }

  test("setDiffDelete keeps only vanished rows (J3/J4)") {
    val existing = Seq(("i1", "s1"), ("i2", "s1"), ("i3", "s1")).toDF("id", "sub")
    val current = Seq("i2").toDF("id")
    val gone = MergeOps.setDiffDelete(existing, current, "id")
      .select("id").as[String].collect().sorted
    assert(gone.toSeq == Seq("i1", "i3"))
  }
}
