package graft

import org.apache.spark.sql.functions.{col, lit}
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

  test("mergeGuarded updates a null-timestamp target row (postgres.ts:203 parity)") {
    // a stored row whose ts was nulled by a malformed payload must be
    // repairable by a corrected redelivery — the `t.ts IS NULL` arm of
    // the reference's guard; without it s_ts > NULL is never true and
    // the stale row is immortal on the parquet path
    val target = Seq(("a", null.asInstanceOf[java.lang.Long], "stale"),
      ("b", java.lang.Long.valueOf(9L), "keep")).toDF("id", "ts", "v")
    val source = Seq(("a", 6L, "fixed")).toDF("id", "ts", "v")
    val out = MergeOps.mergeGuarded(target, source, "id", "ts")
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(out == Map("a" -> "fixed", "b" -> "keep"))
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

  test("scd2History: versions chain, intervals tile, one current per key") {
    val changes = Seq(
      ("a", 10L, 1L, "v1"), ("a", 20L, 2L, "v2"), ("a", 20L, 3L, "v3"),
      ("b", 5L, 4L, "w1")).toDF("id", "ts", "seq", "v")
    val hist = MergeOps.scd2History(changes, Seq("id"), "ts", Seq("seq"))
      .orderBy("id", "version").collect()
    // versions 1..n per key, tie at ts=20 broken by seq
    assert(hist.map(r => (r.getString(0), r.getLong(4), r.getString(3))).toSeq ==
      Seq(("a", 1L, "v1"), ("a", 2L, "v2"), ("a", 3L, "v3"), ("b", 1L, "w1")))
    // each valid_to equals the next version's valid_from; last is open
    val a = hist.filter(_.getString(0) == "a")
    assert(a.init.map(r => r.getLong(6)).toSeq ==
      a.tail.map(r => r.getLong(5)).toSeq)
    assert(hist.count(_.getBoolean(7)) == 2)

    // as-of lookup returns exactly one covering version per key
    val at15 = MergeOps.asOfState(
        MergeOps.scd2History(changes, Seq("id"), "ts", Seq("seq")), lit(15L))
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(at15 == Map("a" -> "v1", "b" -> "w1"))
    // the tied pair: only the LAST version at ts=20 covers t=20
    val at20 = MergeOps.asOfState(
        MergeOps.scd2History(changes, Seq("id"), "ts", Seq("seq")), lit(20L))
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(at20 == Map("a" -> "v3", "b" -> "w1"))
  }

  test("scd2Merge converges to one-shot history for any split + redelivery") {
    val rnd = new scala.util.Random(11)
    val changes = (0 until 120).map { i =>
      (s"k${rnd.nextInt(8)}", rnd.nextInt(50).toLong, i.toLong, s"p$i")
    }
    val all = changes.toDF("id", "ts", "seq", "payload")
    val oneShot = MergeOps.scd2History(all, Seq("id"), "ts", Seq("seq"))

    // deliver as 3 out-of-order batches, with batch 1 redelivered
    val batches = changes.grouped(40).toSeq
    val order = Seq(batches(2), batches(0), batches(1), batches(0))
    var hist = MergeOps.scd2HistoryFlagged(
      order.head.toDF("id", "ts", "seq", "payload"), Seq("id"), "ts", Seq("seq"))
    order.tail.foreach { b =>
      hist = MergeOps.scd2Merge(hist,
        b.toDF("id", "ts", "seq", "payload"), Seq("id"), "ts", Seq("seq"))
    }
    val served = hist.filter(col("is_change")).drop("is_change")
    val key = Seq("id", "version")
    assert(served.orderBy(key.map(col): _*).collect().toSeq ==
      oneShot.select(served.columns.map(col).toIndexedSeq: _*)
        .orderBy(key.map(col): _*).collect().toSeq)
  }

  test("mergeGuarded evolves schema across a migration window (DO UPDATE semantics)") {
    // pre-migration store: (id, ts, a). A migration adds column b.
    val target = Seq((1L, 10L, "a1"), (2L, 10L, "a2")).toDF("id", "ts", "a")
    val post = Seq((1L, 20L, "a1v2", "b1"), (3L, 5L, "a3", "b3"))
      .toDF("id", "ts", "a", "b")
    val m1 = MergeOps.mergeGuarded(target, post, "id", "ts")
    val r1 = m1.orderBy("id").as[(Long, Long, String, Option[String])]
      .collect().toSeq
    // widened: winner carries its b, untouched old rows read null
    assert(r1 == Seq((1L, 20L, "a1v2", Some("b1")),
      (2L, 10L, "a2", None), (3L, 5L, "a3", Some("b3"))), r1.toString)
    // an OLD-FORMAT batch after the migration: its newer row wins the
    // columns it carries but CANNOT touch b (Postgres DO UPDATE updates
    // only listed columns — postgres.ts:181-204)
    val old = Seq((1L, 30L, "a1v3")).toDF("id", "ts", "a")
    val m2 = MergeOps.mergeGuarded(m1, old, "id", "ts")
    val row1 = m2.filter(col("id") === 1L)
      .as[(Long, Long, String, Option[String])].head()
    assert(row1 == ((1L, 30L, "a1v3", Some("b1"))),
      s"old-format winner must preserve the column it didn't carry: $row1")
    // a losing old-format row changes nothing
    val m3 = MergeOps.mergeGuarded(m2, Seq((3L, 1L, "zzz")).toDF("id", "ts", "a"),
      "id", "ts")
    assert(m3.filter(col("id") === 3L)
      .as[(Long, Long, String, Option[String])].head() ==
      ((3L, 5L, "a3", Some("b3"))))
  }

  test("scd2Merge folds a migration-added column (null-filled history)") {
    val h0 = MergeOps.scd2HistoryFlagged(
      Seq((1L, 10L, "x")).toDF("id", "ts", "payload"),
      Seq("id"), "ts", Seq("payload"))
    // post-migration batch carries a new content column
    val batch = Seq((1L, 20L, "y", "extra")).toDF("id", "ts", "payload", "b")
    val merged = MergeOps.scd2Merge(h0, batch, Seq("id"), "ts",
      Seq("payload", "b"))
    val served = merged.filter(col("is_change")).orderBy("version")
      .select("ts", "payload", "b").as[(Long, String, Option[String])]
      .collect().toSeq
    // the old version's b is null (honest content), the new one carries it
    assert(served == Seq((10L, "x", None), (20L, "y", Some("extra"))),
      served.toString)
  }

  test("scd2Merge: late change between identical-content rows re-tiles (flagged store)") {
    // A@t1, then a refetch A@t3 with IDENTICAL content (collapsed,
    // is_change=false), then a LATE B@t2 lands between them: A@t3 must
    // become a real change (current=A) — a store that filtered the
    // collapsed row would end current=B, silently serving wrong state.
    // Content column only (no unique tie) so the t3 refetch collapses.
    val b1 = Seq(("k", 1L, "A"), ("k", 3L, "A")).toDF("id", "ts", "payload")
    val late = Seq(("k", 2L, "B")).toDF("id", "ts", "payload")
    val hist0 = MergeOps.scd2HistoryFlagged(b1, Seq("id"), "ts", Seq("payload"))
    // before the late row: one served version, refetch flagged out
    assert(hist0.filter(col("is_change")).count() == 1)
    assert(hist0.count() == 2)
    val merged = MergeOps.scd2Merge(hist0, late, Seq("id"), "ts", Seq("payload"))
      .filter(col("is_change")).drop("is_change")
    val oneShot = MergeOps.scd2History(
      b1.unionByName(late), Seq("id"), "ts", Seq("payload"))
    val cols = merged.columns.toSeq
    assert(merged.orderBy("version").collect().toSeq ==
      oneShot.select(cols.map(col): _*).orderBy("version").collect().toSeq)
    val cur = merged.filter(col("is_current")).collect()
    assert(cur.length == 1 && cur.head.getAs[String]("payload") == "A"
      && cur.head.getAs[Long]("ts") == 3L,
      "late B@t2 must not remain current once A@t3 re-tiles as a change")
    // no-change rows in the flagged store carry EMPTY intervals: asOfState
    // never matches them, so point-in-time reads work unfiltered
    val at = MergeOps.asOfState(
      MergeOps.scd2Merge(hist0, late, Seq("id"), "ts", Seq("payload")), lit(2L))
      .collect()
    assert(at.length == 1 && at.head.getAs[String]("payload") == "B")
  }
}
