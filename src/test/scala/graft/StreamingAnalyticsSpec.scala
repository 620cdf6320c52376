package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreamAnalytics
import graft.streaming.EventStreamAnalytics.{Ev, Session}

class StreamingAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("windowed counts with watermark run as a real stream and match the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val q = EventStreamAnalytics.windowedCounts(df, "1 hour", "2 hours")
      .writeStream.outputMode("complete").format("memory")
      .queryName("win_counts").start()
    def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    input.addData((t(0, 10), "click", 1.0), (t(0, 50), "click", 2.0),
      (t(1, 5), "view", 3.0))
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.sql("SELECT * FROM win_counts ORDER BY win_start, event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(streamed.toSeq == Seq(
      (t(0, 0), "click", 2L, 300L),
      (t(1, 0), "view", 1L, 300L)))
  }

  test("dedupEvents drops replayed deliveries within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val df = input.toDF().toDF("event_id", "ts", "event_type")
    val q = graft.streaming.EventStreamAnalytics.dedupEvents(df)
      .writeStream.outputMode("append").format("memory")
      .queryName("deduped").start()
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    input.addData((1L, t(1), "click"), (1L, t(1), "click"), (2L, t(2), "view"))
    input.addData((1L, t(1), "click"), (3L, t(3), "click")) // replay of 1 + new
    try q.processAllAvailable() finally q.stop()
    val ids = spark.sql("SELECT event_id FROM deduped ORDER BY event_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(1L, 2L, 3L))
  }

  test("flatMapGroupsWithState sessionization emits closed sessions on gap") {
    val hour = 3600L * 1000000000L
    val evs = Seq(
      Ev(1L, 0L, 1.0), Ev(1L, hour / 2, 2.0),          // session 1
      Ev(1L, 3 * hour, 5.0),                           // gap > 1h → session 2 (open)
      Ev(2L, 0L, 9.0)).toDS()                          // user 2 (open)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreamAnalytics.sessionize(input.toDS(), gapNs = hour)
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions").start()
    input.addData(Ev(1L, 0L, 1.0), Ev(1L, hour / 2, 2.0))
    input.addData(Ev(1L, 3 * hour, 5.0)) // closes session 1
    try q.processAllAvailable() finally q.stop()
    val closed = spark.sql("SELECT * FROM sessions").as[Session].collect()
    assert(closed.toSeq == Seq(Session(1L, 0L, hour / 2, 2, 3.0)))
  }

  test("streaming funnel converts in-window pairs, handles out-of-order, drops too-late data") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String, Long)]
    val df = input.toDF().toDF("user_id", "ts", "event_type", "event_id")
    val q = EventStreamAnalytics.streamingFunnel(df, "1 hour", "2 hours")
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel").start()
    def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    try {
      // batch 1: user 1 converts (view 0:10 → purchase 0:40); user 2
      // purchases with no view; user 3's view is 90min before purchase
      input.addData(
        (1L, t(0, 10), "view", 10L), (1L, t(0, 40), "purchase", 11L),
        (2L, t(0, 5), "purchase", 20L),
        (3L, t(1, 0), "view", 30L), (3L, t(2, 30), "purchase", 31L))
      q.processAllAvailable()
      // batch 2: purchase arrives BEFORE its view (out of order across
      // batches, both within the watermark)
      input.addData((4L, t(0, 50), "purchase", 41L))
      q.processAllAvailable()
      input.addData((4L, t(0, 20), "view", 40L))
      q.processAllAvailable()
      // batch 3: advance event time to 10:00 on BOTH sides (the join's
      // watermark is the min across sides) → horizon ≈ 8:00; user 9's
      // same-instant pair converts
      input.addData((9L, t(10, 0), "view", 90L), (9L, t(10, 0), "purchase", 91L))
      q.processAllAvailable()
      // batch 4: a pair 7+ hours older than the horizon is dropped
      input.addData((5L, t(0, 30), "view", 50L), (5L, t(0, 45), "purchase", 51L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.sql("SELECT user_id, event_id FROM funnel ORDER BY user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 11L), (4L, 41L), (9L, 91L)))
  }

  test("streaming retention deltas fold (LWW) to the batch cohort rows under out-of-order arrival") {
    import EventStreamAnalytics.{RetEv, RetRow}
    val wk = 604800000000L // µs per week
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RetEv]
    val q = EventStreamAnalytics.retentionDeltas(input.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName("retention").start()
    try {
      // user 1 seen in weeks 5 and 6; user 2 in week 5
      input.addData(RetEv(1L, 5 * wk + 7), RetEv(1L, 6 * wk + 11), RetEv(2L, 5 * wk))
      q.processAllAvailable()
      // replay of week 5 for user 1: no new rows (idempotent)
      input.addData(RetEv(1L, 5 * wk + 99))
      q.processAllAvailable()
      val afterReplay = spark.sql("SELECT count(*) FROM retention").head().getLong(0)
      // LATE event: user 1 turns out to have been active in week 3 →
      // cohort shifts, all rows re-emitted with corrected offsets
      input.addData(RetEv(1L, 3 * wk + 1))
      q.processAllAvailable()
      val total = spark.sql("SELECT count(*) FROM retention").head().getLong(0)
      assert(total == afterReplay + 3) // weeks 3,5,6 rewritten
    } finally q.stop()
    // fold deltas per (user, week): a user's cohort only ever DECREASES
    // (min week is monotone under new data), so the current row is the
    // one with the smallest cohort_week — an order-free LWW fold. Must
    // equal the batch q82 arithmetic over the full event set.
    val folded = spark.sql(
      """SELECT user_id, week, min(cohort_week) AS cohort_week,
        |       week - min(cohort_week) AS week_offset
        |FROM retention GROUP BY user_id, week ORDER BY user_id, week""".stripMargin)
      .as[RetRow].collect().toSeq
    assert(folded == Seq(
      RetRow(1L, 3L, 3L, 0L), RetRow(1L, 5L, 3L, 2L), RetRow(1L, 6L, 3L, 3L),
      RetRow(2L, 5L, 5L, 0L)))
  }

  test("ivfKnn finds the identical vector and stays deterministic") {
    val vecs = (0L until 60L).map { i =>
      (i, Array.tabulate(8)(d => math.cos(i * 3.0 + d * 0.7).toFloat))
    } :+ (60L, Array.tabulate(8)(d => math.cos(17 * 3.0 + d * 0.7).toFloat)) // clone of 17
    val df = vecs.toDF("vec_id", "embedding")
    val out = graft.llm.Similarity.ivfKnn(df, df.filter(col("vec_id") === 60), k = 3,
      nLists = 8, nProbe = 3).collect()
    assert(out.nonEmpty)
    assert(out.head.getAs[Long]("neighbor_id") == 17L) // exact clone ranked first
    val again = graft.llm.Similarity.ivfKnn(df, df.filter(col("vec_id") === 60), k = 3,
      nLists = 8, nProbe = 3).collect()
    assert(out.toSeq == again.toSeq)
  }

  test("engine functions are SQL-callable (extensions wiring + registry)") {
    // the extensions class applies cleanly to a fresh builder config…
    new graft.plans.GraftExtensions()(new org.apache.spark.sql.SparkSessionExtensions)
    // …and the live-session registration exposes the same functions:
    graft.functions.GraftFunctions.registerAll(spark)
    val hex = spark.sql("SELECT hmac_sha256('a.b', 'k') AS h").head().getString(0)
    assert(hex.matches("[0-9a-f]{64}"))
    // shingle_hashes: integral k works, fractional k ERRORS instead of
    // silently truncating (2.7 must not run as k=2)
    assert(spark.sql("SELECT size(shingle_hashes('a b c d', 3)) AS n")
      .head().getInt(0) == 2)
    val err = intercept[Throwable] {
      spark.sql("SELECT shingle_hashes('a b c d', 2.7)").collect()
    }
    val chain = Iterator.iterate(err)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("integral"), s"unexpected error: $chain")
  }
}
