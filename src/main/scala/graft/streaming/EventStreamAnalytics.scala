package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics over the event stream — the Structured Streaming
  * surface beyond the sync pipeline: watermarked windowed aggregation and
  * custom per-key state (flatMapGroupsWithState).
  *
  * Both operators work identically on a batch DataFrame (Spark's unified
  * model), which is how the specs drive them deterministically.
  */
object EventStreamAnalytics {

  /** Watermarked tumbling-window aggregate: events per (window, type)
    * with value totals in exact cents. Late data beyond the watermark is
    * dropped by the engine; with the sync pipeline's guarded merge the
    * two compose into at-least-once end-to-end. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * lit(100.0)).cast("long")).as("value_cents"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("value_cents"))

  /** Hourly ANOMALY metric: each (event_type, hour)'s count relative to
    * its own trailing-24-row mean, as exact integer ppm — dev_ppm far
    * from 1e6 flags spikes/collapses, the alerting primitive over an
    * event stream. Exactness trick: avg = sum/cnt stays RATIONAL —
    * dev_ppm = n·1e6·cnt DIV sum, no float mean. Rows before any
    * trailing history (cnt = 0) are dropped, and gap hours simply don't
    * produce rows (the trailing frame is the last 24 OBSERVED hours).
    * One aggregate + one partition-keyed window — event_type keys the
    * shuffle, so the hourly table (tiny vs raw events) is the only
    * windowed data at any scale. */
  def trailingDeviation(events: DataFrame, trailingRows: Int = 24): DataFrame = {
    val hourly = events
      .select(col("event_type"), expr("ts_ns DIV 3600000000000").as("hour"))
      .groupBy("event_type", "hour").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("hour")
      .rowsBetween(-trailingRows, -1)
    hourly
      .withColumn("t_sum", sum("n").over(w))
      .withColumn("t_cnt", count(lit(1)).over(w))
      .filter(col("t_cnt") > 0)
      .withColumn("dev_ppm", expr("n * 1000000 * t_cnt DIV t_sum"))
      .select("event_type", "hour", "n", "dev_ppm")
  }

  /** At-least-once delivery → at-most-once processing per event id:
    * drop replayed webhook deliveries within the watermark horizon.
    * SURVEY §2.6 notes the reference does NOT dedup event ids (its
    * `events` table is never written, §1.2) — replays are only absorbed
    * row-wise by the LWW guard; this operator closes that gap ahead of
    * the merge. State is bounded by the watermark, so it holds on
    * unbounded streams (the 100 TB path: state size ∝ events per
    * watermark window, not stream length). */
  def dedupEvents(events: DataFrame, idCol: String = "event_id",
                  tsCol: String = "ts", watermark: String = "2 hours"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCol)

  /** STREAMING funnel — q81's conversion predicate (purchase with a
    * same-user view in the preceding `windowStr`) as a stream-stream
    * interval LEFT SEMI join with watermarks on both sides: the
    * canonical Structured Streaming form. State per side is bounded by
    * the watermark + join window (the engine drops view state once no
    * future purchase can reach it, and filters input rows older than
    * the watermark — late data beyond it is DROPPED, late data within
    * it still converts, in whichever micro-batch completes the pair).
    * Emits conversions (user_id, event_id, p_ts) append-only; the
    * per-user totals of the batch twin are a downstream aggregate (or
    * the batch query itself over the sink — the unified-model point). */
  def streamingFunnel(events: DataFrame, windowStr: String = "1 hour",
                      watermark: String = "2 hours"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    purchases.join(views,
      col("user_id") === col("v_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr(s"INTERVAL $windowStr"),
      "left_semi")
  }

  case class RetEv(user_id: Long, ts_us: Long)
  case class RetState(w0: Long, weeks: Set[Long])
  case class RetRow(user_id: Long, week: Long, cohort_week: Long, week_offset: Long)

  private val WeekUs = 604800000000L

  /** STREAMING retention — q82's cohort arithmetic as per-user custom
    * state (mapGroupsWithState family): state = (first week w0, seen
    * weeks), output = DELTA rows (user_id, week, cohort_week,
    * week_offset), last-write-wins per (user_id, week) — the same
    * merge philosophy as the sync engine's sink. Out-of-order events
    * are handled EXACTLY: a late event from an earlier week shifts the
    * user's cohort, and the operator re-emits every seen week with the
    * corrected (cohort_week, week_offset), which LWW then supersedes —
    * so the folded output equals the batch q82 input whatever the
    * arrival order (spec-proven). Replays emit nothing (idempotent).
    * State per user is one long + the distinct-week set — bounded by
    * product-lifetime weeks, not event count; cohort counts per
    * (cohort_week, week_offset) are a downstream aggregate over the
    * folded rows. */
  def retentionDeltas(events: Dataset[RetEv]): Dataset[RetRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[RetState, RetRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[RetEv], state: GroupState[RetState]) =>
          val incoming = rows.map(e => e.ts_us / WeekUs).toSet
          val st = state.getOption.getOrElse(RetState(Long.MaxValue, Set.empty))
          val weeks = st.weeks ++ incoming
          val w0 =
            if (incoming.isEmpty) st.w0
            else math.min(st.w0, incoming.min)
          state.update(RetState(w0, weeks))
          // cohort shift rewrites every prior row; otherwise only the
          // genuinely new weeks emit
          val emit = if (w0 != st.w0) weeks else incoming -- st.weeks
          emit.toSeq.sorted.map(w => RetRow(uid, w, w0, w - w0)).iterator
      }
  }

  case class Ev(user_id: Long, ts_ns: Long, value: Double)
  case class SessionState(start_ns: Long, last_ns: Long, n: Int, total: Double)
  case class Session(user_id: Long, start_ns: Long, end_ns: Long, n_events: Int,
                     total_value: Double)

  /** Custom per-key state: gap-based sessionization with
    * flatMapGroupsWithState — emits a Session row whenever a user goes
    * quiet for longer than `gapNs`. State is one small struct per key;
    * the shuffle is the groupByKey on user_id. */
  def sessionize(events: Dataset[Ev], gapNs: Long = 3600L * 1000000000L)
      : Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Ev], state: GroupState[SessionState]) =>
          // batch-mode friendly: fold the (unordered) group in ts order
          val sorted = rows.toSeq.sortBy(_.ts_ns)
          val out = scala.collection.mutable.ArrayBuffer[Session]()
          var st = state.getOption
          sorted.foreach { e =>
            st match {
              case Some(s) if e.ts_ns - s.last_ns <= gapNs =>
                st = Some(s.copy(last_ns = e.ts_ns, n = s.n + 1,
                  total = s.total + e.value))
              case Some(s) =>
                out += Session(userId, s.start_ns, s.last_ns, s.n, s.total)
                st = Some(SessionState(e.ts_ns, e.ts_ns, 1, e.value))
              case None =>
                st = Some(SessionState(e.ts_ns, e.ts_ns, 1, e.value))
            }
          }
          st.foreach(state.update)
          out.iterator
      }
  }
}
