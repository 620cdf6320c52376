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
