package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY §2.9: the reference is batch-
  * only, but its per-day fold is exactly a daily-tumbling-window
  * stream; this module is the capability-growth path).
  *
  * Batch/stream parity: `windowedAgg` is the streaming twin of
  * queries.Events.evWindowAgg — same window/agg expressions, plus a
  * watermark for state eviction. At scale the watermark bounds state:
  * without it a 100 TB/day stream accumulates windows forever.
  */
object EventStream {

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** Tumbling 5-minute counts/sums per event type with a watermark;
    * works on both `readStream` and batch frames (same plan). */
  def windowedAgg(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Stream-static enrichment join: every micro-batch joins against
    * the (re-read) static dimension — broadcast, so the stream side
    * never shuffles and the join adds no state. The streaming twin of
    * the pipeline's catalog joins; at scale the dim table re-resolves
    * per batch, which is exactly how slowly-changing dimensions pick
    * up updates without restarting the query. */
  def enrichWithDim(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Stream-stream interval join: clicks attributed to the view they
    * followed within `within`, per user. BOTH sides carry watermarks
    * and the join condition bounds click_ts relative to view_ts, so
    * the state store evicts rows once the watermark passes the
    * interval — the two requirements without which a stream-stream
    * join grows state forever. Inner joins emit eagerly as matches
    * arrive (no watermark wait). */
  def viewClickJoin(views: DataFrame, clicks: DataFrame,
                    within: String = "10 minutes"): DataFrame = {
    val v = views.withWatermark("ts", within)
      .select(col("user_id"), col("ts").as("view_ts"), col("event_id").as("view_id"))
    val c = clicks.withWatermark("ts", within)
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    v.join(c,
      col("user_id") === col("c_user")
        && col("click_ts") >= col("view_ts")
        && col("click_ts") <= col("view_ts") + expr(s"INTERVAL $within"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
  }

  /** Streaming exact dedup: drop re-deliveries of the same event id
    * arriving within the watermark horizon (the streaming twin of
    * operators.Dedup.exact — state is bounded by the watermark, the
    * non-negotiable ingredient for at-least-once sources at scale). */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  final case class SessionState(
      sessionId: Long, startUs: Long, lastUs: Long, nEvents: Long)
  final case class SessionOut(
      user_id: Long, session_id: Long, n_events: Long, start_us: Long, end_us: Long)

  /** Gap-based sessionization with explicit state
    * (`flatMapGroupsWithState`): closes a session when the gap
    * between consecutive events for a user exceeds `gapUs`, or when
    * the event-time timeout fires (watermark passed the gap horizon —
    * bounded state at scale). Emits closed sessions only (Append). */
  def sessionize(events: Dataset[Event], gapUs: Long = 30L * 60 * 1000000L,
                 watermark: String = "1 hour"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._

    def update(userId: Long, it: Iterator[Event],
               state: GroupState[SessionState]): Iterator[SessionOut] = {
      val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var closed = List.empty[SessionOut]

      if (sorted.isEmpty) {
        // timeout fired: flush the open session
        val out = state.getOption.map(s =>
          SessionOut(userId, s.sessionId, s.nEvents, s.startUs, s.lastUs))
        state.remove()
        return out.iterator
      }

      var cur = state.getOption
      sorted.foreach { e =>
        val us = e.ts.getTime * 1000L
        cur match {
          case Some(s) if us - s.lastUs <= gapUs =>
            cur = Some(s.copy(lastUs = math.max(s.lastUs, us), nEvents = s.nEvents + 1))
          case Some(s) =>
            closed ::= SessionOut(userId, s.sessionId, s.nEvents, s.startUs, s.lastUs)
            cur = Some(SessionState(s.sessionId + 1, us, us, 1))
          case None =>
            cur = Some(SessionState(1, us, us, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.lastUs / 1000L + gapUs / 1000L)
      }
      closed.reverseIterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
