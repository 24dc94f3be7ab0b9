package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.LongType

/** One event on the stream (mirrors the `events` table shape). */
final case class StreamEvent(
    ts: Timestamp,
    user_id: Long,
    event_type: String,
    value: Double)

/** Output of watermarked windowed aggregation. */
final case class WindowedCounts(
    window_start: Timestamp,
    window_end: Timestamp,
    event_type: String,
    n_events: Long,
    sum_value: Double)

/** A closed user session from stateful sessionization. */
final case class UserSession(
    user_id: Long,
    session_start: Timestamp,
    session_end: Timestamp,
    n_events: Long,
    sum_value: Double)

private final case class SessionState(
    start: Long, last: Long, n: Long, sum: Double)

/**
 * Structured Streaming operators (beyond the reference, which is
 * batch-only — SURVEY.md §2.6): the two canonical stateful shapes a
 * training-data ingest pipeline needs.
 *
 * Both are pure stream transforms: callers plug in any streaming source
 * (`readStream` kafka/file/rate) and any sink. State is partitioned by
 * group key, so at cluster scale each executor holds a shard of the
 * state store and watermarks bound its size.
 */
object StreamingOps {

  /**
   * Tumbling-window counts per event type with a watermark: late events
   * beyond `watermarkDelay` are dropped, which bounds state and makes the
   * aggregation emittable in append mode.
   */
  def windowedEventCounts(
      events: Dataset[StreamEvent],
      watermarkDelay: String = "10 minutes",
      windowLength: String = "1 hour"): DataFrame =
    events.toDF()
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      // decimal accumulation: the double sum is then independent of
      // per-partition accumulation order (and bit-equal to a batch run —
      // the oracle twin relies on this)
      .agg(count(lit(1)).cast(LongType).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(28, 6)))
          .cast(org.apache.spark.sql.types.DoubleType).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /**
   * Stream-stream inner join with watermarks and a time-range condition
   * (the click-attribution shape): each `lead` event pairs with every
   * `follow` event of the same user landing strictly after it and within
   * `maxLag`. The time bound plus the two watermarks is what makes this
   * RUN at scale: Spark derives a state-eviction horizon from them, so a
   * buffered lead row is dropped once the follow side's watermark passes
   * `lead.ts + maxLag + delay` — per-side state is bounded by
   * rate × (maxLag + delay) and sharded on the join key across
   * executors, instead of growing with the stream. Matches emit as they
   * are found (append mode); the watermark only governs eviction and
   * late-data drop, so a single-batch replay equals the batch join.
   */
  def attributionJoin(
      lead: Dataset[StreamEvent],
      follow: Dataset[StreamEvent],
      maxLag: String = "24 hours",
      watermarkDelay: String = "1 hour"): DataFrame = {
    val l = lead.toDF().withWatermark("ts", watermarkDelay)
      .select(col("user_id").as("l_user"), col("ts").as("lead_ts"))
    val f = follow.toDF().withWatermark("ts", watermarkDelay)
      .select(col("user_id").as("f_user"), col("ts").as("follow_ts"))
    l.join(f, expr(
        s"l_user = f_user AND follow_ts > lead_ts" +
          s" AND follow_ts <= lead_ts + interval $maxLag"))
      .select(col("l_user").as("user_id"), col("lead_ts"), col("follow_ts"))
  }

  /**
   * Sessionization via `flatMapGroupsWithState` with EVENT-TIME timeout:
   * a session closes `gapMs` after its last event, measured against the
   * stream's watermark — deterministic, replay-safe, and state-bounded
   * (no processing-time busy polling). Emits one row per closed session.
   */
  def sessionize(
      events: Dataset[StreamEvent],
      gapMs: Long = 30 * 60 * 1000L,
      watermarkDelay: String = "10 minutes"): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[StreamEvent], state: GroupState[SessionState]) =>
          if (!batch.hasNext && state.hasTimedOut) {
            // watermark passed last-event + gap: close and emit
            val s = state.get
            state.remove()
            Iterator.single(UserSession(userId,
              new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum))
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[UserSession]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  // an in-watermark but out-of-order event (t < s.last or
                  // even t < s.start) must never REGRESS the session
                  // bounds — that would split sessions spuriously and
                  // emit a wrong session_end
                  cur = Some(SessionState(math.min(s.start, t),
                    math.max(s.last, t), s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed ::= UserSession(userId,
                    new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // never set a timeout at-or-before the current watermark
              state.setTimeoutTimestamp(
                math.max(s.last + gapMs, state.getCurrentWatermarkMs() + 1000L))
            }
            closed.reverseIterator
          }
      }
  }
}
