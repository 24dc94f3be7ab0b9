package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StreamingOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ev(minute: Int, user: Long, tpe: String, value: Double) =
    StreamEvent(new Timestamp(3600_000L + minute * 60_000L), user, tpe, value)

  test("watermarked windowed aggregation over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val query = StreamingOps
      .windowedEventCounts(input.toDS(), "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        ev(1, 1, "click", 1.0), ev(2, 2, "click", 2.0), ev(3, 1, "view", 3.0),
        ev(12, 1, "click", 4.0))
      query.processAllAvailable()
      // advance watermark far enough to close the first windows
      input.addData(ev(60, 9, "click", 0.0))
      query.processAllAvailable()

      val out = spark.table("win_counts")
        .select("window_start", "event_type", "n_events", "sum_value")
        .collect().map(r => (r.getTimestamp(0).getTime / 60000 % 1440,
          r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(out.contains((60L, "click", 2L, 3.0)), s"got $out") // min 0-10
      assert(out.contains((60L, "view", 1L, 3.0)), s"got $out")
      assert(out.contains((70L, "click", 1L, 4.0)), s"got $out") // min 10-20
    } finally query.stop()
  }

  test("stateful sessionization emits closed sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val query = StreamingOps.sessionize(input.toDS(), gapMs = 5 * 60_000L)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: two sessions in one batch (gap of 20 min closes the first)
      input.addData(
        ev(0, 1, "click", 1.0), ev(2, 1, "click", 1.0),
        ev(25, 1, "view", 2.0),
        ev(0, 2, "click", 5.0))
      query.processAllAvailable()

      val out = spark.table("sessions")
        .select("user_id", "n_events", "sum_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // the first user-1 session closed by the in-batch gap
      assert(out.contains((1L, 2L, 2.0)), s"got $out")

      // advance the watermark far beyond last-event + gap: event-time
      // timeouts close the remaining sessions
      input.addData(ev(240, 9, "click", 0.0))
      query.processAllAvailable()
      input.addData(ev(300, 9, "click", 0.0))
      query.processAllAvailable()
      val out2 = spark.table("sessions")
        .select("user_id", "n_events", "sum_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(out2.contains((1L, 1L, 2.0)), s"got $out2") // user1 session 2
      assert(out2.contains((2L, 1L, 5.0)), s"got $out2") // user2
    } finally query.stop()
  }

  test("stream-stream attribution join: strictly-after, lag-bounded, per-user") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val leads = MemoryStream[StreamEvent]
    val follows = MemoryStream[StreamEvent]
    val query = StreamingOps
      .attributionJoin(leads.toDS(), follows.toDS(),
        maxLag = "10 minutes", watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("attr_join")
      .outputMode(OutputMode.Append()).start()
    try {
      leads.addData(ev(0, 1, "view", 0.0), ev(0, 2, "view", 0.0))
      follows.addData(
        ev(0, 1, "click", 0.0),   // equal ts: NOT strictly after -> no pair
        ev(5, 1, "click", 0.0),   // within lag -> pair
        ev(10, 1, "click", 0.0),  // boundary: exactly lead + lag -> pair
        ev(11, 1, "click", 0.0),  // past lag -> no pair
        ev(5, 3, "click", 0.0))   // no matching user -> no pair
      query.processAllAvailable()

      val out = spark.table("attr_join")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(2).getTime / 60000 % 1440))
        .toSet
      assert(out == Set((1L, 65L), (1L, 70L)), s"got $out")
    } finally query.stop()
  }
}
