package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.streaming.SessionStream.Event

/** flatMapGroupsWithState sessionization: closed sessions emitted on gap
  * proof, the final open session flushed by event-time timeout when the
  * watermark passes. */
class SessionStreamSpec extends SparkSuite {
  import spark.implicits._

  private def t(minute: Long): Timestamp =
    Timestamp.valueOf(java.time.LocalDateTime.of(2026, 1, 1, 0, 0)
      .plusMinutes(minute))

  test("streaming sessions match gap semantics across micro-batches") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = SessionStream.sessionize(
      input.toDS().withWatermark("ts", "1 second").as[Event],
      gapSeconds = 30 * 60)

    val q = sessions.writeStream
      .format("memory").queryName("sess_out")
      .outputMode("append")
      .start()
    try {
      // batch 1: user 1 two events 10 min apart (one session), user 2 one.
      input.addData(Event(1, t(0), 1.0), Event(1, t(10), 2.0),
        Event(2, t(5), 5.0))
      q.processAllAvailable()
      // batch 2: user 1 event 2h later — proves the first session closed
      // (emitted in-batch) AND advances the watermark past user 2's
      // end + gap, so the catch-up batch flushes user 2 by timeout.
      input.addData(Event(1, t(130), 3.0))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() === 2,
        "gap-proven + watermark-timed-out sessions expected: " +
          spark.table("sess_out").collect().mkString("; "))

      // sentinel batches: advance the watermark far past end+gap so
      // event-time timeouts flush the remaining open sessions (watermark
      // takes effect the batch after the max event time is observed).
      input.addData(Event(99, t(60 * 24), 0.0))
      q.processAllAvailable()
      input.addData(Event(99, t(60 * 24 + 1), 0.0))
      q.processAllAvailable()

      val got = spark.table("sess_out")
        .as[SessionStream.Session].collect()
        .map(s => (s.user_id, s.session_start, s.n_events, s.session_value))
        .toSet
      assert(got.contains((1L, t(0), 2L, 3.0)), s"user1 first session: $got")
      assert(got.contains((1L, t(130), 1L, 3.0)), s"user1 second session: $got")
      assert(got.contains((2L, t(5), 1L, 5.0)), s"user2 session: $got")
    } finally q.stop()
  }

  test("late above-watermark events form earlier sessions, not corrupt open ones") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = SessionStream.sessionize(
      input.toDS().withWatermark("ts", "10 hours").as[Event],
      gapSeconds = 30 * 60)
    val q = sessions.writeStream
      .format("memory").queryName("late_sess_out")
      .outputMode("append")
      .start()
    try {
      // open session at minute 300
      input.addData(Event(1, t(300), 1.0))
      q.processAllAvailable()
      // LATE event at minute 0 (inside the 10h watermark): more than a
      // gap before the open session — must close as its OWN session,
      // not merge into (and corrupt) the minute-300 one
      input.addData(Event(1, t(0), 7.0))
      q.processAllAvailable()
      // late event at minute 290: within the gap BEFORE the open
      // session — must merge and lower its start
      input.addData(Event(1, t(290), 2.0))
      q.processAllAvailable()
      // flush by timeout
      input.addData(Event(99, t(60 * 48), 0.0))
      q.processAllAvailable()
      input.addData(Event(99, t(60 * 48 + 1), 0.0))
      q.processAllAvailable()

      val got = spark.table("late_sess_out")
        .as[SessionStream.Session].collect()
        .filter(_.user_id == 1L)
        .map(s => (s.session_start, s.n_events, s.session_value))
        .toSet
      assert(got.contains((t(0), 1L, 7.0)),
        s"late standalone session expected: $got")
      assert(got.contains((t(290), 2L, 3.0)),
        s"merged session with lowered start expected: $got")
    } finally q.stop()
  }
}
