package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Watermarked stream-stream interval join: orders match the user's
  * events from the preceding 30 minutes. Both sides carry watermarks +
  * the join carries an event-time range, so Spark can bound the buffered
  * state — the property that keeps a stream-stream join alive at
  * 100 TB/day (an unconstrained join would buffer both streams
  * forever). */
class StreamStreamJoinSpec extends SparkSuite {
  import spark.implicits._

  private def t(minute: Long): Timestamp =
    Timestamp.valueOf(java.time.LocalDateTime.of(2026, 1, 1, 0, 0)
      .plusMinutes(minute))

  test("interval join matches only events within the time bound") {
    implicit val sc = spark.sqlContext
    val events = MemoryStream[(Long, Timestamp, String)]
    val orders = MemoryStream[(Long, Timestamp, Long)]

    val e = events.toDF().toDF("user_id", "ets", "etype")
      .withWatermark("ets", "1 minute")
    val o = orders.toDF().toDF("o_user", "ots", "o_id")
      .withWatermark("ots", "1 minute")

    val joined = o.join(e,
      expr("""user_id = o_user AND
              ets BETWEEN ots - INTERVAL 30 MINUTES AND ots"""))
      .select(col("o_id"), col("user_id"), col("etype"))

    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      events.addData((1L, t(0), "view"), (1L, t(20), "cart"),
        (2L, t(5), "view"))
      orders.addData((1L, t(25), 100L), (2L, t(50), 200L))
      q.processAllAvailable()

      val got = spark.table("ssj_out")
        .as[(Long, Long, String)].collect().toSet
      // order 100 (user 1 @ 0:25): events at 0:00 and 0:20 are in
      // [-30m, 0]; order 200 (user 2 @ 0:50): the 0:05 view is older
      // than 30 minutes — no match.
      assert(got === Set((100L, 1L, "view"), (100L, 1L, "cart")), s"$got")
    } finally q.stop()
  }

  test("LEFT OUTER interval join: unmatched orders emit null-padded " +
      "AFTER the watermark closes their window, not before") {
    implicit val sc = spark.sqlContext
    val events = MemoryStream[(Long, Timestamp, String)]
    val orders = MemoryStream[(Long, Timestamp, Long)]

    val e = events.toDF().toDF("user_id", "ets", "etype")
      .withWatermark("ets", "1 minute")
    val o = orders.toDF().toDF("o_user", "ots", "o_id")
      .withWatermark("ots", "1 minute")

    // The outer side's null-padded results are correctness-critical for
    // attribution pipelines (organic vs attributed): Spark may only
    // emit "no matching event" once the event-time watermark proves no
    // in-window event can still arrive — so unmatched rows are held,
    // then released with nulls, exactly once.
    val joined = o.join(e,
      expr("""user_id = o_user AND
              ets BETWEEN ots - INTERVAL 30 MINUTES AND ots"""),
      "left_outer")
      .select(col("o_id"), col("o_user"), col("etype"))

    val q = joined.writeStream.format("memory").queryName("ssj_outer")
      .outputMode("append").start()
    try {
      events.addData((1L, t(0), "view"))
      orders.addData((1L, t(10), 100L), (2L, t(10), 200L))
      q.processAllAvailable()
      val early = spark.table("ssj_outer")
        .as[(Long, Long, Option[String])].collect().toSet
      // the matched pair may emit immediately; order 200's null result
      // MUST NOT (its window is still open — a late user-2 event at
      // t<=10 could still match)
      assert(!early.contains((200L, 2L, None)),
        s"null-padded row emitted before the watermark closed: $early")

      // advance event time far past order 200's window + watermark —
      // on BOTH streams: the global watermark is the MIN of the two
      // sides (multipleWatermarkPolicy=min), so a stalled orders feed
      // would hold every outer result forever
      events.addData((3L, t(120), "view"))
      orders.addData((3L, t(120), 300L))
      q.processAllAvailable()
      events.addData((3L, t(121), "view")) // next batch applies the move
      orders.addData((3L, t(121), 301L))
      q.processAllAvailable()
      val got = spark.table("ssj_outer")
        .as[(Long, Long, Option[String])].collect().toSet
      assert(got.contains((100L, 1L, Some("view"))), s"$got")
      assert(got.contains((200L, 2L, None)),
        s"unmatched order must surface null-padded after close: $got")
      // exactly once: no duplicate null row for 200
      assert(spark.table("ssj_outer")
        .filter(col("o_id") === 200L).count() === 1L)
    } finally q.stop()
  }

  test("RIGHT OUTER interval join: unmatched events null-pad the order " +
      "side after their forward window closes") {
    implicit val sc = spark.sqlContext
    val events = MemoryStream[(Long, Timestamp, String)]
    val orders = MemoryStream[(Long, Timestamp, Long)]

    val e = events.toDF().toDF("user_id", "ets", "etype")
      .withWatermark("ets", "1 minute")
    val o = orders.toDF().toDF("o_user", "ots", "o_id")
      .withWatermark("ots", "1 minute")

    // The mirror policy of LEFT OUTER: the preserved side is the EVENT
    // stream (the CDC-consumer shape "every event, with its order if one
    // came") — an event's window looks FORWARD: it matches orders in
    // [ets, ets + 30m], so its null can only release once the watermark
    // proves no order can still land in that window.
    val joined = o.join(e,
      expr("""user_id = o_user AND
              ets BETWEEN ots - INTERVAL 30 MINUTES AND ots"""),
      "right_outer")
      .select(col("o_id"), col("user_id"), col("etype"))

    val q = joined.writeStream.format("memory").queryName("ssj_right")
      .outputMode("append").start()
    try {
      events.addData((1L, t(0), "view"), (2L, t(5), "promo"))
      orders.addData((1L, t(10), 100L))
      q.processAllAvailable()
      val early = spark.table("ssj_right")
        .as[(Option[Long], Long, String)].collect().toSet
      // user-2's promo is unmatched but its window [0:05, 0:35] is
      // still open — the null row must be held
      assert(!early.exists(r => r._1.isEmpty && r._2 == 2L),
        s"null-padded event emitted before the watermark closed: $early")

      // advance BOTH watermarks past 0:35 + delay (global = min)
      events.addData((3L, t(120), "view"))
      orders.addData((3L, t(120), 300L))
      q.processAllAvailable()
      events.addData((3L, t(121), "view"))
      orders.addData((3L, t(121), 301L))
      q.processAllAvailable()
      val got = spark.table("ssj_right")
        .as[(Option[Long], Long, String)].collect().toSet
      assert(got.contains((Some(100L), 1L, "view")), s"$got")
      assert(got.contains((None, 2L, "promo")),
        s"unmatched event must surface null-padded after close: $got")
      assert(spark.table("ssj_right")
        .filter(col("user_id") === 2L).count() === 1L, "exactly once")
    } finally q.stop()
  }

  test("FULL OUTER interval join: both sides' unmatched rows surface " +
      "exactly once after close") {
    implicit val sc = spark.sqlContext
    val events = MemoryStream[(Long, Timestamp, String)]
    val orders = MemoryStream[(Long, Timestamp, Long)]

    val e = events.toDF().toDF("user_id", "ets", "etype")
      .withWatermark("ets", "1 minute")
    val o = orders.toDF().toDF("o_user", "ots", "o_id")
      .withWatermark("ots", "1 minute")

    val joined = o.join(e,
      expr("""user_id = o_user AND
              ets BETWEEN ots - INTERVAL 30 MINUTES AND ots"""),
      "full_outer")
      .select(col("o_id"), col("o_user"), col("user_id"), col("etype"))

    val q = joined.writeStream.format("memory").queryName("ssj_full")
      .outputMode("append").start()
    try {
      // user 1: matched pair; user 2: order with no event; user 4:
      // event with no order — every null-padding policy at once
      events.addData((1L, t(0), "view"), (4L, t(5), "promo"))
      orders.addData((1L, t(10), 100L), (2L, t(10), 200L))
      q.processAllAvailable()

      events.addData((3L, t(120), "view"))
      orders.addData((3L, t(120), 300L))
      q.processAllAvailable()
      events.addData((3L, t(121), "view"))
      orders.addData((3L, t(121), 301L))
      q.processAllAvailable()

      val got = spark.table("ssj_full")
        .as[(Option[Long], Option[Long], Option[Long], Option[String])]
        .collect().toSet
      assert(got.contains(
        (Some(100L), Some(1L), Some(1L), Some("view"))), s"$got")
      assert(got.contains((Some(200L), Some(2L), None, None)),
        s"order with no event must null-pad the event side: $got")
      assert(got.contains((None, None, Some(4L), Some("promo"))),
        s"event with no order must null-pad the order side: $got")
      // exactly once each
      assert(spark.table("ssj_full")
        .filter(col("o_id") === 200L).count() === 1L)
      assert(spark.table("ssj_full")
        .filter(col("user_id") === 4L).count() === 1L)
    } finally q.stop()
  }
}
