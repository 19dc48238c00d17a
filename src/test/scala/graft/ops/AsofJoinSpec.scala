package graft.ops

import java.sql.Timestamp

import graft.SparkSuite

class AsofJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of: latest right at-or-before, nulls when none") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (2L, ts("2024-01-01 10:02:00"), 200.0))
      .toDF("sym", "qts", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:03:00"), "t1"), // → 100.0 (10:00 quote)
      (1L, ts("2024-01-01 10:05:00"), "t2"), // → 101.0 (same-instant quote)
      (2L, ts("2024-01-01 10:01:00"), "t3"), // → null (no earlier quote)
      (3L, ts("2024-01-01 10:10:00"), "t4")) // → null (no key match)
      .toDF("sym", "tts", "tid")

    val got = AsofJoin.backward(trades, quotes,
        by = ("sym", "sym"), on = ("tts", "qts"),
        rightPayload = Seq("price"), tieBreak = Seq("qts"))
      .select("tid", "asof_price")
      .as[(String, Option[Double])].collect().toMap

    assert(got === Map(
      "t1" -> Some(100.0), "t2" -> Some(101.0),
      "t3" -> None, "t4" -> None))
  }

  test("ties on right timestamp resolve to the last row in tieBreak order") {
    val r = Seq((1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 00:00:00"), 2L, "b"))
      .toDF("k", "rts", "seq", "v")
    val l = Seq((1L, ts("2024-01-01 00:00:01"), "x")).toDF("k", "lts", "id")
    val got = AsofJoin.backward(l, r, ("k", "k"), ("lts", "rts"),
        rightPayload = Seq("v"), tieBreak = Seq("seq"))
      .select("asof_v").as[String].head()
    assert(got === "b")
  }

  test("forward as-of: earliest right at-or-after, nulls when none") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (2L, ts("2024-01-01 10:02:00"), 200.0))
      .toDF("sym", "qts", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:03:00"), "t1"), // → 101.0 (10:05 quote)
      (1L, ts("2024-01-01 10:05:00"), "t2"), // → 101.0 (same instant)
      (1L, ts("2024-01-01 10:06:00"), "t3"), // → null (no later quote)
      (2L, ts("2024-01-01 10:01:00"), "t4"), // → 200.0 (10:02 quote)
      (3L, ts("2024-01-01 10:10:00"), "t5")) // → null (no key match)
      .toDF("sym", "tts", "tid")
    val got = AsofJoin.forward(trades, quotes,
        by = ("sym", "sym"), on = ("tts", "qts"),
        rightPayload = Seq("price"), tieBreak = Seq("qts"))
      .select("tid", "asof_price")
      .as[(String, Option[Double])].collect().toMap
    assert(got === Map(
      "t1" -> Some(101.0), "t2" -> Some(101.0), "t3" -> None,
      "t4" -> Some(200.0), "t5" -> None))
  }

  test("forward ties resolve to the FIRST row in tieBreak order") {
    val r = Seq((1L, ts("2024-01-01 00:00:10"), 1L, "a"),
      (1L, ts("2024-01-01 00:00:10"), 2L, "b"))
      .toDF("k", "rts", "seq", "v")
    val l = Seq((1L, ts("2024-01-01 00:00:01"), "x")).toDF("k", "lts", "id")
    val got = AsofJoin.forward(l, r, ("k", "k"), ("lts", "rts"),
        rightPayload = Seq("v"), tieBreak = Seq("seq"))
      .select("asof_v").as[String].head()
    assert(got === "a")
  }

  test("nearest as-of: closer side wins, equidistant prefers backward") {
    val r = Seq(
      (1L, ts("2024-01-01 00:00:00"), "b0"),
      (1L, ts("2024-01-01 00:00:10"), "f0"),
      (2L, ts("2024-01-01 00:00:00"), "b1"),
      (2L, ts("2024-01-01 00:00:04"), "f1"),
      (3L, ts("2024-01-01 00:00:05"), "only-after"),
      (4L, ts("2024-01-01 00:00:00"), "only-before"))
      .toDF("k", "rts", "v")
    val l = Seq(
      (1L, ts("2024-01-01 00:00:03"), "closer-back"),  // 3s vs 7s → b0
      (1L, ts("2024-01-01 00:00:05"), "equidistant"),  // 5s vs 5s → b0
      (2L, ts("2024-01-01 00:00:03"), "closer-fwd"),   // 3s vs 1s → f1
      (3L, ts("2024-01-01 00:00:01"), "no-back"),      // → only-after
      (4L, ts("2024-01-01 00:00:09"), "no-fwd"),       // → only-before
      (5L, ts("2024-01-01 00:00:00"), "no-match"))     // → null
      .toDF("k", "lts", "id")
    val got = AsofJoin.nearest(l, r, ("k", "k"), ("lts", "rts"),
        rightPayload = Seq("v"), tieBreak = Seq("rts"))
      .select("id", "asof_v")
      .as[(String, Option[String])].collect().toMap
    assert(got === Map(
      "closer-back" -> Some("b0"), "equidistant" -> Some("b0"),
      "closer-fwd" -> Some("f1"), "no-back" -> Some("only-after"),
      "no-fwd" -> Some("only-before"), "no-match" -> None))
  }

  test("nearest plan: one exchange feeds both direction windows") {
    val r = Seq((1L, ts("2024-01-01 00:00:00"), "a")).toDF("k", "rts", "v")
    val l = Seq((1L, ts("2024-01-01 00:00:01"), "x")).toDF("k", "lts", "id")
    val plan = AsofJoin.nearest(l, r, ("k", "k"), ("lts", "rts"),
        rightPayload = Seq("v"))
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1,
      s"nearest must interleave once, not once per direction:\n$plan")
  }

  test("nearest on DATE keys: day-equidistant tie prefers backward across " +
      "a DST transition in a non-UTC session") {
    // 2024-03-10 is the US spring-forward day: in America/New_York,
    // midnight 03-09 → midnight 03-10 is 24h but 03-10 → 03-11 is 23h.
    // Distance via cast-to-timestamp would make the forward candidate
    // strictly closer and flip the backward tie preference; datediff
    // (epoch-day arithmetic) keeps both at exactly 1 day.
    val d = java.sql.Date.valueOf(_: String)
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val r = Seq((1L, d("2024-03-09"), "back"), (1L, d("2024-03-11"), "fwd"))
        .toDF("k", "rts", "v")
      val l = Seq((1L, d("2024-03-10"), "x")).toDF("k", "lts", "id")
      val got = AsofJoin.nearest(l, r, ("k", "k"), ("lts", "rts"),
          rightPayload = Seq("v"), tieBreak = Seq("rts"))
        .select("asof_v").as[String].head()
      assert(got === "back")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("tolerance: at-band match kept, beyond-band nulls, nearest gates " +
      "after direction resolution") {
    val r = Seq(
      (1L, ts("2024-01-01 00:00:00"), "in"),   // 10s before probe
      (2L, ts("2024-01-01 00:00:00"), "far"))  // 60s before probe
      .toDF("k", "rts", "v")
    val l = Seq(
      (1L, ts("2024-01-01 00:00:10"), "a"),
      (2L, ts("2024-01-01 00:01:00"), "b"))
      .toDF("k", "lts", "id")
    // tolerance in integer MICROSECONDS for timestamp keys; 10s band
    val got = AsofJoin.backward(l, r, ("k", "k"), ("lts", "rts"),
        rightPayload = Seq("v"), tieBreak = Seq("rts"),
        tolerance = Some(10000000L))
      .select("id", "asof_v").as[(String, Option[String])].collect().toMap
    assert(got === Map("a" -> Some("in"), "b" -> None))

    // nearest: the backward match is nearer but OUT of band, the
    // forward is in band — tolerance must gate the RESOLVED pick
    // (pandas rule), not fall through to the other direction
    val r2 = Seq((1L, ts("2024-01-01 00:00:00"), "back"),
      (1L, ts("2024-01-01 00:00:40"), "fwd")).toDF("k", "rts", "v")
    val l2 = Seq((1L, ts("2024-01-01 00:00:15"), "x")).toDF("k", "lts", "id")
    val near = AsofJoin.nearest(l2, r2, ("k", "k"), ("lts", "rts"),
        rightPayload = Seq("v"), tieBreak = Seq("rts"),
        tolerance = Some(20000000L))
      .select("asof_v").as[Option[String]].head()
    assert(near === Some("back")) // 15s back (in band) beats 25s fwd
    val nearTight = AsofJoin.nearest(l2, r2, ("k", "k"), ("lts", "rts"),
        rightPayload = Seq("v"), tieBreak = Seq("rts"),
        tolerance = Some(10000000L))
      .select("asof_v").as[Option[String]].head()
    assert(nearTight === None) // nearest pick (back, 15s) out of band → null
  }

  test("a matched right row with NULL payload stays NULL (no reach-back)") {
    // the latest right row wins even when its payload VALUE is null —
    // per-column last(ignoreNulls) would have reached back to the older
    // row and stitched v from one row with w from another
    val r = Seq(
      (1L, ts("2024-01-01 00:00:00"), Some(5.0), Some("old")),
      (1L, ts("2024-01-01 00:01:00"), None, Some("new")))
      .toDF("k", "rts", "v", "w")
    val l = Seq((1L, ts("2024-01-01 00:02:00"), "x")).toDF("k", "lts", "id")
    val got = AsofJoin.backward(l, r, ("k", "k"), ("lts", "rts"),
        rightPayload = Seq("v", "w"), tieBreak = Seq("rts"))
      .select("asof_v", "asof_w")
      .as[(Option[Double], Option[String])].head()
    assert(got === (None, Some("new")))
  }
}
