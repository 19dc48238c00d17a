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
