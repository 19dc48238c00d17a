package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-stream analytics over the `events` table (the reference's
  * `trades` time-series class, README.md:67-92, plus the event-time
  * extensions SURVEY.md §2.8 notes the reference lacks). The same
  * DataFrame code runs batch here and incremental under Structured
  * Streaming (see [[graft.streaming.CdcStream]]).
  */
object EventQueries {

  type Q = (SparkSession, String) => DataFrame

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  /** Tumbling 1-hour windows per event type: the watermarked streaming
    * aggregation shape, expressed over the batch table. Partial aggregates
    * combine map-side; one shuffle of (hour × type) groups. */
  val tumbling: Q = (s, dir) =>
    ev(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count("*").as("n"),
        sum(RelationalQueries.dec(col("value"))).cast("double").as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("hour", "event_type")

  val tumblingSql: String =
    """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
      |  count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |  count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  /** Gap-based sessionization (30-minute inactivity): lag → gap flag →
    * running sum as session id → per-session rollup. Two window passes
    * over the same (user_id, ts) partitioning — one shuffle total, which
    * is the shape that scales (sessionizing 100 TB shuffles each user's
    * events once). */
  val sessionize: Q = (s, dir) => {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val flagged = ev(s, dir).select(col("user_id"), col("ts"), col("event_id"),
        col("value"),
        // Gap compared in INTEGER MICROSECONDS on both engines
        // (unix_micros here, epoch_us in the oracle): a whole-second
        // cast would truncate fractions and disagree with DuckDB's
        // fractional epoch() for any gap within ~1s of the threshold —
        // the fixture carries microsecond timestamps, so that band is
        // real. ts is TIMESTAMP_NTZ; session TZ is pinned UTC so the
        // via-timestamp micros match DuckDB's.
        when(expr("unix_micros(CAST(ts AS TIMESTAMP))") -
          expr("unix_micros(CAST(lag(ts, 1) OVER " +
            "(PARTITION BY user_id ORDER BY ts, event_id) AS TIMESTAMP))")
            > 1800000000L, 1L)
          .otherwise(0L).as("new_session"))
    flagged
      .withColumn("session_id",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count("*").as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        sum(RelationalQueries.dec(col("value"))).cast("double").as("session_value"))
      .orderBy("user_id", "session_id")
  }

  val sessionizeSql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, ts, event_id, value,
      |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM flagged)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  min(ts) AS session_start, max(ts) AS session_end,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
      |FROM sess GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** JSON property extraction feeding an aggregation (the props column is
    * the PG json class, SURVEY.md §1.3). */
  val jsonAgg: Q = (s, dir) =>
    ev(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"))
      .groupBy("event_type")
      .agg(count("*").as("n"), min("k").as("min_k"), max("k").as("max_k"),
        sum("k").as("sum_k"))
      .orderBy("event_type")

  val jsonAggSql: String =
    """SELECT event_type, count(*) AS n,
      |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Hopping (sliding) 1-hour windows every 30 minutes: each event lands
    * in exactly 2 windows. Spark's built-in window() generator does the
    * fan-out before the shuffle, so the cost is 2x rows into the same
    * single aggregation shuffle — the standard streaming window shape run
    * in batch. The oracle reproduces the window assignment by epoch
    * arithmetic. */
  val sliding: Q = (s, dir) =>
    ev(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count("*").as("n"),
        sum(RelationalQueries.dec(col("value"))).cast("double").as("sum_value"))
      .select(col("window.start").as("wstart"), col("window.end").as("wend"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("wstart", "event_type")

  val slidingSql: String =
    """WITH fanned AS (
      |  SELECT make_timestamp(
      |           (CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 - off)
      |           * 1000000) AS wstart,
      |         event_type, value
      |  FROM events, unnest([CAST(0 AS BIGINT), CAST(1800 AS BIGINT)]) AS t(off))
      |SELECT wstart, wstart + INTERVAL 1 HOUR AS wend, event_type,
      |  count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM fanned GROUP BY wstart, event_type
      |ORDER BY wstart, event_type""".stripMargin

  /** Approximate distinct users (HLL sketch). Sketch estimates are
    * engine-specific, so the ESTIMATE can never hash-match an oracle —
    * but the ACCURACY CONTRACT can: the compared output carries the
    * exact count plus a boolean asserting the HLL estimate landed
    * within 5% (2.5× the requested 2% rsd), and the oracle expects that
    * boolean TRUE for every group. A sketch regression now flips a
    * hash-checked cell instead of hiding behind a rows-only check. At
    * 100 TB the sketch replaces the exact countDistinct expand; the
    * exact count here is the verification harness, not the plan. */
  val approxDistinct: Q = (s, dir) =>
    ev(s, dir)
      .groupBy("event_type")
      // graft's dense HLL (16 KiB registers, unboxed update) — same
      // ≤5% contract, ~3× cheaper per row than approx_count_distinct
      .agg(graft.functions.expressions.AggExpressions
          .hll_distinct_long(col("user_id")).as("approx"),
        countDistinct(col("user_id")).as("exact_users"),
        count("*").as("n"))
      .select(col("event_type"), col("exact_users"), col("n"),
        (abs(col("approx") - col("exact_users")).cast("double") /
          col("exact_users").cast("double") <= 0.05)
          .as("approx_within_bound"))
      .orderBy("event_type")

  val approxDistinctSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS exact_users,
      |  count(*) AS n, TRUE AS approx_within_bound
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Funnel analysis: view → click → purchase, strictly ordered per
    * user (each stage's first event must be AFTER the previous stage's
    * first). The report is the classic conversion table — users
    * reaching each stage plus the exact total view→purchase latency in
    * integer microseconds (no float drift).
    *
    * Scale shape: each stage is a map-side type filter + one
    * user-keyed min-aggregate, then a user-keyed join onto the
    * previous stage's (user, ts) frame — per-stage cost is one shuffle
    * of the stage's events, never an all-events self-join; the stage
    * frames are user-cardinality, far below event cardinality. */
  val funnel: Q = (s, dir) => {
    val e = ev(s, dir).select(col("user_id"), col("event_type"),
      unix_micros(col("ts").cast("timestamp")).as("tsu"))
    def stage(tpe: String) = e.filter(col("event_type") === tpe)
    val s1 = stage("view").groupBy("user_id").agg(min(col("tsu")).as("t1"))
    val s2 = stage("click").join(s1, "user_id")
      .filter(col("tsu") > col("t1"))
      .groupBy("user_id").agg(min(col("tsu")).as("t2"), min(col("t1")).as("t1"))
    val s3 = stage("purchase").join(s2, "user_id")
      .filter(col("tsu") > col("t2"))
      .groupBy("user_id").agg(min(col("tsu")).as("t3"), min(col("t1")).as("t1"))
    s1.agg(count(lit(1)).as("n_viewed")).join(
      s2.agg(count(lit(1)).as("n_clicked")), lit(true)).join(
      s3.agg(count(lit(1)).as("n_purchased"),
        sum(col("t3") - col("t1")).as("total_funnel_micros")), lit(true))
  }

  val funnelSql: String =
    """WITH e AS (SELECT user_id, event_type,
      |    epoch_us(ts) AS tsu FROM events),
      |s1 AS (SELECT user_id, min(tsu) AS t1 FROM e
      |  WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (SELECT e.user_id, min(e.tsu) AS t2, min(s1.t1) AS t1
      |  FROM e JOIN s1 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.tsu > s1.t1
      |  GROUP BY e.user_id),
      |s3 AS (SELECT e.user_id, min(e.tsu) AS t3, min(s2.t1) AS t1
      |  FROM e JOIN s2 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.tsu > s2.t2
      |  GROUP BY e.user_id)
      |SELECT (SELECT count(*) FROM s1) AS n_viewed,
      |  (SELECT count(*) FROM s2) AS n_clicked,
      |  (SELECT count(*) FROM s3) AS n_purchased,
      |  (SELECT CAST(sum(t3 - t1) AS BIGINT) FROM s3)
      |    AS total_funnel_micros""".stripMargin

  /** Cohort retention: users grouped by first-seen day, counted on
    * each later active day as (cohort_day, day_offset, n_users) — the
    * retention matrix every growth dashboard draws. Integer-exact
    * (epoch-day datediff). Shape: one distinct on (user, day) — the
    * activity grid, ≪ events — one user-keyed min-aggregate for the
    * cohort, one join on user, one grid-keyed count; the events table
    * is scanned once per leg and never self-joined. */
  val retention: Q = (s, dir) => {
    val e = ev(s, dir).select(col("user_id"), to_date(col("ts")).as("day"))
    val cohort = e.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    e.distinct().join(cohort, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  val retentionSql: String =
    """WITH e AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
      |  FROM events),
      |c AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id)
      |SELECT c.cohort_day,
      |  CAST(e.day - c.cohort_day AS BIGINT) AS day_offset,
      |  count(DISTINCT e.user_id) AS n_users
      |FROM e JOIN c USING (user_id)
      |GROUP BY c.cohort_day, day_offset
      |ORDER BY cohort_day, day_offset""".stripMargin

  /** Time-series gap fill: the dense per-minute purchase series a
    * monitoring dashboard or a downstream forecast model consumes —
    * minutes with no purchases appear with n = 0, and the cents total
    * carries forward (LOCF) so the "last known value" is defined at
    * every tick. Money rides integer cents end-to-end (decimal×100 →
    * BIGINT), so fill and carry are bit-exact on both engines.
    *
    * Scale shape: the heavy leg is one map-side-combined aggregation of
    * minute keys; the spine is `sequence(min_minute, max_minute)` —
    * its cardinality is the CALENDAR SPAN in minutes (~1.4k/day),
    * independent of event count, so the spine build, the left join,
    * and the one global LOCF window all run over a frame that stays
    * ~43k rows whether the fact table holds 10k events or 100 TB. The
    * two scalar bounds broadcast (single-row cross join). */
  val gapfill: Q = (s, dir) => {
    val p = ev(s, dir).filter(col("event_type") === "purchase")
      .groupBy(date_trunc("minute", col("ts")).as("minute"))
      .agg(count(lit(1)).as("n_obs"),
        sum(RelationalQueries.dec(col("value")) * 100).cast("bigint")
          .as("cents"))
    val bounds = ev(s, dir)
      .agg(date_trunc("minute", min(col("ts"))).as("lo"),
        date_trunc("minute", max(col("ts"))).as("hi"))
    val spine = bounds
      .select(explode(expr("sequence(lo, hi, interval 1 minute)")).as("minute"))
    val locf = Window.orderBy("minute")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(p, Seq("minute"), "left")
      .select(col("minute"),
        coalesce(col("n_obs"), lit(0L)).as("n"),
        last(col("cents"), ignoreNulls = true).over(locf).as("filled_cents"))
      .orderBy("minute")
  }

  val gapfillSql: String =
    """WITH p AS (
      |  SELECT CAST(date_trunc('minute', ts) AS TIMESTAMP) AS minute,
      |    count(*) AS n_obs,
      |    CAST(sum(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |b AS (SELECT CAST(date_trunc('minute', min(ts)) AS TIMESTAMP) AS lo,
      |             CAST(date_trunc('minute', max(ts)) AS TIMESTAMP) AS hi
      |      FROM events),
      |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 MINUTE))
      |            AS minute FROM b)
      |SELECT s.minute, coalesce(p.n_obs, 0) AS n,
      |  last_value(p.cents IGNORE NULLS) OVER (ORDER BY s.minute
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents
      |FROM spine s LEFT JOIN p ON s.minute = p.minute
      |ORDER BY s.minute""".stripMargin

  /** Marketing attribution: each purchase is attributed to the clicks
    * the same user made in the preceding 30 minutes (the classic
    * lookback window). The per-user report carries how many purchases
    * converted from a touch, the touch volume, and the attributed vs
    * organic revenue split — integer cents and integer microseconds
    * throughout, so both engines agree bit-for-bit.
    *
    * Scale shape: purchases and clicks are map-side type filters of the
    * same scan; the band join is an EQUI-join on user_id with the time
    * band as a post-join filter — each user's purchases only ever meet
    * that user's clicks, never a cross of the event table with itself.
    * The purchase rollup and the user rollup are two map-side-combined
    * aggregations; everything is keyed by user_id so the join shuffle
    * is the only event-sized exchange. */
  val attribution: Q = (s, dir) => {
    val e = ev(s, dir).select(col("user_id"), col("event_type"),
      col("event_id"), unix_micros(col("ts").cast("timestamp")).as("tsu"),
      (RelationalQueries.dec(col("value")) * 100).cast("bigint").as("cents"))
    val purch = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"),
        col("tsu").as("ptsu"), col("cents"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("cuser"), col("event_id").as("cid"),
        col("tsu").as("ctsu"))
    // Band lives in the JOIN condition (not a post-filter): a purchase
    // whose user clicked only OUTSIDE the window must survive with
    // n_touches = 0, not vanish.
    val perPurchase = purch.join(clicks,
        col("user_id") === col("cuser") &&
          col("ctsu") <= col("ptsu") &&
          col("ctsu") > col("ptsu") - 1800000000L, "left")
      .groupBy("user_id", "pid")
      .agg(min(col("cents")).as("cents"),
        count(col("cid")).as("n_touches"))
    perPurchase.groupBy("user_id")
      .agg(count(lit(1)).as("n_purchases"),
        sum(when(col("n_touches") > 0, 1L).otherwise(0L)).cast("bigint")
          .as("n_attributed"),
        sum(col("n_touches")).cast("bigint").as("sum_touches"),
        sum(when(col("n_touches") > 0, col("cents")).otherwise(0L))
          .cast("bigint").as("attributed_cents"),
        sum(when(col("n_touches") === 0, col("cents")).otherwise(0L))
          .cast("bigint").as("organic_cents"))
      .orderBy("user_id")
  }

  val attributionSql: String =
    """WITH e AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS tsu,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |p AS (SELECT user_id, event_id AS pid, tsu AS ptsu, cents FROM e
      |      WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, event_id AS cid, tsu AS ctsu FROM e
      |      WHERE event_type = 'click'),
      |per_p AS (
      |  SELECT p.user_id, p.pid, min(p.cents) AS cents,
      |    count(c.cid) AS n_touches
      |  FROM p LEFT JOIN c ON p.user_id = c.user_id
      |    AND c.ctsu <= p.ptsu AND c.ctsu > p.ptsu - 1800000000
      |  GROUP BY p.user_id, p.pid)
      |SELECT user_id, count(*) AS n_purchases,
      |  CAST(sum(CASE WHEN n_touches > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_attributed,
      |  CAST(sum(n_touches) AS BIGINT) AS sum_touches,
      |  CAST(sum(CASE WHEN n_touches > 0 THEN cents ELSE 0 END) AS BIGINT)
      |    AS attributed_cents,
      |  CAST(sum(CASE WHEN n_touches = 0 THEN cents ELSE 0 END) AS BIGINT)
      |    AS organic_cents
      |FROM per_p GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Robust anomaly detection on the per-minute event-rate series:
    * minutes whose |count − median| exceeds 3× the median absolute
    * deviation are flagged (the MAD rule — outlier-proof where a
    * mean/stddev z-score is dragged by the very spikes it should
    * flag). Both medians land on k or k.5 over integer counts, so the
    * doubled deviations (`dev2`, `mad2`) are exact BIGINTs and the
    * 3×-MAD verdict is bit-identical across engines — no float in any
    * compared cell.
    *
    * Scale shape: the event-sized leg is one map-side-combined
    * groupBy(minute); everything after runs on the CALENDAR-sized
    * minute frame (~43k rows/month regardless of event count) — two
    * exact medians over that frame and a broadcast of the two scalars
    * back onto it. Output is the anomalous minutes only. */
  val anomaly: Q = (s, dir) => {
    val perMin = ev(s, dir)
      .groupBy(date_trunc("minute", col("ts")).as("minute"))
      .agg(count(lit(1)).as("n"))
    val med = perMin.agg(
      (percentile(col("n"), lit(0.5)) * 2).cast("bigint").as("med2"))
    val dev = perMin.crossJoin(broadcast(med))
      .withColumn("dev2", abs(col("n") * 2 - col("med2")))
    val mad = dev.agg(
      (percentile(col("dev2"), lit(0.5)) * 2).cast("bigint").as("mad4"))
    dev.crossJoin(broadcast(mad))
      .filter(col("dev2") * 2 > lit(3) * col("mad4"))
      .select(col("minute"), col("n"), col("med2"), col("dev2"),
        col("mad4"))
      .orderBy("minute")
  }

  val anomalySql: String =
    """WITH pm AS (SELECT CAST(date_trunc('minute', ts) AS TIMESTAMP)
      |    AS minute, CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1),
      |m AS (SELECT CAST(quantile_cont(n, 0.5) * 2 AS BIGINT) AS med2
      |      FROM pm),
      |d AS (SELECT minute, n, med2, abs(n * 2 - med2) AS dev2
      |      FROM pm CROSS JOIN m),
      |md AS (SELECT CAST(quantile_cont(dev2, 0.5) * 2 AS BIGINT) AS mad4
      |       FROM d)
      |SELECT minute, n, med2, CAST(dev2 AS BIGINT) AS dev2, mad4
      |FROM d CROSS JOIN md
      |WHERE dev2 * 2 > 3 * mad4
      |ORDER BY minute""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_events_gapfill" -> gapfill,
    "q_events_attribution" -> attribution,
    "q_events_anomaly" -> anomaly,
    "q_events_funnel" -> funnel,
    "q_events_retention" -> retention,
    "q_events_tumbling" -> tumbling,
    "q_events_sliding" -> sliding,
    "q_events_sessionize" -> sessionize,
    "q_events_json_agg" -> jsonAgg,
    "q_events_approx_distinct" -> approxDistinct,
  )

  val oracleSql: Map[String, String] = Map(
    "q_events_gapfill" -> gapfillSql,
    "q_events_attribution" -> attributionSql,
    "q_events_anomaly" -> anomalySql,
    "q_events_funnel" -> funnelSql,
    "q_events_retention" -> retentionSql,
    "q_events_tumbling" -> tumblingSql,
    "q_events_sliding" -> slidingSql,
    "q_events_sessionize" -> sessionizeSql,
    "q_events_json_agg" -> jsonAggSql,
    "q_events_approx_distinct" -> approxDistinctSql,
  )
}
