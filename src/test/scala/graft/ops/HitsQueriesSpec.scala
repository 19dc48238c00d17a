package graft.ops

import graft.SparkSuite

/** Plan + semantics evidence for the ClickBench-class hits queries: the
  * value contract is the DuckDB oracle; this spec pins the SCAN and CUT
  * shapes — derived-column pruning back to the source parquet, heap
  * top-K instead of global sorts, and partial aggregation — the
  * properties that carry the wide-single-table class to 100 TB. */
class HitsQueriesSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def readSchema(phys: String): String =
    "ReadSchema: struct<[^>]*>".r.findFirstIn(phys).getOrElse("")

  test("top urls: scan reads ONLY event_id; heap cut, no global sort") {
    val df = HitsQueries.topUrls(spark, sf)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("TakeOrderedAndProject"),
      "top-20 must be a heap cut, not a global sort + limit")
    // every output column derives from event_id alone — the projection
    // must prune the other 5 source columns out of the parquet scan
    val rs = readSchema(phys)
    assert(rs.contains("event_id") && !rs.contains("props") &&
      !rs.contains("user_id") && !rs.contains("value"),
      s"derived-column pruning failed: $rs")
    assert(phys.contains("HashAggregate"), "map-side combined count")
    val rows = df.collect()
    assert(rows.length === 20 &&
      rows.forall(_.getString(0).startsWith("https://site")))
  }

  test("slow pages: narrow projection prunes to event_id, bounded cut") {
    val df = HitsQueries.slowPages(spark, sf)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("TakeOrderedAndProject"))
    val rs = readSchema(phys)
    assert(rs.contains("event_id") && !rs.contains("user_id") &&
      !rs.contains("event_type"), s"pruning failed: $rs")
    // ~1% selectivity: 12 survivors at sf0.001 (< the 15 cut), a full
    // 15 from sf0.01 up
    assert(df.count() >= 10, "the selective filter must still hit rows")
  }

  test("uniques: per-domain distinct, HLL contract true, no joins") {
    val df = HitsQueries.uniques(spark, sf)
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("Join"), "single-table class: no joins")
    val rows = df.collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(1) <= r.getLong(2))
      assert(r.getBoolean(3), s"HLL bound blown: $r")
    }
  }

  test("mobile ua: OS coherent with device class, durations exact") {
    val rows = HitsQueries.mobileUa(spark, sf).collect()
    val mobileOs = rows.filter(_.getBoolean(0)).map(_.getString(1)).toSet
    val desktopOs = rows.filter(!_.getBoolean(0)).map(_.getString(1)).toSet
    assert(mobileOs.subsetOf(Set("android", "ios")))
    assert(desktopOs.subsetOf(Set("windows", "macos", "linux")))
    // ~40% mobile by construction
    val n = rows.map(_.getLong(2)).sum.toDouble
    val mob = rows.filter(_.getBoolean(0)).map(_.getLong(2)).sum / n
    assert(mob > 0.3 && mob < 0.5, s"mobile share $mob out of range")
  }

  test("hourly: time bucketing scans only event_id + ts") {
    val df = HitsQueries.hourly(spark, sf)
    val rs = readSchema(df.queryExecution.executedPlan.toString)
    assert(rs.contains("event_id") && rs.contains("ts") &&
      !rs.contains("user_id"), s"pruning failed: $rs")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(2) > 0))
  }

  test("hourly: UTC guard resolves the REAL session zone, aliases included") {
    // ts is TIMESTAMP_NTZ, so the CORRECT hourly buckets are the same
    // under every session zone (date_trunc on a naive timestamp is
    // session-independent). The integer-bucket fast path reaches the
    // same answer only when the session zone is UTC — under a
    // half-hour zone its instant-hour boundaries land at :30 wall time
    // and the buckets silently shift. The guard must therefore (a)
    // keep the fast path for fixed-offset UTC aliases, and (b) fall
    // back under any real zone — proven by output EQUALITY across
    // zones, which only holds if the fallback actually branches.
    val utcRows = HitsQueries.hourly(spark, sf).collect().toSeq
    def underTz(tz: String) = {
      val saved = spark.conf.get("spark.sql.session.timeZone")
      spark.conf.set("spark.sql.session.timeZone", tz)
      try HitsQueries.hourly(spark, sf).collect().toSeq
      finally spark.conf.set("spark.sql.session.timeZone", saved)
    }
    assert(underTz("Etc/UTC") === utcRows,
      "Etc/UTC must take the same (fast) path as UTC")
    assert(underTz("Asia/Kolkata") === utcRows,
      "a half-hour zone must fall back to the per-row path and still " +
        "produce the session-independent NTZ buckets")
  }

  test("scan stats: one-pass scalar aggregate, integer-exact avg") {
    val df = HitsQueries.scanStats(spark, sf)
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("Join") && !phys.contains("Window"))
    val r = df.collect().head
    val n = r.getAs[Long]("n")
    assert(n === 1000L)
    assert(r.getAs[Long]("avg_ms") ===
      r.getAs[Long]("total_ms") / n, "avg must be the exact integer div")
  }

  test("sum wide: 30 sum expressions stay ONE aggregate, one scan") {
    val df = HitsQueries.sumWide(spark, sf)
    val phys = df.queryExecution.executedPlan.toString
    // one partial + one final HashAggregate — not a job per expression
    assert("HashAggregate".r.findAllIn(phys).size === 2,
      "30 sums must ride a single partial/final aggregate pair")
    val rs = readSchema(phys)
    assert(rs.contains("event_id") && !rs.contains("user_id"),
      s"width derives from event_id alone: $rs")
    val r = df.collect().head
    // sum(width + k) = sum(width) + k*n exactly
    val w0 = r.getAs[Long]("w00")
    (1 until 30).foreach { k =>
      assert(r.getAs[Long](f"w$k%02d") === w0 + k * 1000L)
    }
  }

  test("power users: nearly-unique composite group key, heap cut") {
    val df = HitsQueries.powerUsers(spark, sf)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("TakeOrderedAndProject"),
      "top-10 over corpus-sized groups must be a heap cut")
    val rows = df.collect()
    assert(rows.length === 10)
    // n DESC with full-key tiebreak: verify the sort is honored
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.sameElements(ns.sortBy(-_)))
  }

  test("date window: ts predicate pushes into the parquet scan") {
    val df = HitsQueries.dateWindow(spark, sf)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("PushedFilters") &&
      (phys.contains("GreaterThanOrEqual(ts") ||
        phys.contains("GreaterThanOrEqual(`ts`")),
      s"ts range must reach the scan: " +
        "PushedFilters".r.findAllIn(phys).mkString(","))
    assert(phys.contains("TakeOrderedAndProject"))
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall { r =>
      val t = r.getAs[Any]("ts").toString
      t >= "2024-01-08" && t < "2024-01-15"
    })
  }

  test("adv counts / phrase like / url domains / minute user: shapes") {
    val adv = HitsQueries.advCounts(spark, sf).collect()
    assert(adv.length === 17 && adv.forall(_.getAs[Long]("adv") != 0L))
    val ph = HitsQueries.phraseLike(spark, sf).collect()
    // %w1% over kw0..kw49 matches kw1 and kw10..kw19 — at most 11
    // phrases; the ~50 phrase-carrying rows at sf0.001 surface a subset
    assert(ph.nonEmpty && ph.length <= 11 &&
      ph.forall(_.getAs[String]("phrase").contains("w1")))
    val ud = HitsQueries.urlDomains(spark, sf).collect()
    assert(ud.length === 20 &&
      ud.forall(_.getAs[String]("site").startsWith("site")))
    val mu = HitsQueries.minuteUser(spark, sf).collect()
    assert(mu.length === 10)
    val wh = HitsQueries.widthHist(spark, sf).collect()
    assert(wh.map(_.getAs[Int]("width")).toSet ===
      Set(320, 768, 1024, 1366, 1920))
  }

  test("mv hourly: MV state equals a from-scratch recompute of net rows") {
    import org.apache.spark.sql.functions._
    val mvRows = LakeQueries.hitsMvHourly(spark, sf).collect()
    // net rows: all hits minus the bot-purge deletes (the v2 inserts
    // restore the held-out quarter) — recompute the rollup directly
    val direct = HitsQueries.hits(spark, sf)
      .filter(!(col("hit_id") % 4 =!= 3 && col("hit_id") % 50 === 0))
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("is_mobile"))
      .agg(count(lit(1)).as("n"), sum("duration_ms").as("total_ms"),
        max("duration_ms").as("max_ms"))
      .orderBy("hour", "is_mobile").collect()
    assert(mvRows.length === direct.length)
    mvRows.zip(direct).foreach { case (a, b) =>
      assert(a.getAs[Any]("hour") === b.getAs[Any]("hour"))
      assert(a.getAs[Boolean]("is_mobile") === b.getAs[Boolean]("is_mobile"))
      assert(a.getAs[Long]("n") === b.getAs[Long]("n"))
      assert(a.getAs[Long]("total_ms") === b.getAs[Long]("total_ms"))
      assert(a.getAs[Long]("max_ms") === b.getAs[Long]("max_ms"))
    }
  }

  test("page offset: bounded top-(offset+k) cut, page 101 exact") {
    val df = HitsQueries.pageOffset(spark, sf)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("TakeOrderedAndProject"),
      "offset+limit must ride one bounded heap cut, not a global sort")
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    // recompute the cut directly over the full aggregated stream
    val all = HitsQueries.hits(spark, sf)
      .groupBy("dom", "page").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => (r.getLong(2), r.getLong(0), r.getLong(1)))
      .sortBy { case (n, d, p) => (-n, d, p) }
      .slice(1000, 1010).map { case (_, d, p) => (d, p) }
    assert(got.toSeq === all.toSeq)
  }

  test("adv window: ts pushdown + packed-set uniques, organic excluded") {
    val df = HitsQueries.advWindow(spark, sf)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("PushedFilters") &&
      phys.contains("GreaterThanOrEqual(ts"), "ts range must reach the scan")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall { r =>
      r.getLong(0) != 0L && r.getLong(2) <= r.getLong(1)
    })
  }

  test("regex + phrases: filters keep real selectivity at the gate SF") {
    // regex: exactly the 100 of 1000 pages matching page/1dd per domain
    val rx = HitsQueries.regexUrls(spark, sf).collect()
    assert(rx.nonEmpty && rx.forall(r => r.getLong(2) <= 100))
    val ph = HitsQueries.searchPhrases(spark, sf).collect()
    assert(ph.length === 10 &&
      ph.forall(_.getString(0).startsWith("kw")))
  }

  test("regex urls: url is injective in page per dom (oracle parity pin)") {
    // regexUrls counts DISTINCT page (packed-set on the integer
    // parent) while the oracle counts DISTINCT url — equal ONLY while
    // urlFrom(dom, page) stays injective in page for a fixed dom. A
    // drive-by change to the url format (e.g. dropping the '/page/'
    // separator) would silently break that equivalence; this pins it
    // on the fixture instead of a comment.
    import org.apache.spark.sql.functions._
    val bad = HitsQueries.hits(spark, sf)
      .groupBy("dom")
      .agg(countDistinct(col("page")).as("pages"),
        countDistinct(col("url")).as("urls"))
      .filter(col("pages") =!= col("urls"))
      .count()
    assert(bad === 0L,
      "urlFrom(dom, page) no longer injective in page per dom — " +
        "regexUrls' DISTINCT page shortcut diverges from the oracle")
  }
}
