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

  test("regex + phrases: filters keep real selectivity at the gate SF") {
    // regex: exactly the 100 of 1000 pages matching page/1dd per domain
    val rx = HitsQueries.regexUrls(spark, sf).collect()
    assert(rx.nonEmpty && rx.forall(r => r.getLong(2) <= 100))
    val ph = HitsQueries.searchPhrases(spark, sf).collect()
    assert(ph.length === 10 &&
      ph.forall(_.getString(0).startsWith("kw")))
  }
}
