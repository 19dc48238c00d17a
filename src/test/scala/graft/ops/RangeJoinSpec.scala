package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** RangeJoin.binned must (a) produce exactly the theta-join's pairs —
  * including negative values, bin-boundary values, and intervals
  * spanning multiple bins — and (b) plan as a hash equi-join, not a
  * broadcast-nested-loop. */
class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  test("binned equals the theta join on adversarial data") {
    // values straddle zero and land exactly on bin boundaries
    val probe = (-50 to 50).map(i => (i.toLong, i * 7.5)).toDF("pid", "v")
    val build = Seq(
      (1L, -120.0, -30.0), // spans multiple bins, negative
      (2L, -10.0, 10.0),   // straddles zero
      (3L, 0.0, 0.0),      // degenerate point interval on a boundary
      (4L, 25.0, 400.0),   // wide interval
      (5L, 390.0, 395.0),  // interval with no probe hit
      (6L, 1e9, -1e9)      // inverted interval: matches nothing, no fan-out
    ).toDF("bid", "lo", "hi")

    val got = RangeJoin.binned(probe, "v", build, "lo", "hi", binWidth = 40.0)
      .select("pid", "bid").as[(Long, Long)].collect().toSet
    val want = probe.join(build, col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "bid").as[(Long, Long)].collect().toSet
    assert(got === want)
    assert(want.nonEmpty)

    // each qualifying pair exactly once
    val cnt = RangeJoin.binned(probe, "v", build, "lo", "hi", binWidth = 40.0)
      .groupBy("pid", "bid").count().filter(col("count") > 1).count()
    assert(cnt === 0L)
  }

  test("binned plans as a hash join, not broadcast-nested-loop") {
    val probe = spark.range(0, 1000).select(col("id").cast("double").as("v"))
    val build = spark.range(0, 100).select(
      (col("id") * 10).cast("double").as("lo"),
      (col("id") * 10 + 15).cast("double").as("hi"))
    val binned = RangeJoin.binned(probe, "v", build, "lo", "hi", 10.0)
    binned.collect()
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      plan.take(2000))
  }
}
