package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Checks the oracle can't express: sketch accuracy. */
class EventQueriesSpec extends SparkSuite {
  import spark.implicits._

  test("approx_count_distinct (HLL) within its rsd bound of exact") {
    // The query output IS the accuracy check now (the oracle compares
    // the boolean); assert it holds for every group, and that the
    // exact side is genuinely the distinct count.
    val sf = "/root/testdata/sf0.01"
    val rows = EventQueries.approxDistinct(spark, sf)
      .select("event_type", "exact_users", "approx_within_bound")
      .as[(String, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._3),
      rows.filterNot(_._3).mkString("out of bound: ", ", ", ""))
    val exact = graft.Tables.load(spark, sf, "events")
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    rows.foreach { case (k, ex, _) => assert(exact(k) === ex) }
  }
}
