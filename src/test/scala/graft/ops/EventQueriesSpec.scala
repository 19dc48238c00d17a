package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Checks the oracle can't express: sketch accuracy. */
class EventQueriesSpec extends SparkSuite {
  import spark.implicits._

  test("approx_count_distinct (HLL) within its rsd bound of exact") {
    val sf = "/root/testdata/sf0.01"
    val approx = EventQueries.approxDistinct(spark, sf)
      .select("event_type", "approx_users")
      .as[(String, Long)].collect().toMap
    val exact = graft.Tables.load(spark, sf, "events")
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k).toDouble
      // rsd=0.02 requested; allow 4 sigma
      assert(math.abs(ap - ex) / ex <= 0.08,
        s"$k: approx $ap vs exact $ex")
    }
  }
}
