package graft

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Co-located joins via bucketing: writing both fact tables bucketed by
  * the join key lets the join run with NO shuffle exchange — the layout
  * you'd give the biggest recurring join at 100 TB. The assertion is on
  * the physical plan, not just the result. */
class BucketingSpec extends SparkSuite {

  test("bucketed-by-key join plans without a shuffle exchange") {
    // Force sort-merge joins: with broadcast allowed the assertion would
    // be vacuous (a BroadcastHashJoin has no hash exchange either).
    val prev = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try testBody() finally {
      prev.fold(spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
      prevA.fold(spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", _))
    }
  }

  private def testBody(): Unit = {
    // spark.sql.warehouse.dir is static — tables land in the default
    // ./spark-warehouse (gitignored). Clean any leftover locations from
    // aborted runs: DROP TABLE alone won't clear an orphaned dir.
    spark.sql("CREATE DATABASE IF NOT EXISTS bspec")
    Seq("orders_b", "lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS bspec.$t")
      val loc = java.nio.file.Paths.get(s"spark-warehouse/bspec.db/$t")
      if (java.nio.file.Files.exists(loc)) {
        val walk = java.nio.file.Files.walk(loc)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
        finally walk.close()
      }
    }

    val dir = "/root/testdata/sf0.001"
    Tables.load(spark, dir, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("bspec.orders_b")
    Tables.load(spark, dir, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("bspec.lineitem_b")

    val joined = spark.table("bspec.lineitem_b")
      .join(spark.table("bspec.orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "o_orderstatus")

    joined.collect()
    // AQE prints final plan then "== Initial Plan ==" — audit the final
    // section only.
    val plan = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("Bucketed: true"), plan)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle either side:\n$plan")

    // same join over plain parquet DOES shuffle — the contrast that
    // proves the bucketing is what removed it
    val unbucketed = Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
    unbucketed.collect()
    assert(unbucketed.queryExecution.executedPlan.toString
      .contains("Exchange hashpartitioning"))
  }
}
