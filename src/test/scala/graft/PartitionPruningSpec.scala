package graft

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Partition layout + pruning: a date-partitioned write must let a date
  * filter skip partitions at plan time (PartitionFilters), which is the
  * 100 TB time-series layout for the events table. */
class PartitionPruningSpec extends SparkSuite {
  import spark.implicits._

  test("date-partitioned layout prunes partitions at plan time") {
    val dir = tmpDir("events-part")
    Tables.load(spark, "/root/testdata/sf0.001", "events")
      .withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").mode("overwrite").parquet(dir)

    val q = spark.read.parquet(dir)
      .filter(col("day") === lit("2024-01-01").cast("date"))
      .agg(count(lit(1)).as("n"))
    val n = q.as[Long].head()
    assert(n > 0)

    val scan = q.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("FileScan")).mkString("\n")
    assert(scan.contains("PartitionFilters: [isnotnull(day"), scan)
    // and the filter must NOT degrade to a post-scan data filter
    assert(!scan.contains("PushedFilters: [IsNotNull(day)"), scan)
  }

  test("session_window: native gap-based streaming session aggregation") {
    implicit val sc = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, Long, Double)]
    val agg = input.toDF().toDF("ts", "user_id", "value")
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))

    input.addData(
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, 1.0),
      (java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), 1L, 2.0), // same session
      (java.sql.Timestamp.valueOf("2024-01-01 11:30:00"), 1L, 5.0)) // new session
    val q = agg.writeStream.format("memory").queryName("sess")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.sql("SELECT n, total FROM sess ORDER BY session_window.start")
      .as[(Long, Double)].collect().toSeq
    assert(got === Seq(2L -> 3.0, 1L -> 5.0))
  }
}
