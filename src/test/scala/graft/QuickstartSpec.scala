package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.lake.Mooncake

/** End-to-end replay of the reference's quick start
  * (`/root/reference/README.md:67-92`): create a trades source, mirror
  * it, run the analytics query through the mirror — the avg must be
  * 208.5 — then stream one more trade in and watch the answer move with
  * read-your-writes freshness. */
class QuickstartSpec extends SparkSuite {
  import spark.implicits._

  test("README trades quickstart: avg(price) for AMZN = 208.5") {
    val lake = new Mooncake(tmpDir("quickstart"))
    val trades = Seq(
      (1L, "AMZN", Timestamp.valueOf("2025-05-27 09:30:00"), 210.0f),
      (2L, "AMZN", Timestamp.valueOf("2025-05-27 09:35:00"), 207.0f),
      (3L, "GOOG", Timestamp.valueOf("2025-05-27 09:30:00"), 87.0f),
      (4L, "GOOG", Timestamp.valueOf("2025-05-27 09:35:00"), 88.5f))
      .toDF("id", "symbol", "time", "price")
    lake.createTable(spark, "trades_iceberg", trades, Seq("id"))

    val avg1 = lake.read(spark, "trades_iceberg", atLeastVersion = Some(1))
      .filter(col("symbol") === "AMZN")
      .agg(avg(col("price"))).as[Double].head()
    assert(avg1 === 208.5)

    // one more AMZN trade arrives via CDC; the next read must see it
    val more = Seq((5L, "AMZN", Timestamp.valueOf("2025-05-27 09:40:00"),
      213.0f, "I")).toDF("id", "symbol", "time", "price", "__op")
    lake.applyChanges(spark, "trades_iceberg", more, version = 2)
    val avg2 = lake.read(spark, "trades_iceberg", atLeastVersion = Some(2))
      .filter(col("symbol") === "AMZN")
      .agg(avg(col("price"))).as[Double].head()
    assert(avg2 === 210.0)
  }
}
