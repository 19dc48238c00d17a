package graft

import org.apache.spark.sql.functions._

/** Scale smoke: the core operator shapes on 50M rows (~80x the sf0.1
  * bench fact table) in one local JVM. Not a benchmark — an existence
  * proof that the plans stay partition-parallel with no driver-side
  * materialization: if anything collects or buffers per-key on the
  * driver, this test is what dies. */
class ScaleSmokeSpec extends SparkSuite {

  test("50M-row aggregate / broadcast join / window stay distributed") {
    val n = 50L * 1000 * 1000
    val fact = spark.range(0, n, 1, 32)
      .select(col("id"), (col("id") % 1000).as("k"),
        (col("id") % 97).cast("double").as("v"))

    // partial+final hash aggregate: one shuffle of 1000 groups
    val agg = fact.groupBy("k")
      .agg(count(lit(1)).as("c"), sum("v").as("s"))
    assert(agg.count() === 1000)

    // broadcast dim join + filtered count
    val dim = spark.range(0, 1000).select(col("id").as("k"),
      (col("id") % 2 === 0).as("even"))
    val joined = fact.join(broadcast(dim), "k").filter(col("even"))
    assert(joined.count() === n / 2)

    // ranked window over 1000 partitions of 50k rows each
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("id"))
    val top = fact.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
    assert(top.count() === 2000)
  }
}
