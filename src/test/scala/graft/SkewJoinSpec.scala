package graft

import org.apache.spark.sql.functions._

/** AQE skew handling: a hot key that would pin one reducer gets split at
  * runtime (SortMergeJoin marked skew=true). This is the no-code-change
  * answer to join skew at 100 TB; q_salted_agg covers the explicit
  * salting alternative for aggregations, where AQE can't help. */
class SkewJoinSpec extends SparkSuite {

  test("AQE splits a skewed join partition (skew=true in the executed plan)") {
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "20KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k =>
      k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // key 1: 100k rows (hot); keys 2..50: 100 rows each.
      val fact = spark.range(0, 100000).select(lit(1L).as("k"),
          col("id").as("payload"))
        .unionAll(spark.range(0, 4900).select(
          (col("id") % 49 + 2).as("k"), col("id").as("payload")))
      val dim = spark.range(1, 51).select(col("id").as("k"),
        concat(lit("d"), col("id")).as("name"))
      // Global (ungrouped) aggregate downstream: no required hash
      // distribution above the join, so the skew rule is free to split,
      // and nothing for Catalyst to push below the join.
      val joined = fact.join(dim, "k")
        .agg(sum(col("payload")).as("s"), count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-split SMJ in:\n${plan.take(2000)}")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
