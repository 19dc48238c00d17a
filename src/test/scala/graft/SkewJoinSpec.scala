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

  test("q_join_salted: sort-merge on (key, salt), salt spreads the hot key") {
    val sf = "/root/testdata/sf0.001"
    val df = graft.ops.RelationalQueries.joinSalted(spark, sf)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("SortMergeJoin"),
      s"salted demo must run the two-big-sides SMJ path:\n$phys")
    assert(!phys.contains("BroadcastHashJoin"),
      "a broadcast would make the salting demonstration vacuous")
    // the salt is part of the join key → hot suppkey rows spread over
    // S partitions: check the partitioning expression mentions salt
    assert(phys.contains("salt"), "salt must be in the shuffle key")
    // salting is invisible in the values: equals the plain join
    val plain = {
      val li = graft.Tables.load(spark, sf, "lineitem")
        .select("l_suppkey", "l_quantity")
      val sup = graft.Tables.load(spark, sf, "supplier")
        .select("s_suppkey", "s_name")
      li.join(sup, li("l_suppkey") === sup("s_suppkey"))
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("total_qty"))
        .orderBy("s_suppkey")
    }
    assert(df.collect().toSeq == plain.collect().toSeq)
  }
}
