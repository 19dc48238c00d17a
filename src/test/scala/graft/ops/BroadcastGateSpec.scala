package graft.ops

import graft.SparkSuite

/** The scale-cliff gate of [[BroadcastGate]]: a hinted dimension must
  * broadcast at bench scale and DEGRADE to a shuffle join — not
  * driver-OOM — when its size estimate outgrows the ceiling. Plans are
  * inspected pre-execution (`sparkPlan`): join strategy selection is a
  * planning decision, so no job needs to run. */
class BroadcastGateSpec extends SparkSuite {

  private def planOf(dimRows: Long, factRows: Long = 1000L): String = {
    val dim = spark.range(dimRows).selectExpr("id AS k", "id * 2 AS v")
    val fact = spark.range(factRows).selectExpr("id AS k")
    fact.join(BroadcastGate.maybeBroadcast(dim), "k")
      .queryExecution.sparkPlan.toString
  }

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("under the ceiling the hint applies: BHJ even with auto-broadcast off") {
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = planOf(100L) // ~1.6 KB of plan-stat bytes
      assert(plan.contains("BroadcastHashJoin"),
        s"small dim must broadcast via the hint:\n$plan")
    }
  }

  test("an oversized dimension degrades to a shuffle join, never a hinted broadcast") {
    // 1B-row synthetic customer against a 1B-row fact: plan stats
    // ≈ 16 GB/side >> the 64 MiB default ceiling AND the auto-broadcast
    // threshold. The gate must withhold the hint so Catalyst picks
    // sort-merge — the plan that survives 15 B rows. (With a TINY fact
    // side, withholding the hint correctly lets auto-broadcast flip to
    // the fact side instead — also a safe degrade.)
    val plan = planOf(1000000000L, factRows = 1000000000L)
    assert(!plan.contains("BroadcastHashJoin"),
      s"oversized dim must not be broadcast-hinted:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"oversized dim must take a shuffle join:\n$plan")
  }

  test("the ceiling is session-configurable") {
    withConf("spark.graft.maxBroadcastBytes" -> "1",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = planOf(100L)
      assert(!plan.contains("BroadcastHashJoin"),
        s"a 1-byte ceiling must demote every hint:\n$plan")
    }
  }

  test("shuffle-hash gate: hinted under the per-partition ceiling, default above it") {
    val small = spark.range(1000L).selectExpr("id AS k", "id % 2 = 0 AS flag")
    val fact = spark.range(100000L).selectExpr("id AS k")
    val hinted = fact.join(BroadcastGate.maybeShuffleHash(small), "k")
      .queryExecution.sparkPlan.toString
    assert(hinted.contains("ShuffledHashJoin"),
      s"small side must take the hinted shuffled-hash join:\n$hinted")
    // ~16 GB of plan-stat bytes >> 32 MiB x partitions: the hint must be
    // withheld so the planner keeps the spill-safe default.
    val huge = spark.range(1000000000L).selectExpr("id AS k", "id % 2 = 0 AS flag")
    val unhinted = fact.join(BroadcastGate.maybeShuffleHash(huge), "k")
      .queryExecution.sparkPlan.toString
    assert(!unhinted.contains("ShuffledHashJoin"),
      s"oversized side must not be pinned to a hash build:\n$unhinted")
  }

  test("counted gate, pass path: gated side is evaluated exactly ONCE") {
    // The counting job materializes the persisted frame; the broadcast
    // build must read the cache, not re-run the frame's plan. An
    // evaluation-counting expression (non-deterministic UDF backed by
    // an accumulator) exposes any re-execution.
    val evals = spark.sparkContext.longAccumulator("gate-evals")
    val tick = org.apache.spark.sql.functions.udf { (k: Long) =>
      evals.add(1L); k
    }.asNondeterministic()
    val dim = spark.range(100L).select(tick(org.apache.spark.sql.functions.col("id")).as("k"))
    val gated = BroadcastGate.maybeBroadcastCounted(dim)
    val fact = spark.range(1000L).selectExpr("id AS k")
    val plan = fact.join(gated, "k").queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan") || plan.contains("InMemoryRelation"),
      s"pass path must read the pinned cache:\n$plan")
    fact.join(gated, "k").write.format("noop").mode("overwrite").save()
    assert(evals.value === 100L,
      s"gated side must run once (count materializes the cache), " +
        s"got ${evals.value} row-evals for 100 rows")
  }

  test("reset() drains pins: a repeat pass re-executes the gated side") {
    // Bench's min-of-2 contract: pass 2 must pay the gated side's
    // compute itself. Without reset() the pass-1 pin is still cached,
    // the CacheManager matches pass 2's identical canonicalized plan,
    // and the accumulator would stay at 100 (pass 2 reads pass-1's
    // cache). With reset() between passes it fires in BOTH passes.
    val evals = spark.sparkContext.longAccumulator("gate-reset-evals")
    val tick = org.apache.spark.sql.functions.udf { (k: Long) =>
      evals.add(1L); k
    }.asNondeterministic()
    def pass(): Unit = {
      val dim = spark.range(100L)
        .select(tick(org.apache.spark.sql.functions.col("id")).as("k"))
      val gated = BroadcastGate.maybeBroadcastCounted(dim)
      val fact = spark.range(1000L).selectExpr("id AS k")
      fact.join(gated, "k").write.format("noop").mode("overwrite").save()
    }
    pass()
    BroadcastGate.reset()
    pass()
    BroadcastGate.reset()
    assert(evals.value === 200L,
      "the gated side must be evaluated once per pass (2 passes x 100 " +
        s"rows), got ${evals.value} row-evals — pass 2 read pass-1's cache")
  }

  test("counted gate, fail path: no hint, no pinned cache left behind") {
    withConf("spark.graft.maxBroadcastRows" -> "10") {
      val dim = spark.range(100L).selectExpr("id AS k", "id * 2 AS v")
      val gated = BroadcastGate.maybeBroadcastCounted(dim)
      val fact = spark.range(1000000000L).selectExpr("id AS k")
      val plan = fact.join(gated, "k").queryExecution.sparkPlan.toString
      assert(!plan.contains("InMemoryRelation") && !plan.contains("InMemoryTableScan"),
        s"fail path must return the UNPINNED original frame:\n$plan")
      assert(spark.sharedState.cacheManager
          .lookupCachedData(
            dim.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]])
          .isEmpty,
        "over-cap side's cache must be released immediately")
    }
  }
}
