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
}
