package graft.ops

import graft.SparkSuite

/** Plan-shape evidence for the TPC-H snowflake queries: the value
  * contract lives in the DuckDB oracle; what the oracle can't see is
  * WHICH plan Spark picked — the thing that decides whether the query
  * survives a 100× scale-up. */
class TpchPlanSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("q5: dimensions broadcast, at most the one orderkey shuffle join") {
    val df = RelationalQueries.q5Revenue(spark, sf)
    val phys = df.queryExecution.executedPlan.toString
    val bhj = "BroadcastHashJoin".r.findAllIn(phys).length
    assert(bhj >= 4, s"expected >=4 broadcast joins, got $bhj:\n$phys")
    assert(!phys.contains("CartesianProduct") &&
      !phys.contains("BroadcastNestedLoopJoin"), "no all-pairs joins")
    val shuffleJoins =
      "SortMergeJoin|ShuffledHashJoin".r.findAllIn(phys).length
    assert(shuffleJoins <= 1,
      s"fact-fact orderkey join is the only allowed shuffle join:\n$phys")
    // scan pruning: lineitem reads only the 4 referenced columns
    assert(phys.contains("l_orderkey") && !phys.contains("l_comment"),
      "column pruning reached the lineitem scan")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getDouble(1) > 0))
  }

  test("q10: filters reach both fact scans, TakeOrdered cut, no global sort") {
    val df = RelationalQueries.q10Returns(spark, sf)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("TakeOrderedAndProject"),
      "top-20 must be a heap cut, not a global sort + limit")
    // the selective predicates ride the scans
    assert("PushedFilters: \\[[^\\]]*l_returnflag".r
      .findFirstIn(phys).isDefined, s"returnflag not pushed:\n$phys")
    assert("PushedFilters: \\[[^\\]]*o_orderdate".r
      .findFirstIn(phys).isDefined, s"date window not pushed:\n$phys")
    assert(!phys.contains("CartesianProduct") &&
      !phys.contains("BroadcastNestedLoopJoin"))
    val rows = df.collect()
    assert(rows.length <= 20 && rows.nonEmpty)
  }
}
