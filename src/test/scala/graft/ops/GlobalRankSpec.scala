package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The two-level global rank: exact equality with the single-sort
  * spelling, and a plan that range-partitions and ranks per partition
  * instead of pulling the corpus through one task's window. */
class GlobalRankSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("decomposed rank equals the single-sort rank exactly") {
    import spark.implicits._
    val got = RelationalQueries.windowRankGlobal(spark, sf)
      .as[(Long, Double, Long)].collect().sortBy(_._1)
    assert(got.nonEmpty)
    // independent single-JVM recompute: sort by (price desc, key asc)
    val want = got.map(r => (r._1, r._2))
      .sortBy { case (k, p) => (-p, k) }
      .zipWithIndex.map { case ((k, _), i) => k -> (i + 1L) }.toMap
    got.foreach { case (k, _, r) =>
      assert(r === want(k), s"order $k global rank")
    }
    // ranks are a permutation of 1..n (no gap, no dup)
    assert(got.map(_._3).sorted.toSeq === (1L to got.length).toSeq)
  }

  test("plan: range exchange + pid-partitioned window, never a corpus-wide window") {
    val df = RelationalQueries.windowRankGlobal(spark, sf)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.toLowerCase.contains("rangepartitioning"),
      s"rank key must range-repartition:\n$phys")
    // the ranking window is keyed by the range-partition id
    assert("windowspecdefinition\\(pid".r.findFirstIn(phys).isDefined,
      s"local rank must partition by pid:\n$phys")
    // the only unpartitioned window runs on the #partitions-row offset
    // frame — identified by its sum(n) over pid ordering
    val unpartitioned = "windowspecdefinition\\(o_"
    assert(unpartitioned.r.findFirstIn(phys).isEmpty,
      s"no corpus-keyed unpartitioned window allowed:\n$phys")
  }
}
