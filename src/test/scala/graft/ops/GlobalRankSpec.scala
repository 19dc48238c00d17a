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
    // the ranked stage (audited directly — the full query reads it
    // through a checkpoint that hides its lineage)
    val stage = RelationalQueries.rankedLocal(spark, sf)
    val sphys = stage.queryExecution.executedPlan.toString
    assert(sphys.toLowerCase.contains("rangepartitioning"),
      s"rank key must range-repartition:\n$sphys")
    assert("windowspecdefinition\\(pid".r.findFirstIn(sphys).isDefined,
      s"local rank must partition by pid:\n$sphys")
    // the assembled query: no corpus-keyed unpartitioned window — the
    // only unpartitioned window is the #partitions-row offset frame
    val phys = RelationalQueries.windowRankGlobal(spark, sf)
      .queryExecution.executedPlan.toString
    assert("windowspecdefinition\\(o_".r.findFirstIn(phys).isEmpty,
      s"no corpus-keyed unpartitioned window allowed:\n$phys")
    // both consumers read the ONE checkpointed partitioning (boundary
    // sampling must not run twice — rdd.id-seeded samples differ)
    assert(phys.contains("ExistingRDD") || phys.contains("Scan ExistingRDD"),
      s"ranked stage must be materialized once via checkpoint:\n$phys")
  }
}
