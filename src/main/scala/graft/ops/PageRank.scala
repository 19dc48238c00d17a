package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Damped PageRank over an undirected edge list, in INTEGER micro-units
  * (1e6 = rank 1.0) with integral division everywhere — bit-identical
  * across engines (the DuckDB oracle unrolls the same hops with `//`),
  * no floating-point mass drift.
  *
  * Update rule per hop, d = 0.85 in percent arithmetic:
  *   r'(v) = 150000 + (85 · Σ_{(u,v)∈E} (r(u) div outdeg(u))) div 100
  * Nodes with no edges never enter the join and re-enter through the
  * left join at the base rank 150000 — the standard dangling-free
  * formulation over an undirected graph (every edge row has a reverse,
  * so outdeg ≥ 1 for any node in E).
  *
  * Scale shape — the pregel pattern as plain DataFrames: the caller's
  * edge list is symmetrized, out-degrees attached, and PINNED once
  * (persist) — each of the `iters` hops is then ONE hash join
  * ranks⋈edges plus one map-side-combined groupBy(dst); per-hop cost
  * O(|E|), driver work is only the loop counter. The pin is released
  * after `materialize` runs (count) so no cached partitions leak.
  */
object PageRank {

  /** `ids`: one column `id` (the node set, isolated nodes included).
    * `pairs`: columns `src`, `dst` — each UNDIRECTED pair once (both
    * directions are derived here). Returns (id, pr).
    *
    * ONE-RESULT LIFETIME: the returned frame's checkpoint blocks stay
    * alive only until the NEXT run() call ([[CheckpointScope]] releases
    * the previous invocation's blocks on re-entry — lifecycle hygiene
    * only; every invocation RECOMPUTES all hops from its inputs, results
    * are never memoized across calls). A caller that holds a returned
    * frame across a later run() and then acts on it gets a
    * missing-checkpoint-block SparkException, not a recompute
    * (localCheckpoint truncates lineage) — collect or copy first. */
  def run(ids: DataFrame, pairs: DataFrame, iters: Int): DataFrame = synchronized {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val edges = pairs
      .select(col("src"), col("dst"))
      .unionAll(pairs.select(col("dst").as("src"), col("src").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val ed = edges.join(deg, "src").persist()
    val nodes = ids.select(col("id"))
    var ranks = nodes.select(col("id"), lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      val contrib = ed.join(ranks, col("src") === col("id"))
        .selectExpr("dst", "r div outdeg AS c")
        .groupBy("dst").agg(sum(col("c")).as("in_sum"))
      ranks = nodes.join(contrib, col("id") === col("dst"), "left")
        .selectExpr("id",
          "CAST(150000 + (85 * coalesce(in_sum, 0)) div 100 AS BIGINT) AS r")
    }
    // Eager checkpoint, not count(): the result is read by the caller
    // (sort + write), and a bare count() would leave the 3-hop plan
    // un-materialized — the caller's execution re-ran every hop from
    // the pinned edges (measured as ~half this operator's wall). The
    // checkpoint materializes ONCE while the edge pin is hot; its
    // blocks are released by the NEXT invocation (CheckpointScope, or
    // the ContextCleaner for a dead session's).
    val out = CheckpointScope.checkpoint("pagerank.result",
      ranks.select(col("id"), col("r").as("pr")))
    ed.unpersist()
    out
  }
}
