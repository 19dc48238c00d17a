package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation — the last
  * stage of a production dedup pipeline: near-dup PAIRS (from MinHash /
  * SimHash / embedding LSH) become CLUSTERS, and each cluster elects one
  * canonical representative (its min doc id) so every other member can
  * be dropped. The reference's dedup surface stops at pair emission; any
  * real 100 TB curation run needs this closure step or transitive
  * duplicates (A~B, B~C, A!~C) survive.
  *
  * Shape per iteration: one hash join (edges × labels, both partitioned
  * by the join key) + one min-aggregate — two shuffles of O(|E|) rows,
  * never O(n²). Iterations = graph diameter; near-dup graphs are
  * near-cliques from LSH banding, so 2-4 iterations in practice (the
  * alternating large-star/small-star variant of Kiveris et al. gives
  * O(log d) worst-case, not needed at clique-like diameters). The
  * driver-side loop holds only a changed-row COUNT per iteration —
  * labels never leave the executors (same fixpoint discipline as
  * [[KMeans.fit]]).
  */
object ConnectedComponents {

  /** Labels every vertex of the undirected graph `edges` (columns
    * `src`, `dst`) with the minimum vertex id reachable from it.
    * Returns (`id`, `comp`) for every vertex incident to an edge —
    * isolated vertices are the caller's no-op case.
    */
  def label(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    // No distinct: duplicate edges only duplicate offers, and min() is
    // idempotent — one shuffle saved (pair emitters already dedupe).
    val sym = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .cache()
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
      .cache()
    // The DataFrame actually pinned in the block cache this iteration
    // (labels is a projection of it after the first hop).
    var pinned = labels
    val compType = labels.schema("comp").dataType
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // Each vertex offers its current component to every neighbour; a
      // vertex keeps the min of its own label and all offers. The old
      // label rides along as `own` (non-null exactly on the vertex's
      // own row), so convergence detection (comp < own anywhere) comes
      // out of the SAME single-shuffle aggregate — no per-iteration
      // join, no second exchange.
      val offers = sym
        .join(labels.withColumnRenamed("id", "__dst"), col("dst") === col("__dst"))
        .select(col("src").as("id"), col("comp"),
          lit(null).cast(compType).as("own"))
      val next = labels.select(col("id"), col("comp"), col("comp").as("own"))
        .unionAll(offers)
        .groupBy("id").agg(min("comp").as("comp"), max("own").as("own"))
        .cache()
      changed = next.filter(col("comp") < col("own")).count()
      pinned.unpersist(blocking = false)
      pinned = next
      labels = next.select("id", "comp")
      iter += 1
    }
    sym.unpersist(blocking = false)
    labels
  }
}
