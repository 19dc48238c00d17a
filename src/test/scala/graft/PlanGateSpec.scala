package graft

import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Registry-wide plan-shape gate: every SparkEntry query's plan is
  * audited for the two mechanical 100×-scale hazards that code review
  * keeps finding by hand:
  *
  *   1. BroadcastNestedLoopJoin / CartesianProduct — all-pairs row
  *      growth unless both sides are bounded by construction;
  *   2. a FORCED broadcast() hint whose hinted subtree scans a
  *      corpus-scaling table with no bounding construct (limit or
  *      scalar aggregate) between the scan and the hint — an explicit
  *      hint bypasses Spark's size guard, so the driver collects a set
  *      that grows with the corpus (the r9 containment-dedup finding).
  *
  * Anything intentionally outside the rule needs an allowlist entry
  * HERE with a one-line justification of why the side is bounded — the
  * justification is the point: it forces the boundedness argument to be
  * written down next to the exception. */
class PlanGateSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  /** Tables whose size scales with the corpus: the facts and the
    * pipeline corpus. Dimensions (customer/part/supplier/nation/region)
    * are broadcast-by-design throughout the repo — TPC-H's star shape —
    * and are deliberately NOT in this set: the hazard class this gate
    * exists for is a forced broadcast that grows with the CORPUS (the
    * r9 containment boilerplate-set finding). */
  private val bigTables = Seq("lineitem", "orders", "events", "documents",
    "embeddings")

  /** query → why its nested-loop/cartesian join is bounded. A BNLJ is
    * fine exactly when the BROADCAST side is bounded and the join is a
    * per-row scan of that bounded side (a serving batch, a scalar, a
    * model table) — then it's a map-side operation over the streamed
    * corpus, not an all-pairs blowup. */
  private val allowedNestedLoop: Map[String, String] = Map(
    "q_join_cross" -> "explicit CROSS JOIN of region × nation — 5 × 25 rows by schema",
    "q_join_range" -> "DuckDB-parity range-join demonstration; q_join_range_binned is the scale path (equi-join on bin keys)",
    "q_dedup_embed" -> "brute-force cosine BASELINE by definition (one side broadcast, corpus streams once); q_dedup_embed_lsh is the scale path",
    "q_embed_topk" -> "serving query batch broadcast (contract-bounded), corpus streams once; non-equi self-exclusion makes it BNLJ",
    "q_mine_negatives" -> "anchor batch broadcast (serving-contract-bounded, the q_embed_topk shape); non-equi self-exclusion makes it BNLJ; the corpus streams ONCE into the max+BoundedTopK aggregate",
    "q_mine_bitext" -> "brute-force margin BASELINE by definition (one language broadcast, the other streams once); at scale candidate generation moves to the IVF probe (q_embed_index/ivf) and the margin math is unchanged",
    "q_embed_matryoshka" -> "serving query batch broadcast (contract-bounded, the q_embed_topk shape); non-equi self-exclusion makes it BNLJ; one corpus pass carries both cosines",
    "q_embed_ivf" -> "query batch × k centroids — both sides bounded (batch by serving contract, centroids by model size)",
    "q_embed_pq" -> "query batch × PQ codebook — both sides model-bounded",
    "q_embed_ivfpq" -> "query batch × k centroids (probe ranking) — batch by serving contract, centroids by model size; the corpus side is an equi-join on cluster",
    "q_embed_index" -> "query batch × persisted centroid table — both sides bounded; postings side is file-skipped, not nested-looped",
    "q_sample_importance" -> "1-row scalar normalization constants cross-joined onto the token stream",
    "q_text_bm25" -> "1-row corpus stats (N, avgdl) cross-joined onto the scored stream",
    "q_text_perplexity" -> "1-row LM normalization total cross-joined onto the token stream",
    "q_text_heavy_hitters" -> "1-row exact-count total cross-joined for the in-band contract columns",
    "q_events_funnel" -> "three 1-row stage-count aggregates cross-joined into the single-row conversion report — every side is a scalar by construction",
    "q_events_anomaly" -> "two 1-row exact-median scalars cross-joined onto the calendar-sized minute frame — scalar aggregates by construction; the frame is calendar-bounded, not event-sized",
    "q_rank_fusion" -> "single query vector (limit-1 point filter on the unique vec_id) broadcast onto the one-pass cosine scan; both top-k legs end in TakeOrdered before the fusion join",
    "q22_prospects" -> "1-row scalar threshold (global ungrouped aggregate) cross-joined onto the customer stream — the TPC-H Q22 avg-balance subquery shape; the NOT EXISTS leg is a hash anti join",
    "q_text_countmin" -> "1-row Count-Min sketch + total (global ungrouped aggregate, 64 KB by construction) cross-joined onto the 10-row exact harness frame — the q_text_bm25 scalar-stats shape",
    "q11_stock" -> "1-row scalar total-inventory-value (global ungrouped aggregate) cross-joined onto the per-part aggregate — the TPC-H Q11 FRACTION-threshold subquery shape",
    "q15_top_supplier" -> "1-row scalar max-revenue (global ungrouped aggregate) cross-joined onto the per-supplier revenue view — the TPC-H Q15 max= selection shape",
  )

  /** query → why its forced broadcast of a corpus-derived subtree is
    * bounded by contract. These are the explicit hints the r9 verdict
    * asked this gate to police: each one's hinted side must have a
    * written reason it does NOT grow with the corpus. */
  private val allowedBroadcast: Map[String, String] = Map(
    "q_contamination" -> "evaluation-suite shingles — the eval benchmark is thousands of prompts by contract, not corpus-scaling",
    "q_decontaminate_bloom" -> "evaluation-suite shingles (exact harness leg of the Bloom contract) — eval suite is contract-bounded",
    "q_dedup_embed" -> "brute-force baseline variant by definition; the LSH twin carries the 100 TB shape",
    "q_embed_topk" -> "serving query batch — broadcast-sized by the serving contract; the corpus side streams",
    "q_mine_negatives" -> "anchor batch — broadcast-sized by the serving contract; the corpus side streams into a single bounded-state aggregation",
    "q_mine_bitext" -> "brute-force margin baseline variant by definition (the q_dedup_embed precedent); the IVF probe carries the 100 TB candidate shape",
    "q_embed_matryoshka" -> "serving query batch — broadcast-sized by the serving contract; the corpus side streams once",
    "q_embed_ivf" -> "query batch and k centroids — model/contract-bounded",
    "q_embed_pq" -> "query batch and 256-entry-per-subspace codebook — model-bounded",
    "q_embed_ivfpq" -> "query batch and k centroids — model/contract-bounded; ADC codes stream through an equi-join, never broadcast",
    "q_embed_index" -> "query batch and persisted centroid table (k rows) — model-bounded",
    "q_embed_outliers" -> "per-label integer centroids — bounded by the label domain, not the corpus",
    "q_quantile_sketch" -> "GK sketch result exploded for the in-band contract — O(1/eps) entries by the sketch's state bound",
    "q_sample_importance" -> "hashed n-gram target/proposal histograms — fixed bucket count by construction",
    "q_sample_stratified" -> "per-stratum quotas — strata are the fixed language-label domain",
    "q_text_bm25" -> "document-frequency table — vocabulary-sized (sublinear in the corpus, Heaps' law); scored stream never shuffles",
    "q_rank_fusion" -> "inherits q_text_bm25's document-frequency broadcast via the shared bm25Scored leg — vocabulary-sized, sublinear in the corpus",
    "q_text_perplexity" -> "hashed-bucket LM table — fixed bucket count by construction",
    "q_text_bpe_pairs" -> "unigram count table for pair scoring — vocabulary-sized (sublinear in the corpus)",
    "q_text_heavy_hitters" -> "Misra-Gries sketch output — at most m entries by the aggregate's state bound",
    // The four below are EXACT-COUNT-GATED (BroadcastGate
    // .maybeBroadcastCounted): the hint exists in the plan only when a
    // counting job just measured the side under the row cap, and the
    // same query degrades to the shuffle join above it — runtime
    // enforcement of the bound this allowlist otherwise documents.
    "q4_priority" -> "quarter-filtered orders behind the exact-count gate; over the cap the spelling flips to the shuffle semi join",
    "q5_local_revenue" -> "year+region-reduced orders⋈customer keys behind the exact-count gate; shuffle join over the cap",
    "q10_returns" -> "quarter-filtered orders behind the exact-count gate; shuffle join over the cap",
    "q21_waiting" -> "l1's order-key set (counted) and the F-orders it semi-selects (bounded by that same count); both collapse to shuffle semi joins over the cap",
  )

  test("no cartesian/nested-loop joins or corpus-derived forced broadcasts") {
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df =
        try fn(spark, sfDir)
        catch {
          case e: Throwable =>
            failures += s"$name: query build failed: ${e.getMessage}"
            null
        }
      if (df != null) {
        val phys = df.queryExecution.executedPlan.toString
        if ((phys.contains("BroadcastNestedLoopJoin") ||
            phys.contains("CartesianProduct")) &&
            !allowedNestedLoop.contains(name))
          failures += s"$name: nested-loop/cartesian join in physical plan"
        df.queryExecution.optimizedPlan.foreach {
          case j: Join =>
            Seq(j.hint.leftHint -> j.left, j.hint.rightHint -> j.right)
              .foreach {
                case (Some(h), side)
                    if h.strategy.contains(BROADCAST) && risky(side) &&
                      !allowedBroadcast.contains(name) =>
                  failures += s"$name: forced broadcast over an unbounded " +
                    s"corpus-derived subtree:\n${side.treeString}"
                case _ =>
              }
          case _ =>
        }
      }
    }
    assert(failures.isEmpty,
      s"${failures.length} plan-gate failures:\n${failures.mkString("\n")}")
  }

  /** The r13 verdict's cluster-window hazard, held closed mechanically:
    * per-cluster facts (size, canonical keep, majority label) must come
    * from groupBy aggregates (map-side partials absorb a giant
    * component) joined back — never from a window partitioned on the
    * component key, which funnels the whole component through ONE task.
    * Windows on other keys (per-source rank, per-query kNN) stay legal. */
  test("cluster-consume legs aggregate, never window, on the component key") {
    val hotKeys = Set("comp", "rep", "community", "mc", "cluster_rep")
    Seq("q_dedup_clusters", "q_dedup_canonical", "q_embed_communities",
      "q_split_leakproof").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val bad = df.queryExecution.optimizedPlan.collect {
        case w: Window if w.partitionSpec.exists(
          _.references.exists(a => hotKeys(a.name))) => w
      }
      assert(bad.isEmpty,
        s"$name: component-keyed Window in optimized plan — a giant " +
          s"near-dup component would single-task it:\n${bad.mkString("\n")}")
      // max_by's struct ordering buffer makes Spark pick Object/Sort
      // aggregate variants — all of them partial-aggregate map-side,
      // which is the property that absorbs the hot key. (leakproof
      // computes no per-cluster fact — its rep→split map is per-row.)
      if (name != "q_split_leakproof") {
        val phys = df.queryExecution.executedPlan.toString
        assert(phys.contains("Aggregate"),
          s"$name: expected aggregate-based cluster facts in physical plan")
      }
    }
  }

  /** A subtree is bounded when a limit or a scalar (ungrouped) aggregate
    * caps its cardinality above every corpus scan. The walk peels
    * cardinality-preserving nodes (project/filter/window/sort), treats
    * a grouped aggregate as bounded iff its child is (output ≤ input),
    * and a join/union as bounded iff every child is; row-EXPANDING
    * nodes (Generate/Expand) stop the walk. */
  private def bounded(p: LogicalPlan): Boolean = p match {
    case _: GlobalLimit | _: LocalLimit => true
    case a: Aggregate =>
      a.groupingExpressions.isEmpty || bounded(a.child)
    case _: Project | _: Filter | _: SubqueryAlias | _: Distinct |
        _: Window | _: Sort | _: RepartitionOperation =>
      bounded(p.children.head)
    case j: Join => bounded(j.left) && bounded(j.right)
    case u: Union => u.children.forall(bounded)
    case d: Deduplicate => bounded(d.child)
    case _ => false
  }

  private def scansBig(p: LogicalPlan): Boolean = p.collectLeaves().exists {
    case l: LogicalRelation =>
      l.relation match {
        case f: HadoopFsRelation => f.location.rootPaths.exists(rp =>
          bigTables.exists(t => rp.toString.contains(t)))
        case _ => false
      }
    case _ => false
  }

  private def risky(p: LogicalPlan): Boolean = !bounded(p) && scansBig(p)
}
