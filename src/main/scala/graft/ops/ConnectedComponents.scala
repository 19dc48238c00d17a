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
  * by the join key) + one min-aggregate + one pointer-jump self-join —
  * three shuffles of O(|E|) rows, never O(n²). The pointer jump
  * (comp := comp[comp], Shiloach-Vishkin style label compression) makes
  * the round count O(log diameter) instead of O(diameter): near-dup
  * graphs are near-cliques from LSH banding (2-4 rounds), and even a
  * pathological transitive chain of length 2^25 converges inside the
  * default maxIter. If the loop still exits un-converged it THROWS —
  * silently under-merged clusters are corrupt output, not a degraded
  * mode. The driver-side loop holds only a changed-row COUNT per
  * iteration — labels never leave the executors (same fixpoint
  * discipline as [[KMeans.fit]]).
  */
object ConnectedComponents {

  /** Edge count at or below which closure runs as a driver-local
    * union-find: the distributed loop costs three O(|E|) shuffles PLUS
    * several fixed-latency Spark jobs PER ROUND, which dominates below
    * millions of edges (measured: 3,392 mutual-kNN edges took 6.6 s in
    * the loop — pure round overhead — vs milliseconds of union-find).
    * 5M edges ≈ 80 MB collected — driver-sized by construction, gated
    * by an exact COUNT (one job over the pinned edge frame), never by
    * assumption, so a 100 TB pair explosion still takes the
    * distributed path. */
  val LocalEdgeThreshold: Long = 5_000_000L

  /** Labels every vertex of the undirected graph `edges` (columns
    * `src`, `dst`) with the minimum vertex id reachable from it.
    * Returns (`id`, `comp`) for every vertex incident to an edge —
    * isolated vertices are the caller's no-op case.
    *
    * Two closure strategies behind one contract: edge sets at or below
    * `localThreshold` (counted, not assumed) collapse in one
    * union-find on the driver; larger graphs run the distributed
    * min-label-propagation loop. Near-dup and mutual-kNN graphs are
    * k-bounded and band-thinned, so moderate scale factors sit far
    * under the threshold while the loop remains the 100 TB path. */
  def label(edges: DataFrame, maxIter: Int = 25,
      localThreshold: Long = LocalEdgeThreshold): DataFrame = {
    // Pin the (possibly expensive — LSH banding, kNN blocking) pair
    // generation ONCE; both the gate count and either strategy read
    // the materialized blocks. CheckpointScope releases the PREVIOUS
    // label() call's edge blocks on re-entry instead of stranding one
    // edge copy per call until the ContextCleaner runs.
    val e = CheckpointScope.checkpoint("cc.edges",
      edges.select(col("src"), col("dst")))
    // The local path casts ids to long, which is lossless only for
    // integral types — any other id type (string hash ids, decimals)
    // keeps the distributed loop's any-ordered-type contract.
    val integralIds = isIntegral(e.schema("src").dataType) &&
      isIntegral(e.schema("dst").dataType)
    if (integralIds && e.count() <= localThreshold) labelLocal(e)
    else labelDistributed(e, maxIter)
  }

  private def isIntegral(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }

  /** Driver-local closure: union-find with path halving + union by
    * min, O(E α(E)). Only reached through [[label]]'s exact-count +
    * integral-id gate, so the footprint is driver-sized by
    * construction — and PRIMITIVE by construction: edges stream in via
    * toLocalIterator (one partition of boxed rows at a time, never the
    * whole edge set boxed at once) into flat long arrays, the vertex
    * dictionary is a sorted deduped long array, and union-find runs on
    * int indices into it. At the 5M-edge ceiling that is ~80 MB of
    * edge longs + ~120 MB dictionary/parent — an order of magnitude
    * under the boxed-HashMap equivalent. Index order equals id order
    * (dictionary is sorted), so union-by-min-index IS union-by-min-id
    * and the root index's id is the component label. */
  private def labelLocal(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    val idType = e.schema("src").dataType
    val srcB = new scala.collection.mutable.ArrayBuilder.ofLong
    val dstB = new scala.collection.mutable.ArrayBuilder.ofLong
    val it = e.select(col("src").cast("long"), col("dst").cast("long"))
      .toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      // A null endpoint constrains nothing (no vertex to merge with) —
      // skip the edge rather than fabricate a null vertex; the
      // distributed path's equi-joins never match nulls either.
      if (!r.isNullAt(0) && !r.isNullAt(1)) {
        srcB += r.getLong(0)
        dstB += r.getLong(1)
      }
    }
    val src = srcB.result()
    val dst = dstB.result()
    // Vertex dictionary: sorted distinct ids.
    val verts = {
      val all = new Array[Long](src.length + dst.length)
      System.arraycopy(src, 0, all, 0, src.length)
      System.arraycopy(dst, 0, all, src.length, dst.length)
      java.util.Arrays.sort(all)
      var w = 0
      var i = 0
      while (i < all.length) {
        if (w == 0 || all(i) != all(w - 1)) { all(w) = all(i); w += 1 }
        i += 1
      }
      java.util.Arrays.copyOf(all, w)
    }
    val parent = new Array[Int](verts.length)
    var i = 0
    while (i < parent.length) { parent(i) = i; i += 1 }
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) {
        parent(x) = parent(parent(x)) // path halving
        x = parent(x)
      }
      x
    }
    i = 0
    while (i < src.length) {
      val ra = find(java.util.Arrays.binarySearch(verts, src(i)))
      val rb = find(java.util.Arrays.binarySearch(verts, dst(i)))
      if (ra < rb) parent(rb) = ra
      else if (rb < ra) parent(ra) = rb
      i += 1
    }
    val out = new Array[(Long, Long)](verts.length)
    i = 0
    while (i < verts.length) {
      out(i) = (verts(i), verts(find(i)))
      i += 1
    }
    import spark.implicits._
    spark.createDataset(out.toIndexedSeq)
      .select(col("_1").cast(idType).as("id"),
        col("_2").cast(idType).as("comp"))
  }

  private def labelDistributed(edges: DataFrame, maxIter: Int): DataFrame = {
    // No distinct: duplicate edges only duplicate offers, and min() is
    // idempotent — one shuffle saved (pair emitters already dedupe).
    val sym = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .cache()
    // localCheckpoint (not cache) per iteration: the jump self-join
    // references the hook result TWICE, so without lineage truncation the
    // Catalyst tree doubles every round — plan ANALYSIS goes exponential
    // long before execution does. Checkpointing pins the round's labels
    // as a LogicalRDD, keeping plan size constant per round; the
    // superseded checkpoint RDDs are released by the ContextCleaner once
    // the loop drops its reference (no block-cache leak across calls —
    // the old cache()d version leaked one pinned frame per call).
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
      .localCheckpoint(true)
    val compType = labels.schema("comp").dataType
    // Active-set frontier: only vertices whose label CHANGED last round
    // offer this round. An unchanged vertex's current label was already
    // folded into every neighbour the round it last changed (labels are
    // monotone decreasing and each vertex min-retains), so re-offering
    // it is pure wasted shuffle — without the frontier every hop
    // re-touches ALL edges; with it, hop r's offer join is O(edges
    // incident to round-(r-1) changes), which collapses fast on the
    // near-clique graphs LSH banding emits. Round 0: everyone offers.
    var frontier = labels
    var changed = 1L
    var iter = 0
    try {
    while (changed > 0 && iter < maxIter) {
      // Each frontier vertex offers its current component to every
      // neighbour; a vertex keeps the min of its own label and all
      // offers. The old label rides along as `own` (non-null exactly on
      // the vertex's own row), so convergence detection (comp < own
      // anywhere) comes out of the SAME single-shuffle aggregate — no
      // per-iteration join, no second exchange.
      val offers = sym
        .join(frontier.withColumnRenamed("id", "__dst"), col("dst") === col("__dst"))
        .select(col("src").as("id"), col("comp"),
          lit(null).cast(compType).as("own"))
      // Checkpointed: it feeds both sides of the jump self-join below, so
      // both join inputs read one materialized pass of the hook stage.
      // AVAILABILITY TRADE-OFF: localCheckpoint truncates lineage and
      // stores blocks UNREPLICATED on executors — an executor loss
      // mid-loop (spot reclaim) fails the whole label() job instead of
      // recomputing. On long-lived production clusters set a reliable
      // sparkContext.setCheckpointDir and swap to checkpoint(), or rely
      // on the loop's small round count (O(log diameter), 2-3 in
      // practice) making a rare retry-from-scratch acceptable.
      val hooked = labels.select(col("id"), col("comp"), col("comp").as("own"))
        .unionAll(offers)
        .groupBy("id").agg(min("comp").as("comp"), max("own").as("own"))
        .localCheckpoint(true)
      // Pointer jump: comp := comp[comp]. Every comp value is itself a
      // vertex id, and labels only ever decrease, so comp[comp] <= comp
      // and never drops below the component's true min — the jump is
      // pure acceleration that makes rounds O(log diameter). Convergence
      // is still judged on the one-hop step alone: a propagate fixpoint
      // forces comp[u] == comp[v] across every edge, which IS global
      // convergence, so exiting on changed==0 is sound.
      val next = hooked
        .join(hooked.select(col("id").as("__jid"), col("comp").as("__jcomp")),
          col("comp") === col("__jid"))
        .select(col("id"), col("__jcomp").as("comp"), col("own"))
        .localCheckpoint(true)
      // next frontier = everything that moved this round, whether by an
      // offer or by the jump (a jump-moved vertex has a new label its
      // neighbours haven't seen — it must re-offer)
      frontier = next.filter(col("comp") < col("own")).select("id", "comp")
      changed = frontier.count()
      labels = next.select("id", "comp")
      iter += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"ConnectedComponents.label did not converge in $maxIter iterations " +
          s"($changed labels still changing) — component labels would be " +
          "under-merged. Raise maxIter (rounds scale with log of the " +
          "longest duplicate chain).")
    } finally sym.unpersist(blocking = false) // incl. the throw path
    labels
  }

  /** Giant-component guard — the dedup pipeline's loud diagnostic.
    * Web-scale near-dup graphs routinely grow one dominant component
    * (boilerplate chains, license headers, mirrored sites); when a
    * single component swallows a large fraction of the paired corpus,
    * downstream keep-one-per-cluster dedup silently deletes that whole
    * fraction and the pair-generation thresholds (shingle size, band
    * count, Jaccard cut) need retuning — a data bug, not a degraded
    * mode, so it THROWS rather than logs.
    *
    * Cost: `labels` out of [[label]] is localCheckpoint-materialized,
    * so this is one map-side-combined aggregate over the label frame
    * (never the corpus) plus a 1-row reduce — O(|labeled vertices|)
    * with driver state of one row.
    *
    * `maxFrac` is a policy knob: 0.5 (default) means "no component may
    * hold more than half of all pair-incident docs". Production runs at
    * 100 TB would set this from the duplication-rate SLO. */
  def requireBounded(labels: DataFrame, maxFrac: Double = 0.5): DataFrame = {
    val row = labels.groupBy("comp").agg(count(lit(1)).as("n"))
      .agg(max("n").as("giant"), sum("n").as("total")).head()
    if (!row.isNullAt(0)) {
      val giant = row.getLong(0)
      val total = row.getLong(1)
      if (giant.toDouble > maxFrac * total)
        throw new IllegalStateException(
          f"Giant near-dup component: one cluster holds $giant of $total " +
            f"pair-incident docs (${giant.toDouble / total}%.2f > " +
            f"$maxFrac%.2f allowed). Keep-one-per-cluster dedup would drop " +
            "that whole fraction; retune pair generation (shingle size, " +
            "bands, similarity cut) or raise maxFrac deliberately.")
    }
    labels
  }
}
