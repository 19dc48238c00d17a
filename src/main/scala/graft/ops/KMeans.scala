package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.expressions.{SetVectorExpressions => SVE}

/** Distributed Lloyd's k-means over an embedding column — the trained
  * centroid source for IVF ANN (`PipelineQueries.embedIvf` uses a
  * deterministic every-Nth stand-in so its DuckDB oracle can mirror the
  * math; this is the production path that replaces it at scale).
  *
  * Execution shape per iteration (the part that must survive 100 TB):
  *   1. centroids broadcast (k×d doubles — model state, driver-sized);
  *   2. assignment = one narrow pass, no shuffle (argmax over k fused
  *      cosine kernels per row);
  *   3. new centroids = posexplode to (cluster, dim, value) then a
  *      partial+final decimal mean — ONE shuffle of k×d groups per iteration;
  *      the collect pulls k×d doubles, never rows.
  * This is the same driver-as-parameter-server shape Spark MLlib's
  * KMeans uses (treeAggregate to the driver each iteration).
  *
  * Determinism: init takes the k lowest (xxhash64(vec_id), vec_id)
  * rows — a deterministic uniform hash sample — assignment ties break
  * on the lowest cluster id, and centroid means accumulate in DECIMAL
  * (exact, order-independent addition; a double avg() would vary with
  * shuffle merge order), so a rerun on the same data yields the same
  * model bit-for-bit — required for the recall tests to be stable.
  */
object KMeans {

  /** Train on `vecs` (columns: vec_id long, embedding array<double|float>)
    * and return the centroids as (clusterId, vector). */
  def fit(vecs: DataFrame, k: Int, iters: Int = 5): Seq[(Int, Array[Double])] = {
    // iters+1 full passes read this — cache once (MLlib does the same)
    // null hygiene mirrors CentroidModel.collect: a null vector (or a
    // null element) sampled into the init set would NPE on the driver,
    // and require(n >= k) must count usable vectors only.
    val e = vecs.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
      .filter(col("v").isNotNull && expr("!exists(v, x -> x IS NULL)"))
      .persist()
    try fitCached(e, k, iters)
    finally e.unpersist(blocking = false)
  }

  private def fitCached(e: DataFrame, k: Int,
      iters: Int): Seq[(Int, Array[Double])] = {
    val n = e.count()
    require(n >= k, s"k=$k exceeds vector count $n")
    // Deterministic spread init WITHOUT a global row_number window
    // (which would funnel all n rows through one task): take the k
    // lowest id-hashes — a TakeOrdered (per-partition top-k + driver
    // merge), effectively a deterministic uniform sample.
    var cents: Seq[(Int, Array[Double])] = e
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(k)
      .orderBy("vec_id")
      .select("v").collect()
      .map(_.getSeq[Double](0).toArray).zipWithIndex
      .map { case (v, i) => (i, v) }.toIndexedSeq

    for (_ <- 0 until iters) {
      // argmax by (cos desc, cid asc) without a shuffle: one fused
      // kernel over the driver-held model (NearestCentroid — O(1) plan
      // size at any k, vs k×d literal nodes that fall out of codegen)
      val assigned = e.withColumn("cluster",
        SVE.nearest_centroid(col("v"),
          cents.map { case (cid, cv) => (cid.toLong, cv) })
          .getField("cluster").cast("int"))
      val updated = assigned
        .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cluster", "dim")
        // decimal sum, not avg(): double accumulation varies with the
        // nondeterministic shuffle merge order; decimal addition is
        // exact and order-independent, so the model is rerun-stable
        .agg((sum(col("x").cast("decimal(38,18)")) / count(lit(1)))
          .cast("double").as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cid, rows) =>
          val d = rows.map(r => r.getInt(1) -> r.getDouble(2)).sortBy(_._1)
          (cid, d.map(_._2).toArray)
        }
      // a cluster that captured no vectors keeps its previous centroid
      // instead of silently shrinking k
      cents = cents.map { case (cid, old) =>
        (cid, updated.getOrElse(cid, old))
      }
    }
    cents
  }

  /** Assign each vector to its nearest centroid (same tie-break as
    * training): adds a `cluster` int column. */
  def assign(vecs: DataFrame, cents: Seq[(Int, Array[Double])]): DataFrame =
    // no scratch column (a caller's own "v" column must survive intact)
    vecs.withColumn("cluster",
      SVE.nearest_centroid(col("embedding").cast("array<double>"),
        cents.map { case (cid, cv) => (cid.toLong, cv) })
        .getField("cluster").cast("int"))
}
