package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, exists, not}

/** Driver-side centroid model for shuffle-free nearest-centroid
  * assignment ([[graft.functions.expressions.NearestCentroid]]).
  *
  * A centroid set is model state, not data: k×d numbers (a few MB at
  * k = 1000, d = 512), the same driver-as-parameter-server footprint
  * [[KMeans.fit]] already carries between iterations. Collecting it
  * once and fusing the argmax into a single per-row kernel removes the
  * n×k cross-join + row_number() window the r8 assignment legs paid —
  * at 100 TB that window's exchange moved ~k× corpus bytes (every
  * expanded row carrying the full embedding); the fused kernel is a
  * narrow map with zero exchange and identical bits.
  *
  * Parallelism follows the INPUT SPLITS (files.maxPartitionBytes caps
  * a split at 128 MB), so per-task kernel work is bounded by ~128 MB
  * of vectors × k — at corpus scale splits are plentiful and the map
  * saturates the cluster. Only a sub-single-split corpus runs on one
  * task, and then the total work is equally small; callers who still
  * want spread there can repartition upstream — the kernel itself
  * never forces the exchange the r8 shape paid. */
object CentroidModel {

  /** Collect (cid, vector) rows as the assignment model. Float vectors
    * widen to double exactly, so the fused kernel's float path (which
    * widens the probe side per element) reproduces the float×float
    * cosine bit-for-bit.
    *
    * Null-vector rows and vectors with null ELEMENTS are dropped,
    * value-identically to the window formulation: a null vector or
    * element makes the cosine NULL, which sorts after every real
    * cosine under `desc` ordering, so such a centroid never wins an
    * assignment. Null-ID rows are dropped as invalid model rows (the
    * window formulation would surface a literal null cluster id —
    * never meaningful). An all-null centroid set then fails the
    * kernel's non-empty check loudly instead of assigning garbage. */
  def collect(cents: DataFrame, cidCol: String = "cid",
      vecCol: String = "cv"): Seq[(Long, Array[Double])] =
    cents.select(col(cidCol).cast("long"), col(vecCol))
      .na.drop("any")
      .filter(not(exists(col(vecCol), _.isNull)))
      .collect().toSeq
      .map { r =>
        val vec = r.getSeq[Any](1).map {
          case f: Float => f.toDouble
          case d: Double => d
        }.toArray
        (r.getLong(0), vec)
      }
}
