package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

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
  * narrow map with zero exchange and identical bits. */
object CentroidModel {

  /** Collect (cid, vector) rows as the assignment model. Float vectors
    * widen to double exactly, so the fused kernel's float path (which
    * widens the probe side per element) reproduces the float×float
    * cosine bit-for-bit. */
  def collect(cents: DataFrame, cidCol: String = "cid",
      vecCol: String = "cv"): Seq[(Long, Array[Double])] =
    cents.select(col(cidCol).cast("long"), col(vecCol)).collect().toSeq
      .map { r =>
        val vec = r.getSeq[Any](1).map {
          case f: Float => f.toDouble
          case d: Double => d
        }.toArray
        (r.getLong(0), vec)
      }
}
