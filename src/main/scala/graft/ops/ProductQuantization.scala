package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.expressions.PqExpressions

/** Product quantization for ANN at corpus scale — the IVF-PQ class:
  * vectors are split into `m` subspaces, each subspace gets a small
  * L2-trained codebook, and every vector compresses to `m` small codes
  * (64-dim float → 8 bytes at m=8, a 32× memory cut). Search is
  * asymmetric: the query stays exact, candidates are scored against
  * their codewords (ADC), and a shortlist re-ranks with exact cosine —
  * the standard candidate-generation + re-rank pipeline.
  *
  * Codebooks train on a DETERMINISTIC driver-side sample (lowest
  * id-hashes, the same TakeOrdered shape as [[KMeans]] init) — k·m
  * centroids of dsub doubles are model state, not data, and every real
  * PQ implementation trains on a sample. Encoding and scoring are
  * single-pass codegen kernels over the full corpus; the codebooks ship
  * inside the plan, so nothing depends on executor-local state.
  *
  * Scale: encode is a narrow map (no shuffle); ADC scoring reads only
  * (id, codes) — the 32×-smaller index — and the exact re-rank touches
  * `shortlist` full vectors per query, not the corpus. Composes with
  * [[KMeans]] IVF routing for sub-linear candidate generation.
  */
object ProductQuantization {

  /** `books(j)(k)` = codeword k of subspace j (dsub doubles each). */
  case class Model(m: Int, dsub: Int, books: Array[Array[Array[Double]]])

  /** Train per-subspace codebooks with plain Lloyd's on a deterministic
    * sample of `vecs` (columns: vec_id, `vecCol` array of numerics). */
  def train(vecs: DataFrame, vecCol: String, m: Int, ksub: Int,
      iters: Int = 10, sampleN: Int = 4096): Model = {
    val rows = vecs
      .select(col(vecCol).cast("array<double>").as("v"), col("vec_id"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(sampleN)
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    require(rows.nonEmpty, "cannot train PQ on an empty frame")
    val d = rows.head.length
    require(d % m == 0, s"dim $d not divisible into $m subspaces")
    val dsub = d / m
    val books = Array.tabulate(m) { j =>
      val sub = rows.map(r => java.util.Arrays.copyOfRange(r, j * dsub,
        (j + 1) * dsub))
      lloydL2(sub, math.min(ksub, sub.length), iters)
    }
    Model(m, dsub, books)
  }

  /** Driver-side Lloyd's with L2 distance; deterministic spread init
    * (every n/k-th sample), empty clusters keep their centroid. */
  private def lloydL2(xs: Array[Array[Double]], k: Int,
      iters: Int): Array[Array[Double]] = {
    val n = xs.length
    val dsub = xs(0).length
    var cents = Array.tabulate(k)(i => xs(((i.toLong * n) / k).toInt).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dsub))
      val cnt = new Array[Int](k)
      for (x <- xs) {
        var best = 0
        var bd = Double.MaxValue
        var c = 0
        while (c < k) {
          var d2 = 0.0
          var i = 0
          while (i < dsub) {
            val diff = x(i) - cents(c)(i); d2 += diff * diff; i += 1
          }
          if (d2 < bd) { bd = d2; best = c }
          c += 1
        }
        cnt(best) += 1
        var i = 0
        while (i < dsub) { sums(best)(i) += x(i); i += 1 }
      }
      cents = Array.tabulate(k)(c =>
        if (cnt(c) == 0) cents(c)
        else sums(c).map(_ / cnt(c)))
    }
    cents
  }

  /** Add a `codes` column (array<int>, length m) for `vecCol`. */
  def encode(df: DataFrame, vecCol: String, model: Model): DataFrame =
    df.withColumn("codes",
      PqExpressions.pq_encode(col(vecCol).cast("array<double>"), model.books))

  /** ADC distance column between an exact query vector and a codes
    * column. */
  def adc(query: Column, codes: Column, model: Model): Column =
    PqExpressions.pq_adc(query.cast("array<double>"), codes, model.books)
}
