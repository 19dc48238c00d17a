package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over embedding columns (array<float>), built from Catalyst
  * higher-order functions.
  *
  * Reproducibility contract: every reduction is an explicit LEFT FOLD with
  * a 0.0 init over element-wise double products, which is exactly what the
  * DuckDB oracle computes with list_reduce(list_prepend(0.0, ...)) — the
  * same IEEE operations in the same order produce bit-identical doubles.
  * (A tree-shaped or SIMD-reassociated sum would not reproduce; at 100 TB
  * you'd trade this determinism for speed inside a custom Expression, but
  * per-row folds over 64-dim vectors are already cheap and fully
  * parallel.)
  */
object VectorFunctions {

  /** Dot product of two float vectors as a sequential double fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Squared L2 norm (same fold shape). */
  def normSq(a: Column): Column = dot(a, a)

  /** Cosine similarity: dot / (sqrt(|a|²) * sqrt(|b|²)). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))
}
