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

  // --------------------------------------------------------------------------
  // Random-hyperplane LSH (the 100 TB candidate-generation path for
  // cosine near-dup / ANN: bucket on band keys, verify with [[cosine]])
  // --------------------------------------------------------------------------

  /** ±1 hyperplane weights, seeded through a murmur-style finalizer per
    * (plane, dim) — an arithmetic progression here would correlate the
    * planes the same way affine MinHash multipliers correlate
    * permutations (see TextFunctions scaladoc / the round-1 lesson). */
  private def mix64(seed: Long): Long = {
    var x = seed
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33; x
  }

  /** 4 bands × 8 bits: at bit-agreement p the candidate probability is
    * 1-(1-p^8)^4 — ≈0.95 for cos 0.97 pairs, ≈0.03 for centered
    * background (cos ≈ 0). Few wide bands, not many narrow ones: narrow
    * bands admit most of the background (2-bit bands pass 90% of random
    * pairs). Raw fixture vectors share a bias component (background cos
    * ≈ 0.3), so center before hashing — standard practice, demonstrated
    * in EmbedLshSpec. */
  val NumPlanes = 32
  val PlaneBands = 4
  val PlaneRows: Int = NumPlanes / PlaneBands // 8 bits per band

  private[graft] def planeWeights(dims: Int, planes: Int = NumPlanes): IndexedSeq[IndexedSeq[Double]] =
    (0 until planes).map(p =>
      (0 until dims).map(i =>
        if ((mix64(p.toLong * 7919L + i) & 1L) == 0L) -1.0 else 1.0))

  /** Sign bits of the vector against each hyperplane, packed to a long. */
  def hyperplaneSig(v: Column, dims: Int): Column = {
    val planes = planeWeights(dims)
    (0 until NumPlanes).map { p =>
      val w = array(planes(p).map(lit): _*)
      val proj = aggregate(
        zip_with(v, w, (x, wi) => x.cast("double") * wi),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0.0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Band keys for bucketing: PlaneBands keys of PlaneRows bits each,
    * tagged with the band index so different bands never collide. */
  def bandKeys(sig: Column): Column =
    array((0 until PlaneBands).map { b =>
      lit(b.toLong << 40) +
        (shiftright(sig, b * PlaneRows) % (1L << PlaneRows))
    }: _*)

  /** Wider family for oracle-grade recall on ~0.9-cosine near-dups:
    * 32 bands × 8 planes = 256 hyperplanes. Per-pair miss probability
    * at bit-agreement p is (1-p^8)^32 — ≈6e-7 at cos 0.93 (p≈0.88), a
    * margin that holds deterministic 100% recall through the sf1 pair
    * population (16 bands' 8e-4 statistically guaranteed misses at
    * ~15k qualifying pairs), while random pairs (p≈0.5-0.6) pass a
    * band at ≤3.2% → candidate fraction stays single-digit-%. Keys are built straight from the projections
    * (no 128-bit packing) and band-tagged so one equi-join column covers
    * all bands. At 100 TB the 128 64-dim folds per row belong in one
    * fused codegen kernel; at 64 dims the HOF fold is already columnar
    * and shuffle-free. */
  val WideBands: Int = expressions.SetVectorOps.WideBands
  val WideRows: Int = expressions.SetVectorOps.WideRows
  val WideNumPlanes: Int = WideBands * WideRows

  /** Fused codegen kernel, NOT a Column-level fold composition: 128
    * zip_with/aggregate folds over 64-element literal arrays generate
    * megabytes of bytecode — measured flooding the JVM code cache and
    * disabling JIT for the rest of the session. The kernel does the
    * same ±1-projection math in one tight pass (weights cached per
    * dims, same seeded finalizer as [[planeWeights]]). */
  def wideBandKeys(v: Column, dims: Int): Column =
    expressions.SetVectorExpressions.wide_band_keys(v, dims)
}
