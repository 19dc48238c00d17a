package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.expressions.{SetVectorExpressions => SVE}
import graft.functions.{TextFunctions => TF, VectorFunctions => VF}

/** The set/vector codegen kernels must be value-identical (bit-for-bit
  * for doubles) to the Column-lambda formulations the oracle mirrors. */
class SetVectorExpressionsSpec extends SparkSuite {

  private def d = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
  private def e = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("word_shingles == array_distinct(transform) incl. order") {
    val bad = d.select(
        SVE.word_shingles(col("text"), 3).as("fast"),
        array_distinct(TF.wordShingles(TF.tokens(col("text")), 3)).as("slow"))
      .filter(not(col("fast") === col("slow"))).count()
    assert(bad === 0)
  }

  test("jaccard_sim == two-pass array_intersect formulation (bitwise)") {
    val pairs = d.limit(60).select(col("doc_id").as("ida"),
        SVE.word_shingles(col("text"), 3).as("a"))
      .crossJoin(d.limit(60).select(col("doc_id").as("idb"),
        SVE.word_shingles(col("text"), 3).as("b")))
      .filter(col("ida") < col("idb"))
    val bad = pairs.select(
        SVE.jaccard_sim(col("a"), col("b")).as("fast"),
        TF.jaccard(col("a"), col("b")).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(bad === 0)
  }

  test("cosine_sim == fold formulation (bitwise) on all vector pairs vs q0") {
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    val bad = e.crossJoin(broadcast(q)).select(
        SVE.cosine_sim(col("qv"), col("embedding")).as("fast"),
        VF.cosine(col("qv"), col("embedding")).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(bad === 0)
  }

  test("wideBandKeys kernel == planeWeights reference math") {
    // The kernel keeps its own copy of the seeded ±1 weight formula
    // (VectorFunctions.planeWeights is Column-side); this pins the two
    // in sync — a drifting seed or band layout would silently change
    // every LSH bucket.
    import spark.implicits._
    val dims = 16
    val w = VF.planeWeights(dims, VF.WideNumPlanes)
    def expected(v: Array[Double]): Seq[Long] =
      (0 until VF.WideBands).map { b =>
        (0 until VF.WideRows).foldLeft(b.toLong << 50) { (k, j) =>
          val proj = w(b * VF.WideRows + j).lazyZip(v)
            .foldLeft(0.0) { case (acc, (wi, x)) => acc + wi * x }
          if (proj > 0.0) k + (1L << j) else k
        }
      }
    val vecs = (0 until 32).map(s =>
      Array.tabulate(dims)(i => math.sin(s * 97 + i * 13).toDouble))
    val got = spark.createDataset(vecs.map(_.toSeq)).toDF("v")
      .select(SVE.wide_band_keys(col("v"), dims).as("k"))
      .as[Seq[Long]].collect()
    vecs.zip(got).foreach { case (v, ks) =>
      assert(ks === expected(v))
    }
  }

  test("l2_norm / quantize8: unit sphere, bounds, zero vector") {
    import spark.implicits._
    val vecs: Seq[Seq[Float]] = Seq(
      Seq(3f, 4f),                       // norm 5 exactly
      Seq(0f, 0f, 0f),                   // zero vector -> zero quant
      Seq(-1f, 1f, 0.5f, -0.25f),
      Seq.tabulate(64)(i => (math.sin(i * 31) * 2).toFloat))
    val rows = spark.createDataset(vecs).toDF("v")
      .select(SVE.l2_norm(col("v")).as("n"), SVE.quantize8(col("v")).as("q"),
        col("v"))
      .as[(Double, Seq[Int], Seq[Float])].collect()
    assert(rows(0)._1 === 5.0)
    assert(rows(0)._2 === Seq(math.floor(3.0 / 5 * 127).toInt,
      math.floor(4.0 / 5 * 127).toInt))
    assert(rows(1)._1 === 0.0 && rows(1)._2 === Seq(0, 0, 0))
    // all quantized components in the int8 band, and each equals the
    // scalar reference computation
    rows.foreach { case (n, q, v) =>
      assert(q.forall(x => x >= -128 && x <= 127))
      if (n != 0.0)
        q.zip(v).foreach { case (qi, vi) =>
          assert(qi === math.floor(vi.toDouble / n * 127.0).toInt)
        }
    }
  }
}
