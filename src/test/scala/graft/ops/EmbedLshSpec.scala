package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}
import graft.functions.{VectorFunctions => VF}

/** Random-hyperplane LSH as the scale path for q_dedup_embed: candidate
  * pairs from band-key buckets, verified with the exact cosine. The
  * oracle-equality check on the brute-force query can't see a weak
  * sketch (both engines would agree on bad candidates), so recall and
  * pruning are measured against brute force here — the same discipline
  * as the MinHash recall spec.
  *
  * The raw fixture vectors share a bias component (background cosine
  * ≈ 0.3 between unrelated vectors), which no hyperplane family can
  * separate from weak near-dups — so the pipeline centers vectors on the
  * global mean first (background drops to ≈ 0), then plants true
  * near-dups (cos ≈ 0.97) to measure recall on.
  */
class EmbedLshSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.01"
  private val Tau = 0.8

  private def mix64(seed: Long): Long = {
    var x = seed
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33; x
  }

  test("centered hyperplane LSH: high recall on planted near-dups, few candidates") {
    val raw = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    val dims = raw.head._2.length
    val mean = Array.tabulate(dims)(i => raw.map(_._2(i)).sum / raw.length)
    val centered = raw.map { case (id, v) =>
      (id, v.zip(mean).map { case (x, m) => x - m })
    }
    // Plant near-dups: id+100000 = centered vector + 25% deterministic
    // noise -> cos ≈ 1/sqrt(1+0.0625) ≈ 0.97.
    val planted = centered.take(25).map { case (id, v) =>
      val norm = math.sqrt(v.map(x => x * x).sum)
      val noise = Array.tabulate(dims) { i =>
        val u = (mix64(id * 64 + i) & 0xffffff).toDouble / 0xffffff - 0.5
        u * 2.0 * 0.25 * norm / math.sqrt(dims.toDouble)
      }
      (id + 100000L, v.zip(noise).map { case (x, e) => x + e })
    }
    import spark.implicits._
    val all = spark.createDataset(centered.toSeq ++ planted.toSeq)
      .toDF("vec_id", "embedding")

    // Ground truth at tau: brute force over the centered corpus.
    val withNorm = all.withColumn("nrm", sqrt(VF.normSq(col("embedding"))))
    val a = withNorm.select(col("vec_id").as("va"), col("embedding").as("ea"),
      col("nrm").as("na"))
    val b = withNorm.select(col("vec_id").as("vb"), col("embedding").as("eb"),
      col("nrm").as("nb"))
    val truth = a.join(broadcast(b), col("va") < col("vb"))
      .select(col("va"), col("vb"),
        (VF.dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= Tau)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.size >= 25, s"expected >= 25 planted pairs, got ${truth.size}")

    // LSH: signature -> band keys -> bucket join -> exact verify.
    val keyed = withNorm.withColumn(
        "bands", VF.bandKeys(VF.hyperplaneSig(col("embedding"), dims)))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        explode(col("bands")).as("bk"))
    val ka = keyed.select(col("bk"), col("vec_id").as("va"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val kb = keyed.select(col("bk"), col("vec_id").as("vb"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    val candidates = ka.join(kb, Seq("bk"))
      .filter(col("va") < col("vb"))
      .dropDuplicates("va", "vb")
      .cache()
    val nCandidates = candidates.count()
    val found = candidates
      .select(col("va"), col("vb"),
        (VF.dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= Tau)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    candidates.unpersist(blocking = false)

    val n = all.count()
    val allPairs = n * (n - 1) / 2
    val recall = found.intersect(truth).size.toDouble / truth.size
    val candFrac = nCandidates.toDouble / allPairs
    info(f"truth=${truth.size} recall=$recall%.3f " +
      f"candidates=$nCandidates of $allPairs (${100 * candFrac}%.1f%%)")
    assert(recall >= 0.85, s"LSH recall $recall below 0.85")
    assert(candFrac < 0.15,
      f"LSH examined ${100 * candFrac}%.1f%% of pairs — pruning too weak")
  }
}
