package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}
import graft.functions.expressions.{SetVectorExpressions => SVE}

/** Lloyd k-means as the trained-centroid source for IVF: recovers
  * planted cluster structure, and its centroids probe at least as well
  * as the deterministic every-Nth stand-in the oracle query uses. */
class KMeansSpec extends SparkSuite {
  import spark.implicits._

  private def mix64(seed: Long): Long = {
    var x = seed
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33; x
  }

  test("recovers planted clusters (purity over deterministic fixture)") {
    val dims = 16
    val kTrue = 4
    // 4 well-separated centers on coordinate axes + small noise
    val rows = (0 until 400).map { i =>
      val c = i % kTrue
      val v = Array.tabulate(dims) { d =>
        val base = if (d / (dims / kTrue) == c) 4.0 else 0.0
        val u = (mix64(i.toLong * 131 + d) & 0xffff).toDouble / 0xffff - 0.5
        base + u * 0.5
      }
      (i.toLong, v.toSeq, c)
    }
    val df = rows.map(r => (r._1, r._2)).toDF("vec_id", "embedding")
    val cents = KMeans.fit(df, kTrue, iters = 5)
    assert(cents.size === kTrue)

    val assigned = KMeans.assign(df, cents)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    // purity: each true class maps dominantly to one learned cluster
    val purity = rows.groupBy(_._3).values.map { grp =>
      val counts = grp.groupBy(r => assigned(r._1)).values.map(_.size)
      counts.max.toDouble / grp.size
    }.min
    assert(purity >= 0.95, s"cluster purity $purity below 0.95")
  }

  test("trained centroids probe no worse than the every-Nth stand-in") {
    val dir = "/root/testdata/sf0.01"
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val k = 10

    // ground truth: brute-force top-5 per query (vec_id < 8)
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val truth = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        SVE.cosine_sim(col("qv"), col("embedding")).as("cos"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rank") <= 5)
      .select("qid", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    def ivfRecall(cents: Seq[(Int, Array[Double])]): Double = {
      val assigned = KMeans.assign(e, cents)
      val probes = KMeans.assign(
          q.select(col("qid").as("vec_id"), col("qv").as("embedding")), cents)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
          col("cluster"))
      // probe 1 cluster (the assignment cluster) — harshest setting
      val found = assigned.join(probes, Seq("cluster"))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          SVE.cosine_sim(col("qv"), col("embedding")).as("cos"))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("qid")
            .orderBy(col("cos").desc, col("vec_id"))))
        .filter(col("rank") <= 5)
        .select("qid", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val hits = truth.map { case (qid, ts) =>
        found.getOrElse(qid, Set.empty).intersect(ts).size
      }.sum
      hits.toDouble / truth.values.map(_.size).sum
    }

    val standIn = e.orderBy("vec_id").limit(500).collect()
      .filter(_.getLong(0) % 50 == 0)
      .zipWithIndex.map { case (r, i) =>
        (i, r.getSeq[Float](1).map(_.toDouble).toArray)
      }.toSeq
    val trained = KMeans.fit(e, k, iters = 4)

    val rStand = ivfRecall(standIn)
    val rTrain = ivfRecall(trained)
    info(f"stand-in recall=$rStand%.3f trained recall=$rTrain%.3f")
    assert(rTrain >= rStand - 0.02,
      f"trained centroids ($rTrain%.3f) probe worse than stand-in ($rStand%.3f)")
  }
}
