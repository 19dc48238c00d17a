package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** q_text_bpe_pairs (WordPiece merge-candidate mining) and
  * q_embed_outliers (integer-exact label-centroid outlier sweep)
  * against brute-force recomputations of the same integer math. */
class TokenizerOutlierSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("bpe pairs: top-20 equals a brute-force count over the raw text") {
    val texts = graft.Tables.load(spark, dir, "documents")
      .select("text").collect().map(_.getString(0))
    val uni = scala.collection.mutable.HashMap.empty[String, Long]
    val pc = scala.collection.mutable.HashMap.empty[String, Long]
    texts.foreach { t =>
      val w = t.split(" ", -1)
      w.foreach(tk => uni(tk) = uni.getOrElse(tk, 0L) + 1)
      w.sliding(2).filter(_.length == 2).foreach { p =>
        val k = p(0) + " " + p(1)
        pc(k) = pc.getOrElse(k, 0L) + 1
      }
    }
    val expect = pc.toSeq.map { case (p, cp) =>
      val Array(a, b) = p.split(" ", 2)
      val score = (BigInt(1000000000000L) * cp / (BigInt(uni(a)) * uni(b))).toLong
      (p, cp, score)
    }.sortBy { case (p, _, sc) => (-sc, p) }.take(20)
    val got = PipelineQueries.textBpePairs(spark, dir).collect()
      .map(r => (r.getAs[String]("pair"), r.getAs[Long]("n"), r.getAs[Long]("score")))
    assert(got.toSeq === expect)
  }

  test("bpe pairs plan: broadcast unigrams, TakeOrdered cut") {
    val plan = PipelineQueries.textBpePairs(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"))
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("embed outliers: dot/vv/cc and flag equal a brute-force integer recompute") {
    val rows = graft.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(x => math.floor(x.toDouble * 1000000).toLong).toArray))
    val cents = rows.groupBy(_._2).map { case (l, vs) =>
      val n = vs.length
      l -> vs.map(_._3).transpose.map(c =>
        (c.map(_ + 2097152L).sum / n) - 2097152L)
    }
    val expect = rows.map { case (id, l, m) =>
      val c = cents(l)
      val dot = m.zip(c).map { case (x, y) => x * y }.sum
      val vv = m.map(x => x * x).sum
      val cc = c.map(x => x * x).sum
      val out = dot <= 0 ||
        BigInt(4) * BigInt(dot) * BigInt(dot) < BigInt(vv) * BigInt(cc)
      (id, l, dot, vv, cc, out)
    }.sortBy(_._1)
    val got = PipelineQueries.embedOutliers(spark, dir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getAs[Long]("dot"), r.getAs[Long]("vv"), r.getAs[Long]("cc"),
        r.getAs[Boolean]("is_outlier")))
    assert(got.toSeq === expect.toSeq)
  }

  test("embed outliers plan: centroid broadcasts, corpus never sort-merge joins") {
    val plan = PipelineQueries.embedOutliers(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }
}
