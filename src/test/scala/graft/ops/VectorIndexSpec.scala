package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.lake.Mooncake

/** Persisted IVF index semantics the oracle can't express: file
  * skipping on the probe path, incremental append without retrain, and
  * persistence across process "restarts" (a fresh Mooncake handle). */
class VectorIndexSpec extends SparkSuite {
  import spark.implicits._

  // Four well-separated clusters on coordinate axes (dim 8): cluster c's
  // members are e_c + small unique jitter on a DIFFERENT axis, so
  // assignment is unambiguous and cosines are distinct.
  private def vec(axis: Int, i: Int): Array[Float] = {
    val v = Array.fill(8)(0.001f * (i % 7 + 1))
    v(axis) = 1.0f
    v
  }

  private def corpus = (0 until 80).map { i =>
    (i.toLong, vec(i % 4, i).toSeq)
  }.toDF("vec_id", "embedding")

  private def cents = (0 until 4).map { c =>
    (c.toLong, vec(c, 0).toSeq)
  }.toDF("cid", "cv")

  test("probe opens only the probed clusters' posting files") {
    val dir = tmpDir("vecidx")
    val lake = new Mooncake(dir)
    VectorIndex.build(spark, lake, "ivf", corpus, cents, targetFiles = Some(4))
    val all = lake.read(spark, "ivf_postings")
    assert(all.count() === 80)
    assert(all.inputFiles.length === 4)

    // one query near cluster 2, nprobe=1 → only cluster 2's file opens
    val q = Seq((1000L, vec(2, 3).toSeq)).toDF("qid", "qv")
    // range-partition boundaries may straddle one cluster edge, so a
    // single cluster's keys live in at most 2 of the 4 files
    val cands = lake.readForKeys(spark, "ivf_postings", "cluster",
      Seq(2L).toDF("cluster"))
    assert(cands.inputFiles.length <= 2,
      s"one cluster should open ≤2 of 4 files, got ${cands.inputFiles.length}")

    val top = VectorIndex.probe(spark, lake, "ivf", q, k = 3, nprobe = 1)
      .select("rank", "vec_id").as[(Long, Long)].collect().toMap
    // every result is a cluster-2 member (vec_id % 4 == 2)
    assert(top.values.forall(_ % 4 === 2), s"non-cluster-2 hits in $top")
  }

  test("append assigns against persisted centroids; probe finds the new vector") {
    val dir = tmpDir("vecidx-append")
    val lake = new Mooncake(dir)
    VectorIndex.build(spark, lake, "ivf", corpus, cents, targetFiles = Some(4))

    // a new vector sitting almost exactly on centroid 1
    val nv = Array.fill(8)(0.0001f); nv(1) = 1.0f
    VectorIndex.append(spark, lake, "ivf",
      Seq((500L, nv.toSeq)).toDF("vec_id", "embedding"), version = 2)
    assert(lake.read(spark, "ivf_postings").count() === 81)
    val placed = lake.read(spark, "ivf_postings")
      .filter(col("vec_id") === 500L).select("cluster").as[Long].head()
    assert(placed === 1L)

    // a query AT the appended vector (whose 0.0001 jitter no corpus
    // member shares) must rank it first — through a FRESH handle
    // (persistence across restart)
    val lake2 = new Mooncake(dir)
    val q = Seq((1000L, nv.toSeq)).toDF("qid", "qv")
    val top = VectorIndex.probe(spark, lake2, "ivf", q, k = 1, nprobe = 1)
      .select("vec_id").as[Long].head()
    assert(top === 500L, s"appended near-centroid vector not top-1 (got $top)")
  }

  test("streaming maintenance: micro-batches append, replays are skipped") {
    implicit val sc = spark.sqlContext
    val dir = tmpDir("vecidx-stream")
    val lake = new Mooncake(dir)
    VectorIndex.build(spark, lake, "ivf", corpus, cents, targetFiles = Some(4))

    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])]
    val vecs = input.toDF().toDF("vec_id", "embedding")
    val ckpt = tmpDir("vecidx-ckpt")

    input.addData((600L, vec(0, 1).toSeq), (601L, vec(3, 2).toSeq))
    VectorIndex.attachStream(lake, "ivf", vecs, ckpt).awaitTermination()
    // second AvailableNow run on the same checkpoint: only new data lands
    input.addData((602L, vec(2, 4).toSeq))
    VectorIndex.attachStream(lake, "ivf", vecs, ckpt).awaitTermination()

    val placed = lake.read(spark, "ivf_postings")
      .filter(col("vec_id") >= 600L)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    assert(placed === Map(600L -> 0L, 601L -> 3L, 602L -> 2L))
    assert(lake.read(spark, "ivf_postings").count() === 83)
  }
}
