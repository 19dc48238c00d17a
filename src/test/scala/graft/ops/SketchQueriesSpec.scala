package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** q_quantile_sketch (bounded-state quantiles under the in-band rank
  * contract) and q_text_bm25 (integer-exact Okapi-class retrieval). */
class SketchQueriesSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("quantile sketch: exact legs match a brute-force sort, contract TRUE") {
    val rows = RelationalQueries.quantileSketch(spark, dir).collect()
    assert(rows.nonEmpty)
    val all = graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag").as("g"),
        (col("l_extendedprice") * 100).cast("bigint").as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def exactQ(xs: Array[Long], num: Long, den: Long): Long = {
      // smallest x with rank >= ceil(p*n), p = num/den
      val target = ((num * xs.length + den - 1) / den).toInt
      xs(math.max(target, 1) - 1)
    }
    rows.foreach { r =>
      val xs = all(r.getAs[String]("l_returnflag"))
      assert(r.getAs[Long]("n") === xs.length.toLong)
      assert(r.getAs[Long]("p50") === exactQ(xs, 1, 2))
      assert(r.getAs[Long]("p90") === exactQ(xs, 9, 10))
      assert(r.getAs[Long]("p99") === exactQ(xs, 99, 100))
      assert(r.getAs[Boolean]("sketch_within_bound"), r.toString)
    }
  }

  test("quantile sketch decision leg partial-aggregates map-side") {
    val v = graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag").as("g"),
        (col("l_extendedprice") * 100).cast("bigint").as("x"))
    val plan = v.groupBy("g")
      .agg(percentile_approx(col("x"), array(lit(0.5)), lit(1000)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_percentile_approx"),
      s"sketch did not partial-aggregate:\n$plan")
  }

  test("bm25: top-10 is sorted, distinct, and every hit contains a query term") {
    val out = PipelineQueries.textBm25(spark, dir).collect()
    assert(out.length === 10)
    val scores = out.map(_.getAs[Long]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    val ids = out.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length === ids.length)
    val hits = graft.Tables.load(spark, dir, "documents")
      .filter(col("doc_id").isin(ids: _*))
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    ids.foreach { id =>
      val toks = hits(id).split(" ")
      assert(toks.exists(Set("spark", "vector", "merge")),
        s"doc $id has no query term")
    }
  }

  test("bm25 plan: df/stats broadcast, top-k via TakeOrdered (no global sort)") {
    val plan = PipelineQueries.textBm25(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), s"no broadcast:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"top-k global-sorted:\n$plan")
  }

  test("count-min: one-sided error, merge identity, epsilon bound") {
    import graft.functions.expressions.{CmExpressions => CM, CmRuntime}
    import spark.implicits._
    val D = 4
    val W = 256
    // skewed multiset: key k appears (k % 37)^2 + 1 times
    val keys = (0L until 400L).flatMap(k =>
      Seq.fill(((k % 37) * (k % 37) + 1).toInt)(k))
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = keys.size.toLong

    // merge identity: 8-partition distributed build == local build
    val skDist = keys.toDF("k").repartition(8)
      .agg(CM.cm_build(col("k"), D, W)).collect()(0).getAs[Array[Byte]](0)
    val local = new Array[Long](D * W)
    keys.foreach(CmRuntime.add(local, _, D, W))
    assert(java.util.Arrays.equals(skDist, CmRuntime.toBytes(local, D, W)),
      "distributed merge must equal the single-pass build bit-for-bit")

    // one-sided error + epsilon bound for EVERY present key
    val eps = 3L * n / W + 1
    for ((k, cnt) <- exact) {
      val est = CmRuntime.estimate(skDist, k, D, W)
      assert(est >= cnt, s"under-count at $k: $est < $cnt")
      assert(est <= cnt + eps, s"bound blown at $k: $est > $cnt + $eps")
    }
    // absent keys: pure collision mass, inside the same bound
    for (k <- 100000L until 100050L) {
      val est = CmRuntime.estimate(skDist, k, D, W)
      assert(est <= eps, s"absent-key estimate $est exceeds eps $eps")
    }
    // geometry guard: a same-byte-size TRANSPOSITION (8x128 vs 4x256)
    // must refuse — the header catches what a length check cannot
    intercept[IllegalArgumentException] {
      CmRuntime.estimate(skDist, 1L, 8, W / 2)
    }
    intercept[IllegalArgumentException] {
      CmRuntime.estimate(skDist, 1L, D, W / 2)
    }
    // legacy v0 layout (pre-header persisted bytes, e.g. an old
    // streaming checkpoint): exactly d·w·8 headerless counters must
    // still decode and estimate identically
    val legacyBytes = {
      val bb = java.nio.ByteBuffer.allocate(local.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      local.foreach(bb.putLong)
      bb.array()
    }
    for ((k, _) <- exact.take(50))
      assert(CmRuntime.estimate(legacyBytes, k, D, W) ===
        CmRuntime.estimate(skDist, k, D, W),
        s"legacy headerless decode diverges at key $k")
    assert(java.util.Arrays.equals(
      CmRuntime.fromBytes(legacyBytes, D, W), local))

    // the oracle-checked query's contract flags hold at the gate SF
    val rows = PipelineQueries.textCountmin(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(2) && r.getBoolean(3), s"$r"))
  }
}
