package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.expressions.{SetVectorExpressions => SVE}
import graft.ops.CentroidModel

/** The fused nearest-centroid kernel must reproduce the r8 cross-join +
  * row_number() window assignment BIT-FOR-BIT (same winner, same cosine
  * doubles, same (cos desc, cid asc) tie-break) while planning as a
  * narrow map — zero Exchange between the corpus scan and the
  * assignment. */
class NearestCentroidSpec extends SparkSuite {
  import spark.implicits._

  private def e = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  /** The r8 formulation: n×k cross join, fused cosine, window argmax. */
  private def windowAssign(vecs: org.apache.spark.sql.DataFrame,
      cents: org.apache.spark.sql.DataFrame, useDouble: Boolean) = {
    val w = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cid"))
    val cos =
      if (useDouble) SVE.cosine_sim_d(col("embedding"), col("cv"))
      else SVE.cosine_sim(col("embedding"), col("cv"))
    vecs.join(broadcast(cents), lit(true))
      .select(col("vec_id"), col("cid"), cos.as("ccos"))
      .withColumn("arn", row_number().over(w))
      .filter(col("arn") === 1)
      .select(col("vec_id"), col("cid").as("cluster"), col("ccos"))
  }

  test("float corpus: fused kernel == window argmax, cluster and cosine bitwise") {
    val cents = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val model = CentroidModel.collect(cents)
    val fused = e
      .withColumn("nc", SVE.nearest_centroid(col("embedding"), model))
      .select(col("vec_id"), col("nc.cluster").as("cluster"),
        col("nc.cos").as("ccos"))
    val bad = fused.as("f")
      .join(windowAssign(e, cents, useDouble = false).as("w"), Seq("vec_id"))
      .filter($"f.cluster" =!= $"w.cluster" || $"f.ccos" =!= $"w.ccos")
      .count()
    assert(bad === 0)
  }

  test("double corpus: fused kernel == window argmax bitwise") {
    val d = e.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val cents = d.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val model = CentroidModel.collect(cents)
    val fused = d
      .withColumn("nc", SVE.nearest_centroid(col("embedding"), model))
      .select(col("vec_id"), col("nc.cluster").as("cluster"),
        col("nc.cos").as("ccos"))
    val bad = fused.as("f")
      .join(windowAssign(d, cents, useDouble = true).as("w"), Seq("vec_id"))
      .filter($"f.cluster" =!= $"w.cluster" || $"f.ccos" =!= $"w.ccos")
      .count()
    assert(bad === 0)
  }

  test("zero vector (all-NaN cosines) ties to the lowest cid, like the window") {
    // Spark's double ordering puts NaN greatest, so in the window
    // formulation every NaN cosine ties and cid asc picks the lowest.
    val model = Seq((7L, Array(1.0, 0.0)), (3L, Array(0.0, 1.0)))
    val r = Seq((1L, Seq(0.0, 0.0))).toDF("vec_id", "embedding")
      .select(SVE.nearest_centroid(col("embedding"), model).as("nc"))
      .select(col("nc.cluster"), col("nc.cos"))
      .as[(Long, Double)].head()
    assert(r._1 === 3L)
    assert(r._2.isNaN)
  }

  test("large k: 2000 centroids × 64 dims stays one codegen'd narrow map") {
    // the r8 literal-array-of-structs spelling is ~2000×64 expression
    // nodes at this k — past codegen limits; the kernel is O(1) plan
    // size with the matrix riding as a reference object
    val model = (0 until 2000).map(i =>
      (i.toLong, Array.tabulate(64)(j => ((i * 31 + j) % 97 + 1) / 97.0)))
    val df = spark.range(4000).select(col("id").as("vec_id"),
      array((0 until 64).map(j =>
        ((col("id") * 7 + j) % 89 + 1).cast("double") / lit(89.0)): _*)
        .as("embedding"))
    val assigned = df.select(col("vec_id"),
      SVE.nearest_centroid(col("embedding"), model)
        .getField("cluster").as("cluster"))
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
    // codegen'd stages render as "*(n)" in the simple plan string
    assert(plan.contains("*(1) Project"), s"not codegen'd:\n${plan.take(200)}")
    val cids = model.map(_._1).toSet
    val got = assigned.as[(Long, Long)].collect()
    assert(got.length === 4000)
    assert(got.forall(r => cids(r._2)))
  }

  test("assignment plans as a narrow map: no Exchange scan→assignment") {
    val cents = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val model = CentroidModel.collect(cents)
    val assigned = e.withColumn("nc",
        SVE.nearest_centroid(col("embedding"), model))
      .select(col("vec_id"), col("nc.cluster").as("cluster"))
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment leg shuffled:\n$plan")
    // and it really computes: every vector lands on a real centroid
    val cids = model.map(_._1).toSet
    assert(assigned.select("cluster").as[Long].collect().forall(cids))
  }
}
