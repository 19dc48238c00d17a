package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.expressions.{AggExpressions => AE}

/** The bounded-heap top-k must reproduce the window/QUALIFY spelling
  * row-for-row (same ordering, same null placement, posexplode index =
  * row_number) while planning as a map-side-partial aggregate with no
  * Window operator. */
class BoundedTopKSpec extends SparkSuite {
  import spark.implicits._

  private def orders = spark.read
    .parquet("/root/testdata/sf0.001/orders.parquet")

  private def heapTopK(df: org.apache.spark.sql.DataFrame, k: Int) = df
    .select(col("o_orderstatus"),
      struct(col("o_totalprice"), col("o_orderkey")).as("r"))
    .groupBy("o_orderstatus")
    .agg(AE.bounded_top_k(col("r"), k, Seq(true, false)).as("top"))
    .select(col("o_orderstatus"), posexplode(col("top")).as(Seq("i", "r")))
    .select(col("o_orderstatus"), col("r.o_orderkey").as("k"),
      (col("i") + 1).as("rn"))

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    df.select(col("o_orderstatus"), col("o_orderkey").as("k"),
        col("o_totalprice"), row_number().over(w).as("rn"))
      .filter(col("rn") <= k).drop("o_totalprice")
  }

  test("heap == window on the orders fixture, across partial merges") {
    // repartition forces multi-buffer partials so merge + serialization
    // run for real
    val df = orders.repartition(7)
    for (k <- Seq(1, 3, 10)) {
      val got = heapTopK(df, k).orderBy("o_orderstatus", "rn")
        .as[(String, Long, Int)].collect().toSeq
      val want = windowTopK(df, k).orderBy("o_orderstatus", "rn")
        .as[(String, Long, Int)].collect().toSeq
      assert(got === want, s"k=$k diverged")
    }
  }

  test("null sort keys place like the window (desc → nulls last)") {
    val df = Seq[(String, Option[Double], Long)](
      ("a", Some(5.0), 1L), ("a", None, 2L), ("a", Some(9.0), 3L),
      ("a", None, 4L), ("b", None, 5L), ("b", Some(1.0), 6L))
      .toDF("o_orderstatus", "o_totalprice", "o_orderkey")
    val got = heapTopK(df, 3).orderBy("o_orderstatus", "rn")
      .as[(String, Long, Int)].collect().toSeq
    val want = windowTopK(df, 3).orderBy("o_orderstatus", "rn")
      .as[(String, Long, Int)].collect().toSeq
    assert(got === want)
    // desc: real values first, then nulls by the orderkey tie-break
    assert(got.map(_._2) === Seq(3L, 1L, 2L, 6L, 5L))
  }

  test("plans as a map-side-partial aggregate: no Window, no global sort") {
    val plan = heapTopK(orders, 3).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window operator crept in:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      s"expected ObjectHashAggregate partial/final:\n$plan")
    assert(plan.split("ObjectHashAggregate").length >= 3,
      "expected BOTH partial and final aggregate stages")
  }
}
