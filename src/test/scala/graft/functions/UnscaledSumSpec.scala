package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}
import graft.functions.expressions.{AggExpressions => AE}

/** UnscaledSum must be VALUE-identical to the built-in sum(decimal) —
  * same exact integer arithmetic, reconstructed from the three long
  * limbs — including nulls, negatives, products that cross precision
  * 18, empty groups, and multi-partition merges. */
class UnscaledSumSpec extends SparkSuite {

  test("== built-in sum on lineitem money columns (incl. products)") {
    val li = Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
    val disc = (col("l_extendedprice").cast("decimal(18,2)")
      * (lit(1) - col("l_discount").cast("decimal(18,2)")))
      .cast("decimal(18,4)")
    val rows = li.groupBy("l_returnflag")
      .agg(
        AE.unscaled_sum(col("l_quantity").cast("decimal(18,2)")).as("a1"),
        sum(col("l_quantity").cast("decimal(18,2)")).as("b1"),
        AE.unscaled_sum(disc).as("a2"),
        sum(disc).as("b2"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDecimal(1).compareTo(r.getDecimal(2)) == 0,
        s"qty: ${r.getDecimal(1)} != ${r.getDecimal(2)}")
      assert(r.getDecimal(3).compareTo(r.getDecimal(4)) == 0,
        s"disc: ${r.getDecimal(3)} != ${r.getDecimal(4)}")
    }
  }

  test("negatives, nulls, empty group, multi-partition merge") {
    import spark.implicits._
    val df = Seq[(String, Option[BigDecimal])](
      ("a", Some(BigDecimal("12.34"))), ("a", Some(BigDecimal("-99999999.99"))),
      ("a", None), ("a", Some(BigDecimal("0.01"))),
      ("b", None)).toDF("g", "v")
      .select(col("g"), col("v").cast("decimal(18,2)").as("v"))
      .repartition(7)
    val rows = df.groupBy("g")
      .agg(AE.unscaled_sum(col("v")).as("a"), sum(col("v")).as("b"))
      .orderBy("g").collect()
    assert(rows(0).getDecimal(1).compareTo(rows(0).getDecimal(2)) == 0)
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
  }

  test("stays in whole-stage codegen (pure long buffer, no object agg)") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val df = li.groupBy("l_returnflag")
      .agg(AE.unscaled_sum(col("l_quantity").cast("decimal(18,2)")).as("s"))
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("HashAggregate") &&
      !phys.contains("ObjectHashAggregate"),
      s"expected codegen HashAggregate:\n$phys")
  }
}
