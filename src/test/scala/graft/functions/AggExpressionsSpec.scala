package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}
import graft.functions.expressions.{AggExpressions => AE}

/** ExactPercentiles must be value-identical (bitwise, not approximately)
  * to Spark's built-in `percentile` — same position math, same
  * interpolation — on real data including interpolated positions. */
class AggExpressionsSpec extends SparkSuite {

  test("exact_percentiles == built-in percentile bitwise on lineitem") {
    val li = Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
    val ps = Seq(0.0, 0.25, 0.5, 0.621, 0.75, 1.0)
    val got = li.groupBy("l_returnflag")
      .agg(AE.exact_percentiles(col("l_extendedprice"), ps).as("mine"),
        expr(s"percentile(l_extendedprice, array(${ps.mkString(",")}))")
          .as("builtin"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val mine = r.getSeq[Double](1)
      val builtin = r.getSeq[Double](2)
      ps.indices.foreach { i =>
        assert(java.lang.Double.doubleToLongBits(mine(i)) ===
          java.lang.Double.doubleToLongBits(builtin(i)),
          s"flag=${r.getString(0)} p=${ps(i)}: ${mine(i)} vs ${builtin(i)}")
      }
    }
  }

  test("decimal_moments == separate decimal sums bitwise") {
    val li = Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
    val dec = col("l_quantity").cast("decimal(18,2)")
    val got = li.groupBy("l_returnflag")
      .agg(AE.decimal_moments(dec).as("m"),
        sum(dec).cast("double").as("s1"),
        sum(dec * dec).cast("double").as("s2"),
        count(lit(1)).as("n"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val m = r.getStruct(1)
      assert(m.getLong(0) === r.getLong(4), "n")
      assert(java.lang.Double.doubleToLongBits(m.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)), "s1")
      assert(java.lang.Double.doubleToLongBits(m.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(3)), "s2")
    }
  }

  test("empty and single-value groups") {
    import spark.implicits._
    val df = Seq(("a", 5.0)).toDF("g", "v")
    val one = df.groupBy("g")
      .agg(AE.exact_percentiles(col("v"), Seq(0.25, 0.9)).as("p"))
      .collect()(0).getSeq[Double](1)
    assert(one === Seq(5.0, 5.0))
    val none = df.filter(col("v") > 100).groupBy("g")
      .agg(AE.exact_percentiles(col("v"), Seq(0.5)).as("p"))
      .collect()
    assert(none.isEmpty)
  }
}
