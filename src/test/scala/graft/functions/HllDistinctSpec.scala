package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.expressions.{AggExpressions => AE}

/** HllDistinctLong's contract: estimates within 5% of exact (the bound
  * every consuming query asserts in-band) across cardinality regimes —
  * linear-counting range, transition, and raw-HLL range — with
  * partition-merge invariance and null/empty handling. Estimates are
  * engine-specific by design; only the BOUND is the contract. */
class HllDistinctSpec extends SparkSuite {

  test("within 5% of exact across cardinality regimes; merge-invariant") {
    import spark.implicits._
    for (card <- Seq(10L, 1000L, 50000L, 400000L)) {
      // multiplicative spread so values are not consecutive ids
      val df = (1L to card * 3).map(i => (i % card) * 2654435761L)
        .toDF("v").repartition(16)
      val row = df.agg(
        AE.hll_distinct_long(col("v")).as("est"),
        countDistinct(col("v")).as("exact")).head()
      val est = row.getLong(0).toDouble
      val exact = row.getLong(1).toDouble
      assert(math.abs(est - exact) / exact <= 0.05,
        s"card=$card est=$est exact=$exact")
      // repartitioning must not move the estimate (register max is
      // order- and partition-invariant)
      val est2 = df.repartition(3)
        .agg(AE.hll_distinct_long(col("v"))).head().getLong(0)
      assert(est2.toDouble === est, s"partition-dependent estimate at $card")
    }
  }

  test("nulls skipped; empty group estimates 0") {
    import spark.implicits._
    val df = Seq[(String, Option[Long])](
      ("a", Some(1L)), ("a", None), ("a", Some(2L)), ("b", None))
      .toDF("g", "v")
    val rows = df.groupBy("g").agg(AE.hll_distinct_long(col("v")).as("d"))
      .orderBy("g").collect()
    assert(rows(0).getLong(1) === 2L)
    assert(rows(1).getLong(1) === 0L)
  }
}
