package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** q_mix_weights: largest-remainder quota arithmetic and the
  * bounded-heap selection (no Window, no global sort on the corpus). */
class MixWeightsSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.01"

  test("quotas follow the largest-remainder method and the budget is spent") {
    val rows = CurationQueries.mixWeights(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("rk")))
    val perLang = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    // budget 175, weights 505/165/143/117/70 per-mille:
    // floors 88/28/25/20/12 (=173), +1 to the two largest remainders
    // (zh rem 875, de rem 475) -> 88/29/25/21/12. sf0.01 availability
    // (en 218, zh 75, es 73, de 70, fr 64) doesn't clamp.
    assert(perLang === Map("en" -> 88L, "zh" -> 29L, "es" -> 25L,
      "de" -> 21L, "fr" -> 12L), s"quotas wrong: $perLang")
    assert(rows.length === 175)
    // ranks are 1..quota per language, no gaps
    rows.groupBy(_._1).foreach { case (l, rs) =>
      assert(rs.map(_._3).sorted.toSeq === (1L to rs.length).toSeq, l)
    }
  }

  test("selection is deterministic: same docs on a re-run") {
    val a = CurationQueries.mixWeights(spark, dir).collect().toSeq
    val b = CurationQueries.mixWeights(spark, dir).collect().toSeq
    assert(a === b)
  }

  test("plan: corpus selection is a bounded-heap aggregate, not a Window") {
    val plan = CurationQueries.mixWeights(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("boundedtopk") || plan.contains("BoundedTopK"),
      s"no bounded heap in plan:\n$plan")
    // the only Window ops allowed are over the 5-row weights frame;
    // assert the corpus aggregate is ObjectHashAggregate (partial heap)
    assert(plan.contains("ObjectHashAggregate"), s"no partial heap:\n$plan")
  }
}
