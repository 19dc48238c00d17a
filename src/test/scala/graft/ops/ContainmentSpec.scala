package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** q_dedup_containment against an all-pairs brute force of the same
  * definition — the window-hash plan must find exactly the pairs a
  * doc×doc scan finds (the boilerplate cap is part of the definition,
  * mirrored in the brute force). */
class ContainmentSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("containment pairs equal the all-pairs brute force") {
    val docs = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sh = docs.map { case (id, t) =>
      id -> t.split(" ", -1).toSeq.sliding(8).filter(_.length == 8)
        .map(_.mkString(" ")).toSeq.distinct.toSet
    }.filter(_._2.nonEmpty)
    val df = sh.flatMap(_._2).groupBy(identity).view.mapValues(_.length)
    val boiler = df.filter(_._2 > 64).keySet
    val expect = (for {
      (ia, sa) <- sh; (ib, sb) <- sh if ia < ib
      shared = (sa & sb).count(!boiler(_))
      if shared > 0
      cont = 1000000L * shared / math.min(sa.size, sb.size)
      if cont >= 800000L
    } yield (ia, ib, shared.toLong, cont)).sortBy(p => (p._1, p._2))
    val got = PipelineQueries.dedupContainment(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("shared"), r.getAs[Long]("cont")))
    assert(got.toSeq === expect.toSeq)
    assert(expect.nonEmpty, "fixture has no containment pairs — test is vacuous")
  }

  test("plan: skew-immune cap anti-join; pair-join sides share one exchange") {
    // At fixture scale AQE broadcasts the pair join itself (no exchange
    // to reuse), so pin the at-scale shape: threshold -1 forces the
    // pair join to shuffle (the cap's explicit broadcast() hint still
    // wins), and with AQE off the planner's ReuseExchange rule is
    // visible statically.
    val pinned = org.apache.spark.sql.graft.ColumnBridge.withSessionConf(
      PipelineQueries.dedupContainment(spark, dir),
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val plan = pinned.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti") && plan.contains("BroadcastHashJoin"),
      s"boilerplate cap is not a broadcast anti-join:\n$plan")
    assert(plan.contains("ReusedExchange"),
      s"pair-join sides did not share the kept leg's exchange:\n$plan")
  }
}
