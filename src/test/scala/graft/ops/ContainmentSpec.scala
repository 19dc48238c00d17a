package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** q_dedup_containment against an all-pairs brute force of the same
  * definition — the banded plan must find exactly the pairs a doc×doc
  * scan finds (the anti-joined boilerplate cap is part of the
  * definition, mirrored in the brute force). */
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

  test("plan: one corpus exchange — cap window and pair join share it") {
    val df = PipelineQueries.dedupContainment(spark, dir)
    df.collect() // AQE resolves exchange reuse at runtime — finalize first
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"pair-join sides did not share the cap window's exchange:\n$plan")
    assert(!plan.contains("LeftAnti"),
      s"cap still spelled as a separate anti-join:\n$plan")
  }
}
