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
    // production default is UNSORTED pair output — canonicalize here
    val got = PipelineQueries.dedupContainment(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("shared"), r.getAs[Long]("cont")))
      .sortBy(p => (p._1, p._2))
    assert(got.toSeq === expect.toSeq)
    assert(expect.nonEmpty, "fixture has no containment pairs — test is vacuous")
  }

  test("plan: one bounded-state aggregate, no join, no broadcast") {
    // The at-scale hazard this pins: earlier rounds capped boilerplate
    // with a FORCED broadcast anti-join — the boilerplate set grows
    // with the corpus and an explicit broadcast() hint bypasses Spark's
    // size guard, so at 100 TB the driver ships an unbounded set or
    // OOMs. The one-pass shape has no join at all: df + a bounded
    // membership buffer ride ONE aggregate, pairs explode from kept
    // buffers. AQE off so the static plan is what's asserted.
    val pinned = org.apache.spark.sql.graft.ColumnBridge.withSessionConf(
      PipelineQueries.dedupContainment(spark, dir),
      "spark.sql.adaptive.enabled" -> "false")
    val plan = pinned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastExchange"),
      s"containment must not broadcast anything (corpus-proportional set):\n$plan")
    assert(!plan.contains("Join"),
      s"containment must be join-free — pairs come from the bounded buffer:\n$plan")
    assert(plan.contains("ObjectHashAggregate") &&
      plan.contains("boundedtopk"),
      s"membership must ride the bounded-state aggregate:\n$plan")
    // exactly two exchanges on the production path (no harness output
    // sort): ex→(g) for the aggregate and pairs→(da,db,na,nb) for the
    // shared count
    val shuffles = "Exchange (hash|range)partitioning".r
      .findAllIn(plan).length
    assert(shuffles == 2, s"unexpected exchange count ($shuffles):\n$plan")
  }
}
