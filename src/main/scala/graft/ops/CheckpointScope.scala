package graft.ops

import org.apache.spark.SparkContext
import org.apache.spark.sql.DataFrame

/** Lifecycle registry for one-shot eager `localCheckpoint`s in query
  * paths — the [[PageRank]] release pattern generalized.
  *
  * A `localCheckpoint(true)` pins its blocks until the ContextCleaner
  * notices the RDD is unreachable; in a query-per-second loop (Bench,
  * a serving session) each invocation of a checkpointing operator
  * strands another copy of its intermediate until GC happens to run.
  * This helper keys each call SITE and releases the PREVIOUS
  * invocation's blocks when the site checkpoints again, so a loop
  * holds exactly one live checkpoint per site — steady-state
  * `getPersistentRDDs`, no accumulation.
  *
  * CONTRACT (same as PageRank.run): the returned frame's blocks stay
  * alive only until the SAME site checkpoints again. A caller that
  * holds the previous invocation's frame across a new invocation and
  * then acts on it gets a missing-checkpoint-block SparkException, not
  * a recompute (localCheckpoint truncates lineage). Collect or copy
  * the result before re-invoking the operator if you need it to
  * outlive the next call.
  */
object CheckpointScope {

  private val last =
    scala.collection.mutable.Map.empty[String, (SparkContext, Seq[Int])]

  /** Eagerly checkpoint `df`, releasing the blocks the same `site`
    * pinned on its previous invocation. */
  def checkpoint(site: String, df: DataFrame): DataFrame = synchronized {
    val sc = df.sparkSession.sparkContext
    last.remove(site).foreach { case (psc, ids) =>
      if (!psc.isStopped)
        ids.foreach(id =>
          psc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    }
    val before = sc.getPersistentRDDs.keySet
    val out = df.localCheckpoint(true)
    val newIds = (sc.getPersistentRDDs.keySet -- before).toSeq
    last.put(site, (sc, newIds))
    out
  }

  /** Release every site's blocks immediately (tests / shutdown). */
  def releaseAll(): Unit = synchronized {
    last.foreach { case (_, (sc, ids)) =>
      if (!sc.isStopped)
        ids.foreach(id =>
          sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    }
    last.clear()
  }
}
