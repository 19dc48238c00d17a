package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.lake.Mooncake

/** Continuous mirror maintenance: attach a streaming change feed (any
  * Structured Streaming source producing rows of table-columns + __op
  * [+ __seq]) to a mooncake table.
  *
  * This is the Spark restatement of the reference's moonlink ingestion
  * loop (SURVEY.md §3.2): the WAL/replication stream becomes a streaming
  * DataFrame, each micro-batch is one atomic CDC apply, and the batch id
  * plays the LSN role — after batch N commits, the manifest's
  * commit/flush frontiers cover version `base + N + 1`, so readers can
  * demand read-your-writes freshness exactly as with batch applies.
  *
  * Crash recovery: Structured Streaming's checkpoint replays the last
  * uncommitted batch after restart (the reference restarts its service
  * from ConsistentState, `/root/reference/src/bgworker.rs:13-14`);
  * [[graft.lake.Mooncake.applyChanges]] rejects non-monotone versions, so
  * a replayed batch that already committed is skipped idempotently rather
  * than double-applied.
  */
object CdcStream {

  /** Start applying `changes` to `table`. Returns the running query;
    * caller owns its lifecycle.
    *
    * The version base is recorded ONCE per checkpoint (a `graft-base`
    * file beside the stream's own state): re-reading the manifest on
    * every attach would move the base past already-applied batches, so
    * a post-crash replay would compute a fresh version and re-apply
    * instead of hitting the `version > current` skip — the frontier
    * would advance spuriously and tableChanges would report a phantom
    * batch. With the pinned base, a replayed batch id maps to its
    * original version and is skipped. */
  /** The version base pinned once per checkpoint (see [[attach]] doc) —
    * shared with every foreachBatch-applying stream over a mirror
    * (e.g. [[graft.ops.VectorIndex.attachStream]]). */
  private[graft] def pinnedBase(lake: Mooncake, table: String,
      checkpointDir: String): Long = {
    val baseFile = java.nio.file.Paths.get(checkpointDir, "graft-base")
    if (java.nio.file.Files.exists(baseFile))
      new String(java.nio.file.Files.readAllBytes(baseFile),
        "UTF-8").trim.toLong
    else {
      val b = lake.currentManifest(table).commitVersion
      java.nio.file.Files.createDirectories(baseFile.getParent)
      java.nio.file.Files.write(baseFile, b.toString.getBytes("UTF-8"))
      b
    }
  }

  /** `maintain` names materialized views over `table` (same lake) to
    * refresh after every applied micro-batch — the reference's
    * real-time-freshness pitch extended to derived state: the mirror
    * AND its MVs advance together, no manual refresh loop.
    *
    * Restart safety needs no extra machinery: [[graft.lake.Mview
    * .refresh]] is driven by the MV definition's own recorded base
    * version (it diffs base versions, not batch ids), so a replayed
    * batch — skipped by the version gate — leads to a no-op refresh,
    * and a crash BETWEEN apply and refresh heals on the next batch,
    * whose refresh folds the multi-version diff in one pass. */
  def attach(lake: Mooncake, table: String, changes: DataFrame,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      maintain: Seq[String] = Nil): StreamingQuery = {
    val base = pinnedBase(lake, table, checkpointDir)
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val version = base + batchId + 1
        val current = lake.currentManifest(table).commitVersion
        if (version > current) {
          lake.applyChanges(batch.sparkSession, table, batch, version)
        } // else: checkpoint replay of an already-committed batch — skip
        if (maintain.nonEmpty) {
          val mv = new graft.lake.Mview(lake)
          maintain.foreach(mv.refresh(batch.sparkSession, _))
        }
        ()
      }
      .start()
  }
}
