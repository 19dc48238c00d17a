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
    * caller owns its lifecycle. */
  def attach(lake: Mooncake, table: String, changes: DataFrame,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val base = lake.currentManifest(table).commitVersion
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val version = base + batchId + 1
        val current = lake.currentManifest(table).commitVersion
        if (version > current) {
          lake.applyChanges(batch.sparkSession, table, batch, version)
        } // else: checkpoint replay of an already-committed batch — skip
        ()
      }
      .start()
  }
}
