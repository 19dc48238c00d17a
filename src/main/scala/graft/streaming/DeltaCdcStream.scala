package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.lake.DeltaCompat

/** Continuous upsert maintenance for a DELTA table: attach a streaming
  * change feed (rows of table-columns + `__op` in {I, U, D}) and apply
  * each micro-batch as one [[DeltaCompat.merge]] — the Spark
  * restatement of moonlink's ingestion loop with Delta as the mirror
  * format instead of the mooncake manifest (the reference's mirrors
  * speak both, `/root/reference/CHANGELOG.md:25,27`).
  *
  * Exactly-once across crashes comes from the Delta spec's OWN
  * mechanism, not a side file: every merge commit carries a `txn`
  * (SetTransaction) action `(appId, batchId)` in the SAME atomic
  * commit as the data, and a replayed batch (Structured Streaming
  * re-delivers the last uncommitted batch after restart) is skipped
  * when its id is at or below the recorded watermark — the identical
  * contract real Delta streaming sinks implement, so a foreign Delta
  * reader sees the same idempotency state we do. */
object DeltaCdcStream {

  /** Start merging `changes` into the Delta table at `tableDir`.
    * `keys` are the replica identity. The app id is pinned per
    * checkpoint (a `graft-appid` file beside the stream state): a
    * restarted query keeps its identity, a fresh checkpoint gets a
    * fresh one. Returns the running query; caller owns its
    * lifecycle. */
  def attach(tableDir: String, changes: DataFrame, keys: Seq[String],
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val idFile = java.nio.file.Paths.get(checkpointDir, "graft-appid")
    val appId =
      if (java.nio.file.Files.exists(idFile))
        new String(java.nio.file.Files.readAllBytes(idFile),
          "UTF-8").trim
      else {
        val id = java.util.UUID.randomUUID().toString
        java.nio.file.Files.createDirectories(idFile.getParent)
        java.nio.file.Files.write(idFile, id.getBytes("UTF-8"))
        id
      }
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val applied = DeltaCompat
          .lastTransactionVersion(batch.sparkSession, tableDir, appId)
        if (applied.forall(_ < batchId)) {
          DeltaCompat.merge(batch.sparkSession, tableDir, batch, keys,
            deleteWhen = Some(col("__op") === "D"),
            txn = Some(appId -> batchId))
        } // else: checkpoint replay of a committed batch — skip
        ()
      }
      .start()
  }
}
