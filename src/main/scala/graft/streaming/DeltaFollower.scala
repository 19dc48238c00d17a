package graft.streaming


import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, when}

import graft.lake.{DeltaCompat, Mooncake}

/** Follow a FOREIGN Delta table live — the lake-side twin of
  * [[RemoteCdcTailer]]: where the tailer polls a remote relation by a
  * row-level watermark column, the follower polls the Delta
  * transaction log by COMMIT VERSION and turns each new commit's
  * change-data-feed rows into standard CDC batches, so a mooncake
  * mirror tracks a Delta table some other engine keeps writing.
  *
  * Per poll: versions past the persisted frontier are read through
  * [[DeltaCompat.readChanges]] (cdc files when present, insert
  * derivation otherwise), mapped to the CDC contract — insert /
  * update_postimage → `__op = U` upsert image, delete → `__op = D`,
  * update_preimage dropped (the postimage's keyed upsert replaces the
  * row) — and spooled as one parquet batch with `__seq =
  * _commit_version`, so a multi-commit poll applies in log order
  * within its micro-batch. The spool is a standard file-source stream:
  * [[changes]] feeds [[CdcStream.attach]] exactly like the tailer's.
  *
  * Delivery is the tailer's two-layer contract: batch-then-frontier
  * ordering re-polls the same versions after a crash (at-least-once
  * into the spool, converging because application is keyed), and the
  * attached stream's checkpoint makes application itself exactly-once.
  *
  * Scale: a poll reads ONLY the cdc/add files of the new commits —
  * never the table — so following a 100 TB Delta table costs
  * change-volume IO, exactly like the mirror's own CDC apply.
  */
class DeltaFollower(table: String, val spoolDir: String)
    extends SpoolFrontier {

  /** Create the mirror from the Delta table's CURRENT snapshot and set
    * the frontier there, so the follower streams only LATER commits —
    * the natural "initial snapshot copy, then replicate" flow
    * (`create_table` backfill + moonlink tail in the reference).
    * Returns the seeded Delta version. */
  def seed(spark: SparkSession, lake: Mooncake, mirror: String,
      pk: Seq[String]): Long = {
    val vs = DeltaCompat.versions(table)
    require(vs.nonEmpty,
      s"cannot seed from '$table': no Delta log exists yet")
    val cur = vs.max
    lake.createTable(spark, mirror,
      DeltaCompat.read(spark, table, version = Some(cur)), pk)
    writeFrontier(cur)
    cur
  }

  /** One poll: spool the change rows of every commit past the frontier
    * as one CDC batch. Returns rows spooled (0 = no new commits). */
  def pollOnce(spark: SparkSession): Long = {
    // an empty/not-yet-created log is a quiet poll, not an empty.max
    // crash — the producer may simply not have committed yet
    val vs = DeltaCompat.versions(table)
    if (vs.isEmpty) return 0L
    val cur = vs.max
    val from = frontier.getOrElse(-1L)
    if (cur <= from) return 0L
    val ch = DeltaCompat.readChanges(spark, table, from + 1, Some(cur))
      .filter(col("_change_type") =!= "update_preimage")
      .withColumn("__op",
        when(col("_change_type") === "delete", lit("D")).otherwise(lit("U")))
      .withColumn("__seq", col("_commit_version"))
      .drop("_change_type", "_commit_version")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = ch.count()
      if (n > 0) ch.write.mode("append").parquet(batchesDir.toString)
      // Advance even when the delta nets to zero rows (e.g. a
      // dataChange=false compaction commit): the frontier tracks the
      // LOG position, not row volume.
      writeFrontier(cur)
      n
    } finally {
      ch.unpersist()
      ()
    }
  }

  /** The spooled change feed as a file-source stream for
    * [[CdcStream.attach]]; schema from the Delta table, so the stream
    * can start before any batch is spooled. */
  def changes(spark: SparkSession): DataFrame = {
    val schema = DeltaCompat.read(spark, table)
      .withColumn("__op", lit("U"))
      .withColumn("__seq", lit(0L)).schema
    spark.readStream.schema(schema).parquet(batchesDir.toString)
  }
}
