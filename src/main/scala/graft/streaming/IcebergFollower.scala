package graft.streaming


import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, when}

import graft.lake.{IcebergCompat, Mooncake}

/** Follow a FOREIGN Iceberg table live — the Iceberg twin of
  * [[DeltaFollower]]: poll the snapshot log by SNAPSHOT ID and turn
  * each new snapshot's row-level delta (via
  * [[IcebergCompat.readChanges]], a writer-agnostic parent-vs-snapshot
  * diff restricted to the files that differ) into standard CDC batches,
  * so a mooncake mirror tracks an Iceberg table some other engine keeps
  * writing — appends, equality/position deletes, even compactions
  * (which net zero change rows).
  *
  * Ordering: `__seq = 2·sequence_number + (insert ? 1 : 0)`. The
  * snapshot's monotone sequence number keeps commits ordered even when
  * several polls' spool files land in ONE stream micro-batch, and the
  * +1 makes an update's insert image beat its delete tombstone within
  * the same snapshot under applyChanges' last-op-per-key rule.
  *
  * Delivery matches the tailer/Delta-follower contract: spool batch
  * parquet THEN advance the frontier (at-least-once into the spool,
  * converging because application is keyed), with the attached stream's
  * checkpoint making application exactly-once.
  */
class IcebergFollower(table: String, val spoolDir: String)
    extends SpoolFrontier {

  /** Create the mirror from the Iceberg table's CURRENT snapshot and
    * set the frontier there, so the follower streams only LATER
    * snapshots. Returns the seeded snapshot id. */
  def seed(spark: SparkSession, lake: Mooncake, mirror: String,
      pk: Seq[String]): Long = {
    val cur = IcebergCompat.currentSnapshotId(table)
    require(cur != -1L,
      s"cannot seed from '$table': it has no snapshot yet")
    lake.createTable(spark, mirror,
      IcebergCompat.read(spark, table, snapshotId = Some(cur)), pk)
    writeFrontier(cur)
    cur
  }

  /** One poll: spool the change rows of every snapshot past the
    * frontier as one CDC batch. Returns rows spooled (0 = no new
    * snapshots, or only no-op snapshots such as compactions). */
  def pollOnce(spark: SparkSession): Long = {
    val cur = IcebergCompat.currentSnapshotId(table)
    val from = frontier.getOrElse(-1L)
    if (cur == from || cur < 0) return 0L
    val ch = IcebergCompat.readChanges(spark, table, from, Some(cur))
      .withColumn("__op",
        when(col("_change_type") === "delete", lit("D")).otherwise(lit("U")))
      .withColumn("__seq", col("_sequence_number") * 2 +
        when(col("_change_type") === "insert", 1L).otherwise(0L))
      .drop("_change_type", "_snapshot_id", "_sequence_number")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = ch.count()
      if (n > 0) ch.write.mode("append").parquet(batchesDir.toString)
      // Advance even when the delta nets to zero rows (a compaction
      // snapshot): the frontier tracks the LOG position, not volume.
      writeFrontier(cur)
      n
    } finally {
      ch.unpersist()
      ()
    }
  }

  /** The spooled change feed as a file-source stream for
    * [[CdcStream.attach]]; schema from the Iceberg table, so the
    * stream can start before any batch is spooled. */
  def changes(spark: SparkSession): DataFrame = {
    val schema = IcebergCompat.read(spark, table)
      .withColumn("__op", lit("U"))
      .withColumn("__seq", lit(0L)).schema
    spark.readStream.schema(schema).parquet(batchesDir.toString)
  }
}
