package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Micro-batch change-set hygiene shared by the CDC sinks.
  *
  * A micro-batch routinely spans several source transactions, so one
  * key can carry several ops (I then U, U then D, ...). Sinks that
  * hand the batch to a one-shot writer — [[graft.lake.DeltaCompat
  * .merge]] refuses duplicate source keys outright; the Iceberg
  * delete+append pair lands every surviving row — must first reduce
  * the batch to its FINAL image per key, exactly the last-op-per-key
  * rule [[graft.lake.Mooncake.applyChanges]] applies internally. */
private[streaming] object CdcBatch {

  /** The last op per key: ordered by `__seq` when the feed provides one
    * (the followers stamp commit order there), else by arrival order
    * within the batch (monotonically_increasing_id — the same
    * convention applyChanges uses). The synthetic ordering column never
    * leaks into the result.
    *
    * `__seq` ties break on a CONTENT fingerprint (json-serialized row,
    * hashed): a feed whose watermark is coarser than its op rate — a
    * second-resolution timestamp with two ops on one key in one poll —
    * produces equal `__seq` values, and without the tie-break the
    * window's pick would follow partition-internal sort stability,
    * i.e. replay could converge to a DIFFERENT final image than the
    * original run. The fingerprint is arbitrary but deterministic, so
    * every replay picks the same winner; to_json covers map columns
    * xxhash64-on-struct cannot. */
  def lastImagePerKey(batch: DataFrame, keys: Seq[String]): DataFrame = {
    val hadSeq = batch.columns.contains("__seq")
    val withSeq =
      if (hadSeq) batch
      else batch.withColumn("__seq", monotonically_increasing_id())
    val content = withSeq.columns.filterNot(_ == "__seq")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__seq").desc,
        xxhash64(to_json(struct(content.map(col): _*))).desc)
    val reduced = withSeq
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    if (hadSeq) reduced else reduced.drop("__seq")
  }
}
