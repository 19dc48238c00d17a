package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) folding of a keyed change history —
  * the standard way a CDC stream (§2.8's operator) is materialized as
  * queryable history instead of a converged mirror. The reference keeps
  * only the converged state (Iceberg snapshots); SCD2 is the companion
  * view training/analytics pipelines build from the same change feed.
  *
  * Input: one row per (key, version) carrying the row image effective at
  * that version. Output: the same rows with `valid_from` / `valid_to`
  * interval columns and an `is_current` flag.
  *
  * Shape at scale: one hash shuffle on the key, then a codegen'd window —
  * no self-join, no driver state. Interval assignment is pure `lead` over
  * the per-key version order.
  */
object Scd2 {

  def history(changes: DataFrame, key: Seq[String],
      versionCol: String): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*).orderBy(col(versionCol))
    val next = lead(col(versionCol), 1).over(w)
    changes
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", next - 1)
      .withColumn("is_current", next.isNull)
  }
}
