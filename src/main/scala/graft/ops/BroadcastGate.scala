package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-gated broadcast hint for SCALE-PROPORTIONAL dimensions.
  *
  * TPC-H's `customer` / `supplier` / `part` grow linearly with scale
  * factor (15 B customer rows at a 100-TB run). A hard `broadcast()`
  * hint on such a table overrides BOTH `autoBroadcastJoinThreshold`
  * and AQE's runtime demotion, so the plan that wins at bench SF
  * driver-OOMs at 100× instead of degrading to a shuffle join. This
  * gate keeps the bench-scale win and removes the scale cliff: the
  * hint is applied only when the OPTIMIZED-PLAN size estimate sits
  * under a byte ceiling, otherwise the frame is returned unhinted and
  * Catalyst/AQE pick the join (sort-merge at huge scale, runtime
  * broadcast if AQE measures the side small after all).
  *
  * Why plan stats and not a count: the estimate is driver-side only
  * (parquet footer bytes × projection ratio) — zero extra Spark jobs
  * per query, unlike the exact-count gate ConnectedComponents uses
  * (which sits behind a checkpoint it needed anyway). The estimate is
  * CONSERVATIVE in the safe direction: stats-less plans report the
  * `Long.MaxValue`-derived sentinel and filters don't shrink the
  * estimate without CBO, so borderline frames fall back to the
  * shuffle join — a perf wobble, never an OOM.
  *
  * NOT for constructed-bounded frames (per-group aggregates, top-k
  * results, centroid/codebook tables): those are small by construction
  * but their stats estimates inherit big child scans, so the gate
  * would spuriously demote them — keep the hard `broadcast()` hint
  * there and justify the bound in a comment.
  */
object BroadcastGate {

  /** Default ceiling: 64 MiB of plan-stat bytes. Compressed parquet
    * expands ~3-5× as an in-memory broadcast relation, so this caps
    * the materialized side around a few hundred MB — comfortably
    * inside a production executor/driver, while still broadcasting
    * customer up to ~sf20 (where the shuffle join's exchange would
    * cost more than the broadcast saves). Override per session with
    * `spark.graft.maxBroadcastBytes`. */
  val DefaultMaxBytes: Long = 64L << 20

  def maybeBroadcast(df: DataFrame): DataFrame = {
    val maxBytes = df.sparkSession.conf
      .getOption("spark.graft.maxBroadcastBytes")
      .map(_.toLong).getOrElse(DefaultMaxBytes)
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est <= maxBytes) broadcast(df) else df
  }
}
