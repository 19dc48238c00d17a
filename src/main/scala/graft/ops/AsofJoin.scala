package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** AS-OF join (DuckDB `ASOF JOIN`, SURVEY.md §2.4 last row) as a
  * composable operator, built from union + last/first-ignoring-nulls over
  * an event-time window — the formulation that scales.
  *
  * Why not join + filter + top-1: `l JOIN r ON key AND r.ts <= l.ts` then
  * rank materializes every (left, earlier-right) PAIR before pruning —
  * quadratic in events per key. This operator instead interleaves both
  * inputs in one (key, ts) sort and carries the latest right row forward,
  * so the cost is one shuffle + sort of |L|+|R| rows regardless of skew.
  * That's the plan you want at 100 TB; Catalyst can't derive it from the
  * join spelling, which is exactly why this exists as an operator.
  *
  * Three directions, matching the DuckDB/pandas surface
  * (`ASOF JOIN ... ON r.ts <= l.ts` / `>=` / merge_asof
  * direction='nearest'):
  *   - [[backward]] — latest right row with `r.ts <= l.ts` (the default
  *     ASOF direction);
  *   - [[forward]] — earliest right row with `r.ts >= l.ts`;
  *   - [[nearest]] — whichever of the two is closer in event time, ties
  *     preferring the backward match. Computed in the SAME single
  *     interleaved pass: one shuffle of |L|+|R|, two in-partition sorts
  *     (the two directions need opposite left/right orderings at equal
  *     timestamps), never a pair materialization.
  */
object AsofJoin {

  /** For each left row, attach the latest right row with
    * `right(onRight) <= left(onLeft)` within the same `by` key ("backward"
    * as-of). Right payload columns come back null when no prior right row
    * exists (left-outer semantics). Ties on right timestamps resolve by
    * the later row in `tieBreak` order — pass a unique column for full
    * determinism.
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      by: (String, String),
      on: (String, String),
      rightPayload: Seq[String],
      tieBreak: Seq[String] = Seq.empty,
      tolerance: Option[Long] = None): DataFrame =
    run(left, right, by, on, rightPayload, tieBreak, wantB = true,
      wantF = false, tolerance = tolerance)

  /** Mirror of [[backward]]: the EARLIEST right row with
    * `right(onRight) >= left(onLeft)` (DuckDB `ASOF JOIN ... ON r.ts >=
    * l.ts`). Ties on right timestamps resolve by the EARLIER row in
    * `tieBreak` order (the mirror of backward's rule). */
  def forward(
      left: DataFrame,
      right: DataFrame,
      by: (String, String),
      on: (String, String),
      rightPayload: Seq[String],
      tieBreak: Seq[String] = Seq.empty,
      tolerance: Option[Long] = None): DataFrame =
    run(left, right, by, on, rightPayload, tieBreak, wantB = false,
      wantF = true, tolerance = tolerance)

  /** The closer of the backward and forward matches in event time
    * (pandas merge_asof direction='nearest'); equidistant candidates —
    * including a same-instant right row, distance 0 both ways — resolve
    * to the BACKWARD match. Event-time distance is exact integer
    * microseconds for date/timestamp keys, double for numeric keys. */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      by: (String, String),
      on: (String, String),
      rightPayload: Seq[String],
      tieBreak: Seq[String] = Seq.empty,
      tolerance: Option[Long] = None): DataFrame =
    run(left, right, by, on, rightPayload, tieBreak, wantB = true,
      wantF = true, tolerance = tolerance)

  /** Exact absolute event-time distance for the nearest rule. Date keys
    * use datediff — exact epoch-day arithmetic. Casting dates through
    * timestamp localizes each midnight in the session zone, so across a
    * DST transition two local midnights sit 23h/25h apart and
    * day-equidistant backward/forward candidates stop tying: the
    * nearest rule's backward preference would silently flip in
    * non-UTC sessions. */
  private def dist(a: Column, b: Column, dt: DataType): Column = dt match {
    case _: DateType => abs(datediff(a, b)).cast("long")
    case _: TimestampType | _: TimestampNTZType =>
      abs(unix_micros(a.cast("timestamp")) - unix_micros(b.cast("timestamp")))
    case _ => abs(a.cast("double") - b.cast("double"))
  }

  private def run(
      left: DataFrame,
      right: DataFrame,
      by: (String, String),
      on: (String, String),
      rightPayload: Seq[String],
      tieBreak: Seq[String],
      wantB: Boolean,
      wantF: Boolean,
      tolerance: Option[Long] = None): DataFrame = {
    val (lKey, rKey) = by
    val (lTs, rTs) = on

    val leftCols = left.columns.toSeq
    // Interleaved layout: __key, __ts, __side, right payload struct
    // (null on left rows), left row (null on right rows).
    //
    // The payload is carried as ONE struct, not per-column: last(...,
    // ignoreNulls) over individual columns would skip a right row whose
    // payload VALUE is genuinely NULL (reaching back to an older row),
    // and with several payload columns could stitch fields from
    // different right rows. The struct is null only on left rows, so
    // ignoreNulls means exactly "skip interleaved left rows". The
    // right's own event time rides the struct as `__rts` so nearest can
    // compare distances without a second lookup.
    val payloadType = StructType(
      StructField("__rts", right.schema(rTs).dataType) +:
        rightPayload.map(c => right.schema(c)))
    val lTagged = left.select(
      col(lKey).as("__key") +: col(lTs).as("__ts") +: lit(1).as("__side") +:
        (lit(null).cast(payloadType).as("__rrow") +:
          (tieBreak.map(c => lit(null).cast(
            right.schema(c).dataType).as(s"__tb_$c")) ++
            leftCols.map(c => col(c).as(s"__l_$c")))): _*)
    val rTagged = right.select(
      col(rKey).as("__key") +: col(rTs).as("__ts") +: lit(0).as("__side") +:
        (struct(col(rTs).as("__rts") +:
            rightPayload.map(c => col(c).as(c)): _*).as("__rrow") +:
          (tieBreak.map(c => col(c).as(s"__tb_$c")) ++
            leftCols.map(c => lit(null).cast(
              left.schema(c).dataType).as(s"__l_$c")))): _*)

    // Backward: right sorts BEFORE left at equal ts (a same-instant
    // right row satisfies r.ts <= l.ts), latest prior via last() over
    // the preceding frame. Forward mirrors both: left BEFORE right at
    // equal ts, earliest later via first() over the following frame.
    // Both windows partition identically, so nearest pays ONE exchange
    // and two in-partition sorts.
    val tbAsc = tieBreak.map(c => col(s"__tb_$c").asc)
    val wB = Window.partitionBy("__key")
      .orderBy(col("__ts").asc +: col("__side").asc +: tbAsc: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy("__key")
      .orderBy(col("__ts").asc +: col("__side").desc +: tbAsc: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val withB = if (wantB) lTagged.unionByName(rTagged)
      .withColumn("__b", last(col("__rrow"), ignoreNulls = true).over(wB))
    else lTagged.unionByName(rTagged)
    val carried = if (wantF) withB
      .withColumn("__f", first(col("__rrow"), ignoreNulls = true).over(wF))
    else withB

    val lts = col("__ts")
    val ltsType = left.schema(lTs).dataType
    val asof: Column =
      if (wantB && wantF)
        when(col("__b").isNull, col("__f"))
          .when(col("__f").isNull, col("__b"))
          .when(dist(lts, col("__b.__rts"), ltsType) <=
            dist(col("__f.__rts"), lts, ltsType), col("__b"))
          .otherwise(col("__f"))
      else if (wantB) col("__b")
      else col("__f")

    // merge_asof `tolerance`: a match farther than `tol` (in dist()
    // units — integer microseconds for timestamp keys, whole days for
    // date keys, absolute value for numeric keys) nulls out, exactly
    // pandas' rule. Applied AFTER direction resolution, so nearest's
    // backward preference still decides ties inside the band.
    val gated = tolerance match {
      case Some(tol) =>
        when(col("__asof").isNotNull &&
          dist(lts, col("__asof.__rts"), ltsType) <= tol, col("__asof"))
          .otherwise(lit(null).cast(payloadType))
      case None => col("__asof")
    }
    carried.filter(col("__side") === 1)
      .withColumn("__asof", asof)
      .withColumn("__asof", gated)
      .select(leftCols.map(c => col(s"__l_$c").as(c)) ++
        rightPayload.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }
}
