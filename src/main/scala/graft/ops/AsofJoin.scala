package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join (DuckDB `ASOF JOIN`, SURVEY.md §2.4 last row) as a
  * composable operator, built from union + last-value-ignoring-nulls over
  * an event-time window — the formulation that scales.
  *
  * Why not join + filter + top-1: `l JOIN r ON key AND r.ts <= l.ts` then
  * rank materializes every (left, earlier-right) PAIR before pruning —
  * quadratic in events per key. This operator instead interleaves both
  * inputs in one (key, ts) sort and carries the latest right row forward,
  * so the cost is one shuffle + sort of |L|+|R| rows regardless of skew.
  * That's the plan you want at 100 TB; Catalyst can't derive it from the
  * join spelling, which is exactly why this exists as an operator.
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
      tieBreak: Seq[String] = Seq.empty): DataFrame = {
    val (lKey, rKey) = by
    val (lTs, rTs) = on

    val leftCols = left.columns.toSeq
    // Interleaved layout: __key, __ts, __side (right sorts before left at
    // equal ts so a same-instant right row is visible to the left row),
    // right payload (null on left rows), left row (null on right rows).
    //
    // The payload is carried as ONE struct, not per-column: last(...,
    // ignoreNulls) over individual columns would skip a right row whose
    // payload VALUE is genuinely NULL (reaching back to an older row),
    // and with several payload columns could stitch fields from
    // different right rows. The struct is null only on left rows, so
    // ignoreNulls means exactly "skip interleaved left rows".
    import org.apache.spark.sql.types.StructType
    val payloadType = StructType(rightPayload.map(c => right.schema(c)))
    val lTagged = left.select(
      col(lKey).as("__key") +: col(lTs).as("__ts") +: lit(1).as("__side") +:
        (lit(null).cast(payloadType).as("__rrow") +:
          (tieBreak.map(c => lit(null).cast(
            right.schema(c).dataType).as(s"__tb_$c")) ++
            leftCols.map(c => col(c).as(s"__l_$c")))): _*)
    val rTagged = right.select(
      col(rKey).as("__key") +: col(rTs).as("__ts") +: lit(0).as("__side") +:
        (struct(rightPayload.map(c => col(c).as(c)): _*).as("__rrow") +:
          (tieBreak.map(c => col(c).as(s"__tb_$c")) ++
            leftCols.map(c => lit(null).cast(
              left.schema(c).dataType).as(s"__l_$c")))): _*)

    val w = Window.partitionBy("__key")
      .orderBy(col("__ts").asc +: col("__side").asc +:
        tieBreak.map(c => col(s"__tb_$c").asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = lTagged.unionByName(rTagged)
      .select(col("*"),
        last(col("__rrow"), ignoreNulls = true).over(w).as("__asof"))

    carried.filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l_$c").as(c)) ++
        rightPayload.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }
}
