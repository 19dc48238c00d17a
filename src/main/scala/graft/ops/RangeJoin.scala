package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range join — the 100 TB execution shape for interval joins.
  *
  * Spark plans a non-equi condition like `p.v BETWEEN b.lo AND b.hi` as a
  * broadcast-nested-loop join: O(|probe| x |build|) comparisons and an
  * obligatory broadcast. That is fine for a small build side
  * (RelationalQueries.joinRange) and fatal at scale. The standard fix
  * (DuckDB's IEJoin and Spark's own range-join hints on other platforms
  * solve the same problem) is to discretize: the build side replicates
  * each interval into the fixed-width bins it overlaps, the probe side
  * maps each value to its single bin, and the join becomes a plain hash
  * equi-join on the bin id plus a residual range filter. Each qualifying
  * pair appears exactly once, because a probe value lives in exactly one
  * bin.
  *
  * Cost model: build rows replicate ceil(span/width)+1 times; probe rows
  * never replicate; the equi-join shuffles (or broadcasts) by bin and
  * hash-matches only co-binned pairs. Bin width tunes replication vs
  * candidate density — width ≈ median interval span is a good default.
  */
object RangeJoin {

  /** Join `probe` to `build` on `probeCol BETWEEN loCol AND hiCol`,
    * planned as a hash equi-join on fixed-width bins. Column names must
    * be distinct across the two sides. */
  def binned(probe: DataFrame, probeCol: String,
      build: DataFrame, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    // drop inverted intervals BEFORE exploding: sequence(start, stop)
    // silently steps -1 when start > stop, so one malformed lo > hi row
    // would fan out into ~span/width junk bins instead of matching
    // nothing
    val binned = build
      .where(col(loCol) <= col(hiCol))
      .withColumn("__bin", explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    probe
      .withColumn("__bin", floor(col(probeCol) / binWidth).cast("long"))
      .join(binned, Seq("__bin"))
      .where(col(probeCol) >= col(loCol) && col(probeCol) <= col(hiCol))
      .drop("__bin")
  }
}
