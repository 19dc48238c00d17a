package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.lake.{DeltaCompat, Mooncake}

/** Following a foreign Delta table: seed from a snapshot, then every
  * later commit's change feed lands in the mirror through the standard
  * CdcStream — across merges, deletes, multi-commit polls, and
  * restarts of both the follower and the stream. */
class DeltaFollowerSpec extends SparkSuite {
  import spark.implicits._

  private val cdf = Map("delta.enableChangeDataFeed" -> "true")

  private def mirrorRows(lake: Mooncake): Seq[(Long, String)] =
    lake.read(spark, "dm").select("k", "v").as[(Long, String)]
      .collect().sortBy(_._1).toSeq

  private def deltaRows(dir: String): Seq[(Long, String)] =
    DeltaCompat.read(spark, dir).select("k", "v").as[(Long, String)]
      .collect().sortBy(_._1).toSeq

  test("mirror follows merge/delete commits and survives restarts") {
    val delta = tmpDir("df-delta")
    val spool = tmpDir("df-spool")
    val ckpt = tmpDir("df-ckpt")
    DeltaCompat.write(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), delta,
      properties = cdf)

    val lake = new Mooncake(tmpDir("df-wh"))
    val follower = new DeltaFollower(delta, spool)
    assert(follower.seed(spark, lake, "dm", Seq("k")) === 0L)
    assert(mirrorRows(lake) === Seq(1L -> "a", 2L -> "b", 3L -> "c"))
    // seeded frontier: nothing to spool yet
    assert(follower.pollOnce(spark) === 0L)

    // one merge commit: update 2, delete 3, insert 9
    DeltaCompat.merge(spark, delta,
      Seq((2L, "B", "U"), (3L, "-", "D"), (9L, "i", "I"))
        .toDF("k", "v", "op"),
      Seq("k"), deleteWhen = Some(col("op") === "D"))
    assert(follower.pollOnce(spark) > 0)
    CdcStream.attach(lake, "dm", follower.changes(spark), ckpt)
      .awaitTermination()
    assert(mirrorRows(lake) === deltaRows(delta))
    assert(mirrorRows(lake) === Seq(1L -> "a", 2L -> "B", 9L -> "i"))

    // TWO commits before one poll: append then delete — __seq carries
    // commit order so the net batch applies in log order
    DeltaCompat.write(Seq((4L, "d"), (5L, "e")).toDF("k", "v"), delta,
      properties = cdf)
    DeltaCompat.delete(spark, delta, col("k") === 1L)
    assert(follower.pollOnce(spark) > 0)
    CdcStream.attach(lake, "dm", follower.changes(spark), ckpt)
      .awaitTermination()
    assert(mirrorRows(lake) === deltaRows(delta))

    // RESTART both sides: new follower instance (frontier persists,
    // nothing re-spools), new commit, re-attached stream converges
    val follower2 = new DeltaFollower(delta, spool)
    assert(follower2.frontier === follower.frontier)
    assert(follower2.pollOnce(spark) === 0L)
    DeltaCompat.merge(spark, delta, Seq((9L, "I2")).toDF("k", "v"),
      Seq("k"))
    assert(follower2.pollOnce(spark) > 0)
    CdcStream.attach(lake, "dm", follower2.changes(spark), ckpt)
      .awaitTermination()
    assert(mirrorRows(lake) === deltaRows(delta))
    assert(mirrorRows(lake).toMap.get(9L) === Some("I2"))
  }

  test("a compaction commit advances the frontier without rows") {
    val delta = tmpDir("df-opt-delta")
    val spool = tmpDir("df-opt-spool")
    DeltaCompat.write(Seq((1L, "a")).toDF("k", "v").coalesce(1), delta,
      properties = cdf)
    DeltaCompat.write(Seq((2L, "b")).toDF("k", "v").coalesce(1), delta,
      properties = cdf)
    val lake = new Mooncake(tmpDir("df-opt-wh"))
    val follower = new DeltaFollower(delta, spool)
    follower.seed(spark, lake, "dm", Seq("k"))
    // dataChange=false bin-packing: log moves, change feed is silent
    DeltaCompat.optimize(spark, delta)
    assert(follower.pollOnce(spark) === 0L)
    assert(follower.frontier === Some(DeltaCompat.versions(delta).max))
  }
}
