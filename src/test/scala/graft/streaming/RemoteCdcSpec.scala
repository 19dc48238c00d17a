package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.lake.Mooncake

/** Live remote tailing (the moonlink analog): a growing "remote"
  * location polled by watermark spools change batches that the standard
  * CdcStream applies — converging the mirror end-to-end, across
  * restarts of both the poller and the stream, without double-applies. */
class RemoteCdcSpec extends SparkSuite {
  import spark.implicits._

  /** The "remote server": a parquet location other writers append to
    * (mergeSchema: a remote ALTER TABLE mid-stream widens the feed). */
  private def remoteOf(dir: String) =
    (s: org.apache.spark.sql.SparkSession) =>
      s.read.option("mergeSchema", "true").parquet(dir)

  test("a live-updating remote converges the mirror across restarts") {
    val remoteDir = tmpDir("remote-src")
    val spool = tmpDir("remote-spool")
    val ckpt = tmpDir("remote-ckpt")

    // remote starts with rows 1-3 (version = the monotone watermark)
    Seq((1L, "a", 1L), (2L, "b", 2L), (3L, "c", 3L)).toDF("k", "v", "ver")
      .write.mode("append").parquet(remoteDir)

    val lake = new Mooncake(tmpDir("remote-wh"))
    lake.createTable(spark, "rt",
      spark.read.parquet(remoteDir), Seq("k"))

    val tailer = new RemoteCdcTailer(remoteOf(remoteDir), "ver", spool)
    // frontier starts empty: first poll would re-spool the backfill —
    // seed it by draining once BEFORE new remote activity and applying
    // (upserts of rows the mirror already holds are idempotent)
    assert(tailer.drain(spark) === 3L)
    CdcStream.attach(lake, "rt", tailer.changes(spark), ckpt)
      .awaitTermination()
    assert(lake.read(spark, "rt").count() === 3)

    // remote gains rows 4-5
    Seq((4L, "d", 4L), (5L, "e", 5L)).toDF("k", "v", "ver")
      .write.mode("append").parquet(remoteDir)
    assert(tailer.pollOnce(spark) === 2L)
    // quiet remote: next poll spools nothing
    assert(tailer.pollOnce(spark) === 0L)
    CdcStream.attach(lake, "rt", tailer.changes(spark), ckpt)
      .awaitTermination()
    assert(lake.read(spark, "rt").orderBy("k").as[(Long, String, Long)]
      .collect().map(r => (r._1, r._2)).toSeq ===
      Seq(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d", 5L -> "e"))

    // RESTART the poller (new instance, same spool): frontier persists,
    // nothing re-spools
    val tailer2 = new RemoteCdcTailer(remoteOf(remoteDir), "ver", spool)
    assert(tailer2.frontier === Some(5L))
    assert(tailer2.pollOnce(spark) === 0L)

    // remote update arrives with a fresh watermark; re-attached stream
    // (same checkpoint) applies exactly the new batch
    Seq((2L, "b2", 6L)).toDF("k", "v", "ver")
      .write.mode("append").parquet(remoteDir)
    assert(tailer2.pollOnce(spark) === 1L)
    CdcStream.attach(lake, "rt", tailer2.changes(spark), ckpt)
      .awaitTermination()
    val afterUpdate = lake.read(spark, "rt").orderBy("k")
      .as[(Long, String, Long)].collect().toSeq
    assert(afterUpdate.map(r => (r._1, r._2)) ===
      Seq(1L -> "a", 2L -> "b2", 3L -> "c", 4L -> "d", 5L -> "e"))
    // exactly-once application: version advanced once per non-empty batch
    assert(lake.currentManifest("rt").flushVersion ===
      lake.currentManifest("rt").commitVersion)

    // explicit __op feeds pass through: a remote DELETE row
    Seq((4L, null.asInstanceOf[String], 7L, "D"))
      .toDF("k", "v", "ver", "__op")
      .write.mode("append").parquet(remoteDir)
    // schema widened remotely mid-stream: re-create tailer streams with
    // the widened schema; older spool files null-fill __op → upsert
    val tailer3 = new RemoteCdcTailer(remoteOf(remoteDir), "ver",
      tmpDir("remote-spool3"))
    assert(tailer3.drain(spark) === 7L) // fresh spool re-reads everything
    val ckpt3 = tmpDir("remote-ckpt3")
    CdcStream.attach(lake, "rt",
      tailer3.changes(spark)
        .withColumn("__op", coalesce(col("__op"), lit("U")))
        .withColumn("__seq", col("ver")), // intra-batch order = watermark
      ckpt3).awaitTermination()
    assert(lake.read(spark, "rt").select("k").as[Long].collect().sorted
      .toSeq === Seq(1L, 2L, 3L, 5L))
  }

  test("crash between spool and frontier re-polls without diverging") {
    val remoteDir = tmpDir("remote-crash-src")
    val spool = tmpDir("remote-crash-spool")
    Seq((1L, "a", 1L), (2L, "b", 2L)).toDF("k", "v", "ver")
      .write.mode("append").parquet(remoteDir)
    val lake = new Mooncake(tmpDir("remote-crash-wh"))
    lake.createTable(spark, "rc",
      Seq((0L, "z", 0L)).toDF("k", "v", "ver"), Seq("k"))

    val tailer = new RemoteCdcTailer(remoteOf(remoteDir), "ver", spool)
    assert(tailer.pollOnce(spark) === 2L)
    // simulate the crash window: frontier file lost AFTER the batch
    // spooled → the re-poll spools the same delta again (at-least-once)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(spool, "frontier"))
    assert(new RemoteCdcTailer(remoteOf(remoteDir), "ver", spool)
      .pollOnce(spark) === 2L)
    CdcStream.attach(lake, "rc", tailer.changes(spark),
      tmpDir("remote-crash-ckpt")).awaitTermination()
    // duplicate upserts of the same keys converge to the same state
    assert(lake.read(spark, "rc").orderBy("k").as[(Long, String, Long)]
      .collect().map(_._2).toSeq === Seq("z", "a", "b"))
  }
}
