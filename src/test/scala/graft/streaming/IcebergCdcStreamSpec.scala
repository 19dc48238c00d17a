package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.lake.IcebergCompat

/** Streaming CDC into an Iceberg v2 table: per-batch equality-delete +
  * append snapshots (the Flink writer shape), watermarked in the
  * append snapshot's summary for idempotent checkpoint replays. */
class IcebergCdcStreamSpec extends SparkSuite {
  import spark.implicits._

  private def readSorted(dir: String): Seq[(Long, String)] =
    IcebergCompat.read(spark, dir).as[(Long, String)]
      .collect().sortBy(_._1).toSeq

  test("memory-stream change feed converges the Iceberg table") {
    implicit val sc = spark.sqlContext
    val dir = tmpDir("iceberg-cdc-stream")
    IcebergCompat.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)

    val input = MemoryStream[(Long, String, String)]
    val changes = input.toDF().toDF("k", "v", "__op")
    val ckpt = tmpDir("iceberg-cdc-ckpt")

    // batch 0: insert 3, update 1 — the update's tombstone must not
    // kill its own re-insert (sequence rule)
    input.addData((3L, "c", "I"), (1L, "a2", "U"))
    IcebergCdcStream.attach(dir, changes, Seq("k"), ckpt)
      .awaitTermination()
    assert(readSorted(dir) === Seq(1L -> "a2", 2L -> "b", 3L -> "c"))

    // batch 1: delete 2
    input.addData((2L, "x", "D"))
    IcebergCdcStream.attach(dir, changes, Seq("k"), ckpt)
      .awaitTermination()
    assert(readSorted(dir) === Seq(1L -> "a2", 3L -> "c"))

    // the watermark rides the snapshot summary, Flink-style
    val appId = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(ckpt, "graft-appid")), "UTF-8").trim
    assert(IcebergCompat.lastSummaryProperty(dir,
      s"graft.watermark.$appId") === Some("1"))

    // batch 2 re-inserts a deleted key: must survive the old tombstone
    input.addData((2L, "b2", "I"))
    IcebergCdcStream.attach(dir, changes, Seq("k"), ckpt)
      .awaitTermination()
    assert(readSorted(dir) === Seq(1L -> "a2", 2L -> "b2", 3L -> "c"))
    assert(IcebergCompat.lastSummaryProperty(dir,
      s"graft.watermark.$appId") === Some("2"))
  }

  test("expireSnapshots carries the watermark onto the retained head") {
    val dir = tmpDir("iceberg-wm-expire")
    IcebergCompat.write(Seq((1L, "a")).toDF("k", "v"), dir,
      summary = Map("graft.watermark.app-x" -> "5"))
    IcebergCompat.write(Seq((2L, "b")).toDF("k", "v"), dir)
    assert(IcebergCompat.lastSummaryProperty(dir,
      "graft.watermark.app-x") === Some("5"))
    // expire everything but the head (the watermark-carrying snapshot)
    val dropped = IcebergCompat.expireSnapshots(dir,
      System.currentTimeMillis() + 60000)
    assert(dropped.nonEmpty)
    assert(IcebergCompat.lastSummaryProperty(dir,
      "graft.watermark.app-x") === Some("5"))
  }

  test("a delete-only batch still advances the watermark") {
    implicit val sc = spark.sqlContext
    val dir = tmpDir("iceberg-cdc-delonly")
    IcebergCompat.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)
    val input = MemoryStream[(Long, String, String)]
    val changes = input.toDF().toDF("k", "v", "__op")
    val ckpt = tmpDir("iceberg-cdc-delonly-ckpt")
    input.addData((1L, "x", "D"))
    IcebergCdcStream.attach(dir, changes, Seq("k"), ckpt)
      .awaitTermination()
    assert(readSorted(dir) === Seq(2L -> "b"))
    val appId = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(ckpt, "graft-appid")), "UTF-8").trim
    assert(IcebergCompat.lastSummaryProperty(dir,
      s"graft.watermark.$appId") === Some("0"))
  }
}
