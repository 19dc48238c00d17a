package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.lake.DeltaCompat

/** Streaming CDC into a Delta table: micro-batches merge-on-write, with
  * the spec's SetTransaction (`txn`) watermark making checkpoint
  * replays idempotent — in the log itself, visible to foreign readers. */
class DeltaCdcStreamSpec extends SparkSuite {
  import spark.implicits._

  private def readSorted(dir: String): Seq[(Long, String)] =
    DeltaCompat.read(spark, dir).as[(Long, String)]
      .collect().sortBy(_._1).toSeq

  test("memory-stream change feed converges the Delta table") {
    implicit val sc = spark.sqlContext
    val dir = tmpDir("delta-cdc-stream")
    DeltaCompat.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)

    val input = MemoryStream[(Long, String, String)]
    val changes = input.toDF().toDF("k", "v", "__op")
    val ckpt = tmpDir("delta-cdc-ckpt")

    // batch 0: insert 3, update 1
    input.addData((3L, "c", "I"), (1L, "a2", "U"))
    DeltaCdcStream.attach(dir, changes, Seq("k"), ckpt)
      .awaitTermination()
    assert(readSorted(dir) === Seq(1L -> "a2", 2L -> "b", 3L -> "c"))

    // batch 1 (new AvailableNow run, same checkpoint): delete 2
    input.addData((2L, "x", "D"))
    DeltaCdcStream.attach(dir, changes, Seq("k"), ckpt)
      .awaitTermination()
    assert(readSorted(dir) === Seq(1L -> "a2", 3L -> "c"))

    // the txn watermark is in the log, per the spec
    val appId = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(ckpt, "graft-appid")), "UTF-8").trim
    assert(DeltaCompat.lastTransactionVersion(spark, dir, appId) ===
      Some(1L))
    // a manual re-merge of batch 1 (simulated replay) is skipped by the
    // watermark check the sink performs
    val replayed = DeltaCompat
      .lastTransactionVersion(spark, dir, appId).forall(_ < 1L)
    assert(!replayed)
  }

  test("a missing table bootstraps from the first batch") {
    implicit val sc = spark.sqlContext
    val dir = tmpDir("delta-cdc-bootstrap") + "/fresh"
    val input = MemoryStream[(Long, String, String)]
    val changes = input.toDF().toDF("k", "v", "__op")
    val ckpt = tmpDir("delta-cdc-bootstrap-ckpt")
    input.addData((1L, "a", "I"), (9L, "x", "D"))
    DeltaCdcStream.attach(dir, changes, Seq("k"), ckpt)
      .awaitTermination()
    assert(readSorted(dir) === Seq(1L -> "a"))
    // subsequent batches merge normally
    input.addData((1L, "a2", "U"))
    DeltaCdcStream.attach(dir, changes, Seq("k"), ckpt)
      .awaitTermination()
    assert(readSorted(dir) === Seq(1L -> "a2"))
  }

  test("txn watermarks survive a checkpointed, vacuumed log") {
    implicit val sc = spark.sqlContext
    val dir = tmpDir("delta-cdc-txn-ckpt")
    DeltaCompat.write(Seq((1L, "a")).toDF("k", "v"), dir)
    DeltaCompat.merge(spark, dir, Seq((2L, "b")).toDF("k", "v"),
      Seq("k"), txn = Some("app-1" -> 7L))
    DeltaCompat.checkpoint(spark, dir)
    // drop the JSON commits the checkpoint covers (what vacuum +
    // log-cleanup do on real tables)
    val log = java.nio.file.Paths.get(dir, "_delta_log")
    java.nio.file.Files.list(log).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".json"))
      .filterNot(_.getFileName.toString.startsWith("_"))
      .foreach(java.nio.file.Files.delete)
    assert(DeltaCompat.lastTransactionVersion(spark, dir, "app-1") ===
      Some(7L))
    assert(readSorted(dir) === Seq(1L -> "a", 2L -> "b"))
  }
}
