package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.lake.Mooncake

/** Streaming CDC: change rows arriving through a Structured Streaming
  * source converge the mirror, with the batch id advancing the version
  * frontier (read-your-writes across the stream). */
class CdcStreamSpec extends SparkSuite {
  import spark.implicits._

  test("memory-stream change feed converges the mirror batch by batch") {
    implicit val sc = spark.sqlContext
    val lake = new Mooncake(tmpDir("cdc-stream"))
    lake.createTable(spark, "s",
      Seq((1, "a"), (2, "b")).toDF("a", "b"), Seq("a"))

    val input = MemoryStream[(Int, String, String, Long)]
    val changes = input.toDF().toDF("a", "b", "__op", "__seq")
    val ckpt = tmpDir("cdc-ckpt")

    // batch 0: insert 3, update 1
    input.addData((3, "c", "I", 1L), (1, "a2", "U", 2L))
    val q1 = CdcStream.attach(lake, "s", changes, ckpt)
    q1.awaitTermination()

    val afterB0 = lake.read(spark, "s", atLeastVersion = Some(2))
      .orderBy("a").as[(Int, String)].collect().toSeq
    assert(afterB0 === Seq(1 -> "a2", 2 -> "b", 3 -> "c"))

    // batch 1 (new AvailableNow run, same checkpoint): delete 2
    input.addData((2, null, "D", 3L))
    val q2 = CdcStream.attach(lake, "s", changes, ckpt)
    q2.awaitTermination()

    val afterB1 = lake.read(spark, "s", atLeastVersion = Some(3))
      .orderBy("a").as[(Int, String)].collect().toSeq
    assert(afterB1 === Seq(1 -> "a2", 3 -> "c"))
    // The base is pinned once per checkpoint (graft-base), so batch N
    // always maps to version base+N+1: re-attach does NOT rebase, and a
    // replayed batch id recomputes its ORIGINAL version and is skipped
    // by the monotonicity guard instead of re-applied at a fresh one.
    assert(lake.currentManifest("s").flushVersion === 3L)
  }

  test("legacy markerless checkpoint: a crash-replay is settled by content " +
      "— no duplicate delivery, while a genuinely new batch still applies") {
    implicit val sc = spark.sqlContext
    val lake = new Mooncake(tmpDir("cdc-legacy"))
    lake.createTable(spark, "lg",
      Seq((1, "a"), (2, "b")).toDF("a", "b"), Seq("a"))
    val input = MemoryStream[(Int, String, String, Long)]
    val changes = input.toDF().toDF("a", "b", "__op", "__seq")
    val ckpt = tmpDir("cdc-legacy-ckpt")

    // awaitTermination can return before the query leaves the active
    // registry; a same-checkpoint re-attach then trips the
    // concurrent-use guard — drain the registry between runs
    def run(): Unit = {
      CdcStream.attach(lake, "lg", changes, ckpt).awaitTermination()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
    }

    input.addData((3, "c", "I", 1L))
    run()
    assert(lake.currentManifest("lg").commitVersion === 2L)

    // Simulate a PRE-MARKER checkpoint that crashed between apply and
    // commit-log write: drop the marker (legacy upgrade) and batch 0's
    // commit entry (so Structured Streaming replays it on restart).
    val marker = java.nio.file.Paths.get(ckpt, "graft-applied")
    java.nio.file.Files.delete(marker)
    java.nio.file.Files.delete(java.nio.file.Paths.get(ckpt, "commits", "0"))
    // the local-FS CRC sidecar would block the re-commit's rename
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(ckpt, "commits", ".0.crc"))
    run()
    // The content probe recognizes the replay: NO redundant version, so
    // tableChanges consumers never see the change set delivered twice.
    assert(lake.currentManifest("lg").commitVersion === 2L)
    assert(new String(java.nio.file.Files.readAllBytes(marker), "UTF-8")
      .trim === "0")

    // Markerless + version consumed by an OUT-OF-BAND commit + a
    // genuinely NEW batch: content differs, so the batch must apply at
    // current+1 (the data-loss direction the marker fix guards).
    java.nio.file.Files.delete(marker)
    lake.applyChanges(spark, "lg",
      Seq((9, "oob", "I", 1L)).toDF("a", "b", "__op", "__seq"), 3L)
    input.addData((5, "e", "I", 2L))
    run()
    assert(lake.currentManifest("lg").commitVersion === 4L)
    assert(lake.read(spark, "lg").orderBy("a")
      .as[(Int, String)].collect().toSeq ===
      Seq(1 -> "a", 2 -> "b", 3 -> "c", 5 -> "e", 9 -> "oob"))
  }

  test("a widened change feed evolves the mirror schema mid-stream") {
    // Upstream ALTER TABLE ADD COLUMN: the feed starts carrying an
    // extra column; applyChanges widens the manifest and rows last
    // written before the evolution read back null-filled.
    implicit val sc = spark.sqlContext
    val lake = new Mooncake(tmpDir("cdc-stream-evo"))
    lake.createTable(spark, "e", Seq((1, "a")).toDF("a", "b"), Seq("a"))

    val in1 = MemoryStream[(Int, String, String, Long)]
    in1.addData((2, "b", "I", 1L))
    CdcStream.attach(lake, "e", in1.toDF().toDF("a", "b", "__op", "__seq"),
      tmpDir("cdc-evo-ck1")).awaitTermination()

    val in2 = MemoryStream[(Int, String, String, String, Long)]
    in2.addData((3, "c", "x3", "I", 1L), (1, "a2", "y1", "U", 2L))
    CdcStream.attach(lake, "e",
      in2.toDF().toDF("a", "b", "c", "__op", "__seq"),
      tmpDir("cdc-evo-ck2")).awaitTermination()

    val got = lake.read(spark, "e").orderBy("a")
      .as[(Int, String, Option[String])].collect().toSeq
    assert(got === Seq((1, "a2", Some("y1")), (2, "b", None),
      (3, "c", Some("x3"))))
  }

  test("event-time tumbling window with watermark over the events table") {
    // The reference has no event-time windows (WAL order is total,
    // SURVEY.md §2.8 last row); this is the Spark-native extension:
    // watermarked tumbling-window aggregation over a streamed change feed.
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val agg = input.toDF().toDF("ts", "user_id", "value")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(sum("value").as("total"))

    input.addData(
      (java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), 1L, 2.0),
      (java.sql.Timestamp.valueOf("2024-01-01 10:40:00"), 1L, 3.0),
      (java.sql.Timestamp.valueOf("2024-01-01 11:05:00"), 1L, 7.0))
    val q = agg.writeStream.format("memory").queryName("win")
      .outputMode("complete").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.sql(
      "SELECT user_id, total FROM win ORDER BY window.start")
      .as[(Long, Double)].collect().toSeq
    assert(got === Seq(1L -> 5.0, 1L -> 7.0))
  }

  test("maintain: MVs refresh with every micro-batch, restart + replay safe") {
    implicit val sc = spark.sqlContext
    val lake = new Mooncake(tmpDir("cdc-mv"))
    lake.createTable(spark, "t",
      Seq((1, 1L, 10), (2, 1L, 50), (3, 2L, 7)).toDF("a", "g", "v"),
      Seq("a"))
    val mv = new graft.lake.Mview(lake)
    mv.create(spark, "t_by_g", "t", Seq("g"), Seq(
      graft.lake.MvAgg("count", "*", "n"),
      graft.lake.MvAgg("sum", "v", "sum_v"),
      graft.lake.MvAgg("min", "v", "min_v"),
      graft.lake.MvAgg("max", "v", "max_v")))

    val input = MemoryStream[(Int, Long, Int, String, Long)]
    val changes = input.toDF().toDF("a", "g", "v", "__op", "__seq")
    val ckpt = tmpDir("cdc-mv-ckpt")

    def recompute() = lake.read(spark, "t").groupBy("g").agg(
        count(lit(1)).as("n"), sum("v").as("sum_v"),
        min("v").as("min_v"), max("v").as("max_v"))
      .orderBy("g").as[(Long, Long, Long, Int, Int)].collect().toSeq
    def mvRows() = mv.read(spark, "t_by_g")
      .select(col("g"), col("n"), col("sum_v"), col("min_v"), col("max_v"))
      .orderBy("g").as[(Long, Long, Long, Int, Int)].collect().toSeq

    // batch 0: insert into g=2, and move the g=1 max carrier DOWN — the
    // update's delete image ties the stored max, forcing the dirty-group
    // re-aggregation inside the stream's own refresh
    input.addData((4, 2L, 9, "I", 1L), (2, 1L, 20, "U", 2L))
    CdcStream.attach(lake, "t", changes, ckpt, maintain = Seq("t_by_g"))
      .awaitTermination()
    assert(mvRows() === recompute())

    // restart: second AvailableNow run on the SAME checkpoint; batch 1
    // deletes the g=2 min carrier (dirty min path)
    input.addData((3, 2L, 7, "D", 3L))
    CdcStream.attach(lake, "t", changes, ckpt, maintain = Seq("t_by_g"))
      .awaitTermination()
    assert(mvRows() === recompute())

    // replayed-batch / crash-between-apply-and-refresh analog: refresh
    // is frontier-driven, so running it again changes nothing
    val again = mv.refresh(spark, "t_by_g")
    assert(again.affectedGroups === 0L)
    assert(mvRows() === recompute())
  }
}
