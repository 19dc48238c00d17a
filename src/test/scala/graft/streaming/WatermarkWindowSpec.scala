package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Watermarked tumbling-window aggregation under readStream →
  * writeStream: append mode only finalizes a window once the watermark
  * passes it, and events later than the watermark are dropped — the
  * event-time contract SURVEY §2.8 adds beyond the reference's
  * total-WAL-order world. */
class WatermarkWindowSpec extends SparkSuite {
  import spark.implicits._

  private def t(minute: Long): Timestamp =
    Timestamp.valueOf(java.time.LocalDateTime.of(2026, 1, 1, 0, 0)
      .plusMinutes(minute))

  test("append-mode window finalization + late-event drop") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val agg = input.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count("*").as("n"), sum("value").as("total"))
      .select(col("window.start").as("wstart"), col("n"), col("total"))

    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      // Three events in hour 0, one in hour 2 (advances the watermark to
      // 2:00-0:10 > 1:00, finalizing hour 0).
      input.addData((t(5), 1.0), (t(20), 2.0), (t(59), 3.0))
      q.processAllAvailable()
      input.addData((t(125), 10.0))
      q.processAllAvailable()
      val afterFinalize = spark.table("win_out")
        .as[(Timestamp, Long, Double)].collect().toSet
      assert(afterFinalize === Set((t(0), 3L, 6.0)),
        s"hour-0 window must finalize with 3 events: $afterFinalize")

      // A straggler inside already-finalized hour 0 (event time 0:30,
      // watermark ~1:55) must be DROPPED, not re-emitted.
      input.addData((t(30), 100.0))
      q.processAllAvailable()
      // Advance far enough to finalize hour 2 as well.
      input.addData((t(300), 0.0))
      q.processAllAvailable()
      val finalRows = spark.table("win_out")
        .as[(Timestamp, Long, Double)].collect().toSet
      assert(finalRows === Set((t(0), 3L, 6.0), (t(120), 1L, 10.0)),
        s"late event must not change the finalized window: $finalRows")
    } finally q.stop()
  }
}
