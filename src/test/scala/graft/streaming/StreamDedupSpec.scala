package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Streaming deduplication with bounded state: dropDuplicatesWithinWatermark
  * keeps a key's fingerprint only until the watermark passes it — the
  * streaming companion of the batch exact-dedup operator, and the only
  * shape that survives an unbounded stream (plain dropDuplicates grows
  * state forever). Duplicate CDC/ingest events inside the watermark
  * horizon are suppressed; the state for old keys is reclaimed. */
class StreamDedupSpec extends SparkSuite {
  import spark.implicits._

  private def t(minute: Long): Timestamp =
    Timestamp.valueOf(java.time.LocalDateTime.of(2026, 1, 1, 0, 0)
      .plusMinutes(minute))

  test("dropDuplicatesWithinWatermark suppresses dups, bounds state") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val deduped = input.toDF().toDF("id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")

    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // id=1 arrives three times within the horizon — one survivor.
      input.addData((1L, t(0)), (1L, t(1)), (2L, t(2)))
      q.processAllAvailable()
      input.addData((1L, t(3)))
      q.processAllAvailable()
      val early = spark.table("dedup_out").as[(Long, Timestamp)]
        .collect().map(_._1).toSeq.sorted
      assert(early === Seq(1L, 2L), s"dups within watermark must drop: $early")

      // Advance event time far past the watermark horizon; id=1's state
      // has been reclaimed, so a fresh id=1 is emitted again.
      input.addData((3L, t(60)))
      q.processAllAvailable()
      input.addData((1L, t(61)))
      q.processAllAvailable()
      val late = spark.table("dedup_out").as[(Long, Timestamp)]
        .collect().map(_._1).toSeq.sorted
      assert(late === Seq(1L, 1L, 2L, 3L),
        s"a key older than the watermark must be re-emittable: $late")
    } finally q.stop()
  }
}
