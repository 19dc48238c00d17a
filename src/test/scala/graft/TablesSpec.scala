package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Drift-proofs `Tables.load`'s events normalization: driver fixture
  * regenerations have shipped `events.ts` as parquet TIMESTAMP(NANOS)
  * (surfaced as int64 nanos under nanosAsLong) and as TIMESTAMP(MICROS).
  * Both physical shapes must load to the SAME micros timestamp_ntz frame.
  */
class TablesSpec extends SparkSuite {

  private val microsUtc = Seq(
    1700000000000000L, // 2023-11-14 22:13:20
    1700000000123456L,
    1706745600999999L)

  private def writeEvents(dir: String, tsField: StructField,
      tsValue: Long => Any): Unit = {
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      tsField,
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    val rows = microsUtc.zipWithIndex.map { case (us, i) =>
      Row(i.toLong, tsValue(us), i.toLong, "click", 1.0, """{"k":1}""")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("events loader normalizes int64-nanos and timestamp[us] to the same frame") {
    val nsDir = tmpDir("events-ns")
    val usDir = tmpDir("events-us")
    // Arm 1: int64 nanos — the shape the nanosAsLong legacy conf yields
    // for a parquet TIMESTAMP(NANOS) fixture.
    writeEvents(nsDir, StructField("ts", LongType), us => us * 1000L)
    // Arm 2: real timestamp[us] (NTZ), the current driver fixture shape.
    writeEvents(usDir, StructField("ts", TimestampNTZType),
      us => java.time.LocalDateTime.ofEpochSecond(
        us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC))

    val fromNs = Tables.load(spark, nsDir, "events")
    val fromUs = Tables.load(spark, usDir, "events")

    for (df <- Seq(fromNs, fromUs)) {
      assert(df.schema("ts").dataType === TimestampNTZType)
      assert(df.columns.toSeq === Seq(
        "event_id", "ts", "user_id", "event_type", "value", "props"))
    }
    // Micro-precision must survive both arms (compare raw micros; the
    // session TZ is UTC so the NTZ→TZ cast is value-preserving).
    val micros = Seq(fromNs, fromUs).map(
      _.orderBy("event_id")
        .selectExpr("unix_micros(cast(ts as timestamp))")
        .collect().map(_.getLong(0)).toSeq)
    assert(micros(0) === micros(1))
    assert(micros(0) === microsUtc)
  }

  test("real fixture events loads with timestamp_ntz ts") {
    val df = Tables.load(spark, "/root/testdata/sf0.001", "events")
    assert(df.schema("ts").dataType === TimestampNTZType)
    assert(df.count() > 0)
  }
}
