package graft.lake

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.SparkSuite

/** Delta log interop: append/overwrite commits produce a well-formed
  * `_delta_log`, reads replay it (head + time travel), and unsupported
  * protocol features are refused rather than mis-read. */
class DeltaCompatSpec extends SparkSuite {
  import spark.implicits._

  test("append, overwrite, time travel round-trip through the Delta log") {
    val dir = tmpDir("delta-compat")

    val v0 = DeltaCompat.write(
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)
    assert(v0 === 0L)
    val v1 = DeltaCompat.write(Seq((3L, "c")).toDF("k", "v"), dir)
    assert(v1 === 1L)

    val head = DeltaCompat.read(spark, dir).as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(head === Seq(1L -> "a", 2L -> "b", 3L -> "c"))

    // Overwrite removes all prior adds in the same commit.
    DeltaCompat.write(Seq((9L, "z")).toDF("k", "v"), dir, mode = "overwrite")
    val after = DeltaCompat.read(spark, dir).as[(Long, String)]
      .collect().toSeq
    assert(after === Seq(9L -> "z"))

    // Time travel to the pre-overwrite version still sees 3 rows.
    val travel = DeltaCompat.read(spark, dir, version = Some(1L))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(travel === Seq(1L -> "a", 2L -> "b", 3L -> "c"))

    // The log is what a Delta reader expects: versioned ndjson with
    // protocol/metaData in commit 0 and Spark-schema-JSON schemaString.
    val log0 = Files.readAllLines(
      Paths.get(dir, "_delta_log", f"${0L}%020d.json")).asScala.mkString("\n")
    assert(log0.contains("\"minReaderVersion\":1"))
    assert(log0.contains("\"schemaString\""))
    assert(DeltaCompat.versions(dir) === Seq(0L, 1L, 2L))
  }

  test("checkpointed or newer-protocol tables are refused, not mis-read") {
    val dir = tmpDir("delta-refuse")
    DeltaCompat.write(Seq((1L, "a")).toDF("k", "v"), dir)
    Files.write(Paths.get(dir, "_delta_log", "_last_checkpoint"),
      "{\"version\":0}".getBytes)
    intercept[UnsupportedOperationException] {
      DeltaCompat.read(spark, dir)
    }
  }
}
