package graft.lake

import graft.SparkSuite

/** RESTORE TO VERSION AS OF: content rolls back (including per-file DV
  * state), history is preserved, schema rollback refuses, vacuumed
  * targets refuse, no-op restores don't commit. */
class DeltaRestoreSpec extends SparkSuite {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int)] =
    df.as[(Long, Int)].collect().sortBy(_._1).toSeq

  test("restore rolls content back across appends and DV deletes") {
    val dir = tmpDir("delta-restore")
    val v0 = DeltaCompat.write(
      Seq((1L, 10), (2L, 20), (3L, 30)).toDF("k", "v"), dir)
    DeltaCompat.write(Seq((4L, 40)).toDF("k", "v"), dir)
    DeltaCompat.delete(spark, dir,
      org.apache.spark.sql.functions.col("k") === 2L)
    assert(rows(DeltaCompat.read(spark, dir)) ===
      Seq(1L -> 10, 3L -> 30, 4L -> 40))

    val restored = DeltaCompat.restore(spark, dir, v0)
    assert(rows(DeltaCompat.read(spark, dir)) ===
      Seq(1L -> 10, 2L -> 20, 3L -> 30), "content = v0 exactly")
    // history preserved: the pre-restore states still time-travel
    assert(rows(DeltaCompat.read(spark, dir, Some(restored - 1))) ===
      Seq(1L -> 10, 3L -> 30, 4L -> 40))
    assert(rows(DeltaCompat.read(spark, dir, Some(v0))) ===
      rows(DeltaCompat.read(spark, dir)))
    // history row records the operation
    val ops = DeltaCompat.history(spark, dir)
      .select("operation").as[String].collect().toSeq
    assert(ops.contains("RESTORE"))
  }

  test("restore to a mid-history DV state reproduces that DV exactly") {
    val dir = tmpDir("delta-restore-dv")
    DeltaCompat.write(
      Seq((1L, 10), (2L, 20), (3L, 30), (4L, 40)).toDF("k", "v"), dir)
    val v1 = DeltaCompat.delete(spark, dir,
      org.apache.spark.sql.functions.col("k") === 2L)
    DeltaCompat.delete(spark, dir,
      org.apache.spark.sql.functions.col("k") === 3L)
    assert(rows(DeltaCompat.read(spark, dir)) === Seq(1L -> 10, 4L -> 40))
    DeltaCompat.restore(spark, dir, v1)
    assert(rows(DeltaCompat.read(spark, dir)) ===
      Seq(1L -> 10, 3L -> 30, 4L -> 40),
      "only the v1 deletion vector applies after restore")
  }

  test("no-op restore returns the head without committing") {
    val dir = tmpDir("delta-restore-noop")
    val v0 = DeltaCompat.write(Seq((1L, 10)).toDF("k", "v"), dir)
    val before = DeltaCompat.versions(dir)
    assert(DeltaCompat.restore(spark, dir, v0) === v0)
    assert(DeltaCompat.versions(dir) === before, "no new commit")
  }

  test("schema change since the target refuses; vacuumed target refuses") {
    val dir = tmpDir("delta-restore-refuse")
    val v0 = DeltaCompat.write(Seq((1L, 10)).toDF("k", "v"), dir)
    DeltaCompat.evolveSchema(spark, dir,
      adds = Seq(org.apache.spark.sql.types.StructField("w",
        org.apache.spark.sql.types.LongType, nullable = true)))
    // data written UNDER the evolved schema: rolling the files back
    // would re-expose old data under a schema it was never written for
    DeltaCompat.write(Seq((2L, 20, Some(7L))).toDF("k", "v", "w"), dir)
    intercept[UnsupportedOperationException] {
      DeltaCompat.restore(spark, dir, v0)
    }

    val dir2 = tmpDir("delta-restore-vac")
    val w0 = DeltaCompat.write(Seq((1L, 10)).toDF("k", "v"), dir2)
    DeltaCompat.write(Seq((2L, 20)).toDF("k", "v"), dir2,
      mode = "overwrite")
    val gone = DeltaCompat.vacuum(dir2, retentionMs = 0L)
    assert(gone.nonEmpty, "vacuum must reclaim the overwritten file")
    intercept[UnsupportedOperationException] {
      DeltaCompat.restore(spark, dir2, w0)
    }
  }
}
