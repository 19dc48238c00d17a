package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** SHALLOW CLONE contract: zero-copy snapshot via absolute-path adds,
  * log-level isolation both directions, and ownership rules for
  * maintenance (the clone's VACUUM must never reach into the source). */
class DeltaCloneSpec extends SparkSuite {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int)] =
    df.as[(Long, Int)].collect().sortBy(_._1).toSeq

  test("clone is a metadata-only snapshot: no data files copied") {
    val src = tmpDir("clone-src")
    val dst = tmpDir("clone-dst")
    DeltaCompat.write(Seq((1L, 10), (2L, 20), (3L, 30)).toDF("k", "v"), src)
    val v = DeltaCompat.shallowClone(spark, src, dst)
    assert(v === 0L)
    // target holds ONLY the log — zero parquet copied
    val parquets = java.nio.file.Files.walk(java.nio.file.Paths.get(dst))
      .filter(p => p.toString.endsWith(".parquet")).count()
    assert(parquets === 0L, "clone must not copy data files")
    assert(rows(DeltaCompat.read(spark, dst)) ===
      Seq(1L -> 10, 2L -> 20, 3L -> 30))
  }

  test("isolation both ways, DVs snapshot at clone time") {
    val src = tmpDir("clone-iso-src")
    val dst = tmpDir("clone-iso-dst")
    DeltaCompat.write(
      (1L to 8L).map(i => (i, i.toInt * 10)).toDF("k", "v"), src)
    DeltaCompat.delete(spark, src, col("k") === 3L) // DV before clone
    DeltaCompat.shallowClone(spark, src, dst)
    // mutate source AFTER the clone: append + another DV delete
    DeltaCompat.write(Seq((100L, 1000)).toDF("k", "v"), src)
    DeltaCompat.delete(spark, src, col("k") === 5L)
    // mutate clone: its own append + its own DV delete
    DeltaCompat.write(Seq((200L, 2000)).toDF("k", "v"), dst)
    DeltaCompat.delete(spark, dst, col("k") === 1L)

    val srcNow = rows(DeltaCompat.read(spark, src))
    val dstNow = rows(DeltaCompat.read(spark, dst))
    // source: original minus k=3,5 plus 100; clone's writes invisible
    assert(srcNow === ((1L to 8L).filter(k => k != 3 && k != 5)
      .map(k => (k, k.toInt * 10)) :+ (100L -> 1000)))
    // clone: pre-clone snapshot (k=3 gone, k=5 STILL PRESENT),
    // minus its own k=1 delete, plus its own append
    assert(dstNow === ((1L to 8L).filter(k => k != 3 && k != 1)
      .map(k => (k, k.toInt * 10)) :+ (200L -> 2000)))
  }

  test("clone vacuum never deletes source-owned files") {
    val src = tmpDir("clone-vac-src")
    val dst = tmpDir("clone-vac-dst")
    DeltaCompat.write(Seq((1L, 10), (2L, 20)).toDF("k", "v"), src)
    DeltaCompat.shallowClone(spark, src, dst)
    // Rewrite the clone so the cloned (absolute-path) adds become
    // tombstones, then vacuum with zero retention.
    DeltaCompat.write(Seq((9L, 90)).toDF("k", "v"), dst, mode = "overwrite")
    val deleted = DeltaCompat.vacuum(dst, retentionMs = 0L)
    assert(deleted.isEmpty, s"vacuum deleted source files: $deleted")
    // source unharmed
    assert(rows(DeltaCompat.read(spark, src)) === Seq(1L -> 10, 2L -> 20))
    assert(rows(DeltaCompat.read(spark, dst)) === Seq(9L -> 90))
  }

  test("absolute-path adds survive a checkpoint fold on the clone") {
    val src = tmpDir("clone-cp-src")
    val dst = tmpDir("clone-cp-dst")
    DeltaCompat.write(Seq((1L, 10), (2L, 20)).toDF("k", "v"), src)
    DeltaCompat.delete(spark, src, col("k") === 2L)
    DeltaCompat.shallowClone(spark, src, dst)
    DeltaCompat.write(Seq((3L, 30)).toDF("k", "v"), dst)
    DeltaCompat.checkpoint(spark, dst)
    DeltaCompat.write(Seq((4L, 40)).toDF("k", "v"), dst)
    // post-checkpoint replay resolves the folded absolute-path adds
    // (and the source's DV) exactly as the JSON log did
    assert(rows(DeltaCompat.read(spark, dst)) ===
      Seq(1L -> 10, 3L -> 30, 4L -> 40))
    // vacuum after the checkpoint still refuses source-owned storage
    DeltaCompat.write(Seq((9L, 90)).toDF("k", "v"), dst, mode = "overwrite")
    val deleted = DeltaCompat.vacuum(dst, retentionMs = 0L)
    assert(!deleted.exists(p => java.nio.file.Paths.get(p).isAbsolute),
      s"vacuum crossed into the source: $deleted")
    assert(rows(DeltaCompat.read(spark, src)) === Seq(1L -> 10))
  }

  test("clone into an existing Delta log refuses") {
    val src = tmpDir("clone-ref-src")
    val dst = tmpDir("clone-ref-dst")
    DeltaCompat.write(Seq((1L, 10)).toDF("k", "v"), src)
    DeltaCompat.write(Seq((2L, 20)).toDF("k", "v"), dst)
    intercept[IllegalArgumentException] {
      DeltaCompat.shallowClone(spark, src, dst)
    }
  }
}
