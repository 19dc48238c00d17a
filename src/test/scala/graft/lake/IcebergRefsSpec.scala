package graft.lake

import graft.SparkSuite

/** Iceberg refs (table-spec v2 `refs` map): branches and tags.
  * Branch commits chain off the branch head and never move main; tags
  * are immutable; refs survive unrelated commits and maintenance;
  * expiry pins every ref head; fast-forward is ancestor-gated. */
class IcebergRefsSpec extends SparkSuite {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int)] =
    df.as[(Long, Int)].collect().sortBy(_._1).toSeq

  test("branch writes are isolated from main, and vice versa") {
    val dir = tmpDir("ice-refs-iso")
    IcebergCompat.write(Seq((1L, 10), (2L, 20)).toDF("k", "v"), dir)
    IcebergCompat.createBranch(dir, "audit")
    IcebergCompat.write(Seq((3L, 30)).toDF("k", "v"), dir, ref = "audit")
    IcebergCompat.write(Seq((4L, 40)).toDF("k", "v"), dir) // main
    IcebergCompat.write(Seq((5L, 50)).toDF("k", "v"), dir, ref = "audit")

    assert(rows(IcebergCompat.read(spark, dir)) ===
      Seq(1L -> 10, 2L -> 20, 4L -> 40), "main must not see branch rows")
    assert(rows(IcebergCompat.readRef(spark, dir, "audit")) ===
      Seq(1L -> 10, 2L -> 20, 3L -> 30, 5L -> 50),
      "branch = base + its own commits only")
    assert(rows(IcebergCompat.readRef(spark, dir, "main")) ===
      rows(IcebergCompat.read(spark, dir)))
  }

  test("tags pin a snapshot immutably; writes to a tag refuse") {
    val dir = tmpDir("ice-refs-tag")
    IcebergCompat.write(Seq((1L, 10)).toDF("k", "v"), dir)
    IcebergCompat.createTag(dir, "v1")
    IcebergCompat.write(Seq((2L, 20)).toDF("k", "v"), dir)
    assert(rows(IcebergCompat.readRef(spark, dir, "v1")) === Seq(1L -> 10))
    intercept[UnsupportedOperationException] {
      IcebergCompat.write(Seq((9L, 90)).toDF("k", "v"), dir, ref = "v1")
    }
    intercept[NoSuchElementException] {
      IcebergCompat.write(Seq((9L, 90)).toDF("k", "v"), dir, ref = "nope")
    }
    intercept[IllegalArgumentException] {
      IcebergCompat.createTag(dir, "v1") // already exists
    }
  }

  test("refs survive maintenance commits and expiry pins ref heads") {
    val dir = tmpDir("ice-refs-exp")
    IcebergCompat.write(Seq((1L, 10)).toDF("k", "v"), dir)
    IcebergCompat.createTag(dir, "v1")
    IcebergCompat.write(Seq((2L, 20)).toDF("k", "v"), dir)
    IcebergCompat.write(Seq((3L, 30)).toDF("k", "v"), dir)
    IcebergCompat.compact(spark, dir) // maintenance must carry refs
    assert(IcebergCompat.refs(dir).contains("v1"))

    val dropped = IcebergCompat.expireSnapshots(
      dir, System.currentTimeMillis() + 3600000L)
    assert(dropped.nonEmpty, "interior history must still expire")
    // the tag head survived the cutoff and still reads
    assert(rows(IcebergCompat.readRef(spark, dir, "v1")) === Seq(1L -> 10))
    // dropping the ref releases the pin: a second expiry removes it
    IcebergCompat.dropRef(dir, "v1")
    val dropped2 = IcebergCompat.expireSnapshots(
      dir, System.currentTimeMillis() + 3600000L)
    assert(dropped2.nonEmpty, "unpinned tag head must now expire")
    intercept[NoSuchElementException] {
      IcebergCompat.readRef(spark, dir, "v1")
    }
  }

  test("fast-forward moves main to the branch head; diverged refuses") {
    val dir = tmpDir("ice-refs-ff")
    IcebergCompat.write(Seq((1L, 10)).toDF("k", "v"), dir)
    IcebergCompat.createBranch(dir, "dev")
    IcebergCompat.write(Seq((2L, 20)).toDF("k", "v"), dir, ref = "dev")
    IcebergCompat.write(Seq((3L, 30)).toDF("k", "v"), dir, ref = "dev")
    IcebergCompat.fastForward(dir, "dev")
    assert(rows(IcebergCompat.read(spark, dir)) ===
      Seq(1L -> 10, 2L -> 20, 3L -> 30))
    // main == dev head now; a further main write diverges main AHEAD
    IcebergCompat.write(Seq((4L, 40)).toDF("k", "v"), dir)
    intercept[IllegalStateException] {
      IcebergCompat.fastForward(dir, "dev")
    }
    // and the follower probe sees the fast-forwarded head
    assert(IcebergCompat.currentSnapshotId(dir) ===
      IcebergCompat.refs(dir)("main")._1)
  }
}
