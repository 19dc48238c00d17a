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

  test("cherry-pick publishes a staged append onto a diverged main") {
    val dir = tmpDir("ice-refs-cp")
    IcebergCompat.write(Seq((1L, 10), (2L, 20)).toDF("k", "v"), dir)
    IcebergCompat.createBranch(dir, "wap")
    IcebergCompat.write(Seq((3L, 30)).toDF("k", "v"), dir, ref = "wap")
    IcebergCompat.write(Seq((4L, 40)).toDF("k", "v"), dir) // diverge main
    val staged = IcebergCompat.refs(dir)("wap")._1
    intercept[IllegalStateException] { // sanity: ff really is blocked
      IcebergCompat.fastForward(dir, "wap")
    }
    val published = IcebergCompat.cherryPick(dir, staged)
    assert(rows(IcebergCompat.read(spark, dir)) ===
      Seq(1L -> 10, 2L -> 20, 3L -> 30, 4L -> 40))
    // main's head is the NEW commit, parented on main's prior head —
    // the staged snapshot itself never enters main's lineage
    assert(IcebergCompat.currentSnapshotId(dir) === published)
    val hist = IcebergCompat.inspect(spark, dir, "snapshots")
      .select("snapshot_id").collect().map(_.getLong(0))
    assert(hist.contains(published) && hist.contains(staged))
    // re-publishing the same snapshot refuses
    intercept[IllegalStateException] {
      IcebergCompat.cherryPick(dir, staged)
    }
    // branch stays where it was (publish does not move the ref)
    assert(IcebergCompat.refs(dir)("wap")._1 === staged)
  }

  test("cherry-pick takes a NEW sequence: interim eq-deletes don't shadow") {
    val dir = tmpDir("ice-refs-cp-seq")
    IcebergCompat.write(Seq((1L, 10), (2L, 20)).toDF("k", "v"), dir)
    IcebergCompat.createBranch(dir, "wap")
    // stage k=3 on the branch at sequence S
    IcebergCompat.write(Seq((3L, 30)).toDF("k", "v"), dir, ref = "wap")
    // main meanwhile equality-deletes k=3 (sequence S+1 > S): had the
    // publish kept the staged sequence, this delete would swallow the
    // published row
    IcebergCompat.writeEqualityDeletes(spark, dir,
      Seq(Tuple1(3L)).toDF("k"), Seq("k"))
    val staged = IcebergCompat.refs(dir)("wap")._1
    IcebergCompat.cherryPick(dir, staged)
    assert(rows(IcebergCompat.read(spark, dir)) ===
      Seq(1L -> 10, 2L -> 20, 3L -> 30),
      "published rows sequence PAST the interim delete")
    // the staged branch head still reads its own (pre-delete) content
    assert(rows(IcebergCompat.readRef(spark, dir, "wap")) ===
      Seq(1L -> 10, 2L -> 20, 3L -> 30))
  }

  test("cherry-pick refuses non-append snapshots and the current head") {
    val dir = tmpDir("ice-refs-cp-ref")
    IcebergCompat.write(Seq((1L, 10), (2L, 20)).toDF("k", "v"), dir)
    val head = IcebergCompat.currentSnapshotId(dir)
    intercept[IllegalStateException] {
      IcebergCompat.cherryPick(dir, head) // already main's head
    }
    IcebergCompat.write(Seq((9L, 90)).toDF("k", "v"), dir,
      mode = "overwrite")
    val replace = IcebergCompat.currentSnapshotId(dir)
    IcebergCompat.write(Seq((5L, 50)).toDF("k", "v"), dir)
    intercept[UnsupportedOperationException] {
      IcebergCompat.cherryPick(dir, replace) // overwrite, not append
    }
    intercept[NoSuchElementException] {
      IcebergCompat.cherryPick(dir, 424242L)
    }
  }

  test("rollback rewinds main, keeps time travel, flags abandoned history") {
    val dir = tmpDir("ice-rollback")
    IcebergCompat.write(Seq((1L, 10)).toDF("k", "v"), dir) // 100
    IcebergCompat.write(Seq((2L, 20)).toDF("k", "v"), dir) // 200
    IcebergCompat.write(Seq((3L, 30)).toDF("k", "v"), dir) // 300
    val back = IcebergCompat.rollback(dir, 100L)
    assert(back === 100L)
    assert(rows(IcebergCompat.read(spark, dir)) === Seq(1L -> 10),
      "content = snapshot 100 exactly")
    // abandoned snapshots still time-travel until expiry
    assert(rows(IcebergCompat.read(spark, dir, snapshotId = Some(300L))) ===
      Seq(1L -> 10, 2L -> 20, 3L -> 30))
    // a write after rollback chains off the rolled-to head
    IcebergCompat.write(Seq((4L, 40)).toDF("k", "v"), dir) // 500, parent 100
    assert(rows(IcebergCompat.read(spark, dir)) ===
      Seq(1L -> 10, 4L -> 40))
    // history: log order preserved, 200/300 off the current lineage
    val h = IcebergCompat.inspect(spark, dir, "history")
      .select("snapshot_id", "is_current_ancestor")
      .as[(Long, Boolean)].collect().toSeq
    assert(h === Seq(100L -> true, 200L -> false, 300L -> false,
      100L -> true, 500L -> true))
  }

  test("rollback refuses cross-lineage targets; no-op returns the head") {
    val dir = tmpDir("ice-rollback-refuse")
    IcebergCompat.write(Seq((1L, 10)).toDF("k", "v"), dir) // 100
    IcebergCompat.createBranch(dir, "b")
    IcebergCompat.write(Seq((2L, 20)).toDF("k", "v"), dir, ref = "b") // 300
    IcebergCompat.write(Seq((3L, 30)).toDF("k", "v"), dir) // main 400
    // branch snapshot is not on main's lineage
    intercept[IllegalArgumentException] {
      IcebergCompat.rollback(dir, 300L)
    }
    intercept[IllegalArgumentException] {
      IcebergCompat.rollback(dir, 424242L)
    }
    val head = IcebergCompat.currentSnapshotId(dir)
    assert(IcebergCompat.rollback(dir, head) === head, "no-op")
    assert(IcebergCompat.currentSnapshotId(dir) === head)
  }
}
