package graft.lake

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.SparkSuite

/** `rewriteManifests`: metadata-only consolidation of a snapshot's data
  * manifests. Content must be bit-identical before/after, sequence
  * scoping of equality deletes must survive (EXISTING entries carry
  * EXPLICIT sequence numbers), prior snapshots must still travel, and
  * the consolidated manifest must carry recomputed partition summaries
  * so the manifest-skip tier keeps pruning. */
class IcebergRewriteManifestsSpec extends SparkSuite {
  import spark.implicits._

  private def manifestCount(dir: String, content: Int): Long =
    IcebergCompat.inspect(spark, dir, "manifests")
      .filter(s"content = $content").count()

  test("N appends consolidate to one manifest, content unchanged") {
    val dir = tmpDir("ice-rwm")
    (1 to 4).foreach { i =>
      IcebergCompat.write(
        Seq((i.toLong, i * 10)).toDF("k", "p"), dir, partitionBy = Seq("p"))
    }
    val before = IcebergCompat.read(spark, dir)
      .as[(Long, Int)].collect().sortBy(_._1).toSeq
    assert(manifestCount(dir, 0) === 4)
    val preSnapshot = IcebergCompat.read(spark, dir) // current before rewrite
    val rewriteId = IcebergCompat.rewriteManifests(dir)
    assert(manifestCount(dir, 0) === 1, "4 data manifests must fold to 1")
    val after = IcebergCompat.read(spark, dir)
      .as[(Long, Int)].collect().sortBy(_._1).toSeq
    assert(after === before, "metadata-only: content must be identical")
    // no-op on an already-consolidated table
    assert(IcebergCompat.rewriteManifests(dir) === rewriteId)
    (preSnapshot: Any)
  }

  test("prior snapshots still travel; summaries still skip manifests") {
    val dir = tmpDir("ice-rwm-travel")
    val s1 = IcebergCompat.write(
      Seq((1L, 10), (2L, 11)).toDF("k", "p"), dir, partitionBy = Seq("p"))
    IcebergCompat.write(
      Seq((3L, 20)).toDF("k", "p"), dir, partitionBy = Seq("p"))
    IcebergCompat.write(
      Seq((4L, 30)).toDF("k", "p"), dir, partitionBy = Seq("p"))
    IcebergCompat.rewriteManifests(dir)
    // time travel to the pre-rewrite snapshot reads the OLD manifests
    assert(IcebergCompat.read(spark, dir, snapshotId = Some(s1))
      .select("k").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    // the consolidated manifest's recomputed summaries prune: a
    // conjunct outside its [10,30] range opens no data manifest at all
    val pruned = IcebergCompat.read(spark, dir,
      prune = Some(org.apache.spark.sql.functions.col("p") >= 25))
    assert(pruned.select("k").as[Long].collect().toSeq === Seq(4L))
    // destructive proof on the consolidated manifest itself: a
    // predicate its summary excludes never opens it
    val rwManifest = IcebergCompat.inspect(spark, dir, "manifests")
      .filter("content = 0").select("path").as[String].head()
    Files.write(Paths.get(rwManifest), "garbage".getBytes,
      StandardOpenOption.TRUNCATE_EXISTING)
    assert(IcebergCompat.read(spark, dir,
        prune = Some(org.apache.spark.sql.functions.col("p") > 99))
      .count() === 0L, "summary-excluded consolidated manifest must not open")
    intercept[Exception] { IcebergCompat.read(spark, dir).count() }
  }

  test("equality-delete sequence scoping survives the rewrite") {
    val dir = tmpDir("ice-rwm-eqdel")
    // seq 1: k=5 v=old; seq 2: equality-delete k=5; seq 3: re-insert k=5
    IcebergCompat.write(Seq((5L, "old"), (6L, "keep")).toDF("k", "v"), dir)
    IcebergCompat.writeEqualityDeletes(spark, dir, Seq(5L).toDF("k"), Seq("k"))
    IcebergCompat.write(Seq((5L, "new")).toDF("k", "v"), dir)
    val before = IcebergCompat.read(spark, dir)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(before === Seq((5L, "new"), (6L, "keep")),
      "re-insert must survive the older delete")
    IcebergCompat.rewriteManifests(dir)
    val after = IcebergCompat.read(spark, dir)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(after === before,
      "EXISTING entries must keep their explicit data sequence numbers")
    assert(manifestCount(dir, 0) === 1)
    assert(manifestCount(dir, 1) === 1, "delete manifests carry untouched")
  }

  test("expire after rewrite reclaims the superseded manifests") {
    val dir = tmpDir("ice-rwm-expire")
    (1 to 3).foreach { i =>
      IcebergCompat.write(Seq((i.toLong, s"v$i")).toDF("k", "v"), dir)
    }
    val oldManifests = IcebergCompat.inspect(spark, dir, "manifests")
      .select("path").as[String].collect().toSet
    IcebergCompat.rewriteManifests(dir)
    val deleted = IcebergCompat.expireSnapshots(
      dir, System.currentTimeMillis() + 3600_000L).toSet
    assert(oldManifests.forall(p =>
      deleted.contains(p) || !Files.exists(Paths.get(p))),
      "pre-rewrite manifests are unreachable from the head and reclaimable")
    assert(IcebergCompat.read(spark, dir).count() === 3L)
  }
}
