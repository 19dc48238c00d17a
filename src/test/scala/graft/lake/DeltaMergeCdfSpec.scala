package graft.lake

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Delta MERGE (file-level merge-on-write) and the change data feed:
  * upsert/delete/insert semantics, touched-file-only rewrites, cdc
  * files under _change_data, readChanges across commit kinds, and the
  * DESCRIBE HISTORY surface from commitInfo. */
class DeltaMergeCdfSpec extends SparkSuite {
  import spark.implicits._

  private def readSorted(dir: String): Seq[(Long, String)] =
    DeltaCompat.read(spark, dir).as[(Long, String)]
      .collect().sortBy(_._1).toSeq

  test("merge updates matched, inserts unmatched, deletes flagged") {
    val dir = tmpDir("delta-merge")
    DeltaCompat.write(
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v"), dir)
    // update 2, delete 3, insert 9; delete of absent key 77 is a no-op
    val src = Seq((2L, "B", "U"), (3L, "-", "D"), (9L, "i", "I"),
      (77L, "-", "D")).toDF("k", "v", "op")
    val v = DeltaCompat.merge(spark, dir, src, Seq("k"),
      deleteWhen = Some(col("op") === "D"))
    assert(v === 1L)
    assert(readSorted(dir) ===
      Seq(1L -> "a", 2L -> "B", 4L -> "d", 9L -> "i"))
    // time travel still sees the pre-merge state
    assert(DeltaCompat.read(spark, dir, version = Some(0L))
      .count() === 4L)
  }

  test("merge rewrites only the touched files") {
    val dir = tmpDir("delta-merge-files")
    // two files with disjoint key ranges: one write per file
    DeltaCompat.write(
      Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1), dir)
    DeltaCompat.write(
      Seq((10L, "x"), (11L, "y")).toDF("k", "v").coalesce(1), dir)
    val before = DeltaCompat.read(spark, dir).inputFiles.toSet
    assert(before.size === 2)
    DeltaCompat.merge(spark, dir,
      Seq((10L, "X")).toDF("k", "v"), Seq("k"))
    val after = DeltaCompat.read(spark, dir).inputFiles.toSet
    // the file holding keys 1-2 survives untouched; the 10-11 file is
    // replaced by a rewrite
    assert(after.intersect(before).size === 1)
    assert(readSorted(dir) ===
      Seq(1L -> "a", 2L -> "b", 10L -> "X", 11L -> "y"))
  }

  test("a NULL deleteWhen verdict means false, never a silent delete") {
    val dir = tmpDir("delta-merge-nullif")
    DeltaCompat.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)
    // op is NULL for key 1 (matched) and key 9 (unmatched): neither may
    // be deleted/dropped — NULL is not true
    val src = Seq((1L, "A", null), (2L, "-", "D"), (9L, "i", null))
      .toDF("k", "v", "op")
    DeltaCompat.merge(spark, dir, src, Seq("k"),
      deleteWhen = Some(col("op") === "D"))
    assert(readSorted(dir) === Seq(1L -> "A", 9L -> "i"))
  }

  test("merge refuses duplicate source keys") {
    val dir = tmpDir("delta-merge-dup")
    DeltaCompat.write(Seq((1L, "a")).toDF("k", "v"), dir)
    intercept[IllegalArgumentException] {
      DeltaCompat.merge(spark, dir,
        Seq((1L, "x"), (1L, "y")).toDF("k", "v"), Seq("k"))
    }
  }

  test("merge into an empty-file-set table inserts") {
    val dir = tmpDir("delta-merge-empty")
    DeltaCompat.write(Seq((1L, "a")).toDF("k", "v"), dir)
    DeltaCompat.delete(spark, dir, lit(true))
    DeltaCompat.purge(spark, dir)
    val vac = DeltaCompat.merge(spark, dir,
      Seq((5L, "e")).toDF("k", "v"), Seq("k"))
    assert(readSorted(dir) === Seq(5L -> "e"))
    assert(vac === DeltaCompat.versions(dir).max)
  }

  test("merge on a partitioned table keeps partition values right") {
    val dir = tmpDir("delta-merge-part")
    DeltaCompat.write(
      Seq((1L, "p1", "a"), (2L, "p1", "b"), (3L, "p2", "c"))
        .toDF("k", "p", "v"),
      dir, partitionBy = Seq("p"))
    // move key 2 to partition p2 and update its value
    DeltaCompat.merge(spark, dir,
      Seq((2L, "p2", "B"), (7L, "p3", "g")).toDF("k", "p", "v"), Seq("k"))
    val rows = DeltaCompat.read(spark, dir).as[(Long, String, String)]
      .collect().sortBy(_._1).toSeq
    assert(rows === Seq((1L, "p1", "a"), (2L, "p2", "B"),
      (3L, "p2", "c"), (7L, "p3", "g")))
  }

  test("change data feed: appends, merge, delete, purge") {
    val dir = tmpDir("delta-cdf")
    DeltaCompat.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir,
      properties = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaCompat.write(Seq((3L, "c")).toDF("k", "v"), dir)
    DeltaCompat.merge(spark, dir,
      Seq((2L, "B", false), (4L, "d", false), (1L, "-", true))
        .toDF("k", "v", "del"),
      Seq("k"), deleteWhen = Some(col("del")))
    DeltaCompat.delete(spark, dir, col("k") === 3L)
    DeltaCompat.purge(spark, dir) // dataChange=false — silent in the feed

    val ch = DeltaCompat.readChanges(spark, dir, 0L)
      .as[(Long, String, String, Long)].collect().toSeq
      .sortBy(t => (t._4, t._3, t._1))
    // the delete preimage carries the TARGET row's values (1,"a") —
    // never the source's placeholder
    assert(ch === Seq(
      (1L, "a", "insert", 0L), (2L, "b", "insert", 0L),
      (3L, "c", "insert", 1L),
      (1L, "a", "delete", 2L), (4L, "d", "insert", 2L),
      (2L, "B", "update_postimage", 2L), (2L, "b", "update_preimage", 2L),
      (3L, "c", "delete", 3L)))
    // range reads slice by commit
    assert(DeltaCompat.readChanges(spark, dir, 2L, Some(2L)).count() === 4L)
    // cdc parquet landed under _change_data/
    assert(Files.list(Paths.get(dir, "_change_data")).iterator().asScala
      .nonEmpty)
    // the final state is consistent with replaying the feed
    assert(readSorted(dir) === Seq(2L -> "B", 4L -> "d"))
  }

  test("change feed refuses non-CDF tables and reconstructable gaps") {
    val dir = tmpDir("delta-cdf-refuse")
    DeltaCompat.write(Seq((1L, "a")).toDF("k", "v"), dir)
    intercept[UnsupportedOperationException] {
      DeltaCompat.readChanges(spark, dir, 0L)
    }
    // enable CDF late via a foreign metaData commit: the overwrite at
    // v1 removed data with no cdc files, so its changes must refuse
    val dir2 = tmpDir("delta-cdf-gap")
    DeltaCompat.write(Seq((1L, "a")).toDF("k", "v"), dir2,
      properties = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaCompat.write(Seq((2L, "b")).toDF("k", "v"), dir2,
      mode = "overwrite")
    intercept[UnsupportedOperationException] {
      DeltaCompat.readChanges(spark, dir2, 0L).collect()
    }
    // but a range past the overwrite still reads
    DeltaCompat.write(Seq((3L, "c")).toDF("k", "v"), dir2)
    assert(DeltaCompat.readChanges(spark, dir2, 2L)
      .select("_change_type").as[String].collect().toSeq === Seq("insert"))
  }

  test("cdf on a column-mapped partitioned table round-trips") {
    val dir = tmpDir("delta-cdf-cmap")
    DeltaCompat.write(
      Seq((1L, "p1", "a"), (2L, "p2", "b")).toDF("k", "p", "v"), dir,
      partitionBy = Seq("p"), columnMapping = "name",
      properties = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaCompat.merge(spark, dir,
      Seq((1L, "p1", "A")).toDF("k", "p", "v"), Seq("k"))
    val ch = DeltaCompat.readChanges(spark, dir, 1L)
      .as[(Long, String, String, String, Long)].collect().toSeq.sorted
    assert(ch === Seq((1L, "p1", "A", "update_postimage", 1L),
      (1L, "p1", "a", "update_preimage", 1L)))
  }

  test("history reads commitInfo operations in order") {
    val dir = tmpDir("delta-history")
    DeltaCompat.write(Seq((1L, "a")).toDF("k", "v"), dir)
    DeltaCompat.write(Seq((2L, "b")).toDF("k", "v"), dir)
    DeltaCompat.merge(spark, dir, Seq((1L, "A")).toDF("k", "v"), Seq("k"))
    DeltaCompat.delete(spark, dir, col("k") === 2L)
    DeltaCompat.purge(spark, dir)
    val h = DeltaCompat.history(spark, dir)
      .select("version", "operation").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(h === Seq(0L -> "WRITE", 1L -> "WRITE", 2L -> "MERGE",
      3L -> "DELETE", 4L -> "PURGE"))
    // timestamps are present and nondecreasing
    val ts = DeltaCompat.history(spark, dir)
      .select("timestamp").as[Long].collect().toSeq
    assert(ts === ts.sorted)
  }

  test("optimize consolidates small files; the change feed stays silent") {
    val dir = tmpDir("delta-optimize")
    (0 until 4).foreach { i =>
      DeltaCompat.write(
        Seq((i.toLong, s"v$i")).toDF("k", "v").coalesce(1), dir,
        properties =
          if (i == 0) Map("delta.enableChangeDataFeed" -> "true")
          else Map.empty)
    }
    val before = DeltaCompat.read(spark, dir).inputFiles.length
    assert(before === 4)
    val v = DeltaCompat.optimize(spark, dir)
    assert(DeltaCompat.read(spark, dir).inputFiles.length === 1)
    assert(readSorted(dir) ===
      Seq(0L -> "v0", 1L -> "v1", 2L -> "v2", 3L -> "v3"))
    // time travel still sees the fragmented layout
    assert(DeltaCompat.read(spark, dir, version = Some(v - 1))
      .inputFiles.length === 4)
    // the feed has exactly the four inserts — OPTIMIZE is dataChange=false
    assert(DeltaCompat.readChanges(spark, dir, 0L).count() === 4L)
    assert(DeltaCompat.history(spark, dir)
      .select("operation").as[String].collect().last === "OPTIMIZE")
    // already-consolidated: no-op returns the head
    assert(DeltaCompat.optimize(spark, dir) === v)
  }

  test("optimize bin-packs per partition and converges in steady state") {
    val dir = tmpDir("delta-opt-part")
    // p1 gets ONE small file, p2 gets TWO
    DeltaCompat.write(Seq((1L, "p1", "a")).toDF("k", "p", "v")
      .coalesce(1), dir, partitionBy = Seq("p"))
    DeltaCompat.write(Seq((2L, "p2", "b")).toDF("k", "p", "v")
      .coalesce(1), dir)
    DeltaCompat.write(Seq((3L, "p2", "c")).toDF("k", "p", "v")
      .coalesce(1), dir)
    assert(DeltaCompat.read(spark, dir).inputFiles.length === 3)
    val v = DeltaCompat.optimize(spark, dir)
    // p2 consolidated; p1's lone file untouched
    assert(DeltaCompat.read(spark, dir).inputFiles.length === 2)
    // steady state: every partition has one file — optimize is a no-op,
    // not an endless full rewrite
    assert(DeltaCompat.optimize(spark, dir) === v)
    assert(DeltaCompat.read(spark, dir).as[(Long, String, String)]
      .collect().sortBy(_._1).toSeq ===
      Seq((1L, "p1", "a"), (2L, "p2", "b"), (3L, "p2", "c")))
  }

  test("optimize zorder re-clusters so both dimensions prune") {
    val dir = tmpDir("delta-zorder")
    val rows = for (a <- 0L until 64L; b <- 0L until 64L)
      yield (a, b, s"r$a-$b")
    DeltaCompat.write(rows.toDF("a", "b", "v").repartition(4), dir)
    // target derived from the ACTUAL staged bytes (geometry must not
    // hinge on compression defaults): ~8 output z-slices at any codec
    val total = DeltaCompat.read(spark, dir).inputFiles
      .map(f => new java.io.File(new java.net.URI(f)).length).sum
    val v = DeltaCompat.optimize(spark, dir,
      targetFileBytes = math.max(1L, total / 8),
      zorderBy = Seq("a", "b"))
    val all = DeltaCompat.read(spark, dir)
    assert(all.inputFiles.length > 2)
    // a range on the SECOND dimension prunes via add.stats
    val pruned = DeltaCompat.read(spark, dir,
      prune = Some(col("b") < 8))
    assert(pruned.inputFiles.length < all.inputFiles.length)
    assert(pruned.count() === 64L * 8)
    assert(all.count() === 64L * 64)
    // history labels it; the feed would stay silent (dataChange=false)
    assert(DeltaCompat.history(spark, dir)
      .select("operation").as[String].collect().last === "OPTIMIZE ZORDER")
    assert(v === DeltaCompat.versions(dir).max)
    // misuse refuses up front — no silent one-dimension rewrite
    intercept[IllegalArgumentException] {
      DeltaCompat.optimize(spark, dir, zorderBy = Seq("v", "a"))
    }
    intercept[IllegalArgumentException] {
      DeltaCompat.optimize(spark, dir, zorderBy = Seq("nope", "a"))
    }
  }

  test("optimize zorder keeps hive partitions intact") {
    val dir = tmpDir("delta-zorder-part")
    val rows = for (a <- 0L until 32L; b <- 0L until 8L)
      yield (a, b, if (a % 2 == 0) "p1" else "p2")
    DeltaCompat.write(rows.toDF("a", "b", "p").repartition(4), dir,
      partitionBy = Seq("p"))
    val before = DeltaCompat.read(spark, dir).inputFiles.length
    DeltaCompat.optimize(spark, dir, zorderBy = Seq("a", "b"))
    val after = DeltaCompat.read(spark, dir)
    // one z-slice, two partitions -> two files (never nOut x P)
    assert(after.inputFiles.length <= before)
    assert(after.inputFiles.length === 2)
    assert(after.count() === 32L * 8)
    assert(after.filter(col("p") === "p1").count() === 16L * 8)
  }

  test("a no-op merge with a txn still advances the watermark") {
    val dir = tmpDir("delta-merge-noop-txn")
    DeltaCompat.write(Seq((1L, "a")).toDF("k", "v"), dir)
    // deletes of absent keys: nothing matches, nothing inserts
    val v = DeltaCompat.merge(spark, dir,
      Seq((9L, "x")).toDF("k", "v"), Seq("k"),
      deleteWhen = Some(lit(true)), txn = Some("app" -> 3L))
    assert(v === 1L)
    assert(DeltaCompat.lastTransactionVersion(spark, dir, "app") ===
      Some(3L))
    assert(readSorted(dir) === Seq(1L -> "a"))
    // and a replayed batch at the watermark skips without a commit
    assert(DeltaCompat.merge(spark, dir,
      Seq((2L, "b")).toDF("k", "v"), Seq("k"),
      txn = Some("app" -> 3L)) === v)
    assert(readSorted(dir) === Seq(1L -> "a"))
  }

  test("checkpoint preserves the CDF flag and feed reads continue") {
    val dir = tmpDir("delta-cdf-ckpt")
    DeltaCompat.write(Seq((1L, "a")).toDF("k", "v"), dir,
      properties = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaCompat.checkpoint(spark, dir)
    DeltaCompat.write(Seq((2L, "b")).toDF("k", "v"), dir)
    // feed from v1 works off the checkpointed config
    assert(DeltaCompat.readChanges(spark, dir, 1L).count() === 1L)
    val log1 = Files.readAllLines(
      Paths.get(dir, "_delta_log", f"${1L}%020d.json")).asScala.mkString
    assert(log1.contains("commitInfo"))
  }
}
