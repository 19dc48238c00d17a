package graft.lake

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.SparkSuite

/** Manifest-LIST-level pruning: the writer emits the spec's
  * `partitions` field summaries (field 507) on every manifest-list
  * entry, and `read(prune)` drops whole manifests whose identity-field
  * summary range provably excludes a conjunct — without ever opening
  * the manifest Avro. The proof of "never opened" is destructive: the
  * excluded manifests are overwritten with garbage, and the pruned read
  * must still return exact rows while an unpruned read must fail.
  *
  * At 100 TB this is the tier that keeps planning cheap: ~10⁵ manifest
  * files reduce to one manifest-list read plus only the manifests whose
  * partition range can match. (Reference scope: file skipping is the
  * mirror's only index surface — /root/reference/README.md table scan
  * notes — and real Iceberg readers prune exactly this way.)
  */
class IcebergManifestPruneSpec extends SparkSuite {
  import spark.implicits._

  private def corrupt(path: java.nio.file.Path): Unit =
    Files.write(path, "not an avro file".getBytes,
      StandardOpenOption.TRUNCATE_EXISTING)

  test("summaries skip whole manifests on an int identity partition") {
    val dir = tmpDir("ice-mlprune-int")
    // three appends with disjoint partition ranges -> three manifests
    val s1 = IcebergCompat.write(
      Seq((1L, 10), (2L, 11)).toDF("k", "p"), dir, partitionBy = Seq("p"))
    val s2 = IcebergCompat.write(
      Seq((3L, 20), (4L, 21)).toDF("k", "p"), dir, partitionBy = Seq("p"))
    val s3 = IcebergCompat.write(
      Seq((5L, 30), (6L, 31)).toDF("k", "p"), dir, partitionBy = Seq("p"))

    // sanity before corruption: pruned read returns exactly the match
    val pruned = IcebergCompat.read(spark, dir,
      prune = Some(org.apache.spark.sql.functions.col("p") >= 30))
    assert(pruned.select("k").as[Long].collect().sorted.toSeq ===
      Seq(5L, 6L))

    // destroy the manifests the summary range excludes (s1, s2) —
    // a reader that still opens them can only fail
    corrupt(Paths.get(dir, "metadata", f"m-$s1%d.avro"))
    corrupt(Paths.get(dir, "metadata", f"m-$s2%d.avro"))

    val prunedAfter = IcebergCompat.read(spark, dir,
      prune = Some(org.apache.spark.sql.functions.col("p") >= 30))
    assert(prunedAfter.select("k").as[Long].collect().sorted.toSeq ===
      Seq(5L, 6L), "excluded manifests must never be opened")
    // equality conjunct takes the same path
    val prunedEq = IcebergCompat.read(spark, dir,
      prune = Some(org.apache.spark.sql.functions.col("p") === 31))
    assert(prunedEq.select("k").as[Long].collect().toSeq === Seq(6L))
    // the unpruned read MUST still open them -> corruption is real
    intercept[Exception] {
      IcebergCompat.read(spark, dir).count()
    }
    // and a conjunct overlapping a corrupted manifest's range must
    // still try to open it (conservatism cuts IO, never results)
    intercept[Exception] {
      IcebergCompat.read(spark, dir,
        prune = Some(org.apache.spark.sql.functions.col("p") <= 11)).count()
    }
    (s3: Long)
  }

  test("summaries carry across appends and prune date partitions") {
    val dir = tmpDir("ice-mlprune-date")
    def day(s: String) = java.sql.Date.valueOf(s)
    val s1 = IcebergCompat.write(
      Seq((1L, day("2024-01-01")), (2L, day("2024-01-02")))
        .toDF("k", "d"), dir, partitionBy = Seq("d"))
    val s2 = IcebergCompat.write(
      Seq((3L, day("2024-02-01"))).toDF("k", "d"), dir,
      partitionBy = Seq("d"))
    // third commit CARRIES s1/s2's entries — their summaries must
    // survive carryManifest verbatim for the skip to work
    IcebergCompat.write(
      Seq((4L, day("2024-03-01"))).toDF("k", "d"), dir,
      partitionBy = Seq("d"))

    corrupt(Paths.get(dir, "metadata", f"m-$s1%d.avro"))
    corrupt(Paths.get(dir, "metadata", f"m-$s2%d.avro"))
    val pruned = IcebergCompat.read(spark, dir,
      prune = Some(org.apache.spark.sql.functions.col("d") >=
        java.sql.Date.valueOf("2024-02-15")))
    assert(pruned.select("k").as[Long].collect().toSeq === Seq(4L))
  }

  test("string identity bounds prune in unsigned-UTF-8 order") {
    val dir = tmpDir("ice-mlprune-str")
    val s1 = IcebergCompat.write(
      Seq((1L, "alpha"), (2L, "beta")).toDF("k", "s"), dir,
      partitionBy = Seq("s"))
    IcebergCompat.write(
      Seq((3L, "zulu")).toDF("k", "s"), dir, partitionBy = Seq("s"))
    corrupt(Paths.get(dir, "metadata", f"m-$s1%d.avro"))
    val pruned = IcebergCompat.read(spark, dir,
      prune = Some(org.apache.spark.sql.functions.col("s") > "m"))
    assert(pruned.select("k").as[Long].collect().toSeq === Seq(3L))
  }

  test("non-identity transforms never prune at manifest level") {
    val dir = tmpDir("ice-mlprune-bucket")
    val s1 = IcebergCompat.write(
      Seq((1L, 10), (2L, 11)).toDF("k", "p"), dir,
      transforms = Seq("p" -> "bucket[4]"))
    IcebergCompat.write(
      Seq((3L, 30)).toDF("k", "p"), dir,
      transforms = Seq("p" -> "bucket[4]"))
    // bucket summaries exist (hash-ordinal bounds) but the conjunct is
    // on the SOURCE column — the reader must ignore them and open s1
    corrupt(Paths.get(dir, "metadata", f"m-$s1%d.avro"))
    intercept[Exception] {
      IcebergCompat.read(spark, dir,
        prune = Some(org.apache.spark.sql.functions.col("p") >= 30)).count()
    }
  }

  test("delete manifests still apply when data manifests are skipped") {
    val dir = tmpDir("ice-mlprune-deletes")
    val s1 = IcebergCompat.write(
      Seq((1L, 10), (2L, 10)).toDF("k", "p"), dir, partitionBy = Seq("p"))
    IcebergCompat.write(
      Seq((5L, 30), (6L, 30)).toDF("k", "p"), dir, partitionBy = Seq("p"))
    // equality-delete k=5, scoped to the p=30 partition
    IcebergCompat.writeEqualityDeletes(spark, dir,
      Seq(5L).toDF("k"), Seq("k"), scope = Map("p" -> 30))
    corrupt(Paths.get(dir, "metadata", f"m-$s1%d.avro"))
    val pruned = IcebergCompat.read(spark, dir,
      prune = Some(org.apache.spark.sql.functions.col("p") === 30))
    assert(pruned.select("k").as[Long].collect().sorted.toSeq === Seq(6L),
      "the delete must apply inside the surviving manifest")
  }
}
