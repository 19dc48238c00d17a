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

  test("corrupt checkpoints and newer protocols are refused, not mis-read") {
    val dir = tmpDir("delta-refuse")
    DeltaCompat.write(Seq((1L, "a")).toDF("k", "v"), dir)
    // _last_checkpoint naming a file that does not exist is corruption,
    // not something to skip over silently.
    Files.write(Paths.get(dir, "_delta_log", "_last_checkpoint"),
      "{\"version\":0}".getBytes)
    intercept[IllegalStateException] {
      DeltaCompat.read(spark, dir)
    }
    Files.delete(Paths.get(dir, "_delta_log", "_last_checkpoint"))
    // Reader version 2 (column mapping capable) is fine now; version 3
    // with a feature we don't implement must refuse; so must version 4+.
    Files.write(Paths.get(dir, "_delta_log", f"${1L}%020d.json"),
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""".getBytes)
    assert(DeltaCompat.read(spark, dir).count() === 1)
    Files.write(Paths.get(dir, "_delta_log", f"${2L}%020d.json"),
      ("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["typeWidening"],"writerFeatures":["typeWidening"]}}""").getBytes)
    intercept[UnsupportedOperationException] {
      DeltaCompat.read(spark, dir)
    }
    Files.write(Paths.get(dir, "_delta_log", f"${2L}%020d.json"),
      """{"protocol":{"minReaderVersion":4,"minWriterVersion":7}}""".getBytes)
    intercept[UnsupportedOperationException] {
      DeltaCompat.read(spark, dir)
    }
  }

  test("deletion vectors: delete marks rows dead without rewriting files") {
    val dir = tmpDir("delta-dv")
    import org.apache.spark.sql.functions.col
    // several files so DVs target distinct row_index spaces per file
    DeltaCompat.write(
      spark.range(0, 100).selectExpr("id AS k", "CAST(id % 10 AS STRING) AS v")
        .repartition(4), dir)
    val dataFiles = Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq

    val v1 = DeltaCompat.delete(spark, dir, col("k") % 10 === 3)
    assert(v1 === 1L)
    val after = DeltaCompat.read(spark, dir)
    assert(after.count() === 90)
    assert(after.filter(col("k") % 10 === 3).count() === 0)
    // the data files were NOT rewritten — same paths still live
    dataFiles.foreach(p => assert(Files.exists(p), s"$p rewritten"))
    assert(Files.list(Paths.get(dir)).iterator().asScala
      .exists(_.getFileName.toString.startsWith("deletion_vector_")))

    // second delete MERGES with the existing DVs
    DeltaCompat.delete(spark, dir, col("k") < 25)
    val twice = DeltaCompat.read(spark, dir)
    assert(twice.count() === 100 - 10 - (25 - 3)) // 10 (%10==3) + 22 more
    // time travel behind the deletes still sees everything
    assert(DeltaCompat.read(spark, dir, version = Some(0L)).count() === 100)
    // deleting nothing is a no-op commit-wise
    val same = DeltaCompat.delete(spark, dir, col("k") === -1)
    assert(same === 2L)

    // DV state survives a checkpoint (descriptor round-trips via parquet)
    DeltaCompat.checkpoint(spark, dir)
    DeltaCompat.versions(dir).foreach(v =>
      Files.delete(Paths.get(dir, "_delta_log", f"$v%020d.json")))
    val fromCkpt = DeltaCompat.read(spark, dir)
    assert(fromCkpt.count() === 68)
    assert(fromCkpt.filter(col("k") < 25).count() === 0)
  }

  test("timestamp time travel picks the newest commit at or before t") {
    val dir = tmpDir("delta-asof")
    DeltaCompat.write(Seq((1L, "a")).toDF("k", "v"), dir)
    DeltaCompat.write(Seq((2L, "b")).toDF("k", "v"), dir)
    // pin deterministic commit times a minute apart
    val log = Paths.get(dir, "_delta_log")
    val t0 = 1700000000000L
    Files.setLastModifiedTime(log.resolve(f"${0L}%020d.json"),
      java.nio.file.attribute.FileTime.fromMillis(t0))
    Files.setLastModifiedTime(log.resolve(f"${1L}%020d.json"),
      java.nio.file.attribute.FileTime.fromMillis(t0 + 60000))
    assert(DeltaCompat.readAsOf(spark, dir, t0 + 1).count() === 1)
    assert(DeltaCompat.readAsOf(spark, dir, t0 + 60000).count() === 2)
    intercept[IllegalArgumentException] {
      DeltaCompat.readAsOf(spark, dir, t0 - 1)
    }
    // add.stats carries numRecords + per-column bounds (what real
    // readers count rows and prune files from)
    // commits lead with commitInfo — pick the add action's line
    val line = Files.readAllLines(log.resolve(f"${1L}%020d.json"))
      .asScala.find(_.contains("\"add\"")).get
    val jm = new com.fasterxml.jackson.databind.ObjectMapper()
    val stats = jm.readTree(jm.readTree(line).get("add").get("stats").asText())
    assert(stats.get("numRecords").asLong() === 1L)
    assert(stats.get("minValues").get("k").asLong() === 2L)
    assert(stats.get("maxValues").get("v").asText() === "b")
    assert(stats.get("nullCount").get("k").asLong() === 0L)
  }

  test("foreign DV storage types: inline (i) and absolute-path (p)") {
    // a table whose log was written by another engine: one data file,
    // DV delivered inline in the descriptor / at an absolute path
    val dir = tmpDir("delta-dv-foreign")
    Seq.tabulate(10)(i => (i.toLong, s"v$i")).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val part = Files.list(Paths.get(dir)).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get.getFileName
    val schema = new org.apache.spark.sql.types.StructType()
      .add("k", "long").add("v", "string")
    val jm = new com.fasterxml.jackson.databind.ObjectMapper()

    // inline: delete rows 1,3,5 — data is Z85 of the serialized bitmap,
    // zero-padded to 4n for encoding while sizeInBytes stays the UNPADDED
    // length (what real writers record; the reader must truncate)
    val inlineData = DeletionVectors.serializeData(Array(1L, 3L, 5L))
    val padded = inlineData ++
      new Array[Byte]((4 - inlineData.length % 4) % 4)
    val inline = DeletionVectors.z85Encode(padded)
    def commit0(dvJson: String): String =
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""" + "\n" +
        s"""{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},"schemaString":${jm.writeValueAsString(schema.json)},"partitionColumns":[],"configuration":{},"createdTime":0}}""" + "\n" +
        s"""{"add":{"path":"$part","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true,"deletionVector":$dvJson}}""" + "\n"
    val log = Paths.get(dir, "_delta_log")
    Files.createDirectories(log)
    Files.write(log.resolve(f"${0L}%020d.json"), commit0(
      s"""{"storageType":"i","pathOrInlineDv":"$inline","sizeInBytes":${inlineData.length},"cardinality":3}""").getBytes)
    val gotInline = DeltaCompat.read(spark, dir).as[(Long, String)]
      .collect().map(_._1).sorted.toSeq
    assert(gotInline === Seq(0L, 2L, 4L, 6L, 7L, 8L, 9L))

    // absolute path: delete rows 0..4 — DV blob in a file elsewhere
    val dvDir = Paths.get(tmpDir("delta-dv-elsewhere"))
    val d = DeletionVectors.write(dvDir, Seq(Array(0L, 1L, 2L, 3L, 4L))).head
    val abs = d.filePath(dvDir).get
    Files.write(log.resolve(f"${0L}%020d.json"), commit0(
      s"""{"storageType":"p","pathOrInlineDv":"$abs","offset":${d.offset.get},"sizeInBytes":${d.sizeInBytes},"cardinality":5}""").getBytes)
    val gotAbs = DeltaCompat.read(spark, dir).as[(Long, String)]
      .collect().map(_._1).sorted.toSeq
    assert(gotAbs === Seq(5L, 6L, 7L, 8L, 9L))
  }

  test("vacuum deletes tombstoned files past retention, keeps the head") {
    val dir = tmpDir("delta-vacuum")
    DeltaCompat.write(Seq((1L, "a")).toDF("k", "v"), dir)
    DeltaCompat.write(Seq((2L, "b")).toDF("k", "v"), dir, mode = "overwrite")
    // within retention: nothing is eligible
    assert(DeltaCompat.vacuum(dir).isEmpty)
    assert(DeltaCompat.read(spark, dir, version = Some(0L)).count() === 1)
    // retention 0: the overwritten file goes; the head stays intact
    val gone = DeltaCompat.vacuum(dir, retentionMs = 0L)
    assert(gone.size === 1)
    assert(DeltaCompat.read(spark, dir).as[(Long, String)]
      .collect().toSeq === Seq(2L -> "b"))
    // time travel behind the vacuum now fails on the missing file —
    // Delta's documented retention trade-off
    intercept[Exception] {
      DeltaCompat.read(spark, dir, version = Some(0L)).collect()
    }
    // idempotent
    assert(DeltaCompat.vacuum(dir, retentionMs = 0L).isEmpty)
  }

  test("purge rewrites only DV-carrying files; clean files carry over") {
    import org.apache.spark.sql.functions.col
    val dir = tmpDir("delta-purge")
    // two separate commits -> two files; only the first gets a DV
    DeltaCompat.write(spark.range(0, 100)
      .selectExpr("id AS k", "CAST(id AS STRING) AS v").coalesce(1), dir)
    DeltaCompat.write(spark.range(100, 200)
      .selectExpr("id AS k", "CAST(id AS STRING) AS v").coalesce(1), dir)
    DeltaCompat.delete(spark, dir, col("k") < 50) // DV on file 1 only
    val preFiles = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".parquet")).toSet

    val v = DeltaCompat.purge(spark, dir)
    val after = DeltaCompat.read(spark, dir)
    assert(after.count() === 150)
    assert(after.filter(col("k") < 50).count() === 0)
    // the untouched file survives; the DV'd one was replaced by a new one
    val postFiles = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".parquet")).toSet
    assert(preFiles.intersect(postFiles).size === preFiles.size) // data files never deleted
    // the live set now has no DVs: a fresh delete+read round still works
    // and pre-purge versions still time-travel through their DVs
    assert(DeltaCompat.read(spark, dir, version = Some(2L)).count() === 150)
    assert(DeltaCompat.read(spark, dir, version = Some(1L)).count() === 200)
    // purge with nothing to do is a no-op returning the head
    assert(DeltaCompat.purge(spark, dir) === v)
  }

  test("deletion vector binary format round-trips (Z85, roaring, CRC)") {
    // Z85: spec test vector from the ZeroMQ RFC
    assert(DeletionVectors.z85Encode(
      Array(0x86, 0x4f, 0xd2, 0x6f, 0xb5, 0x59, 0xf7, 0x5b)
        .map(_.toByte)) === "HelloWorld")
    assert(DeletionVectors.z85Decode("HelloWorld").toSeq ===
      Seq(0x86, 0x4f, 0xd2, 0x6f, 0xb5, 0x59, 0xf7, 0x5b).map(_.toByte))
    // bitmap data round-trip incl. a >32-bit row index (bucket key 1)
    val positions = Array(0L, 5L, 7L, 1L << 33, (1L << 33) + 2)
    val data = DeletionVectors.serializeData(positions)
    assert(DeletionVectors.deserializeData(data).toSeq === positions.sorted.toSeq)
    // file IO: write two DVs into one file, read both back via descriptors
    val root = Paths.get(tmpDir("dv-bin"))
    val ds = DeletionVectors.write(root, Seq(Array(1L, 2L), Array(42L)))
    assert(ds.map(_.cardinality) === Seq(2L, 1L))
    assert(DeletionVectors.read(root, ds(0)).toSeq === Seq(1L, 2L))
    assert(DeletionVectors.read(root, ds(1)).toSeq === Seq(42L))
  }

  test("column mapping: name-mode tables round-trip with physical names") {
    val dir = tmpDir("delta-cmap")
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
      .toDF("id", "name", "score")
    DeltaCompat.write(df, dir, columnMapping = "name")
    // parquet files on disk carry col-<uuid> physical names, not logical
    val part = Files.list(Paths.get(dir)).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    val physical = spark.read.parquet(part.toString).columns
    assert(physical.forall(_.startsWith("col-")), physical.mkString(","))
    // ... but the read maps back to logical names and values
    val back = DeltaCompat.read(spark, dir)
    assert(back.columns.toSeq === Seq("id", "name", "score"))
    assert(back.orderBy("id").as[(Long, String, Double)].collect().toSeq ===
      Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)))
    // appends inherit the existing physical mapping
    DeltaCompat.write(Seq((4L, "d", 4.5)).toDF("id", "name", "score"), dir)
    assert(DeltaCompat.read(spark, dir).count() === 4)
    // and DV deletes compose with column mapping
    DeltaCompat.delete(spark, dir, col("id") === 2L)
    val afterDel = DeltaCompat.read(spark, dir).orderBy("id")
      .as[(Long, String, Double)].collect().toSeq
    assert(afterDel.map(_._1) === Seq(1L, 3L, 4L))
  }

  test("column mapping: partitioned tables key partitionValues physically") {
    val dir = tmpDir("delta-cmap-part")
    val df = Seq((1L, "x", "p1"), (2L, "y", "p2"), (3L, "z", "p1"))
      .toDF("id", "v", "part")
    DeltaCompat.write(df, dir, partitionBy = Seq("part"), columnMapping = "name")
    // partition dirs (and thus add.partitionValues keys) use the
    // physical column name
    val dirs = Files.list(Paths.get(dir)).iterator().asScala
      .filter(Files.isDirectory(_)).map(_.getFileName.toString)
      .filter(_.contains("=")).toSeq
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("col-")), dirs.mkString(","))
    val back = DeltaCompat.read(spark, dir)
    assert(back.columns.toSeq === Seq("id", "v", "part"))
    assert(back.orderBy("id").as[(Long, String, String)].collect().toSeq ===
      Seq((1L, "x", "p1"), (2L, "y", "p2"), (3L, "z", "p1")))
  }

  test("checkpoint + vacuumed JSON: replay starts from the checkpoint") {
    val dir = tmpDir("delta-ckpt")
    // 12 commits — a real Delta writer would checkpoint at 10.
    for (i <- 0 until 12)
      DeltaCompat.write(Seq((i.toLong, s"v$i")).toDF("k", "v"), dir)
    val cv = DeltaCompat.checkpoint(spark, dir)
    assert(cv === 11L)
    assert(Files.exists(
      Paths.get(dir, "_delta_log", f"$cv%020d.checkpoint.parquet")))

    // Reads go through the checkpoint (plus zero newer commits).
    val viaCkpt = DeltaCompat.read(spark, dir).as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(viaCkpt === (0 until 12).map(i => i.toLong -> s"v$i"))

    // Vacuum the JSON the checkpoint covers — reads must still work.
    for (i <- 0 until 12)
      Files.delete(Paths.get(dir, "_delta_log", f"$i%020d.json"))
    assert(DeltaCompat.read(spark, dir).count() === 12)

    // New commits continue past the checkpoint version...
    val v12 = DeltaCompat.write(Seq((99L, "x")).toDF("k", "v"), dir)
    assert(v12 === 12L)
    assert(DeltaCompat.read(spark, dir).count() === 13)
    // ...and overwrite drops checkpoint-tracked files too.
    DeltaCompat.write(Seq((100L, "y")).toDF("k", "v"), dir,
      mode = "overwrite")
    assert(DeltaCompat.read(spark, dir).as[(Long, String)].collect().toSeq
      === Seq(100L -> "y"))

    // Time travel behind the checkpoint needs the vacuumed JSON: refuse.
    intercept[UnsupportedOperationException] {
      DeltaCompat.read(spark, dir, version = Some(3L))
    }
  }

  test("v2 checkpoint write: spec shape, sidecar adds, vacuumed-JSON read-back") {
    val dir = tmpDir("delta-ckpt-v2")
    for (i <- 0 until 5)
      DeltaCompat.write(Seq((i.toLong, s"v$i")).toDF("k", "v"), dir)
    val cv = DeltaCompat.checkpoint(spark, dir, v2 = true)
    assert(cv === 4L)
    val log = Paths.get(dir, "_delta_log")
    // Spec shape: a UUID-named main file, NO classic file, sidecars dir.
    assert(!Files.exists(log.resolve(f"$cv%020d.checkpoint.parquet")))
    val re = (f"$cv%020d" + "\\.checkpoint\\.[0-9a-fA-F-]{36}\\.parquet").r
    val mains = Files.list(log).iterator().asScala
      .filter(p => re.pattern.matcher(p.getFileName.toString).matches())
      .toSeq
    assert(mains.size === 1)
    val main = spark.read.parquet(mains.head.toString)
    // Main file: protocol with the v2Checkpoint feature, one
    // checkpointMetadata row at the checkpoint version, sidecar
    // pointer(s), and NO inline add actions.
    assert(!main.schema.fieldNames.contains("add"))
    assert(main.select("checkpointMetadata.version")
      .na.drop().as[Long].collect().toSeq === Seq(cv))
    val feats = main.select("protocol.readerFeatures").na.drop()
      .as[Seq[String]].collect().flatten
    assert(feats.contains("v2Checkpoint"))
    val sidecarNames = main.select("sidecar.path").na.drop()
      .as[String].collect().toSeq
    assert(sidecarNames.nonEmpty)
    sidecarNames.foreach(n =>
      assert(Files.exists(log.resolve("_sidecars").resolve(n))))
    // The sidecar holds exactly the live add actions.
    val adds = spark.read.parquet(
      log.resolve("_sidecars").resolve(sidecarNames.head).toString)
    assert(adds.select("add.path").na.drop().count() === 5)

    // Vacuum every JSON the checkpoint covers: reads must come back
    // through the v2 path (main → sidecar), identical rows.
    for (i <- 0 until 5)
      Files.delete(log.resolve(f"$i%020d.json"))
    assert(DeltaCompat.read(spark, dir).as[(Long, String)]
      .collect().sortBy(_._1).toSeq ===
      (0 until 5).map(i => i.toLong -> s"v$i"))
    // And the table keeps working past the checkpoint.
    DeltaCompat.write(Seq((99L, "x")).toDF("k", "v"), dir)
    assert(DeltaCompat.read(spark, dir).count() === 6)
  }

  test("multi-part checkpoints read all parts") {
    val dir = tmpDir("delta-ckpt-parts")
    for (i <- 0 until 3)
      DeltaCompat.write(Seq((i.toLong, s"v$i")).toDF("k", "v"), dir)
    val cv = DeltaCompat.checkpoint(spark, dir)
    val log = Paths.get(dir, "_delta_log")
    val single = log.resolve(f"$cv%020d.checkpoint.parquet")
    // Split the checkpoint the way large tables are checkpointed:
    // actions spread across N part files named v.checkpoint.i.N.parquet.
    val rows = spark.read.parquet(single.toString)
    def part(i: Int, df: org.apache.spark.sql.DataFrame): Unit = {
      val stage = tmpDir(s"ckpt-part-$i")
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val f = Files.list(Paths.get(stage)).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.head
      Files.copy(f, log.resolve(
        f"$cv%020d.checkpoint.$i%010d.${2}%010d.parquet"))
    }
    part(1, rows.where(rows.col("add").isNull))
    part(2, rows.where(rows.col("add").isNotNull))
    Files.delete(single)
    Files.write(log.resolve("_last_checkpoint"),
      s"""{"version":$cv,"size":5,"parts":2}""".getBytes)
    for (v <- DeltaCompat.versions(dir))
      Files.delete(log.resolve(f"$v%020d.json"))
    assert(DeltaCompat.read(spark, dir).as[(Long, String)]
      .collect().sortBy(_._1).toSeq ===
      (0 until 3).map(i => i.toLong -> s"v$i"))
  }

  test("partitioned write round-trips, with nulls and special chars") {
    val dir = tmpDir("delta-pwrite")
    val df = Seq((1L, Some("a"), 10), (2L, Some("a"), 20),
      (3L, Some("b x"), 30), (4L, None, 40))
      .toDF("k", "p", "n")
    DeltaCompat.write(df, dir, partitionBy = Seq("p"))
    // partition values live in the log, not the data files
    val dataFile = Files.walk(Paths.get(dir)).iterator().asScala
      .find(p => p.getFileName.toString.endsWith(".parquet") &&
        !p.toString.contains("_delta_log")).get
    assert(!spark.read.parquet(dataFile.toString)
      .schema.fieldNames.contains("p"))
    val back = DeltaCompat.read(spark, dir)
      .as[(Long, Option[String], Int)].collect().sortBy(_._1).toSeq
    assert(back === Seq((1L, Some("a"), 10), (2L, Some("a"), 20),
      (3L, Some("b x"), 30), (4L, None, 40)))

    // appends inherit the partitioning; conflicting specs are refused
    DeltaCompat.write(Seq((5L, Some("c"), 50)).toDF("k", "p", "n"), dir)
    assert(DeltaCompat.read(spark, dir).count() === 5)
    intercept[IllegalArgumentException] {
      DeltaCompat.write(df, dir, partitionBy = Seq("n"))
    }

    // checkpoints carry partitionValues through
    DeltaCompat.checkpoint(spark, dir)
    for (v <- DeltaCompat.versions(dir))
      Files.delete(Paths.get(dir, "_delta_log", f"$v%020d.json"))
    val afterCkpt = DeltaCompat.read(spark, dir)
      .as[(Long, Option[String], Int)].collect().sortBy(_._1).toSeq
    assert(afterCkpt.map(_._2) ===
      Seq(Some("a"), Some("a"), Some("b x"), None, Some("c")))
  }

  test("partitioned tables read partition values from add.partitionValues") {
    // Delta keeps partition-column values in add.partitionValues only —
    // the parquet data files carry just the data columns. Fabricate a
    // two-partition table the way a real Delta writer lays it out.
    val dir = tmpDir("delta-part")
    val log = Paths.get(dir, "_delta_log")
    Files.createDirectories(log)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("k", "long").add("p", "string").add("n", "int")
    def writePart(sub: String, rows: Seq[(Long, Int)]): String = {
      Files.createDirectories(Paths.get(dir, sub))
      val tmp = tmpDir("delta-part-stage")
      rows.toDF("k", "n").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.head
      val rel = s"$sub/${part.getFileName}"
      Files.copy(part, Paths.get(dir, rel))
      rel
    }
    val fA = writePart("p=a", Seq((1L, 10), (2L, 20)))
    // value "b x" with dir name "p=b" — values must come from the log's
    // partitionValues, never be parsed out of the path
    val fB = writePart("p=b", Seq((3L, 30)))
    val jm = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val commit =
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""" + "\n" +
        s"""{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},"schemaString":${
          jm.writeValueAsString(schema.json)
        },"partitionColumns":["p"],"configuration":{},"createdTime":0}}""" + "\n" +
        s"""{"add":{"path":"${fA.replace("=", "%3D")}","partitionValues":{"p":"a"},"size":1,"modificationTime":0,"dataChange":true}}""" + "\n" +
        s"""{"add":{"path":"${fB.replace("=", "%3D")}","partitionValues":{"p":"b x"},"size":1,"modificationTime":0,"dataChange":true}}""" + "\n" +
        s"""{"add":{"path":"missing.parquet","partitionValues":{"p":null},"size":1,"modificationTime":0,"dataChange":true}}""" + "\n"
    Files.write(log.resolve(f"${0L}%020d.json"), commit.getBytes)
    // a LATER commit removes the dangling file (within one commit a
    // remove+add of the same path means "replace the entry" — the DV
    // update shape — so the add wins there; across commits remove wins)
    Files.write(log.resolve(f"${1L}%020d.json"),
      ("""{"remove":{"path":"missing.parquet","deletionTimestamp":0,""" +
        """"dataChange":true}}""" + "\n").getBytes)
    val got = DeltaCompat.read(spark, dir)
    assert(got.schema.fieldNames.toSeq === Seq("k", "p", "n"))
    assert(got.as[(Long, String, Int)].collect().sortBy(_._1).toSeq ===
      Seq((1L, "a", 10), (2L, "a", 20), (3L, "b x", 30)))

    // appends inherit the table's partitioning and emit real
    // partitionValues — the appended row reads back with its partition
    DeltaCompat.write(Seq((9L, "c", 90)).toDF("k", "p", "n"), dir)
    assert(DeltaCompat.read(spark, dir).as[(Long, String, Int)]
      .collect().sortBy(_._1).toSeq ===
      Seq((1L, "a", 10), (2L, "a", 20), (3L, "b x", 30), (9L, "c", 90)))
  }

  test("vacuum treats a commit as a set: same-commit add wins over remove") {
    // A DV-style update is remove+add of the SAME path in ONE commit, in
    // either line order. A vacuum that keyed on the last LINE would see
    // add-then-remove as "tombstoned" and destroy a file the head still
    // references — permanent data loss on a spec-conformant table.
    val dir = tmpDir("delta-vacuum-setsem")
    DeltaCompat.write(Seq((1L, "a")).toDF("k", "v"), dir)
    val part = Files.list(Paths.get(dir)).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    val rel = part.getFileName.toString
    // foreign commit: add line FIRST, remove line SECOND, same path,
    // ancient deletionTimestamp — the adversarial line order
    val commit =
      s"""{"add":{"path":"$rel","partitionValues":{},"size":${
        Files.size(part)},"modificationTime":0,"dataChange":true}}""" + "\n" +
        s"""{"remove":{"path":"$rel","deletionTimestamp":0,"dataChange":true}}""" + "\n"
    Files.write(Paths.get(dir, "_delta_log", f"${1L}%020d.json"),
      commit.getBytes)
    // replay agrees the file is live...
    assert(DeltaCompat.read(spark, dir).count() === 1)
    // ...so vacuum at retention 0 must NOT delete it
    assert(DeltaCompat.vacuum(dir, retentionMs = 0L).isEmpty)
    assert(Files.exists(part))
    assert(DeltaCompat.read(spark, dir).as[(Long, String)]
      .collect().toSeq === Seq(1L -> "a"))
  }

  test("delete refuses past dvMaxDeleteRows instead of collecting unbounded") {
    import org.apache.spark.sql.functions.col
    val dir = tmpDir("delta-dv-guard")
    DeltaCompat.write(spark.range(0, 100)
      .selectExpr("id AS k", "CAST(id AS STRING) AS v"), dir)
    spark.conf.set("spark.graft.delta.dvMaxDeleteRows", "5")
    try {
      val e = intercept[UnsupportedOperationException] {
        DeltaCompat.delete(spark, dir, col("k") < 50)
      }
      assert(e.getMessage.contains("dvMaxDeleteRows"))
      assert(e.getMessage.contains("rewrite"))
      // nothing was committed by the refused delete
      assert(DeltaCompat.versions(dir) === Seq(0L))
      // under the limit still works
      assert(DeltaCompat.delete(spark, dir, col("k") < 5) === 1L)
      assert(DeltaCompat.read(spark, dir).count() === 95)
    } finally spark.conf.unset("spark.graft.delta.dvMaxDeleteRows")
  }

  test("DV re-adds carry stats.numRecords with tightBounds:false") {
    import org.apache.spark.sql.functions.col
    val dir = tmpDir("delta-dv-stats")
    DeltaCompat.write(spark.range(0, 100)
      .selectExpr("id AS k", "CAST(id AS STRING) AS v").coalesce(1), dir)
    DeltaCompat.delete(spark, dir, col("k") < 10)
    val jm = new com.fasterxml.jackson.databind.ObjectMapper()
    val addLine = Files.readAllLines(
        Paths.get(dir, "_delta_log", f"${1L}%020d.json")).asScala
      .map(jm.readTree).find(_.has("add")).get.get("add")
    assert(addLine.has("deletionVector"))
    val stats = jm.readTree(addLine.get("stats").asText())
    // physical row count (readers subtract DV cardinality for logical)
    assert(stats.get("numRecords").asLong() === 100L)
    assert(stats.get("tightBounds").asBoolean() === false)
    // checkpoints keep the loose-bounds marker for DV'd files
    DeltaCompat.checkpoint(spark, dir)
    val cp = spark.read.parquet(
      Paths.get(dir, "_delta_log", f"${1L}%020d.checkpoint.parquet").toString)
    val cpStats = cp.where(cp.col("add").isNotNull)
      .select("add.stats").collect().map(_.getString(0)).map(jm.readTree)
    assert(cpStats.length === 1)
    assert(cpStats.head.get("numRecords").asLong() === 100L)
    assert(cpStats.head.get("tightBounds").asBoolean() === false)
  }

  test("add.stats bounds prune files before the scan; results unchanged") {
    import org.apache.spark.sql.functions.{col, lit}
    val dir = tmpDir("delta-prune")
    // two commits with disjoint key ranges -> two files with disjoint
    // add.stats bounds in the log
    DeltaCompat.write(spark.range(0, 100)
      .selectExpr("id AS k", "CAST(id AS STRING) AS v").coalesce(1), dir)
    DeltaCompat.write(spark.range(100, 200)
      .selectExpr("id AS k", "CAST(id AS STRING) AS v").coalesce(1), dir)
    assert(DeltaCompat.read(spark, dir).inputFiles.length === 2)

    val pruned = DeltaCompat.read(spark, dir, prune = Some(col("k") >= 150))
    assert(pruned.inputFiles.length === 1, "stats must skip the low file")
    assert(pruned.as[(Long, String)].collect().map(_._1).sorted.toSeq ===
      (150L until 200L))
    assert(DeltaCompat.read(spark, dir,
      prune = Some(lit(50L) > col("k"))).inputFiles.length === 1)
    // rows still filtered when both files survive
    val both = DeltaCompat.read(spark, dir, prune = Some(col("k") % 2 === 0))
    assert(both.inputFiles.length === 2 && both.count() === 100)
    // conjunct excluding everything opens zero files
    assert(DeltaCompat.read(spark, dir,
      prune = Some(col("k") > 999L)).inputFiles.isEmpty)

    // partition values act as exact bounds (no column stats needed)
    val pdir = tmpDir("delta-prune-part")
    DeltaCompat.write(Seq((1L, "a", 10), (2L, "a", 20), (3L, "b", 30))
      .toDF("k", "p", "n"), pdir, partitionBy = Seq("p"))
    val pAll = DeltaCompat.read(spark, pdir)
    val pOne = DeltaCompat.read(spark, pdir, prune = Some(col("p") === "b"))
    assert(pOne.inputFiles.length < pAll.inputFiles.length)
    assert(pOne.as[(Long, String, Int)].collect().toSeq ===
      Seq((3L, "b", 30)))

    // column mapping: stats are keyed by PHYSICAL names — pruning must
    // translate the logical predicate
    val cdir = tmpDir("delta-prune-cmap")
    DeltaCompat.write(spark.range(0, 50)
      .selectExpr("id AS k", "CAST(id AS STRING) AS v").coalesce(1), cdir,
      columnMapping = "name")
    DeltaCompat.write(spark.range(50, 100)
      .selectExpr("id AS k", "CAST(id AS STRING) AS v").coalesce(1), cdir)
    val cPruned = DeltaCompat.read(spark, cdir, prune = Some(col("k") < 10))
    assert(cPruned.inputFiles.length === 1)
    assert(cPruned.count() === 10)

    // DV'd files keep pruning safely: loose bounds cover a superset
    DeltaCompat.delete(spark, dir, col("k") >= 190)
    val afterDv = DeltaCompat.read(spark, dir, prune = Some(col("k") >= 150))
    assert(afterDv.inputFiles.length === 1)
    assert(afterDv.count() === 40) // 150..189
  }

  test("vacuum folds the checkpoint at its version-order position") {
    // Two foreign-table behaviors a naive vacuum gets wrong:
    //   1. real engines persist in-retention REMOVE tombstones in the
    //      checkpoint after log cleanup deleted the JSON that carried
    //      them — reading only checkpoint adds leaks those files
    //      forever;
    //   2. a stale pre-checkpoint JSON remove (damaged/partially
    //      cleaned log) folded AFTER the checkpoint's liveness marking
    //      would tombstone a file the head still references — vacuum
    //      would destroy live data.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dir = tmpDir("delta-vacuum-cp")
    DeltaCompat.write(Seq((1L, "a")).toDF("k", "v").coalesce(1), dir)
    DeltaCompat.write(Seq((2L, "b")).toDF("k", "v").coalesce(1), dir,
      mode = "overwrite")
    val log = Paths.get(dir, "_delta_log")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def addsOf(v: Long): Seq[String] =
      Files.readAllLines(log.resolve(f"$v%020d.json")).asScala
        .filter(_.contains("\"add\""))
        .map(l => mapper.readTree(l).get("add").get("path").asText()).toSeq
    val Seq(aPath) = addsOf(0L)
    val Seq(bPath) = addsOf(1L)

    // synthetic REAL-ENGINE checkpoint at v1: B live, A tombstoned
    val addT = StructType(Seq(StructField("path", StringType)))
    val removeT = StructType(Seq(StructField("path", StringType),
      StructField("deletionTimestamp", LongType)))
    val rowT = StructType(Seq(StructField("add", addT),
      StructField("remove", removeT)))
    val rows = Seq(Row(Row(bPath), null), Row(null, Row(aPath, 1000L)))
    val tmp = Files.createTempDirectory(Paths.get(dir), ".cp")
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), rowT)
      .write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, log.resolve("00000000000000000001.checkpoint.parquet"))
    Files.writeString(log.resolve("_last_checkpoint"), """{"version":1}""")

    // foreign log cleanup took the real JSON; what survives is a stale
    // damaged v0 carrying a remove of the HEAD-LIVE file B
    Files.delete(log.resolve(f"${0L}%020d.json"))
    Files.delete(log.resolve(f"${1L}%020d.json"))
    Files.writeString(log.resolve(f"${0L}%020d.json"),
      s"""{"remove":{"path":"$bPath","deletionTimestamp":1000}}""" + "\n")

    val deleted = DeltaCompat.vacuum(dir, retentionMs = 0L)
    assert(deleted.contains(aPath),
      s"checkpoint tombstone must sweep A: $deleted")
    assert(!deleted.contains(bPath),
      "stale pre-checkpoint remove must not kill the checkpoint-live file")
    assert(!Files.exists(Paths.get(dir, aPath)))
    assert(Files.exists(Paths.get(dir, bPath)))
  }

  test("date stats and date partition values prune files (epoch-day compare)") {
    import org.apache.spark.sql.functions.col
    // date range stats: two files with disjoint date windows — the
    // stats JSON spells dates as ISO strings, the pushed conjunct
    // carries catalyst's epoch-day int; both normalize to epoch days
    // so the compare is exact and tz-free
    val dir = tmpDir("delta-prune-date")
    DeltaCompat.write(spark.sql(
      "SELECT id AS k, date_add(DATE'2024-01-01', CAST(id AS INT)) AS d " +
        "FROM range(0, 50)").coalesce(1), dir)
    DeltaCompat.write(spark.sql(
      "SELECT id AS k, date_add(DATE'2024-03-01', CAST(id AS INT)) AS d " +
        "FROM range(0, 50)").coalesce(1), dir)
    assert(DeltaCompat.read(spark, dir).inputFiles.length === 2)
    val pruned = DeltaCompat.read(spark, dir,
      prune = Some(col("d") >= java.sql.Date.valueOf("2024-03-01")))
    assert(pruned.inputFiles.length === 1,
      "date stats must skip the January file")
    assert(pruned.count() === 50)
    // equality keeps only the covering file; out-of-range opens none
    assert(DeltaCompat.read(spark, dir,
      prune = Some(col("d") === java.sql.Date.valueOf("2024-01-10")))
      .inputFiles.length === 1)
    assert(DeltaCompat.read(spark, dir,
      prune = Some(col("d") > java.sql.Date.valueOf("2025-01-01")))
      .inputFiles.isEmpty)

    // date-PARTITIONED layout (the common Delta shape): partitionValues
    // act as exact [v, v] bounds with no column stats needed
    val pdir = tmpDir("delta-prune-date-part")
    DeltaCompat.write(Seq(
        (1L, java.sql.Date.valueOf("2024-01-01")),
        (2L, java.sql.Date.valueOf("2024-01-02")),
        (3L, java.sql.Date.valueOf("2024-01-02")))
      .toDF("k", "d"), pdir, partitionBy = Seq("d"))
    val pAll = DeltaCompat.read(spark, pdir)
    val pOne = DeltaCompat.read(spark, pdir,
      prune = Some(col("d") === java.sql.Date.valueOf("2024-01-02")))
    assert(pOne.inputFiles.length < pAll.inputFiles.length,
      "date partition values must prune")
    assert(pOne.select("k").as[Long].collect().sorted.toSeq === Seq(2L, 3L))
  }

  test("add/remove paths are percent-decoded per the Delta spec") {
    val dir = tmpDir("delta-enc")
    DeltaCompat.write(Seq((1L, "a")).toDF("k", "v"), dir)
    // A second commit adds a file whose on-disk name contains a space,
    // referenced by its percent-encoded log path.
    val existing = Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.head
    val spaced = Paths.get(dir, "part with space.parquet")
    Files.copy(existing, spaced)
    val add =
      s"""{"add":{"path":"part%20with%20space.parquet","size":${
        Files.size(spaced)},"modificationTime":0,"dataChange":true,"partitionValues":{}}}""" + "\n"
    Files.write(Paths.get(dir, "_delta_log", f"${1L}%020d.json"),
      add.getBytes)
    assert(DeltaCompat.read(spark, dir).count() === 2)
    // And a remove with the encoded path drops it again.
    val rm =
      """{"remove":{"path":"part%20with%20space.parquet","deletionTimestamp":0,"dataChange":true}}""" + "\n"
    Files.write(Paths.get(dir, "_delta_log", f"${2L}%020d.json"),
      rm.getBytes)
    assert(DeltaCompat.read(spark, dir).count() === 1)
  }

  test("v2 (uuid + sidecar) checkpoints read like classic ones") {
    import org.apache.spark.sql.functions.{col, struct, lit}
    val dir = tmpDir("delta-v2cp")
    DeltaCompat.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)
    DeltaCompat.write(Seq((3L, "c")).toDF("k", "v"), dir)
    val cv = DeltaCompat.checkpoint(spark, dir)
    val log = Paths.get(dir, "_delta_log")
    val classic = log.resolve(f"$cv%020d.checkpoint.parquet")
    val cp = spark.read.parquet(classic.toString)

    // Hand-convert to the V2 layout a newer writer emits: file actions
    // move into a sidecar parquet under _sidecars/, the main file
    // becomes UUID-named and carries non-file actions + the
    // checkpointMetadata and sidecar pointers.
    val sidecarsDir = Files.createDirectories(log.resolve("_sidecars"))
    val sidecarName = "11111111-2222-3333-4444-555555555555.parquet"
    val stage = Files.createTempDirectory(log, ".v2stage")
    cp.filter(col("add").isNotNull).select("add")
      .coalesce(1).write.mode("overwrite").parquet(s"$stage/sidecar")
    val sidecarPart = Files.list(Paths.get(s"$stage/sidecar")).iterator()
      .asScala.find(_.toString.endsWith(".parquet")).get
    Files.move(sidecarPart, sidecarsDir.resolve(sidecarName))

    val nonFile = cp.filter(col("add").isNull).drop("add")
    val pointers = Seq(sidecarName).toDF("__p").select(
      struct(col("__p").as("path"),
        lit(Files.size(sidecarsDir.resolve(sidecarName))).as("sizeInBytes"),
        lit(1L).as("modificationTime")).as("sidecar"))
    val cpMeta = Seq(cv).toDF("__v").select(
      struct(col("__v").as("version")).as("checkpointMetadata"))
    nonFile
      .unionByName(pointers, allowMissingColumns = true)
      .unionByName(cpMeta, allowMissingColumns = true)
      .coalesce(1).write.mode("overwrite").parquet(s"$stage/main")
    val mainPart = Files.list(Paths.get(s"$stage/main")).iterator()
      .asScala.find(_.toString.endsWith(".parquet")).get
    Files.move(mainPart, log.resolve(
      f"$cv%020d.checkpoint.aaaabbbb-cccc-dddd-eeee-ffff00001111.parquet"))
    LakeFs.deleteRec(stage)
    // the classic file and pre-checkpoint JSON are gone (vacuumed) —
    // the V2 file is the ONLY way to reconstruct state
    Files.delete(classic)
    Manifest.withListing(log)(_.filter(p =>
      p.getFileName.toString.matches("\\d{20}\\.json") &&
        p.getFileName.toString.stripSuffix(".json").toLong <= cv).toSeq)
      .foreach(Files.delete)

    val rows = DeltaCompat.read(spark, dir).as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(rows === Seq(1L -> "a", 2L -> "b", 3L -> "c"))

    // appends after the v2 checkpoint replay on top of it
    DeltaCompat.write(Seq((4L, "d")).toDF("k", "v"), dir)
    assert(DeltaCompat.read(spark, dir).count() === 4)

    // a missing sidecar refuses loudly instead of silently dropping files
    Files.move(sidecarsDir.resolve(sidecarName),
      sidecarsDir.resolve("gone.parquet"))
    val ex = intercept[IllegalStateException] {
      DeltaCompat.read(spark, dir, version = Some(cv)).collect()
    }
    assert(ex.getMessage.contains("sidecar"))
  }
}
