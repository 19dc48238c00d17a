package graft.lake

import java.io.File
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** IcebergCompat reads the real table layout: JSON metadata → Avro
  * manifest list → Avro manifests → parquet. The table here is
  * fabricated with the stock Avro writer using the spec's field names,
  * including a DELETED (status=2) entry that must be skipped and a
  * second snapshot for time travel. */
class IcebergCompatSpec extends SparkSuite {
  import spark.implicits._

  private val manifestEntrySchema: Schema = SchemaBuilder
    .record("manifest_entry").fields()
    .requiredInt("status")
    .name("data_file").`type`(SchemaBuilder.record("data_file").fields()
      .requiredString("file_path")
      .requiredString("file_format")
      .requiredLong("record_count")
      .endRecord()).noDefault()
    .endRecord()

  private val manifestFileSchema: Schema = SchemaBuilder
    .record("manifest_file").fields()
    .requiredString("manifest_path")
    .endRecord()

  private def writeAvro(path: String, schema: Schema,
      rows: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new File(path))
    try rows.foreach(w.append) finally w.close()
  }

  private def entry(status: Int, file: String, n: Long): GenericRecord = {
    val df = new GenericData.Record(
      manifestEntrySchema.getField("data_file").schema())
    df.put("file_path", file)
    df.put("file_format", "PARQUET")
    df.put("record_count", n)
    val e = new GenericData.Record(manifestEntrySchema)
    e.put("status", status)
    e.put("data_file", df)
    e
  }

  test("reads current + past snapshots of a fabricated Iceberg table") {
    val dir = tmpDir("iceberg-compat")
    Files.createDirectories(Paths.get(dir, "metadata"))
    Files.createDirectories(Paths.get(dir, "data"))

    // Two parquet data files + one that snapshot 2 marks deleted.
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .coalesce(1).write.parquet(s"$dir/data/f1")
    Seq((3L, "c")).toDF("k", "v")
      .coalesce(1).write.parquet(s"$dir/data/f2")
    def partOf(d: String): String =
      Manifest.withListing(Paths.get(d))(_.filter(
        _.getFileName.toString.endsWith(".parquet")).toSeq).head.toString
    val (f1, f2) = (partOf(s"$dir/data/f1"), partOf(s"$dir/data/f2"))

    // Snapshot 1: both files live. Snapshot 2: f2 deleted.
    writeAvro(s"$dir/metadata/m1.avro", manifestEntrySchema,
      Seq(entry(1, f1, 2), entry(1, f2, 1)))
    writeAvro(s"$dir/metadata/m2.avro", manifestEntrySchema,
      Seq(entry(0, f1, 2), entry(2, f2, 1)))
    def mlist(name: String, manifest: String): Unit = {
      val r = new GenericData.Record(manifestFileSchema)
      r.put("manifest_path", manifest)
      writeAvro(s"$dir/metadata/$name", manifestFileSchema, Seq(r))
    }
    mlist("ml1.avro", s"$dir/metadata/m1.avro")
    mlist("ml2.avro", s"$dir/metadata/m2.avro")

    val metadata = s"""{
      |  "format-version": 2,
      |  "current-snapshot-id": 200,
      |  "schemas": [{"schema-id": 0, "type": "struct", "fields": [
      |    {"id": 1, "name": "k", "required": true, "type": "long"},
      |    {"id": 2, "name": "v", "required": false, "type": "string"}]}],
      |  "current-schema-id": 0,
      |  "snapshots": [
      |    {"snapshot-id": 100, "manifest-list": "$dir/metadata/ml1.avro"},
      |    {"snapshot-id": 200, "manifest-list": "$dir/metadata/ml2.avro"}]
      |}""".stripMargin
    Files.write(Paths.get(dir, "metadata", "v2.metadata.json"),
      metadata.getBytes("UTF-8"))
    Files.write(Paths.get(dir, "metadata", "version-hint.text"),
      "2".getBytes("UTF-8"))

    val head = IcebergCompat.read(spark, dir)
      .as[(Long, String)].collect().sorted.toSeq
    assert(head === Seq(1L -> "a", 2L -> "b"), "snapshot 2 drops f2")

    val past = IcebergCompat.read(spark, dir, snapshotId = Some(100L))
      .as[(Long, String)].collect().sorted.toSeq
    assert(past === Seq(1L -> "a", 2L -> "b", 3L -> "c"))

    assert(IcebergCompat.read(spark, dir).schema.fieldNames.toSeq
      === Seq("k", "v"))
  }

  test("non-parquet delete files are refused explicitly at the manifest walk") {
    // An Avro position/equality-delete file is legal per spec but out of
    // this reader's scope — the walk must say so instead of failing with
    // an opaque parquet footer error when the delete file is read.
    val dir = tmpDir("iceberg-avro-del")
    Files.createDirectories(Paths.get(dir, "metadata"))
    Files.createDirectories(Paths.get(dir, "data"))
    Seq((1L, "a")).toDF("k", "v").coalesce(1).write.parquet(s"$dir/data/f1")
    val f1 = Manifest.withListing(Paths.get(s"$dir/data/f1"))(_.filter(
      _.getFileName.toString.endsWith(".parquet")).toSeq).head.toString
    val entryWithContent: Schema = SchemaBuilder
      .record("manifest_entry2").fields()
      .requiredInt("status")
      .name("data_file").`type`(SchemaBuilder.record("data_file2").fields()
        .requiredInt("content")
        .requiredString("file_path")
        .requiredString("file_format")
        .requiredLong("record_count")
        .endRecord()).noDefault()
      .endRecord()
    def e2(content: Int, file: String, fmt: String): GenericRecord = {
      val df = new GenericData.Record(
        entryWithContent.getField("data_file").schema())
      df.put("content", content)
      df.put("file_path", file)
      df.put("file_format", fmt)
      df.put("record_count", 1L)
      val e = new GenericData.Record(entryWithContent)
      e.put("status", 1)
      e.put("data_file", df)
      e
    }
    writeAvro(s"$dir/metadata/m1.avro", entryWithContent,
      Seq(e2(0, f1, "PARQUET"), e2(2, s"$dir/data/del.avro", "AVRO")))
    val r = new GenericData.Record(manifestFileSchema)
    r.put("manifest_path", s"$dir/metadata/m1.avro")
    writeAvro(s"$dir/metadata/ml1.avro", manifestFileSchema, Seq(r))
    val metadata = s"""{
      |  "format-version": 2,
      |  "current-snapshot-id": 100,
      |  "schemas": [{"schema-id": 0, "type": "struct", "fields": [
      |    {"id": 1, "name": "k", "required": true, "type": "long"},
      |    {"id": 2, "name": "v", "required": false, "type": "string"}]}],
      |  "current-schema-id": 0,
      |  "snapshots": [
      |    {"snapshot-id": 100, "sequence-number": 1,
      |     "manifest-list": "$dir/metadata/ml1.avro"}]
      |}""".stripMargin
    Files.write(Paths.get(dir, "metadata", "v2.metadata.json"),
      metadata.getBytes("UTF-8"))
    Files.write(Paths.get(dir, "metadata", "version-hint.text"),
      "2".getBytes("UTF-8"))
    val e = intercept[UnsupportedOperationException] {
      IcebergCompat.liveDataFiles(dir)
    }
    assert(e.getMessage.contains("equality-delete file format AVRO"))
  }

  test("writer round-trip: append snapshots accumulate, overwrite resets") {
    val dir = tmpDir("iceberg-write")
    val s1 = IcebergCompat.write(Seq((1L, "a")).toDF("k", "v"), dir)
    val s2 = IcebergCompat.write(Seq((2L, "b")).toDF("k", "v"), dir)
    assert(s1 !== s2)
    assert(IcebergCompat.read(spark, dir).as[(Long, String)]
      .collect().sorted.toSeq === Seq(1L -> "a", 2L -> "b"))
    // time travel to the first snapshot
    assert(IcebergCompat.read(spark, dir, Some(s1)).as[(Long, String)]
      .collect().toSeq === Seq(1L -> "a"))
    IcebergCompat.write(Seq((9L, "z")).toDF("k", "v"), dir,
      mode = "overwrite")
    assert(IcebergCompat.read(spark, dir).as[(Long, String)]
      .collect().toSeq === Seq(9L -> "z"))
  }

  test("writer refuses hint-less external tables and schema drift") {
    // External layout (metadata but no version-hint): a write would
    // rename over the live metadata and orphan every file — refuse.
    val ext = tmpDir("iceberg-ext")
    Files.createDirectories(Paths.get(ext, "metadata"))
    Files.write(Paths.get(ext, "metadata", "00000-abc.metadata.json"),
      "{}".getBytes)
    intercept[UnsupportedOperationException] {
      IcebergCompat.write(Seq((1L, "a")).toDF("k", "v"), ext)
    }
    // Schema drift on an existing table: carried snapshots were written
    // under the old schema and the metadata keeps one schema — refuse.
    val dir = tmpDir("iceberg-drift")
    IcebergCompat.write(Seq((1L, "a")).toDF("k", "v"), dir)
    intercept[UnsupportedOperationException] {
      IcebergCompat.write(Seq((2L, "b")).toDF("k", "x"), dir)
    }
    assert(IcebergCompat.read(spark, dir).count() === 1)
  }

  test("writer emits the spec-required v2 fields (ADVICE r2)") {
    import scala.jdk.CollectionConverters._
    import org.apache.avro.file.DataFileReader
    import org.apache.avro.generic.GenericDatumReader
    val dir = tmpDir("iceberg-spec")
    val sid = IcebergCompat.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)

    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val metaFile = Paths.get(dir, "metadata", "v1.metadata.json")
    val meta = mapper.readTree(new String(Files.readAllBytes(metaFile), "UTF-8"))
    for (f <- Seq("table-uuid", "location", "last-sequence-number",
        "last-updated-ms", "last-column-id", "schemas", "partition-specs",
        "default-spec-id", "last-partition-id", "sort-orders",
        "default-sort-order-id"))
      assert(meta.has(f), s"metadata missing required field $f")
    assert(meta.get("last-column-id").asInt() === 2)
    val snap = meta.get("snapshots").get(0)
    for (f <- Seq("sequence-number", "timestamp-ms", "summary", "schema-id"))
      assert(snap.has(f), s"snapshot missing required field $f")
    assert(snap.get("summary").get("operation").asText() === "append")

    def open(path: String) = new DataFileReader[GenericRecord](
      new File(path), new GenericDatumReader[GenericRecord]())
    val listReader = open(snap.get("manifest-list").asText())
    val listMeta = listReader.getMetaString("format-version")
    val mf = try listReader.iterator().asScala.toList
      finally listReader.close()
    assert(listMeta === "2")
    assert(mf.size === 1)
    val m = mf.head
    assert(m.get("manifest_length").asInstanceOf[Long] ===
      Files.size(Paths.get(m.get("manifest_path").toString)))
    assert(m.get("added_snapshot_id").asInstanceOf[Long] === sid)
    assert(m.get("partition_spec_id").asInstanceOf[Int] === 0)
    assert(m.get("added_rows_count").asInstanceOf[Long] === 2L)
    assert(m.get("sequence_number").asInstanceOf[Long] === 1L)

    // Avro field-ids per the spec's schema mapping.
    val pathField = m.getSchema.getField("manifest_path")
    assert(pathField.getObjectProp("field-id") === (500: Integer))

    val manReader = open(m.get("manifest_path").toString)
    val manSchemaMeta = manReader.getMetaString("schema")
    val entries = try manReader.iterator().asScala.toList
      finally manReader.close()
    assert(mapper.readTree(manSchemaMeta).get("fields").size() === 2)
    val d = entries.head.get("data_file").asInstanceOf[GenericRecord]
    assert(d.get("file_size_in_bytes").asInstanceOf[Long] > 0L)
    assert(entries.map(_.get("data_file").asInstanceOf[GenericRecord]
      .get("record_count").asInstanceOf[Long]).sum === 2L)
    assert(d.get("content").asInstanceOf[Int] === 0)
    assert(d.get("partition") !== null)
    assert(d.getSchema.getField("file_path")
      .getObjectProp("field-id") === (100: Integer))
    assert(entries.head.get("snapshot_id").asInstanceOf[Long] === sid)
  }

  test("identity-partitioned write: typed tuples in manifests, reconstruction on read") {
    import scala.jdk.CollectionConverters._
    val dir = tmpDir("iceberg-part")
    val df = Seq((1L, Some("A"), 7, "x"), (2L, Some("B c"), 7, "y"),
      (3L, Some("A"), 8, "z"), (4L, None, 9, "w"))
      .toDF("k", "p", "i", "v")
    IcebergCompat.write(df, dir, partitionBy = Seq("p", "i"))
    // appends inherit the spec; a conflicting spec is refused
    IcebergCompat.write(
      Seq((5L, Some("D"), 10, "q")).toDF("k", "p", "i", "v"), dir)
    intercept[IllegalArgumentException] {
      IcebergCompat.write(df, dir, partitionBy = Seq("v"))
    }

    val back = IcebergCompat.read(spark, dir)
      .as[(Long, Option[String], Int, String)].collect().sortBy(_._1).toSeq
    assert(back === Seq((1L, Some("A"), 7, "x"), (2L, Some("B c"), 7, "y"),
      (3L, Some("A"), 8, "z"), (4L, None, 9, "w"), (5L, Some("D"), 10, "q")))

    // data files do NOT contain partition columns (hive staging strips
    // them) — the read reconstructs from manifest partition tuples
    val dataFile = Files.walk(Paths.get(dir, "data")).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    val raw = spark.read.parquet(dataFile.toString).schema.fieldNames.toSet
    assert(!raw.contains("p") && !raw.contains("i"))

    // metadata declares the identity spec
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(new String(Files.readAllBytes(
      Paths.get(dir, "metadata", "v2.metadata.json")), "UTF-8"))
    val fields = meta.get("partition-specs").get(0).get("fields")
    assert(fields.size() === 2)
    assert(fields.get(0).get("transform").asText() === "identity")
    assert(fields.get(0).get("field-id").asInt() === 1000)
    assert(meta.get("last-partition-id").asInt() === 1001)
  }

  test("identity-DATE partitioning: epoch-day tuples, reconstruction, pruning") {
    import scala.jdk.CollectionConverters._
    val dir = tmpDir("iceberg-part-date")
    val df = Seq(
      (1L, java.sql.Date.valueOf("2024-01-01"), "a"),
      (2L, java.sql.Date.valueOf("2024-01-02"), "b"),
      (3L, java.sql.Date.valueOf("2024-01-02"), "c"),
      (4L, null.asInstanceOf[java.sql.Date], "d"))
      .toDF("k", "d", "v")
    IcebergCompat.write(df, dir, partitionBy = Seq("d"))

    // hive staging strips the identity column; the read reconstructs
    // the calendar date from the manifest tuple's epoch-day int
    val back = IcebergCompat.read(spark, dir)
      .as[(Long, Option[java.sql.Date], String)].collect().sortBy(_._1)
    assert(back.toSeq === Seq(
      (1L, Some(java.sql.Date.valueOf("2024-01-01")), "a"),
      (2L, Some(java.sql.Date.valueOf("2024-01-02")), "b"),
      (3L, Some(java.sql.Date.valueOf("2024-01-02")), "c"),
      (4L, None, "d")))

    // the manifest partition tuple is the spec's epoch-day int with the
    // avro date logical type (real readers type it back)
    val manifest = Files.walk(Paths.get(dir, "metadata")).iterator().asScala
      .filter(_.getFileName.toString.matches("m-\\d+\\.avro")).toSeq.head
    val reader = new org.apache.avro.file.DataFileReader[org.apache.avro.generic.GenericRecord](
      manifest.toFile, new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    val partSchemas = reader.getSchema.getField("data_file").schema()
      .getField("partition").schema().getFields.asScala
    val dField = partSchemas.head.schema().getTypes.get(1)
    assert(dField.getType === org.apache.avro.Schema.Type.INT)
    assert(dField.getLogicalType != null &&
      dField.getLogicalType.getName === "date")
    val tuples = reader.iterator().asScala.map(r =>
      r.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
        .get("partition").asInstanceOf[org.apache.avro.generic.GenericRecord]
        .get(0)).toSet
    reader.close()
    assert(tuples.contains(
      java.time.LocalDate.parse("2024-01-01").toEpochDay.toInt))

    // partition-value standin bounds prune date conjuncts
    val pruned = IcebergCompat.read(spark, dir,
      prune = Some(org.apache.spark.sql.functions.col("d") ===
        java.sql.Date.valueOf("2024-01-02")))
    assert(pruned.inputFiles.length < IcebergCompat.read(spark, dir)
      .inputFiles.length, "identity date tuple must prune")
    assert(pruned.select("k").as[Long].collect().sorted.toSeq ===
      Seq(2L, 3L))
  }

  test("bucket/truncate transforms: spec-exact hashing, routing, round-trip") {
    import scala.jdk.CollectionConverters._
    // 32-bit hash test vectors from the Iceberg spec (Appendix B): int
    // and long 34 hash identically; string hashes its UTF-8 bytes.
    assert(IcebergTransforms.hashLong(34L) === 2017239379)
    assert(IcebergTransforms.hashString("iceberg") === 1210000089)

    val dir = tmpDir("iceberg-bucket")
    val df = spark.range(0, 100)
      .selectExpr("id AS k", "CAST(id AS STRING) AS s", "CAST(id % 7 AS INT) AS n")
    IcebergCompat.write(df, dir,
      transforms = Seq("k" -> "bucket[4]", "s" -> "truncate[2]"))

    // STRING bucketing through the full write path (regression: the
    // codegen bucket expression must not touch child.dataType while the
    // analyzer still holds an unresolved attribute)
    val sdir = tmpDir("iceberg-bucket-str")
    IcebergCompat.write(df, sdir, transforms = Seq("s" -> "bucket[4]"))
    val sback = IcebergCompat.read(spark, sdir)
      .as[(Long, String, Int)].collect().sortBy(_._1).toSeq
    assert(sback === (0L until 100L).map(i => (i, i.toString, (i % 7).toInt)))
    // routing matches the spec hash
    val sDirs = Files.list(Paths.get(sdir, "data")).iterator().asScala
      .filter(Files.isDirectory(_)).map(_.getFileName.toString).toSet
    assert(sDirs.nonEmpty && sDirs.forall(_.startsWith("__p__s_bucket=")))
    val expectBuckets = (0L until 100L)
      .map(i => (IcebergTransforms.hashString(i.toString) &
        Integer.MAX_VALUE) % 4).toSet
    assert(sDirs.map(_.stripPrefix("__p__s_bucket=").toInt) === expectBuckets)
    // content round-trips exactly
    val back = IcebergCompat.read(spark, dir)
      .as[(Long, String, Int)].collect().sortBy(_._1).toSeq
    assert(back === (0L until 100L).map(i => (i, i.toString, (i % 7).toInt)))
    // source columns STAY in the data files (the tuple only holds the
    // transformed value — files are the only place to read the source)
    val aFile = Files.walk(Paths.get(dir, "data")).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    assert(spark.read.parquet(aFile.toString).schema.fieldNames.toSet ===
      Set("k", "s", "n"))
    // every row landed in the file whose dir matches its spec bucket
    val misrouted = Files.walk(Paths.get(dir, "data")).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map { p =>
        val bucketDir = p.getParent.getParent.getFileName.toString
        val b = bucketDir.split("=")(1).toInt
        spark.read.parquet(p.toString).select("k").as[Long].collect()
          .count(k => (IcebergTransforms.hashLong(k) & Int.MaxValue) % 4 != b)
      }.sum
    assert(misrouted === 0L)
    // metadata declares the transforms
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(new String(Files.readAllBytes(
      Paths.get(dir, "metadata", "v1.metadata.json")), "UTF-8"))
    val fields = meta.get("partition-specs").get(0).get("fields")
    assert(fields.get(0).get("transform").asText() === "bucket[4]")
    assert(fields.get(0).get("name").asText() === "k_bucket")
    assert(fields.get(1).get("transform").asText() === "truncate[2]")
  }

  test("time transforms partition by epoch ordinals (day/month/year/hour)") {
    import scala.jdk.CollectionConverters._
    // ordinal math per spec: values relative to 1970 epoch
    val dir = tmpDir("iceberg-day")
    val df = Seq(
      (1L, java.sql.Date.valueOf("1970-01-01")),
      (2L, java.sql.Date.valueOf("1970-02-03")),
      (3L, java.sql.Date.valueOf("2024-06-15"))).toDF("k", "d")
    IcebergCompat.write(df, dir, transforms = Seq("d" -> "day"))
    val back = IcebergCompat.read(spark, dir)
      .as[(Long, java.sql.Date)].collect().sortBy(_._1).toSeq
    assert(back.map(_._2.toString) === Seq("1970-01-01", "1970-02-03", "2024-06-15"))
    // manifest tuple = days since epoch (0 for 1970-01-01, 33 for 02-03)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(new String(Files.readAllBytes(
      Paths.get(dir, "metadata", "v1.metadata.json")), "UTF-8"))
    val f0 = meta.get("partition-specs").get(0).get("fields").get(0)
    assert(f0.get("transform").asText() === "day")
    assert(f0.get("name").asText() === "d_day")
    val dirs = Files.list(Paths.get(dir, "data")).iterator().asScala
      .filter(Files.isDirectory(_)).map(_.getFileName.toString).toSet
    assert(dirs === Set("__p__d_day=0", "__p__d_day=33", "__p__d_day=19889"))
  }

  test("timestamp time transforms decompose in UTC, not the session zone") {
    // 1970-01-01T01:30:00Z — in any zone west of UTC the LOCAL calendar
    // says 1969-12-31, so a session-zone year()/month()/day() would
    // produce -1 / -1 / -1 where the spec demands the UTC ordinals
    // 0 / 0 / 0 (and hour 1).
    val tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try {
      val df = Seq(Tuple1(new java.sql.Timestamp(5400L * 1000))).toDF("ts")
      val got = df.select(
          IcebergTransforms.expr("year", "ts", org.apache.spark.sql.types.TimestampType).as("y"),
          IcebergTransforms.expr("month", "ts", org.apache.spark.sql.types.TimestampType).as("m"),
          IcebergTransforms.expr("day", "ts", org.apache.spark.sql.types.TimestampType).as("d"),
          IcebergTransforms.expr("hour", "ts", org.apache.spark.sql.types.TimestampType).as("h"))
        .as[(Int, Int, Int, Int)].collect().head
      assert(got === ((0, 0, 0, 1)))
      // and a pre-epoch instant floors toward -inf in every transform
      val neg = Seq(Tuple1(new java.sql.Timestamp(-5400L * 1000))).toDF("ts")
      val gotNeg = neg.select(
          IcebergTransforms.expr("year", "ts", org.apache.spark.sql.types.TimestampType).as("y"),
          IcebergTransforms.expr("month", "ts", org.apache.spark.sql.types.TimestampType).as("m"),
          IcebergTransforms.expr("day", "ts", org.apache.spark.sql.types.TimestampType).as("d"),
          IcebergTransforms.expr("hour", "ts", org.apache.spark.sql.types.TimestampType).as("h"))
        .as[(Int, Int, Int, Int)].collect().head
      assert(gotNeg === ((-1, -1, -1, -2)))
    } finally spark.conf.set("spark.sql.session.timeZone", tz)
  }

  test("spec evolution: unpartitioned -> bucket -> identity reads as one table") {
    import scala.jdk.CollectionConverters._
    val dir = tmpDir("iceberg-evolve")
    def rows(a: Long, b: Long) = spark.range(a, b)
      .selectExpr("id AS k", "CAST(id % 3 AS INT) AS c", "CAST(id AS STRING) AS v")
    IcebergCompat.write(rows(0, 10), dir) // spec 0: unpartitioned
    IcebergCompat.write(rows(10, 20), dir,
      transforms = Seq("k" -> "bucket[2]"), evolveSpec = true) // spec 1
    IcebergCompat.write(rows(20, 30), dir,
      partitionBy = Seq("c"), evolveSpec = true) // spec 2: identity (hive)
    val back = IcebergCompat.read(spark, dir)
      .as[(Long, Int, String)].collect().sortBy(_._1).toSeq
    assert(back === (0L until 30L).map(i => (i, (i % 3).toInt, i.toString)))
    // all three specs live in the metadata; default is the newest
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(new String(Files.readAllBytes(
      Paths.get(dir, "metadata", "v3.metadata.json")), "UTF-8"))
    assert(meta.get("partition-specs").size() === 3)
    assert(meta.get("default-spec-id").asInt() === 2)
    // partition-field ids never collide across specs
    val ids = meta.get("partition-specs").elements()
      .asScala.flatMap(_.get("fields").elements().asScala)
      .map(_.get("field-id").asInt()).toSeq
    assert(ids.distinct.size === ids.size)
    // without the explicit opt-in, a different spec still refuses
    intercept[IllegalArgumentException] {
      IcebergCompat.write(rows(30, 40), dir, partitionBy = Seq("v"))
    }
  }

  test("manifests carry per-column lower/upper bounds (spec binary encoding)") {
    import scala.jdk.CollectionConverters._
    val dir = tmpDir("iceberg-bounds")
    IcebergCompat.write(Seq((5L, "apple", 1.5), (42L, "zebra", -2.5))
      .toDF("k", "s", "x").coalesce(1), dir)
    val manifest = Files.list(Paths.get(dir, "metadata")).iterator().asScala
      .find(_.getFileName.toString.startsWith("m-")).get
    val reader = new org.apache.avro.file.DataFileReader[GenericRecord](
      new File(manifest.toString),
      new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
    val entry = try reader.iterator().asScala.next() finally reader.close()
    val dataFile = entry.get("data_file").asInstanceOf[GenericRecord]
    def boundMap(field: String): Map[Int, Array[Byte]] =
      dataFile.get(field).asInstanceOf[java.util.List[_]].asScala.map { r =>
        val rec = r.asInstanceOf[GenericRecord]
        val bb = rec.get("value").asInstanceOf[java.nio.ByteBuffer]
        val bytes = new Array[Byte](bb.remaining()); bb.duplicate().get(bytes)
        rec.get("key").asInstanceOf[Int] -> bytes
      }.toMap
    val lower = boundMap("lower_bounds")
    val upper = boundMap("upper_bounds")
    def leLong(b: Array[Byte]) =
      java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
    def leDouble(b: Array[Byte]) =
      java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).getDouble
    // field ids: k=1, s=2, x=3 (schema position + 1)
    assert(leLong(lower(1)) === 5L && leLong(upper(1)) === 42L)
    assert(new String(lower(2), "UTF-8") === "apple")
    assert(new String(upper(2), "UTF-8") === "zebra")
    assert(leDouble(lower(3)) === -2.5 && leDouble(upper(3)) === 1.5)
  }

  test("date/timestamp bounds: spec encodings in manifests, and they prune") {
    import org.apache.spark.sql.functions.col
    val dir = tmpDir("iceberg-bounds-dt")
    // two files with disjoint date/timestamp windows
    IcebergCompat.write(spark.sql(
      "SELECT id AS k, date_add(DATE'2024-01-01', CAST(id AS INT)) AS d, " +
        "timestampadd(HOUR, CAST(id AS INT), TIMESTAMP'2024-01-01 00:00:00') AS ts " +
        "FROM range(0, 24)").coalesce(1), dir)
    IcebergCompat.write(spark.sql(
      "SELECT id AS k, date_add(DATE'2024-06-01', CAST(id AS INT)) AS d, " +
        "timestampadd(HOUR, CAST(id AS INT), TIMESTAMP'2024-06-01 00:00:00') AS ts " +
        "FROM range(0, 24)").coalesce(1), dir)
    val all = IcebergCompat.read(spark, dir)
    assert(all.inputFiles.length === 2)
    val byDate = IcebergCompat.read(spark, dir,
      prune = Some(col("d") >= java.sql.Date.valueOf("2024-06-01")))
    assert(byDate.inputFiles.length === 1,
      "date manifest bounds must skip the January file")
    assert(byDate.count() === 24)
    val byTs = IcebergCompat.read(spark, dir,
      prune = Some(col("ts") <
        java.sql.Timestamp.valueOf("2024-02-01 00:00:00")))
    assert(byTs.inputFiles.length === 1,
      "timestamp manifest bounds must skip the June file")
    assert(byTs.count() === 24)
    // out-of-range conjunct opens nothing
    assert(IcebergCompat.read(spark, dir,
      prune = Some(col("d") > java.sql.Date.valueOf("2025-01-01")))
      .inputFiles.isEmpty)
  }

  test("snapshot-log, metadata-log, and timestamp time travel") {
    import scala.jdk.CollectionConverters._
    val dir = tmpDir("iceberg-asof")
    IcebergCompat.write(Seq((1L, "a")).toDF("k", "v"), dir)
    Thread.sleep(15) // distinct timestamp-ms between snapshots
    IcebergCompat.write(Seq((2L, "b")).toDF("k", "v"), dir)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(new String(Files.readAllBytes(
      Paths.get(dir, "metadata", "v2.metadata.json")), "UTF-8"))
    // history surfaces: both snapshots in snapshot-log, v1 in metadata-log
    val slog = meta.get("snapshot-log").elements().asScala.toSeq
    assert(slog.map(_.get("snapshot-id").asLong()) === Seq(100L, 200L))
    assert(meta.get("metadata-log").get(0).get("metadata-file").asText()
      .endsWith("v1.metadata.json"))
    // timestamp travel via the recorded snapshot timestamps
    val ts = slog.map(_.get("timestamp-ms").asLong())
    assert(ts(0) < ts(1))
    assert(IcebergCompat.readAsOf(spark, dir, ts(0)).count() === 1)
    assert(IcebergCompat.readAsOf(spark, dir, ts(1) + 1).count() === 2)
    intercept[IllegalArgumentException] {
      IcebergCompat.readAsOf(spark, dir, ts(0) - 1)
    }
  }

  test("identity appends match the table's existing file shape per spec") {
    import scala.jdk.CollectionConverters._
    // A table whose files CONTAIN all columns (every real Iceberg writer's
    // layout): evolving to / appending under an identity spec must keep
    // writing complete files — the reader's one-footer-per-spec shape
    // probe assumes a single shape per spec, so a stripped append into a
    // complete-file spec would be silently null-filled on read.
    val dir = tmpDir("iceberg-shape")
    def rows(a: Long, b: Long) = spark.range(a, b)
      .selectExpr("id AS k", "CAST(id % 3 AS INT) AS c", "CAST(id AS STRING) AS v")
    IcebergCompat.write(rows(0, 10), dir) // spec 0: unpartitioned, complete
    IcebergCompat.write(rows(10, 20), dir,
      partitionBy = Seq("c"), evolveSpec = true) // spec 1: identity on c
    IcebergCompat.write(rows(20, 30), dir) // inherits spec 1
    // every data file written under the identity spec still contains c
    val stripped = Files.walk(Paths.get(dir, "data")).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .filterNot(p => spark.read.parquet(p.toString)
        .schema.fieldNames.contains("c")).toSeq
    assert(stripped.isEmpty, s"stripped files under a complete-file table: $stripped")
    // and the table reads back whole, identity values intact
    val back = IcebergCompat.read(spark, dir)
      .as[(Long, Int, String)].collect().sortBy(_._1).toSeq
    assert(back === (0L until 30L).map(i => (i, (i % 3).toInt, i.toString)))
    // our own hive-style tables stay hive-style: fresh identity table
    // appends keep stripping (reconstruction path unchanged)
    val dir2 = tmpDir("iceberg-shape2")
    IcebergCompat.write(rows(0, 10), dir2, partitionBy = Seq("c"))
    IcebergCompat.write(rows(10, 20), dir2)
    val complete2 = Files.walk(Paths.get(dir2, "data")).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .filter(p => spark.read.parquet(p.toString)
        .schema.fieldNames.contains("c")).toSeq
    assert(complete2.isEmpty)
    assert(IcebergCompat.read(spark, dir2).count() === 20)
  }

  test("v2 position deletes apply via (file, pos) anti-join; time travel sees past") {
    val dir = tmpDir("iceberg-posdel")
    IcebergCompat.write(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v").coalesce(1), dir)
    val s2 = IcebergCompat.write(
      Seq((4L, "d"), (5L, "e")).toDF("k", "v").coalesce(1), dir)

    // physical (file, pos) of the rows to delete, via the same metadata
    // columns the reader uses
    val rows = spark.read.parquet(s"$dir/data")
      .select(col("k"),
        regexp_replace(col("_metadata.file_path"), "^file:(//)?", "").as("f"),
        col("_metadata.row_index").as("p"))
      .collect()
    val dels = rows.filter(r => Set(2L, 5L)(r.getLong(0)))
      .map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(dels.size === 2)
    IcebergCompat.writePositionDeletes(spark, dir, dels)

    assert(IcebergCompat.read(spark, dir).as[(Long, String)]
      .collect().sorted.toSeq === Seq(1L -> "a", 3L -> "c", 4L -> "d"))
    // the pre-delete snapshot still sees all five rows
    assert(IcebergCompat.read(spark, dir, Some(s2)).count() === 5)
    // a later append carries the delete manifest forward
    IcebergCompat.write(Seq((6L, "f")).toDF("k", "v"), dir)
    assert(IcebergCompat.read(spark, dir).as[(Long, String)]
      .collect().sorted.toSeq ===
      Seq(1L -> "a", 3L -> "c", 4L -> "d", 6L -> "f"))
    // equality deletes are refused, not skipped: fabricate content=2
    // by rewriting the delete file's manifest is out of scope here —
    // the reader-side guard is unit-visible in read()'s content match.
  }

  test("v2 equality deletes: null-safe key match, strictly-older-sequence scope") {
    val dir = tmpDir("iceberg-eqdel")
    IcebergCompat.write(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), dir)
    // delete k=2 and k=3 by key — the CDC-writer shape
    IcebergCompat.writeEqualityDeletes(spark, dir,
      Seq(Tuple1(2L), Tuple1(3L)).toDF("k"), Seq("k"))
    assert(IcebergCompat.read(spark, dir).as[(Long, String)]
      .collect().toSeq === Seq(1L -> "a"))

    // sequence rule: re-inserting k=2 in a LATER snapshot survives the
    // older delete (its data sequence is newer)
    IcebergCompat.write(Seq((2L, "b2")).toDF("k", "v"), dir)
    assert(IcebergCompat.read(spark, dir).as[(Long, String)]
      .collect().sorted.toSeq === Seq(1L -> "a", 2L -> "b2"))

    // a second equality delete hits both old and re-inserted rows it
    // postdates; unknown columns are refused
    IcebergCompat.writeEqualityDeletes(spark, dir,
      Seq(Tuple1(2L)).toDF("k"), Seq("k"))
    assert(IcebergCompat.read(spark, dir).as[(Long, String)]
      .collect().toSeq === Seq(1L -> "a"))
    intercept[IllegalArgumentException] {
      IcebergCompat.writeEqualityDeletes(spark, dir,
        Seq(Tuple1(1L)).toDF("zzz"), Seq("zzz"))
    }

    // mixed with position deletes in the same table: drop 1L by position
    import scala.jdk.CollectionConverters._
    val dataFiles = Files.walk(Paths.get(dir, "data")).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet") &&
        !p.getFileName.toString.contains("-delete-"))
      .map(_.toString).toSeq
    val pos = spark.read.parquet(dataFiles: _*)
      .select(col("k"),
        regexp_replace(col("_metadata.file_path"), "^file:(//)?", "").as("f"),
        col("_metadata.row_index").as("p"))
      .where(col("k") === 1L)
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(pos.nonEmpty)
    IcebergCompat.writePositionDeletes(spark, dir, pos)
    assert(IcebergCompat.read(spark, dir).count() === 0)
  }

  test("partition-scoped equality deletes apply only in their partition") {
    val dir = tmpDir("iceberg-eqscope")
    // same key values exist in BOTH partitions — the scope must protect
    // partition "b" from a delete aimed at partition "a"
    val rows = Seq((1L, "a", 10), (2L, "a", 20), (3L, "a", 30),
      (1L, "b", 11), (2L, "b", 21), (3L, "b", 31)).toDF("k", "p", "n")
    IcebergCompat.write(rows, dir, partitionBy = Seq("p"))
    IcebergCompat.writeEqualityDeletes(spark, dir,
      Seq(1L, 2L).toDF("k"), Seq("k"), scope = Map("p" -> "a"))
    val after = IcebergCompat.read(spark, dir)
      .as[(Long, String, Int)].collect().sortBy(r => (r._2, r._1)).toSeq
    // k=1,2 gone from partition a only; partition b intact
    assert(after === Seq((3L, "a", 30),
      (1L, "b", 11), (2L, "b", 21), (3L, "b", 31)))

    // a re-insert into the scoped partition survives the older delete
    // (sequence rule composes with the scope)
    IcebergCompat.write(Seq((1L, "a", 100)).toDF("k", "p", "n"), dir)
    assert(IcebergCompat.read(spark, dir).count() === 5)

    // a scope against a partition value with NO data files is a no-op
    IcebergCompat.writeEqualityDeletes(spark, dir,
      Seq(3L).toDF("k"), Seq("k"), scope = Map("p" -> "zzz"))
    assert(IcebergCompat.read(spark, dir).count() === 5)

    // writer contract: unscoped delete on a partitioned table still
    // refuses; scope on an unpartitioned table refuses; partial scope
    // refuses
    intercept[UnsupportedOperationException] {
      IcebergCompat.writeEqualityDeletes(spark, dir,
        Seq(3L).toDF("k"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      IcebergCompat.writeEqualityDeletes(spark, dir,
        Seq(3L).toDF("k"), Seq("k"), scope = Map("q" -> "a"))
    }
    val flat = tmpDir("iceberg-eqscope-flat")
    IcebergCompat.write(Seq((1L, "x")).toDF("k", "v"), flat)
    intercept[IllegalArgumentException] {
      IcebergCompat.writeEqualityDeletes(spark, flat,
        Seq(1L).toDF("k"), Seq("k"), scope = Map("v" -> "x"))
    }
  }

  test("compact folds merge-on-read deletes into clean files") {
    import scala.jdk.CollectionConverters._
    val dir = tmpDir("iceberg-compact")
    val sup = Seq.tabulate(30)(i => (i.toLong, s"n$i", i * 1.5))
      .toDF("k", "n", "b")
    IcebergCompat.write(sup.coalesce(1), dir)
    IcebergCompat.writeEqualityDeletes(spark, dir,
      sup.filter(col("k") % 3 === 0).select("k"), Seq("k"))
    assert(IcebergCompat.read(spark, dir).count() === 20)

    val snap = IcebergCompat.compact(spark, dir)
    val after = IcebergCompat.read(spark, dir)
    assert(after.count() === 20)
    assert(after.filter(col("k") % 3 === 0).count() === 0)
    // the compacted snapshot's manifest list has no delete manifests
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(new String(Files.readAllBytes(
      Paths.get(dir, "metadata", "v3.metadata.json")), "UTF-8"))
    val ml = meta.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong() == snap).get
      .get("manifest-list").asText()
    val reader = new org.apache.avro.file.DataFileReader[GenericRecord](
      new File(ml.stripPrefix("file:")),
      new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
    val entries = try reader.iterator().asScala.toList finally reader.close()
    assert(entries.forall(r => r.get("content").asInstanceOf[Int] == 0))
    // pre-compact snapshots still time-travel through their deletes
    val snaps = meta.get("snapshots").elements().asScala
      .map(_.get("snapshot-id").asLong()).toSeq
    assert(IcebergCompat.read(spark, dir, Some(snaps.head)).count() === 30)
  }

  test("expireSnapshots drops old history, deletes only unreachable files") {
    import scala.jdk.CollectionConverters._
    val dir = tmpDir("iceberg-expire")
    val df0 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    IcebergCompat.write(df0.coalesce(1), dir)
    // overwrite: the v1 data file becomes reachable ONLY via snapshot 1
    IcebergCompat.write(Seq((3L, "c")).toDF("k", "v").coalesce(1), dir,
      mode = "overwrite")
    IcebergCompat.write(Seq((4L, "d")).toDF("k", "v").coalesce(1), dir)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def snapshots(): Seq[Long] = {
      val hint = new String(Files.readAllBytes(
        Paths.get(dir, "metadata", "version-hint.text")), "UTF-8").trim
      mapper.readTree(new String(Files.readAllBytes(
          Paths.get(dir, "metadata", s"v$hint.metadata.json")), "UTF-8"))
        .get("snapshots").elements().asScala
        .map(_.get("snapshot-id").asLong()).toSeq
    }
    val before = snapshots()
    assert(before.size === 3)
    val dataFiles = Files.list(Paths.get(dir, "data")).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq
    assert(dataFiles.size === 3)

    // nothing older than epoch 0: no-op, no new metadata version
    assert(IcebergCompat.expireSnapshots(dir, 0L).isEmpty)
    assert(snapshots() === before)

    val deleted = IcebergCompat.expireSnapshots(
      dir, System.currentTimeMillis() + 3600000L)
    // snapshot-1's data file was dropped by the overwrite → physically
    // deleted; the appended + overwriting snapshots' files survive via
    // the head's carried manifests
    assert(deleted.exists(_.endsWith(".parquet")))
    assert(deleted.exists(_.contains("ml-"))) // expired manifest lists
    // only the current snapshot remains; the head reads unchanged
    assert(snapshots() === Seq(before.last))
    assert(IcebergCompat.read(spark, dir).as[(Long, String)]
      .collect().sorted.toSeq === Seq(3L -> "c", 4L -> "d"))
    // time travel behind the cutoff refuses
    intercept[NoSuchElementException] {
      IcebergCompat.read(spark, dir, Some(before.head))
    }
    intercept[IllegalArgumentException] {
      IcebergCompat.readAsOf(spark, dir, 1L)
    }
    // idempotent
    assert(IcebergCompat.expireSnapshots(
      dir, System.currentTimeMillis() + 3600000L).isEmpty)
    // appends continue normally after expiry
    IcebergCompat.write(Seq((5L, "e")).toDF("k", "v").coalesce(1), dir)
    assert(IcebergCompat.read(spark, dir).count() === 3)
  }

  test("removeOrphanFiles sweeps unreferenced staging leftovers only") {
    import scala.jdk.CollectionConverters._
    val dir = tmpDir("iceberg-orphan")
    IcebergCompat.write(
      Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1), dir)
    // a crash-leftover: parquet in data/ no manifest references
    val orphan = Paths.get(dir, "data", "orphan-leftover.parquet")
    val real = Files.list(Paths.get(dir, "data")).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq.head
    Files.copy(real, orphan)
    // default grace window spares young files — an in-flight write()'s
    // staged-but-uncommitted parquet must survive a concurrent sweep
    assert(IcebergCompat.removeOrphanFiles(dir).isEmpty)
    assert(Files.exists(orphan))
    val swept = IcebergCompat.removeOrphanFiles(dir, graceMs = 0L)
    assert(swept === Seq(orphan.toAbsolutePath.normalize.toString))
    assert(!Files.exists(orphan) && Files.exists(real))
    assert(IcebergCompat.read(spark, dir).count() === 2)
    // clean table: nothing to sweep
    assert(IcebergCompat.removeOrphanFiles(dir, graceMs = 0L).isEmpty)
  }

  test("manifest bounds prune files before the scan; results unchanged") {
    val dir = tmpDir("iceberg-prune")
    // two commits with disjoint key ranges -> two files with disjoint
    // manifest bounds
    IcebergCompat.write(spark.range(0, 100)
      .selectExpr("id AS k", "CAST(id AS STRING) AS v").coalesce(1), dir)
    IcebergCompat.write(spark.range(100, 200)
      .selectExpr("id AS k", "CAST(id AS STRING) AS v").coalesce(1), dir)
    val unpruned = IcebergCompat.read(spark, dir)
    assert(unpruned.inputFiles.length === 2)

    val pruned = IcebergCompat.read(spark, dir, prune = Some(col("k") >= 150))
    assert(pruned.inputFiles.length === 1, "bounds must skip the low file")
    assert(pruned.as[(Long, String)].collect().map(_._1).sorted.toSeq ===
      (150L until 200L))
    // flipped literal side, equality, and string bounds all prune
    assert(IcebergCompat.read(spark, dir,
      prune = Some(lit(50L) > col("k"))).inputFiles.length === 1)
    assert(IcebergCompat.read(spark, dir,
      prune = Some(col("k") === 7L)).inputFiles.length === 1)
    // rows are STILL filtered even when both files survive pruning
    val both = IcebergCompat.read(spark, dir,
      prune = Some(col("k") % 2 === 0))
    assert(both.inputFiles.length === 2)
    assert(both.count() === 100)
    // a conjunct excluding everything opens zero files
    assert(IcebergCompat.read(spark, dir,
      prune = Some(col("k") > 999L)).inputFiles.isEmpty)

    // identity partition values stand in as exact bounds: pruning works
    // on the partition column of a hive-stripped table too
    val pdir = tmpDir("iceberg-prune-part")
    IcebergCompat.write(Seq((1L, "a", 10), (2L, "a", 20), (3L, "b", 30))
      .toDF("k", "p", "n"), pdir, partitionBy = Seq("p"))
    val pAll = IcebergCompat.read(spark, pdir)
    val pOne = IcebergCompat.read(spark, pdir, prune = Some(col("p") === "b"))
    assert(pOne.inputFiles.length < pAll.inputFiles.length)
    assert(pOne.as[(Long, String, Int)].collect().toSeq ===
      Seq((3L, "b", 30)))
  }

  test("compact with zorderBy re-clusters so both dimensions prune") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = tmpDir("iceberg-zorder")
    val rows = for (a <- 0L until 64L; b <- 0L until 64L)
      yield (a, b, s"r$a-$b")
    IcebergCompat.write(rows.toDF("a", "b", "v").repartition(4), dir)
    val total = IcebergCompat.read(spark, dir).inputFiles
      .map(f => new java.io.File(new java.net.URI(f)).length).sum
    IcebergCompat.compact(spark, dir, zorderBy = Seq("a", "b"),
      targetFileBytes = math.max(1L, total / 8))
    val all = IcebergCompat.read(spark, dir)
    assert(all.inputFiles.length > 2)
    assert(all.count() === 64L * 64)
    // manifest bounds prune on the SECOND dimension
    val pruned = IcebergCompat.read(spark, dir,
      prune = Some(col("b") < 8))
    assert(pruned.inputFiles.length < all.inputFiles.length)
    assert(pruned.count() === 64L * 8)
    intercept[IllegalArgumentException] {
      IcebergCompat.compact(spark, dir, zorderBy = Seq("v", "a"))
    }
  }

  test("inspection tables describe the current snapshot's layout") {
    import spark.implicits._
    val dir = tmpDir("iceberg-inspect")
    IcebergCompat.write(
      Seq((1L, "p1", "a"), (2L, "p1", "b"), (3L, "p2", "c"))
        .toDF("k", "p", "v").repartition(1), dir,
      partitionBy = Seq("p"))
    IcebergCompat.write(
      Seq((4L, "p2", "d")).toDF("k", "p", "v"), dir)
    val files = IcebergCompat.inspect(spark, dir, "files")
    assert(files.count() === 3) // two p-partitions + one appended file
    assert(files.select("record_count").as[Long].collect().sum === 4L)
    assert(files.filter($"partition" === "p=p1")
      .select("record_count").as[Long].collect().toSeq === Seq(2L))
    val manifests = IcebergCompat.inspect(spark, dir, "manifests")
    assert(manifests.count() === 2) // one data manifest per commit
    assert(manifests.select("content").as[Int].collect().toSet === Set(0))
    val snaps = IcebergCompat.inspect(spark, dir, "snapshots")
      .orderBy("sequence_number")
      .select("operation").as[String].collect().toSeq
    assert(snaps === Seq("append", "append"))
    intercept[IllegalArgumentException] {
      IcebergCompat.inspect(spark, dir, "nope")
    }
    // derived transforms: $partitions keys by the spec FIELD name
    // (k_bucket), never the source column
    val bdir = tmpDir("iceberg-inspect-bucket")
    IcebergCompat.write(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), bdir,
      transforms = Seq(("k", "bucket[4]")))
    val parts = IcebergCompat.inspect(spark, bdir, "partitions")
    assert(parts.columns.toSeq ===
      Seq("k_bucket", "record_count", "file_count"))
    assert(parts.select("record_count").as[Long].collect().sum === 3L)
    assert(parts.filter($"k_bucket".isNull).count() === 0)
  }

  test("fp bounds prune only when nan_value_counts proves NaN-absence") {
    // Own writer: clean double files carry nan_value_counts=0, so fp
    // conjuncts prune; a NaN-holding file loses its fp bounds entirely
    // (parquet-mr drops poisoned stats) and is always kept.
    val dir = tmpDir("iceberg-nan-own")
    IcebergCompat.write(spark.range(0, 50)
      .selectExpr("id AS k", "CAST(id AS DOUBLE) AS d").coalesce(1), dir)
    IcebergCompat.write(spark.range(100, 150)
      .selectExpr("id AS k", "CAST(id AS DOUBLE) AS d").coalesce(1), dir)
    assert(IcebergCompat.read(spark, dir,
      prune = Some(col("d") >= 120.0)).inputFiles.length === 1)
    // the manifests really carry the counts (not just absent-field keep)
    val metaDir = Paths.get(dir, "metadata")
    val manifests = Files.list(metaDir).iterator().asScala
      .filter(_.getFileName.toString.matches("m-\\d+\\.avro")).toSeq
    def readAvro(p: java.nio.file.Path): Seq[GenericRecord] = {
      val rd = new org.apache.avro.file.DataFileReader[GenericRecord](
        p.toFile,
        new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
      try {
        val b = Seq.newBuilder[GenericRecord]
        while (rd.hasNext) b += rd.next()
        b.result()
      } finally rd.close()
    }
    val nanFields = manifests.flatMap(m =>
      readAvro(m).map(_.get("data_file")
        .asInstanceOf[GenericRecord].get("nan_value_counts")))
    assert(nanFields.nonEmpty && nanFields.forall(_ != null),
      "own manifests must stamp nan_value_counts for fp columns")

    val nanDir = tmpDir("iceberg-nan-poison")
    IcebergCompat.write(Seq((1L, 1.0), (2L, 2.0), (3L, Double.NaN))
      .toDF("k", "d").coalesce(1), nanDir)
    // Spark orders NaN above every value, so d > 1e9 matches the NaN
    // row — the file must survive pruning and the row must come back
    val hit = IcebergCompat.read(spark, nanDir,
      prune = Some(col("d") > 1e9))
    assert(hit.inputFiles.length === 1)
    assert(hit.select("k").as[Long].collect().toSeq === Seq(3L))
  }

  test("foreign fp bounds without nan_value_counts never prune") {
    // Fabricated foreign manifest: spec-compliant bounds that EXCLUDE
    // NaN, with no nan_value_counts — pruning on them would wrongly
    // drop the NaN row. A second clean file carries counts=0 and may
    // prune.
    val dir = tmpDir("iceberg-nan-foreign")
    Files.createDirectories(Paths.get(dir, "metadata"))
    Files.createDirectories(Paths.get(dir, "data"))
    Seq((1L, 1.0), (2L, 2.0), (3L, Double.NaN)).toDF("k", "d")
      .coalesce(1).write.parquet(s"$dir/data/f1")
    Seq((10L, 10.0), (11L, 11.0)).toDF("k", "d")
      .coalesce(1).write.parquet(s"$dir/data/f2")
    def partOf(d: String): String =
      Manifest.withListing(Paths.get(d))(_.filter(
        _.getFileName.toString.endsWith(".parquet")).toSeq).head.toString
    val (f1, f2) = (partOf(s"$dir/data/f1"), partOf(s"$dir/data/f2"))

    def le8(v: Double): Array[Byte] = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putDouble(v).array()
    def le8l(v: Long): Array[Byte] = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array()
    val boundsKv = SchemaBuilder.record("bkv").fields()
      .requiredInt("key").requiredBytes("value").endRecord()
    val countsKv = SchemaBuilder.record("ckv").fields()
      .requiredInt("key").requiredLong("value").endRecord()
    def opt(s: Schema): Schema =
      Schema.createUnion(Schema.create(Schema.Type.NULL), s)
    val entrySchema = SchemaBuilder.record("manifest_entry").fields()
      .requiredInt("status")
      .name("data_file").`type`(SchemaBuilder.record("data_file").fields()
        .requiredString("file_path")
        .requiredString("file_format")
        .requiredLong("record_count")
        .name("lower_bounds").`type`(opt(Schema.createArray(boundsKv)))
        .withDefault(null)
        .name("upper_bounds").`type`(opt(Schema.createArray(boundsKv)))
        .withDefault(null)
        .name("nan_value_counts").`type`(opt(Schema.createArray(countsKv)))
        .withDefault(null)
        .endRecord()).noDefault()
      .endRecord()
    val dfSchema = entrySchema.getField("data_file").schema()
    def kv(schema: Schema, id: Int, v: AnyRef): GenericRecord = {
      val r = new GenericData.Record(schema)
      r.put("key", id)
      r.put("value", v)
      r
    }
    def bArr(field: String, kBound: Long, dBound: Double): AnyRef = {
      val s = dfSchema.getField(field).schema().getTypes.get(1)
      new GenericData.Array[AnyRef](s, java.util.List.of[AnyRef](
        kv(boundsKv, 1, java.nio.ByteBuffer.wrap(le8l(kBound))),
        kv(boundsKv, 2, java.nio.ByteBuffer.wrap(le8(dBound)))))
    }
    def entryOf(file: String, n: Long, kLo: Long, kHi: Long,
        lo: Double, hi: Double, nanZero: Boolean): GenericRecord = {
      val d = new GenericData.Record(dfSchema)
      d.put("file_path", file)
      d.put("file_format", "PARQUET")
      d.put("record_count", n)
      d.put("lower_bounds", bArr("lower_bounds", kLo, lo))
      d.put("upper_bounds", bArr("upper_bounds", kHi, hi))
      if (nanZero) {
        val s = dfSchema.getField("nan_value_counts").schema().getTypes.get(1)
        d.put("nan_value_counts", new GenericData.Array[AnyRef](s,
          java.util.List.of[AnyRef](kv(countsKv, 2, 0L: java.lang.Long))))
      }
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1)
      e.put("data_file", d)
      e
    }
    // f1: bounds [1.0, 2.0] per spec (NaN excluded), counts ABSENT
    // f2: bounds [10.0, 11.0], nan_value_counts = 0
    writeAvro(s"$dir/metadata/m1.avro", entrySchema, Seq(
      entryOf(f1, 3, 1L, 3L, 1.0, 2.0, nanZero = false),
      entryOf(f2, 2, 10L, 11L, 10.0, 11.0, nanZero = true)))
    val r = new GenericData.Record(manifestFileSchema)
    r.put("manifest_path", s"$dir/metadata/m1.avro")
    writeAvro(s"$dir/metadata/ml1.avro", manifestFileSchema, Seq(r))
    val metadata = s"""{
      |  "format-version": 2,
      |  "current-snapshot-id": 100,
      |  "schemas": [{"schema-id": 0, "type": "struct", "fields": [
      |    {"id": 1, "name": "k", "required": true, "type": "long"},
      |    {"id": 2, "name": "d", "required": false, "type": "double"}]}],
      |  "current-schema-id": 0,
      |  "snapshots": [
      |    {"snapshot-id": 100, "manifest-list": "$dir/metadata/ml1.avro"}]
      |}""".stripMargin
    Files.write(Paths.get(dir, "metadata", "v1.metadata.json"),
      metadata.getBytes("UTF-8"))
    Files.write(Paths.get(dir, "metadata", "version-hint.text"),
      "1".getBytes("UTF-8"))

    // d > 20: f2 provably excluded (clean bounds), f1 MUST survive —
    // its NaN row matches the predicate despite upper bound 2.0
    val got = IcebergCompat.read(spark, dir, prune = Some(col("d") > 20.0))
    assert(got.inputFiles.length === 1, "only the NaN-unknown file stays")
    assert(got.select("k").as[Long].collect().toSeq === Seq(3L))
    // integral bounds keep pruning as before on the same table
    assert(IcebergCompat.read(spark, dir,
      prune = Some(col("k") >= 10L)).inputFiles.length === 1)
  }

  test("partition-scoped equality deletes refuse live older-spec files") {
    val dir = tmpDir("iceberg-eqscope-evolve")
    IcebergCompat.write(Seq((1L, "a", 10)).toDF("k", "p", "n"), dir)
    IcebergCompat.write(Seq((2L, "b", 20)).toDF("k", "p", "n"), dir,
      partitionBy = Seq("p"), evolveSpec = true)
    // k=1 lives in an unpartitioned (spec 0) file the scoped tombstone
    // cannot reach — committing would silently resurface it
    val ex = intercept[UnsupportedOperationException] {
      IcebergCompat.writeEqualityDeletes(spark, dir,
        Seq(1L).toDF("k"), Seq("k"), scope = Map("p" -> "a"))
    }
    assert(ex.getMessage.contains("partition spec other than the default"))
    // compact rewrites everything under the default spec; then it lands
    IcebergCompat.compact(spark, dir)
    IcebergCompat.writeEqualityDeletes(spark, dir,
      Seq(1L).toDF("k"), Seq("k"), scope = Map("p" -> "a"))
    assert(IcebergCompat.read(spark, dir)
      .select("k").as[Long].collect().toSeq === Seq(2L))
  }

  test("mirror exports its snapshot as an Iceberg table") {
    val lake = new Mooncake(tmpDir("iceberg-export-wh"))
    lake.createTable(spark, "m",
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Seq("k"))
    val dest = tmpDir("iceberg-export")
    lake.exportIceberg(spark, "m", dest)
    assert(IcebergCompat.read(spark, dest).as[(Long, String)]
      .collect().sorted.toSeq === Seq(1L -> "a", 2L -> "b"))
    // and the Delta twin of the same interop role
    val destD = tmpDir("delta-export")
    lake.exportDelta(spark, "m", destD)
    assert(DeltaCompat.read(spark, destD).as[(Long, String)]
      .collect().sorted.toSeq === Seq(1L -> "a", 2L -> "b"))
  }
}
