package graft.lake

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.types._

import graft.SparkSuite

/** Iceberg SCHEMA evolution: metadata-only rename/add/drop with field-id
  * resolution on read — renamed columns resolve in old files via parquet
  * field-id annotations (or the historical-name fallback for files
  * written before annotation), added columns null-fill, drops stop
  * projecting. */
class IcebergEvolveSchemaSpec extends SparkSuite {
  import spark.implicits._

  private def dataFiles(dir: String) =
    Files.walk(Paths.get(dir, "data")).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq

  test("written parquet files carry field-id annotations") {
    val dir = tmpDir("iceberg-fieldids")
    IcebergCompat.write(Seq((1L, "a")).toDF("k", "v"), dir)
    val conf = new org.apache.hadoop.conf.Configuration()
    val p = dataFiles(dir).head
    val in = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(p.toString), conf))
    try {
      val fields = in.getFooter.getFileMetaData.getSchema.getFields.asScala
      assert(fields.map(f => f.getName -> f.getId.intValue()).toMap ===
        Map("k" -> 1, "v" -> 2))
    } finally in.close()
  }

  test("rename resolves old files by field id; appends mix cleanly") {
    val dir = tmpDir("iceberg-rename")
    IcebergCompat.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)
    IcebergCompat.evolveSchema(dir, renames = Map("v" -> "val"))
    // old file, new name
    assert(IcebergCompat.read(spark, dir).columns.toSeq === Seq("k", "val"))
    // append under the evolved schema; both shapes read together
    IcebergCompat.write(Seq((3L, "c")).toDF("k", "val"), dir)
    val rows = IcebergCompat.read(spark, dir).as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(rows === Seq(1L -> "a", 2L -> "b", 3L -> "c"))
    // the old column name no longer resolves
    intercept[UnsupportedOperationException] {
      IcebergCompat.write(Seq((4L, "d")).toDF("k", "v"), dir)
    }
  }

  test("added columns null-fill in old files, carry values in new ones") {
    val dir = tmpDir("iceberg-add")
    IcebergCompat.write(Seq((1L, "a")).toDF("k", "v"), dir)
    IcebergCompat.evolveSchema(dir,
      adds = Seq(StructField("score", DoubleType)))
    val afterAdd = IcebergCompat.read(spark, dir)
      .as[(Long, String, Option[Double])].collect().toSeq
    assert(afterAdd === Seq((1L, "a", None)))
    IcebergCompat.write(Seq((2L, "b", 0.5)).toDF("k", "v", "score"), dir)
    val mixed = IcebergCompat.read(spark, dir)
      .as[(Long, String, Option[Double])].collect().sortBy(_._1).toSeq
    assert(mixed === Seq((1L, "a", None), (2L, "b", Some(0.5))))
  }

  test("dropped columns stop projecting; files are untouched") {
    val dir = tmpDir("iceberg-drop")
    IcebergCompat.write(Seq((1L, "a", 9L)).toDF("k", "v", "x"), dir)
    val nFiles = dataFiles(dir).size
    IcebergCompat.evolveSchema(dir, drops = Seq("x"))
    assert(IcebergCompat.read(spark, dir).columns.toSeq === Seq("k", "v"))
    assert(IcebergCompat.read(spark, dir).as[(Long, String)]
      .collect().toSeq === Seq(1L -> "a"))
    assert(dataFiles(dir).size === nFiles) // metadata-only
  }

  test("renaming an identity partition source keeps reconstruction") {
    val dir = tmpDir("iceberg-rename-part")
    IcebergCompat.write(
      Seq((1L, "p1", "a"), (2L, "p2", "b")).toDF("k", "p", "v"), dir,
      partitionBy = Seq("p"))
    IcebergCompat.evolveSchema(dir, renames = Map("p" -> "part"))
    val rows = IcebergCompat.read(spark, dir)
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(rows === Seq((1L, "p1", "a"), (2L, "p2", "b")))
    assert(IcebergCompat.read(spark, dir).columns.toSeq ===
      Seq("k", "part", "v"))
  }

  test("appending after a partition-source rename keeps tuples readable") {
    val dir = tmpDir("iceberg-rename-append")
    IcebergCompat.write(
      Seq((1L, "p1", "a"), (2L, "p2", "b")).toDF("k", "p", "v"), dir,
      partitionBy = Seq("p"))
    IcebergCompat.evolveSchema(dir, renames = Map("p" -> "part"))
    // the inherited spec still records field name "p"; the append's
    // manifests must use it so readers keyed by spec name find the tuple
    IcebergCompat.write(Seq((3L, "p3", "c")).toDF("k", "part", "v"), dir)
    val rows = IcebergCompat.read(spark, dir)
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(rows === Seq((1L, "p1", "a"), (2L, "p2", "b"), (3L, "p3", "c")))
    // the appended snapshot records the evolved schema id, not 0
    val meta = com.fasterxml.jackson.databind.json.JsonMapper.builder()
      .build().readTree(java.nio.file.Files.readString(
        java.nio.file.Paths.get(dir, "metadata", "v3.metadata.json")))
    val last = meta.get("snapshots").elements().asScala.toSeq.last
    assert(last.path("schema-id").asInt(-1) ===
      meta.path("current-schema-id").asInt(-2))
  }

  test("historical-name fallback reads files without field ids") {
    val dir = tmpDir("iceberg-legacy")
    IcebergCompat.write(Seq((1L, "a")).toDF("k", "v"), dir)
    // strip the annotations: rewrite the data file in place without
    // field ids (a plain re-read drops the metadata), simulating a file
    // written before the writer annotated
    val p = dataFiles(dir).head
    val rows = spark.read.parquet(p.toString)
    val clean = spark.createDataFrame(rows.collectAsList(),
      StructType(rows.schema.fields.map(f =>
        StructField(f.name, f.dataType, f.nullable))))
    val tmp = Files.createTempDirectory(Paths.get(dir), ".rw")
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "false")
    try clean.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    finally spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    val part = Files.walk(tmp).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    Files.move(part, p, StandardCopyOption.REPLACE_EXISTING)
    IcebergCompat.evolveSchema(dir, renames = Map("v" -> "val"))
    val got = IcebergCompat.read(spark, dir).as[(Long, String)]
      .collect().toSeq
    assert(got === Seq(1L -> "a"))
  }

  test("swapped renames refuse the ambiguous name fallback") {
    // a↔b swap via a temp name: a file WITHOUT field ids then has both
    // names present and two historical schema versions that bind them
    // OPPOSITELY — per-field greedy matching would silently swap the
    // columns; joint resolution must refuse instead
    val dir = tmpDir("iceberg-swap")
    IcebergCompat.write(Seq(("x1", "y1")).toDF("a", "b"), dir)
    // strip field ids from the data file (pre-annotation writer shape)
    val p = dataFiles(dir).head
    val rows = spark.read.parquet(p.toString)
    val clean = spark.createDataFrame(rows.collectAsList(),
      StructType(rows.schema.fields.map(f =>
        StructField(f.name, f.dataType, f.nullable))))
    val tmp = Files.createTempDirectory(Paths.get(dir), ".rw")
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "false")
    try clean.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    finally spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    val part = Files.walk(tmp).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    Files.move(part, p, StandardCopyOption.REPLACE_EXISTING)
    IcebergCompat.evolveSchema(dir, renames = Map("a" -> "tswap"))
    IcebergCompat.evolveSchema(dir, renames = Map("b" -> "a"))
    IcebergCompat.evolveSchema(dir, renames = Map("tswap" -> "b"))
    val ex = intercept[UnsupportedOperationException] {
      IcebergCompat.read(spark, dir).collect()
    }
    assert(ex.getMessage.contains("ambiguously"))
  }

  test("evolution misuse refuses loudly") {
    val dir = tmpDir("iceberg-evolve-refuse")
    IcebergCompat.write(
      Seq((1L, "p1", "a")).toDF("k", "p", "v"), dir,
      partitionBy = Seq("p"))
    intercept[IllegalArgumentException] {
      IcebergCompat.evolveSchema(dir, renames = Map("nope" -> "x"))
    }
    intercept[IllegalArgumentException] {
      IcebergCompat.evolveSchema(dir, renames = Map("v" -> "k"))
    }
    intercept[IllegalArgumentException] {
      IcebergCompat.evolveSchema(dir, drops = Seq("p"))
    }
  }
}
