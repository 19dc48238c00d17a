package graft.lake

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** Delta schema evolution: metaData-only add/rename/drop commits —
  * adds null-fill in old files on any table; renames/drops require
  * column mapping and leave the physical files untouched. */
class DeltaEvolveSchemaSpec extends SparkSuite {
  import spark.implicits._

  test("added columns null-fill in old files; appends carry values") {
    val dir = tmpDir("delta-evolve-add")
    DeltaCompat.write(Seq((1L, "a")).toDF("k", "v"), dir)
    DeltaCompat.evolveSchema(spark, dir,
      adds = Seq(StructField("score", DoubleType)))
    assert(DeltaCompat.read(spark, dir)
      .as[(Long, String, Option[Double])].collect().toSeq ===
      Seq((1L, "a", None)))
    DeltaCompat.write(Seq((2L, "b", 0.5)).toDF("k", "v", "score"), dir)
    assert(DeltaCompat.read(spark, dir)
      .as[(Long, String, Option[Double])].collect().sortBy(_._1).toSeq ===
      Seq((1L, "a", None), (2L, "b", Some(0.5))))
  }

  test("rename/drop require column mapping; mapped tables resolve") {
    val dir = tmpDir("delta-evolve-nomap")
    DeltaCompat.write(Seq((1L, "a")).toDF("k", "v"), dir)
    intercept[UnsupportedOperationException] {
      DeltaCompat.evolveSchema(spark, dir, renames = Map("v" -> "val"))
    }
    val mdir = tmpDir("delta-evolve-map")
    DeltaCompat.write(Seq((1L, "a", 9L)).toDF("k", "v", "x"), mdir,
      columnMapping = "name")
    DeltaCompat.evolveSchema(spark, mdir,
      renames = Map("v" -> "val"), drops = Seq("x"))
    assert(DeltaCompat.read(spark, mdir).columns.toSeq === Seq("k", "val"))
    assert(DeltaCompat.read(spark, mdir).as[(Long, String)]
      .collect().toSeq === Seq(1L -> "a"))
    // appends under the evolved schema keep working; old + new read
    DeltaCompat.write(Seq((2L, "b")).toDF("k", "val"), mdir)
    assert(DeltaCompat.read(spark, mdir).as[(Long, String)]
      .collect().sortBy(_._1).toSeq === Seq(1L -> "a", 2L -> "b"))
  }

  test("adds on a mapped table get fresh ids past maxColumnId") {
    val dir = tmpDir("delta-evolve-map-add")
    DeltaCompat.write(Seq((1L, "a")).toDF("k", "v"), dir,
      columnMapping = "name")
    DeltaCompat.evolveSchema(spark, dir,
      adds = Seq(StructField("w", StringType)))
    DeltaCompat.write(Seq((2L, "b", "w2")).toDF("k", "v", "w"), dir)
    assert(DeltaCompat.read(spark, dir)
      .as[(Long, String, Option[String])].collect().sortBy(_._1).toSeq ===
      Seq((1L, "a", None), (2L, "b", Some("w2"))))
    // maxColumnId advanced to cover the new field
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(dir, "_delta_log",
        f"${1L}%020d.json")).toString
    assert(lines.contains("\"delta.columnMapping.maxColumnId\":\"3\""))
  }

  test("id-mode creation round-trips; files carry field ids; rename/drop evolve") {
    val dir = tmpDir("delta-idmode")
    DeltaCompat.write(Seq((1L, "a", 10L), (2L, "b", 20L))
      .toDF("k", "v", "x"), dir, columnMapping = "id")

    // log: mode id, schema fields carry ids + physical names
    val log = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(dir, "_delta_log", f"${0L}%020d.json")).toString
    assert(log.contains("\"delta.columnMapping.mode\":\"id\""))
    assert(log.contains("delta.columnMapping.id"))
    assert(log.contains("delta.columnMapping.physicalName"))

    // parquet files: every column stamped with its field id (what an
    // id-mode reader resolves by)
    val pq = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(p => p.toString.endsWith(".parquet") &&
        !p.toString.contains("_delta_log"))
      .findFirst().get()
    val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
      new org.apache.hadoop.conf.Configuration(),
      new org.apache.hadoop.fs.Path(pq.toString))
    val ids = scala.jdk.CollectionConverters
      .ListHasAsScala(footer.getFileMetaData.getSchema.getFields).asScala
      .map(f => Option(f.getId).map(_.intValue))
    assert(ids.forall(_.isDefined), s"parquet fields missing ids: $ids")
    assert(ids.flatten.sorted == Seq(1, 2, 3))

    // foreign-table read path resolves logical names
    assert(DeltaCompat.read(spark, dir).as[(Long, String, Long)]
      .collect().sortBy(_._1).toSeq === Seq((1L, "a", 10L), (2L, "b", 20L)))

    // rename + drop evolve, then append under the evolved schema
    DeltaCompat.evolveSchema(spark, dir,
      renames = Map("v" -> "val"), drops = Seq("x"))
    assert(DeltaCompat.read(spark, dir).columns.toSeq === Seq("k", "val"))
    DeltaCompat.write(Seq((3L, "c")).toDF("k", "val"), dir)
    assert(DeltaCompat.read(spark, dir).as[(Long, String)]
      .collect().sortBy(_._1).toSeq ===
      Seq(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("evolution survives a checkpoint and shows in history") {
    val dir = tmpDir("delta-evolve-ckpt")
    DeltaCompat.write(Seq((1L, "a")).toDF("k", "v"), dir)
    DeltaCompat.evolveSchema(spark, dir,
      adds = Seq(StructField("n", LongType)))
    DeltaCompat.checkpoint(spark, dir)
    DeltaCompat.write(Seq((2L, "b", 7L)).toDF("k", "v", "n"), dir)
    assert(DeltaCompat.read(spark, dir)
      .as[(Long, String, Option[Long])].collect().sortBy(_._1).toSeq ===
      Seq((1L, "a", None), (2L, "b", Some(7L))))
    val ops = DeltaCompat.history(spark, dir)
      .select("version", "operation").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(ops.take(2) === Seq(0L -> "WRITE", 1L -> "ALTER TABLE"))
    // partition columns can never drop
    val pdir = tmpDir("delta-evolve-part")
    DeltaCompat.write(Seq((1L, "p1", "a")).toDF("k", "p", "v"), pdir,
      partitionBy = Seq("p"), columnMapping = "name")
    intercept[IllegalArgumentException] {
      DeltaCompat.evolveSchema(spark, pdir, drops = Seq("p"))
    }
  }
}
