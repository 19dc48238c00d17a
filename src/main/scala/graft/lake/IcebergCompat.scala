package graft.lake

import java.io.File
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader,
  GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Read-only Iceberg table support — the reference reads existing
  * Iceberg tables (`/root/reference/CHANGELOG.md:25`) and stores its own
  * mirrors as Iceberg. No Iceberg runtime jars exist in this
  * environment, but the format is open: JSON table metadata + Avro
  * manifest lists + Avro manifests over parquet data, and the Avro core
  * jars ship with Spark. This reader walks the real layout:
  *
  *   metadata/version-hint.text → vN.metadata.json → current snapshot →
  *   manifest list (Avro) → manifests (Avro) → live parquet files,
  *
  * maps the Iceberg primitive schema to Spark types, and scans with the
  * declared schema. Scope: primitive columns, unpartitioned or
  * identity-partitioned data, no deletion vectors / equality deletes —
  * out-of-scope tables are refused, not mis-read (same discipline as
  * [[DeltaCompat]]). Snapshot selection enables time travel by id.
  */
object IcebergCompat {

  private val mapper = new ObjectMapper()

  private def avroRecords(path: String): Seq[GenericRecord] = {
    val reader = new DataFileReader[GenericRecord](
      new File(path), new GenericDatumReader[GenericRecord]())
    try reader.iterator().asScala.toList
    finally reader.close()
  }

  private def localPath(uri: String): String =
    uri.stripPrefix("file:").replaceAll("^//+", "/")

  /** Latest metadata JSON for the table. */
  private def currentMetadata(tableDir: String): JsonNode = {
    val metaDir = Paths.get(tableDir, "metadata")
    if (!Files.isDirectory(metaDir))
      throw new NoSuchElementException(s"no Iceberg metadata at $tableDir")
    val hint = metaDir.resolve("version-hint.text")
    val metaFile =
      if (Files.exists(hint)) {
        val v = new String(Files.readAllBytes(hint), "UTF-8").trim
        metaDir.resolve(s"v$v.metadata.json")
      } else {
        Manifest.withListing(metaDir)(_.filter(
          _.getFileName.toString.endsWith(".metadata.json")).toSeq)
          .sortBy(_.getFileName.toString).lastOption
          .getOrElse(throw new NoSuchElementException(
            s"no *.metadata.json under $metaDir"))
      }
    mapper.readTree(new String(Files.readAllBytes(metaFile), "UTF-8"))
  }

  private def toSparkType(t: String): DataType = t match {
    case "boolean" => BooleanType
    case "int" => IntegerType
    case "long" => LongType
    case "float" => FloatType
    case "double" => DoubleType
    case "string" => StringType
    case "binary" => BinaryType
    case "date" => DateType
    case "timestamp" => TimestampNTZType
    case "timestamptz" => TimestampType
    case dec if dec.startsWith("decimal(") =>
      val Array(p, s) = dec.stripPrefix("decimal(").stripSuffix(")")
        .split(",").map(_.trim.toInt)
      DecimalType(p, s)
    case other => throw new UnsupportedOperationException(
      s"Iceberg type '$other' out of this reader's scope")
  }

  private def toStructType(meta: JsonNode): StructType = {
    val schema =
      if (meta.has("schemas")) {
        val id = meta.path("current-schema-id").asInt(0)
        meta.get("schemas").elements().asScala
          .find(_.path("schema-id").asInt(-1) == id)
          .getOrElse(meta.get("schemas").get(0))
      } else meta.get("schema")
    StructType(schema.get("fields").elements().asScala.map { f =>
      val t = f.get("type")
      if (!t.isTextual) throw new UnsupportedOperationException(
        "nested Iceberg types out of this reader's scope")
      StructField(f.get("name").asText(), toSparkType(t.asText()),
        nullable = !f.path("required").asBoolean(false))
    }.toSeq)
  }

  /** Scan the current (or an explicit) snapshot of an Iceberg table. */
  def read(spark: SparkSession, tableDir: String,
      snapshotId: Option[Long] = None): DataFrame = {
    val meta = currentMetadata(tableDir)
    val schema = toStructType(meta)
    val wantId = snapshotId.getOrElse(meta.path("current-snapshot-id").asLong(-1))
    val snapshot = meta.get("snapshots").elements().asScala
      .find(_.path("snapshot-id").asLong(-2) == wantId)
      .getOrElse(throw new NoSuchElementException(
        s"snapshot $wantId not found in $tableDir"))
    val manifests = avroRecords(localPath(
      snapshot.get("manifest-list").asText()))
      .map(_.get("manifest_path").toString)
    val dataFiles = manifests.flatMap { m =>
      avroRecords(localPath(m)).flatMap { rec =>
        val status = rec.get("status").asInstanceOf[Int]
        if (status == 2) None // DELETED
        else {
          val df = rec.get("data_file").asInstanceOf[GenericRecord]
          val fmt = df.get("file_format").toString
          if (!fmt.equalsIgnoreCase("parquet"))
            throw new UnsupportedOperationException(
              s"Iceberg data file format $fmt out of scope")
          Some(localPath(df.get("file_path").toString))
        }
      }
    }
    if (dataFiles.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(dataFiles.sorted.distinct: _*)
  }

  // --------------------------------------------------------------------------
  // write path (append / overwrite, one snapshot per commit)
  // --------------------------------------------------------------------------

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

  private def writeAvro(path: Path, schema: Schema,
      rows: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new File(path.toString))
    try rows.foreach(w.append) finally w.close()
  }

  private def toIcebergType(t: DataType): String = t match {
    case BooleanType => "boolean"
    case IntegerType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case StringType => "string"
    case BinaryType => "binary"
    case DateType => "date"
    case TimestampNTZType => "timestamp"
    case TimestampType => "timestamptz"
    case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
    case other => throw new UnsupportedOperationException(
      s"Spark type $other out of this writer's Iceberg scope")
  }

  /** Append (or overwrite) `df` as one Iceberg snapshot; returns the new
    * snapshot id. Produces the same layout [[read]] consumes: parquet
    * under data/, one Avro manifest of ADDED files per commit, a
    * manifest list per snapshot (prior manifests carried on append),
    * versioned metadata JSON + version-hint. */
  def write(df: DataFrame, tableDir: String, mode: String = "append"): Long = {
    require(mode == "append" || mode == "overwrite", s"mode $mode")
    val metaDir = Paths.get(tableDir, "metadata")
    Files.createDirectories(metaDir)
    Files.createDirectories(Paths.get(tableDir, "data"))

    val (prevVersion, prevSnapshots, prevManifests) =
      if (Files.exists(metaDir.resolve("version-hint.text"))) {
        val meta = currentMetadata(tableDir)
        val v = new String(Files.readAllBytes(
          metaDir.resolve("version-hint.text")), "UTF-8").trim.toLong
        val snaps = meta.get("snapshots").elements().asScala.toSeq
          .map(s => (s.get("snapshot-id").asLong(),
            s.get("manifest-list").asText()))
        val currentId = meta.path("current-snapshot-id").asLong(-1)
        val currentList = snaps.find(_._1 == currentId).map(_._2)
        val manifests = currentList.toSeq.flatMap(ml =>
          avroRecords(localPath(ml)).map(_.get("manifest_path").toString))
        (v, snaps, manifests)
      } else (0L, Seq.empty[(Long, String)], Seq.empty[String])

    val version = prevVersion + 1
    val snapshotId = version * 100

    // Data files via Spark into a staging dir, moved under data/.
    val stage = Files.createTempDirectory(Paths.get(tableDir), ".stage")
    df.write.mode("overwrite").parquet(stage.toString)
    val parts = Manifest.withListing(stage)(_.filter(
      _.getFileName.toString.endsWith(".parquet")).toSeq).sortBy(_.toString)
    val moved = parts.zipWithIndex.map { case (p, i) =>
      val target = Paths.get(tableDir, "data",
        f"$snapshotId%d-$i%05d-${UUID.randomUUID()}.parquet")
      Files.move(p, target, StandardCopyOption.ATOMIC_MOVE)
      target.toString
    }
    val walk = Files.walk(stage)
    try walk.sorted(java.util.Comparator.reverseOrder[Path]())
      .iterator().asScala.foreach(Files.delete)
    finally walk.close()

    val entries = moved.map { p =>
      val d = new GenericData.Record(
        manifestEntrySchema.getField("data_file").schema())
      d.put("file_path", p)
      d.put("file_format", "PARQUET")
      d.put("record_count", 0L)
      val e = new GenericData.Record(manifestEntrySchema)
      e.put("status", 1) // ADDED
      e.put("data_file", d)
      e: GenericRecord
    }
    val manifestPath = metaDir.resolve(f"m-$snapshotId%d.avro")
    writeAvro(manifestPath, manifestEntrySchema, entries)

    val listManifests =
      (if (mode == "append") prevManifests else Seq.empty) :+
        manifestPath.toString
    val listPath = metaDir.resolve(f"ml-$snapshotId%d.avro")
    writeAvro(listPath, manifestFileSchema, listManifests.map { m =>
      val r = new GenericData.Record(manifestFileSchema)
      r.put("manifest_path", m)
      r: GenericRecord
    })

    val fields = df.schema.fields.zipWithIndex.map { case (f, i) =>
      s"""{"id": ${i + 1}, "name": "${f.name}", """ +
        s""""required": ${!f.nullable}, "type": "${toIcebergType(f.dataType)}"}"""
    }.mkString(", ")
    val snapshotsJson = (prevSnapshots :+
      (snapshotId, listPath.toString)).map { case (id, ml) =>
      s"""{"snapshot-id": $id, "manifest-list": "$ml"}"""
    }.mkString(", ")
    val metadata =
      s"""{
         |  "format-version": 2,
         |  "current-snapshot-id": $snapshotId,
         |  "schemas": [{"schema-id": 0, "type": "struct",
         |               "fields": [$fields]}],
         |  "current-schema-id": 0,
         |  "snapshots": [$snapshotsJson]
         |}""".stripMargin
    val tmp = Files.createTempFile(metaDir, ".tmp-meta", ".json")
    Files.write(tmp, metadata.getBytes("UTF-8"))
    Files.move(tmp, metaDir.resolve(s"v$version.metadata.json"),
      StandardCopyOption.ATOMIC_MOVE)
    val tmpHint = Files.createTempFile(metaDir, ".tmp-hint", ".txt")
    Files.write(tmpHint, version.toString.getBytes("UTF-8"))
    Files.move(tmpHint, metaDir.resolve("version-hint.text"),
      StandardCopyOption.ATOMIC_MOVE)
    snapshotId
  }
}
