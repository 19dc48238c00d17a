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

  /** Attach Iceberg `field-id` props (numeric, as the spec's Avro schema
    * mapping requires) to every field of a record schema. */
  private def withFieldIds(schema: Schema, ids: Map[String, Int]): Schema = {
    schema.getFields.asScala.foreach(f =>
      ids.get(f.name).foreach(id => f.addProp("field-id", id: Integer)))
    schema
  }

  /** manifest_entry per spec v2: status + inheritance-eligible ids written
    * explicitly + the required data_file struct (content, path, format,
    * partition, record_count, file_size_in_bytes). The `partition` field
    * is the empty struct `r102` — this writer only emits unpartitioned
    * data (the reader refuses partitioned tables likewise). */
  private val manifestEntrySchema: Schema = {
    val dataFile = withFieldIds(SchemaBuilder.record("data_file").fields()
      .requiredInt("content")
      .requiredString("file_path")
      .requiredString("file_format")
      .name("partition").`type`(
        SchemaBuilder.record("r102").fields().endRecord()).noDefault()
      .requiredLong("record_count")
      .requiredLong("file_size_in_bytes")
      .endRecord(),
      Map("content" -> 134, "file_path" -> 100, "file_format" -> 101,
        "partition" -> 102, "record_count" -> 103,
        "file_size_in_bytes" -> 104))
    withFieldIds(SchemaBuilder.record("manifest_entry").fields()
      .requiredInt("status")
      .requiredLong("snapshot_id")
      .requiredLong("sequence_number")
      .requiredLong("file_sequence_number")
      .name("data_file").`type`(dataFile).noDefault()
      .endRecord(),
      Map("status" -> 0, "snapshot_id" -> 1, "sequence_number" -> 3,
        "file_sequence_number" -> 4, "data_file" -> 2))
  }

  /** manifest_file per spec v2 (manifest-list entry): path, length,
    * spec id, content, sequence numbers, added snapshot, file and row
    * counts — everything a real reader resolves before opening the
    * manifest. */
  private val manifestFileSchema: Schema = withFieldIds(SchemaBuilder
    .record("manifest_file").fields()
    .requiredString("manifest_path")
    .requiredLong("manifest_length")
    .requiredInt("partition_spec_id")
    .requiredInt("content")
    .requiredLong("sequence_number")
    .requiredLong("min_sequence_number")
    .requiredLong("added_snapshot_id")
    .requiredInt("added_files_count")
    .requiredInt("existing_files_count")
    .requiredInt("deleted_files_count")
    .requiredLong("added_rows_count")
    .requiredLong("existing_rows_count")
    .requiredLong("deleted_rows_count")
    .endRecord(),
    Map("manifest_path" -> 500, "manifest_length" -> 501,
      "partition_spec_id" -> 502, "content" -> 517,
      "sequence_number" -> 515, "min_sequence_number" -> 516,
      "added_snapshot_id" -> 503, "added_files_count" -> 504,
      "existing_files_count" -> 505, "deleted_files_count" -> 506,
      "added_rows_count" -> 512, "existing_rows_count" -> 513,
      "deleted_rows_count" -> 514))

  private def writeAvro(path: Path, schema: Schema,
      rows: Seq[GenericRecord], meta: Map[String, String] = Map.empty): Unit = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    meta.foreach { case (k, v) => w.setMeta(k, v) }
    w.create(schema, new File(path.toString))
    try rows.foreach(w.append) finally w.close()
  }

  /** Row count from the parquet footer — metadata-only, no data scan
    * (how real Iceberg collects commit stats). */
  private def parquetRowCount(p: Path): Long =
    Manifest.withFooter(p)(_.getBlocks.asScala.map(_.getRowCount).sum)

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
    * snapshot id. Produces a spec-complete v2 layout — parquet under
    * data/, one Avro manifest of ADDED files per commit (real record
    * counts and byte sizes from the parquet footers, field-id'd Avro
    * schema, schema/spec key-value metadata), a manifest list per
    * snapshot carrying lengths, sequence numbers and file/row counts
    * (prior manifests carried on append), and versioned metadata JSON
    * with location / table-uuid / last-column-id / partition-specs /
    * sort-orders / snapshot summaries + version-hint. */
  def write(df: DataFrame, tableDir: String, mode: String = "append"): Long = {
    require(mode == "append" || mode == "overwrite", s"mode $mode")
    val metaDir = Paths.get(tableDir, "metadata")
    Files.createDirectories(metaDir)
    Files.createDirectories(Paths.get(tableDir, "data"))

    // A table with metadata but no version-hint is an EXTERNAL layout
    // (our writer always emits the hint): its metadata file names don't
    // follow our vN scheme, so continuing would silently rename over the
    // current metadata and orphan every existing file. Refuse.
    val hasHint = Files.exists(metaDir.resolve("version-hint.text"))
    if (!hasHint && Manifest.withListing(metaDir)(_.exists(
        _.getFileName.toString.endsWith(".metadata.json"))))
      throw new UnsupportedOperationException(
        s"$tableDir has Iceberg metadata but no version-hint.text — " +
          "refusing to write into an externally-managed table")
    val prior = if (hasHint) Some(currentMetadata(tableDir)) else None
    // No schema evolution: carried snapshots/manifests were written
    // under the prior schema, and this metadata keeps exactly one
    // schema entry — a drifted append/overwrite would misread them.
    prior.map(toStructType).foreach { prev =>
      val now = StructType(df.schema.fields.map(f =>
        StructField(f.name, f.dataType, f.nullable)))
      val was = StructType(prev.fields.map(f =>
        StructField(f.name, f.dataType, f.nullable)))
      if (now != was)
        throw new UnsupportedOperationException(
          s"schema mismatch writing $tableDir: table has ${was.toDDL}, " +
            s"DataFrame has ${now.toDDL} — schema evolution is out of " +
            "this writer's scope")
    }
    val prevVersion = prior.map(_ => new String(Files.readAllBytes(
      metaDir.resolve("version-hint.text")), "UTF-8").trim.toLong)
      .getOrElse(0L)
    val tableUuid = prior.flatMap(m => Option(m.get("table-uuid"))
      .map(_.asText())).getOrElse(UUID.randomUUID().toString)
    val lastSeq = prior.map(_.path("last-sequence-number").asLong(0L))
      .getOrElse(0L)
    val prevSnapshotNodes = prior.toSeq.flatMap(
      _.path("snapshots").elements().asScala.toSeq)
    val parentId = prior.map(_.path("current-snapshot-id").asLong(-1L))
      .getOrElse(-1L)
    val prevManifestRecords: Seq[GenericRecord] =
      prevSnapshotNodes.find(_.path("snapshot-id").asLong(-2) == parentId)
        .map(_.get("manifest-list").asText())
        .toSeq.flatMap(ml => avroRecords(localPath(ml)))

    val version = prevVersion + 1
    val snapshotId = version * 100
    val sequenceNumber = lastSeq + 1

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

    // Iceberg schema JSON (shared by the metadata file and the manifest
    // Avro's key-value metadata).
    val schemaNode = mapper.createObjectNode()
    schemaNode.put("type", "struct")
    schemaNode.put("schema-id", 0)
    val fieldsArr = schemaNode.putArray("fields")
    df.schema.fields.zipWithIndex.foreach { case (f, i) =>
      val fn = fieldsArr.addObject()
      fn.put("id", i + 1)
      fn.put("name", f.name)
      fn.put("required", !f.nullable)
      fn.put("type", toIcebergType(f.dataType))
    }
    val schemaJson = mapper.writeValueAsString(schemaNode)

    val dataFileSchema = manifestEntrySchema.getField("data_file").schema()
    val entriesWithRows = moved.map { p =>
      val path = Paths.get(p)
      val rows = parquetRowCount(path)
      val d = new GenericData.Record(dataFileSchema)
      d.put("content", 0) // DATA
      d.put("file_path", p)
      d.put("file_format", "PARQUET")
      d.put("partition",
        new GenericData.Record(dataFileSchema.getField("partition").schema()))
      d.put("record_count", rows)
      d.put("file_size_in_bytes", Files.size(path))
      val e = new GenericData.Record(manifestEntrySchema)
      e.put("status", 1) // ADDED
      e.put("snapshot_id", snapshotId)
      e.put("sequence_number", sequenceNumber)
      e.put("file_sequence_number", sequenceNumber)
      e.put("data_file", d)
      (e: GenericRecord, rows)
    }
    val manifestPath = metaDir.resolve(f"m-$snapshotId%d.avro")
    writeAvro(manifestPath, manifestEntrySchema, entriesWithRows.map(_._1),
      Map("schema" -> schemaJson, "partition-spec" -> "[]",
        "partition-spec-id" -> "0", "format-version" -> "2",
        "content" -> "data"))

    // Carry prior manifest-list entries on append; entries written by a
    // pre-upgrade layout get their length recomputed and neutral counts.
    def carry(r: GenericRecord): GenericRecord = {
      // default is by-name: current-layout entries always carry the
      // field, so fallbacks (a filesystem stat per manifest) only run
      // for pre-upgrade tables
      def num(f: String, d: => Long): Long =
        if (r.getSchema.getField(f) == null) d
        else r.get(f) match {
          case l: java.lang.Long => l.longValue
          case i: java.lang.Integer => i.longValue
          case _ => d
        }
      val mPath = r.get("manifest_path").toString
      val n = new GenericData.Record(manifestFileSchema)
      n.put("manifest_path", mPath)
      n.put("manifest_length",
        num("manifest_length", Files.size(Paths.get(localPath(mPath)))))
      n.put("partition_spec_id", num("partition_spec_id", 0L).toInt)
      n.put("content", num("content", 0L).toInt)
      n.put("sequence_number", num("sequence_number", 0L))
      n.put("min_sequence_number", num("min_sequence_number", 0L))
      n.put("added_snapshot_id", num("added_snapshot_id", parentId))
      n.put("added_files_count", num("added_files_count", 0L).toInt)
      n.put("existing_files_count", num("existing_files_count", 0L).toInt)
      n.put("deleted_files_count", num("deleted_files_count", 0L).toInt)
      n.put("added_rows_count", num("added_rows_count", 0L))
      n.put("existing_rows_count", num("existing_rows_count", 0L))
      n.put("deleted_rows_count", num("deleted_rows_count", 0L))
      n
    }
    val newListEntry = {
      val r = new GenericData.Record(manifestFileSchema)
      r.put("manifest_path", manifestPath.toString)
      r.put("manifest_length", Files.size(manifestPath))
      r.put("partition_spec_id", 0)
      r.put("content", 0) // data manifests
      r.put("sequence_number", sequenceNumber)
      r.put("min_sequence_number", sequenceNumber)
      r.put("added_snapshot_id", snapshotId)
      r.put("added_files_count", entriesWithRows.size)
      r.put("existing_files_count", 0)
      r.put("deleted_files_count", 0)
      r.put("added_rows_count", entriesWithRows.map(_._2).sum)
      r.put("existing_rows_count", 0L)
      r.put("deleted_rows_count", 0L)
      r: GenericRecord
    }
    val listPath = metaDir.resolve(f"ml-$snapshotId%d.avro")
    val listRecords =
      (if (mode == "append") prevManifestRecords.map(carry)
       else Seq.empty) :+ newListEntry
    writeAvro(listPath, manifestFileSchema, listRecords,
      Map("format-version" -> "2"))

    val now = System.currentTimeMillis()
    val root = mapper.createObjectNode()
    root.put("format-version", 2)
    root.put("table-uuid", tableUuid)
    root.put("location", Paths.get(tableDir).toAbsolutePath.toString)
    root.put("last-sequence-number", sequenceNumber)
    root.put("last-updated-ms", now)
    root.put("last-column-id", df.schema.length)
    root.put("current-schema-id", 0)
    root.putArray("schemas").add(schemaNode)
    root.put("default-spec-id", 0)
    val spec0 = root.putArray("partition-specs").addObject()
    spec0.put("spec-id", 0)
    spec0.putArray("fields")
    root.put("last-partition-id", 999)
    root.put("default-sort-order-id", 0)
    val order0 = root.putArray("sort-orders").addObject()
    order0.put("order-id", 0)
    order0.putArray("fields")
    root.put("current-snapshot-id", snapshotId)
    val snaps = root.putArray("snapshots")
    prevSnapshotNodes.foreach(snaps.add)
    val sn = snaps.addObject()
    sn.put("snapshot-id", snapshotId)
    if (parentId >= 0) sn.put("parent-snapshot-id", parentId)
    sn.put("sequence-number", sequenceNumber)
    sn.put("timestamp-ms", now)
    sn.put("manifest-list", listPath.toString)
    sn.put("schema-id", 0)
    sn.putObject("summary").put("operation", mode)

    val tmp = Files.createTempFile(metaDir, ".tmp-meta", ".json")
    Files.write(tmp, mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(root).getBytes("UTF-8"))
    Files.move(tmp, metaDir.resolve(s"v$version.metadata.json"),
      StandardCopyOption.ATOMIC_MOVE)
    val tmpHint = Files.createTempFile(metaDir, ".tmp-hint", ".txt")
    Files.write(tmpHint, version.toString.getBytes("UTF-8"))
    Files.move(tmpHint, metaDir.resolve("version-hint.text"),
      StandardCopyOption.ATOMIC_MOVE)
    snapshotId
  }
}
