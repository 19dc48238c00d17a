package graft.lake

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Minimal Delta Lake log interop — the reference reads Delta tables and
  * writes them (`/root/reference/CHANGELOG.md:25,27`); this container has
  * no Delta jars, but the Delta transaction log is just newline-delimited
  * JSON actions over parquet files, and Spark's own `StructType.json` IS
  * Delta's `schemaString` format. So the interop layer speaks the
  * protocol directly:
  *
  *   - `read` replays `_delta_log/%020d.json` in version order
  *     (add/remove actions → live file set, latest metaData → schema)
  *     and scans the surviving parquet with the declared schema.
  *   - `write` produces a log any Delta reader at protocol (1,2) accepts:
  *     parquet part files at the table root + a commit of add actions
  *     (plus protocol/metaData on the first commit, remove actions on
  *     overwrite).
  *
  * Scope: protocol (1,2) — no deletion vectors or column mapping;
  * `read` refuses tables that require them (higher minReaderVersion)
  * rather than mis-reading. Checkpoints ARE supported: replay starts
  * from the `_last_checkpoint`-named parquet checkpoint (single or
  * multi-part) and applies only newer JSON commits — real-world Delta
  * tables checkpoint every 10 commits and vacuum old JSON, so a
  * JSON-only reader cannot read any table older than a day.
  * Partitioned tables are supported on both sides: reads take partition
  * values from `add.partitionValues` (never parsed from paths) and
  * attach them as typed literal columns per file group; writes stage
  * with Spark's hive layout and emit the partition tuple of every file
  * into its add action.
  * At 100 TB the log replay is manifest-sized work, exactly like the
  * mooncake manifest; the data scan is the same pruned parquet scan.
  */
object DeltaCompat {

  private val mapper = new ObjectMapper()

  private def logDir(table: String): Path = Paths.get(table, "_delta_log")

  private def versionFile(table: String, v: Long): Path =
    logDir(table).resolve(f"$v%020d.json")

  /** All committed versions, ascending. */
  def versions(table: String): Seq[Long] = {
    val dir = logDir(table)
    if (!Files.isDirectory(dir)) return Seq.empty
    Manifest.withListing(dir)(_.map(_.getFileName.toString)
      .filter(_.matches("\\d{20}\\.json"))
      .map(_.stripSuffix(".json").toLong).toSeq).sorted
  }

  private case class AddFile(partitionValues: Map[String, Option[String]])

  private case class LogState(schemaJson: Option[String],
      partitionColumns: Seq[String],
      files: Map[String, AddFile]) // decoded path -> add info

  /** `_last_checkpoint` content: the checkpoint version and (for
    * multi-part checkpoints) the part count. */
  private def lastCheckpoint(table: String): Option[(Long, Int)] = {
    val f = logDir(table).resolve("_last_checkpoint")
    if (!Files.exists(f)) None
    else {
      val node = mapper.readTree(Files.readString(f))
      Some((node.get("version").asLong(), node.path("parts").asInt(1)))
    }
  }

  private def checkpointFiles(table: String, v: Long, parts: Int): Seq[Path] =
    if (parts <= 1) Seq(logDir(table).resolve(f"$v%020d.checkpoint.parquet"))
    else (1 to parts).map(p => logDir(table)
      .resolve(f"$v%020d.checkpoint.$p%010d.$parts%010d.parquet"))

  /** Load replay state from a parquet checkpoint: one row per action,
    * exactly one of the protocol/metaData/add/remove structs non-null.
    * Checkpoint rows are manifest metadata — collected driver-side like
    * the JSON replay; the data files they point at never move. */
  private def checkpointState(spark: SparkSession, table: String,
      v: Long, parts: Int): LogState = {
    val paths = checkpointFiles(table, v, parts)
    paths.filterNot(Files.exists(_)).foreach(p =>
      throw new IllegalStateException(
        s"$table: _last_checkpoint names missing file $p"))
    val df = spark.read.parquet(paths.map(_.toString): _*)
    val names = df.schema.fieldNames.toSet
    val cols = Seq("protocol", "metaData", "add").filter(names.contains)
    // ONE collect over the action columns: a checkpointed read is the
    // per-query hot path, and every extra Spark action here is a full
    // job-scheduling round trip for manifest-sized data.
    val rows = df.select(cols.map(df.col): _*).collect()
    val idx = cols.zipWithIndex.toMap
    var state = LogState(None, Seq.empty, Map.empty)
    for (r <- rows) {
      idx.get("protocol").filterNot(r.isNullAt).foreach { i =>
        val mrv = Option(r.getStruct(i).getAs[Integer]("minReaderVersion"))
          .fold(1)(_.intValue)
        if (mrv > 1) throw new UnsupportedOperationException(
          s"$table requires Delta reader version $mrv — only 1 supported")
      }
      idx.get("metaData").filterNot(r.isNullAt).foreach { i =>
        val md = r.getStruct(i)
        val pcIdx = md.fieldIndex("partitionColumns")
        state = state.copy(
          schemaJson = Option(md.getAs[String]("schemaString")),
          partitionColumns =
            if (md.isNullAt(pcIdx)) Seq.empty
            else md.getSeq[String](pcIdx).toSeq)
      }
      // A checkpoint's add set IS the live file set at its version
      // (remove rows are only vacuum tombstones — not applied to
      // liveness). Map values may be null for null partitions.
      idx.get("add").filterNot(r.isNullAt).foreach { i =>
        val a = r.getStruct(i)
        val pvIdx = a.fieldIndex("partitionValues")
        val pv =
          if (a.isNullAt(pvIdx)) Map.empty[String, Option[String]]
          else a.getMap[String, String](pvIdx).toMap
            .map { case (k, value) => k -> Option(value) }
        state = state.copy(files = state.files +
          (PathCodec.percentDecode(a.getAs[String]("path")) -> AddFile(pv)))
      }
    }
    state
  }

  private def replay(spark: SparkSession, table: String,
      upTo: Option[Long]): LogState = {
    // Start from the checkpoint when one exists and the requested
    // version is not older than it; JSON commits before the checkpoint
    // may already be vacuumed, so time travel behind it only requires
    // the pre-checkpoint JSON to still exist.
    val lastCp = lastCheckpoint(table)
    val cp = lastCp.filter { case (v, _) => upTo.forall(v <= _) }
    val vs = versions(table)
    if (vs.isEmpty && cp.isEmpty)
      throw new NoSuchElementException(s"no Delta log at $table")
    val after = cp.map(_._1).getOrElse(-1L)
    // Refuse-over-misread: the JSON being replayed must be CONTIGUOUS
    // from the replay base to the target version — a gap (vacuumed or
    // lost commits) replayed silently would return a state that never
    // existed. Without a usable checkpoint the base is v0.
    val target = upTo.getOrElse((vs ++ cp.map(_._1)).max)
    val needed = (after + 1) to target
    val have = vs.toSet
    val missing = needed.filterNot(have)
    if (missing.nonEmpty)
      throw new UnsupportedOperationException(
        s"$table: commits ${missing.take(3).mkString(", ")}" +
          (if (missing.size > 3) ", …" else "") +
          s" missing for replay to v$target" +
          (if (cp.isEmpty && lastCp.nonEmpty)
            " (they predate the checkpoint and were vacuumed)" else ""))
    var state = cp.map { case (v, parts) =>
      checkpointState(spark, table, v, parts)
    }.getOrElse(LogState(None, Seq.empty, Map.empty))
    for (v <- vs if v > after && upTo.forall(v <= _)) {
      val lines = Files.readAllLines(versionFile(table, v)).asScala
      for (line <- lines if line.trim.nonEmpty) {
        val node = mapper.readTree(line)
        if (node.has("protocol")) {
          val mrv = node.get("protocol").path("minReaderVersion").asInt(1)
          if (mrv > 1) throw new UnsupportedOperationException(
            s"$table requires Delta reader version $mrv — only 1 supported")
        }
        if (node.has("metaData")) {
          val md = node.get("metaData")
          state = state.copy(
            schemaJson = Some(md.get("schemaString").asText()),
            partitionColumns = md.path("partitionColumns").elements()
              .asScala.map(_.asText()).toSeq)
        }
        // Per the Delta spec, add/remove paths are percent-encoded
        // relative paths — decode before resolving against the root.
        if (node.has("add")) {
          val a = node.get("add")
          val pv = a.path("partitionValues").properties().asScala
            .map(e => e.getKey ->
              (if (e.getValue.isNull) None else Some(e.getValue.asText())))
            .toMap
          state = state.copy(files = state.files +
            (PathCodec.percentDecode(a.get("path").asText()) -> AddFile(pv)))
        }
        if (node.has("remove"))
          state = state.copy(files = state.files -
            PathCodec.percentDecode(node.get("remove").get("path").asText()))
      }
    }
    state
  }

  /** Read the table head (or an explicit version — time travel).
    *
    * Partition-column values live only in `add.partitionValues` (the
    * parquet data files do not contain them), so partitioned tables are
    * read as: group the live files by partition tuple, scan each group
    * with the data-column schema, attach the partition values as typed
    * literal columns, and union in the declared column order. The
    * grouping count is the table's live-partition count — manifest-sized
    * driver work, same as the log replay itself. */
  def read(spark: SparkSession, table: String,
      version: Option[Long] = None): DataFrame = {
    val state = replay(spark, table, version)
    val schema = DataType.fromJson(state.schemaJson.getOrElse(
      throw new IllegalStateException(s"$table has no metaData action")))
      .asInstanceOf[StructType]
    def emptyDf = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    if (state.partitionColumns.isEmpty) {
      val paths = state.files.keys.map(p => Paths.get(table, p).toString).toSeq
      if (paths.isEmpty) emptyDf
      else spark.read.schema(schema).parquet(paths.sorted: _*)
    } else {
      import org.apache.spark.sql.functions.{col, lit}
      val partCols = state.partitionColumns
      val dataSchema = StructType(
        schema.filterNot(f => partCols.contains(f.name)))
      val partType = schema.fields.map(f => f.name -> f.dataType).toMap
      val groups = state.files.toSeq
        .groupBy { case (_, add) => partCols.map(add.partitionValues.get) }
        .toSeq.sortBy(_._1.toString)
      val parts = groups.map { case (_, files) =>
        val pv = files.head._2.partitionValues
        val paths = files.map(f => Paths.get(table, f._1).toString).sorted
        val base = spark.read.schema(dataSchema).parquet(paths: _*)
        val withParts = partCols.foldLeft(base) { (df, c) =>
          val v = pv.getOrElse(c, None)
          df.withColumn(c,
            v.map(lit(_)).getOrElse(lit(null)).cast(partType(c)))
        }
        withParts.select(schema.fieldNames.map(col).toSeq: _*)
      }
      if (parts.isEmpty) emptyDf else LakeFs.unionAll(parts)
    }
  }

  // replay keys are DECODED paths; the log stores percent-encoded
  // paths (per segment — '/' separators stay) so the next replay's
  // decode round-trips exactly.
  private def encodePath(p: String): String =
    p.split("/", -1).map(PathCodec.percentEncode).mkString("/")

  /** Append (or overwrite) `df` as one Delta commit. `partitionBy`
    * hive-partitions the table (identity partitioning — the only kind
    * Delta has); an existing table's partitioning is inherited and a
    * conflicting spec is refused. Returns the new version. */
  def write(df: DataFrame, table: String,
      mode: String = "append", partitionBy: Seq[String] = Seq.empty): Long = {
    require(mode == "append" || mode == "overwrite", s"mode $mode")
    val root = Paths.get(table)
    Files.createDirectories(root)
    // JSON commits at or before a checkpoint may be vacuumed — the next
    // version is one past the max of surviving JSON and the checkpoint.
    val version = (versions(table) ++ lastCheckpoint(table).map(_._1))
      .maxOption.map(_ + 1).getOrElse(0L)
    val priorState =
      if (version > 0L) Some(replay(df.sparkSession, table, None)) else None
    val partCols = priorState.map(_.partitionColumns) match {
      case Some(existing) =>
        require(partitionBy.isEmpty || partitionBy == existing,
          s"$table is partitioned by (${existing.mkString(", ")}) — " +
            s"cannot write with (${partitionBy.mkString(", ")})")
        existing
      case None => partitionBy
    }
    require(partCols.forall(df.columns.contains),
      s"partition columns (${partCols.mkString(", ")}) missing from input")

    // Stage part files via Spark (hive layout when partitioned), then
    // move them under the table root keeping their partition dirs.
    val tmp = Files.createTempDirectory(root, ".stage")
    val stage = df.write.mode("overwrite")
    (if (partCols.nonEmpty) stage.partitionBy(partCols: _*) else stage)
      .parquet(tmp.toString)
    val parts = LakeFs.parquetFilesUnder(tmp)
    // (relative decoded path, size, partition tuple) per moved file
    val added = parts.zipWithIndex.map { case (p, i) =>
      val rel = tmp.relativize(p)
      val dirSegs = (0 until rel.getNameCount - 1)
        .map(rel.getName(_).toString)
      val pv = dirSegs.map(PathCodec.parseHiveSegment)
      val name = f"part-$i%05d-${UUID.randomUUID()}-c000.snappy.parquet"
      val targetDir = dirSegs.foldLeft(root)(_ resolve _)
      Files.createDirectories(targetDir)
      val target = targetDir.resolve(name)
      Files.move(p, target, StandardCopyOption.ATOMIC_MOVE)
      ((dirSegs :+ name).mkString("/"), Files.size(target), pv)
    }
    LakeFs.deleteRec(tmp)

    val now = System.currentTimeMillis()
    val actions = Seq.newBuilder[ObjectNode]
    if (version == 0L) {
      val protocol = mapper.createObjectNode()
      protocol.putObject("protocol")
        .put("minReaderVersion", 1).put("minWriterVersion", 2)
      actions += protocol
      val meta = mapper.createObjectNode()
      val m = meta.putObject("metaData")
      m.put("id", UUID.randomUUID().toString)
      m.putObject("format").put("provider", "parquet")
        .putObject("options")
      m.put("schemaString", df.schema.json)
      val pcArr = m.putArray("partitionColumns")
      partCols.foreach(pcArr.add)
      m.putObject("configuration")
      m.put("createdTime", now)
      actions += meta
    }
    if (mode == "overwrite" && version > 0L) {
      priorState.map(_.files.keys.toSeq).getOrElse(Seq.empty)
        .sorted.foreach { p =>
        val rm = mapper.createObjectNode()
        rm.putObject("remove").put("path", encodePath(p))
          .put("deletionTimestamp", now).put("dataChange", true)
        actions += rm
      }
    }
    added.foreach { case (relPath, size, pv) =>
      val add = mapper.createObjectNode()
      val a = add.putObject("add").put("path", encodePath(relPath))
        .put("size", size)
        .put("modificationTime", now).put("dataChange", true)
      val pvNode = a.putObject("partitionValues")
      pv.foreach { case (k, v) =>
        v.fold[Unit](pvNode.putNull(k))(pvNode.put(k, _))
      }
      actions += add
    }

    Files.createDirectories(logDir(table))
    val target = versionFile(table, version)
    if (Files.exists(target))
      throw new IllegalStateException(
        s"Delta version $version already exists (concurrent writer?)")
    val tmpLog = Files.createTempFile(logDir(table), ".tmp", ".json")
    Files.write(tmpLog, actions.result().map(mapper.writeValueAsString)
      .mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmpLog, target, StandardCopyOption.ATOMIC_MOVE)
    version
  }

  /** Write a parquet checkpoint of the table head and point
    * `_last_checkpoint` at it — what a Delta writer does every 10
    * commits so readers replay O(1) JSON files instead of the whole
    * history (and old JSON can be vacuumed). One row per action:
    * protocol, metaData, and one add per live file. Returns the
    * checkpointed version. */
  def checkpoint(spark: SparkSession, table: String): Long = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val vs = versions(table)
    val cpPrior = lastCheckpoint(table).map(_._1)
    val version = (vs ++ cpPrior).maxOption.getOrElse(
      throw new NoSuchElementException(s"no Delta log at $table"))
    val state = replay(spark, table, None)
    val schemaJson = state.schemaJson.getOrElse(
      throw new IllegalStateException(s"$table has no metaData action"))

    val protocolT = StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType)))
    val formatT = StructType(Seq(
      StructField("provider", StringType),
      StructField("options", MapType(StringType, StringType))))
    val metaT = StructType(Seq(
      StructField("id", StringType),
      StructField("format", formatT),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType)),
      StructField("createdTime", LongType)))
    val addT = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues",
        MapType(StringType, StringType, valueContainsNull = true)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType)))
    val rowT = StructType(Seq(
      StructField("protocol", protocolT),
      StructField("metaData", metaT),
      StructField("add", addT)))

    val now = System.currentTimeMillis()
    val rows = Seq(
      Row(Row(1, 2), null, null),
      Row(null, Row(UUID.randomUUID().toString,
        Row("parquet", Map.empty[String, String]), schemaJson,
        state.partitionColumns, Map.empty[String, String], now), null)) ++
      state.files.toSeq.sortBy(_._1).map { case (path, add) =>
        // A live file that cannot be stat'ed means the table is already
        // corrupt — fail NOW, not after the JSON that could explain it
        // has been vacuumed and the checkpoint is the only truth.
        val onDisk = Paths.get(table, path)
        if (!Files.exists(onDisk))
          throw new IllegalStateException(
            s"$table: live file $path missing on disk — refusing to " +
              "checkpoint a corrupt table")
        Row(null, null, Row(encodePath(path),
          add.partitionValues.map { case (k, v) => k -> v.orNull },
          Files.size(onDisk), now, true))
      }
    // One checkpoint file: the action list is manifest-sized. (Readers
    // handle multi-part checkpoints; writing them only matters once the
    // manifest itself outgrows one parquet file.)
    val tmp = Files.createTempDirectory(Paths.get(table), ".ckpt")
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), rowT)
      .write.mode("overwrite").parquet(tmp.toString)
    val part = Manifest.withListing(tmp)(_.find(
      _.getFileName.toString.endsWith(".parquet")).get)
    val target = logDir(table).resolve(f"$version%020d.checkpoint.parquet")
    Files.move(part, target, StandardCopyOption.REPLACE_EXISTING)
    LakeFs.deleteRec(tmp)
    val lcTmp = Files.createTempFile(logDir(table), ".tmp", ".json")
    Files.write(lcTmp,
      s"""{"version":$version,"size":${rows.size}}"""
        .getBytes(StandardCharsets.UTF_8))
    Files.move(lcTmp, logDir(table).resolve("_last_checkpoint"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    version
  }
}
