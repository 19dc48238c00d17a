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
  * Scope: protocol (1,2) — no checkpoints, deletion vectors, or column
  * mapping; `read` refuses tables that require them rather than
  * mis-reading (`_last_checkpoint` present, or higher minReaderVersion).
  * Partitioned tables are supported on the read side: partition values
  * are taken from `add.partitionValues` (never parsed from paths) and
  * attached as typed literal columns per file group.
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

  private def replay(table: String, upTo: Option[Long]): LogState = {
    val checkpoint = logDir(table).resolve("_last_checkpoint")
    if (Files.exists(checkpoint))
      throw new UnsupportedOperationException(
        s"$table uses Delta checkpoints — out of this reader's protocol scope")
    val vs = versions(table)
    if (vs.isEmpty)
      throw new NoSuchElementException(s"no Delta log at $table")
    var state = LogState(None, Seq.empty, Map.empty)
    for (v <- vs if upTo.forall(v <= _)) {
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
    val state = replay(table, version)
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
      // balanced union: O(log P) plan depth instead of a P-deep
      // left-leaning tree whose analysis cost is quadratic in the
      // live-partition count
      def unionAll(dfs: Seq[DataFrame]): DataFrame =
        if (dfs.lengthCompare(1) == 0) dfs.head
        else unionAll(dfs.grouped(2)
          .map(g => g.reduce(_ unionByName _)).toSeq)
      if (parts.isEmpty) emptyDf else unionAll(parts)
    }
  }

  /** Append (or overwrite) `df` as one Delta commit. Returns the new
    * version. */
  def write(df: DataFrame, table: String,
      mode: String = "append"): Long = {
    require(mode == "append" || mode == "overwrite", s"mode $mode")
    val root = Paths.get(table)
    Files.createDirectories(root)
    val prior = versions(table)
    val version = prior.lastOption.map(_ + 1).getOrElse(0L)
    // This writer emits add actions with empty partitionValues — writing
    // into a PARTITIONED table would silently null its partition columns
    // on every read (ours and real Delta readers alike). Refuse, per the
    // file's refuse-over-misread contract.
    val priorState = if (version > 0L) Some(replay(table, None)) else None
    priorState.map(_.partitionColumns).filter(_.nonEmpty).foreach { pc =>
      throw new UnsupportedOperationException(
        s"$table is partitioned (${pc.mkString(", ")}) — this " +
          "writer only writes unpartitioned tables")
    }

    // Write part files via Spark into a temp dir, then move them to the
    // table root under fresh UUID names (Delta layout).
    val tmp = Files.createTempDirectory(root, ".stage")
    df.write.mode("overwrite").parquet(tmp.toString)
    val parts = Manifest.withListing(tmp)(_.filter(
      _.getFileName.toString.endsWith(".parquet")).toSeq).sortBy(_.toString)
    val added = parts.zipWithIndex.map { case (p, i) =>
      val name = f"part-$i%05d-${UUID.randomUUID()}-c000.snappy.parquet"
      val target = root.resolve(name)
      Files.move(p, target, StandardCopyOption.ATOMIC_MOVE)
      name -> Files.size(target)
    }
    val walk = Files.walk(tmp)
    try walk.sorted(java.util.Comparator.reverseOrder[Path]())
      .iterator().asScala.foreach(Files.delete)
    finally walk.close()

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
      m.putArray("partitionColumns")
      m.putObject("configuration")
      m.put("createdTime", now)
      actions += meta
    }
    if (mode == "overwrite" && version > 0L) {
      // replay keys are DECODED paths; the log stores percent-encoded
      // paths (per segment — '/' separators stay) so the next replay's
      // decode round-trips exactly.
      def encodePath(p: String): String =
        p.split("/", -1).map(PathCodec.percentEncode).mkString("/")
      priorState.map(_.files.keys.toSeq).getOrElse(Seq.empty)
        .sorted.foreach { p =>
        val rm = mapper.createObjectNode()
        rm.putObject("remove").put("path", encodePath(p))
          .put("deletionTimestamp", now).put("dataChange", true)
        actions += rm
      }
    }
    added.foreach { case (name, size) =>
      val add = mapper.createObjectNode()
      add.putObject("add").put("path", name).put("size", size)
        .put("modificationTime", now).put("dataChange", true)
        .putObject("partitionValues")
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
}
