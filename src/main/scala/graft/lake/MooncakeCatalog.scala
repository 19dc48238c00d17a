package graft.lake

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier => CatIdent, _}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.InMemoryFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 catalog that makes mirror tables SQL-NAMED — the
  * reference's entire daily UX is `SELECT * FROM c` against a mirror
  * (`/root/reference/tests/pg_regress/sql/sanity.sql:6`; the AM
  * registration at `/root/reference/src/table.rs:62-74` exists only to
  * make the bare name resolve). Registered per session:
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.mooncake",
  *   "graft.lake.MooncakeCatalog")
  * spark.conf.set("spark.sql.catalog.mooncake.warehouse", "/wh")
  * spark.sql("SELECT * FROM mooncake.main.t WHERE k > 5")   // pruned
  * spark.sql("SELECT * FROM mooncake.main.t VERSION AS OF 1")
  * spark.sql("SELECT * FROM mooncake.main.t TIMESTAMP AS OF '...'")
  * }}}
  *
  * Reads resolve through the SAME manifest machinery as the API
  * ([[Mooncake.read]]/[[Mooncake.readVersion]]): the scan builder takes
  * Spark's pushed data filters, prunes manifest files through
  * [[Mooncake.pruneFiles]] (range conjuncts vs per-file footer stats),
  * and hands the surviving file list to Spark's OWN vectorized
  * [[ParquetScan]] — whole-stage codegen, row-group stats pushdown and
  * column pruning all come from the stock parquet path; this catalog
  * adds only name resolution, time travel, and manifest file skipping.
  * At 100 TB the skipping happens on driver-side manifest metadata
  * before a single footer is opened.
  *
  * Mutation stays CDC-only (the table-AM contract): CREATE/ALTER/RENAME
  * via SQL refuse loudly; DROP TABLE maps to [[Mooncake.dropTable]].
  */
class MooncakeCatalog extends TableCatalog {

  private var catalogName: String = _
  private var lake: Mooncake = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val wh = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"spark.sql.catalog.$name.warehouse must point at the mooncake " +
          "warehouse directory"))
    // `spark.sql.catalog.<name>.database` scopes the catalog's one-part
    // namespaces to that database (the reference's ambient DATABASE —
    // a pg session only sees its own db's tables); default `main`.
    lake = new Mooncake(wh,
      Option(options.get("database")).getOrElse("main"))
  }

  override def name(): String = catalogName

  /** `mooncake.t` → bare name (Identifier.parse applies the session's
    * current-schema rule, same as the API); `mooncake.s.t` → qualified.
    * Parts arrive ALREADY RESOLVED from Spark's SQL parser, so each is
    * re-quoted before the lexical parse — feeding them raw would
    * lowercase a mixed-case name a second time (and a dotted name would
    * mis-split), making quoted-name mirrors unreachable. */
  private def quoted(part: String): String =
    "\"" + part.replace("\"", "\"\"") + "\""

  /** Namespace levels: `mooncake.t` → catalog database, default schema;
    * `mooncake.s.t` → catalog database, schema s; `mooncake.d.s.t` →
    * database d, schema s — the second level the reference gets for
    * free from Postgres (connect to another db) and this catalog gets
    * by re-scoping the SAME warehouse. Returns the database-scoped lake
    * plus the in-database `schema.table` name. */
  private def scoped(ident: CatIdent): (Mooncake, String) =
    ident.namespace match {
      case Array() => (lake, quoted(ident.name))
      case Array(schema) =>
        (lake, s"${quoted(schema)}.${quoted(ident.name)}")
      case Array(db, schema) =>
        (lake.inDatabase(db),
          s"${quoted(schema)}.${quoted(ident.name)}")
      case parts => throw new NoSuchTableException(
        (parts :+ ident.name).toSeq)
    }

  private def exists(l: Mooncake, name: String): Boolean =
    try { l.currentManifest(name); true }
    catch { case _: NoSuchElementException => false }

  /** As-typed (quoted-exact) name when that mirror exists, else the
    * LOWERCASED form — the reference's unquoted-identifier folding:
    * unquoted SQL stays case-insensitive while quoted mixed-case
    * mirrors still resolve exactly. Database names fold with the same
    * rule (the db directory name is the decoded identifier). */
  private def resolve(ident: CatIdent): (Mooncake, String) = {
    val (l, exact) = scoped(ident)
    if (exists(l, exact)) (l, exact)
    else {
      val (lf, folded) = scoped(CatIdent.of(
        ident.namespace.map(_.toLowerCase), ident.name.toLowerCase))
      if (exists(lf, folded)) (lf, folded) else (l, exact)
    }
  }

  private def load(ident: CatIdent)(m: (Mooncake, String) => Manifest)
      : Table =
    try {
      val (l, name) = resolve(ident)
      MooncakeTable(name, m(l, name))
    } catch {
      case _: NoSuchElementException =>
        throw new NoSuchTableException(
          (ident.namespace :+ ident.name).toSeq)
    }

  override def loadTable(ident: CatIdent): Table =
    load(ident)((l, n) => l.currentManifest(n))

  /** `VERSION AS OF <v>` — an explicit manifest version. */
  override def loadTable(ident: CatIdent, version: String): Table = {
    val v = version.toLongOption.getOrElse(
      throw new IllegalArgumentException(
        s"mooncake versions are numeric manifest versions, got '$version'"))
    load(ident)((l, n) => l.manifestAt(n, v))
  }

  /** `TIMESTAMP AS OF <t>` — Spark passes MICROseconds since epoch. */
  override def loadTable(ident: CatIdent, timestampMicros: Long): Table =
    load(ident)((l, n) => l.manifestAsOf(n, timestampMicros / 1000L))

  override def tableExists(ident: CatIdent): Boolean =
    try { val (l, n) = resolve(ident); exists(l, n) }
    catch { case _: Exception => false }

  /** Stored table names are `schema.table` with a single-segment schema
    * ([[Identifier.qualified]]) — split at the FIRST dot rather than
    * re-running the lexical parser, which would re-lowercase (or crash
    * on) names that needed quoting at creation. A one-part namespace is
    * a schema of the CATALOG's database (the reference's list_tables
    * scope); a two-part namespace names (database, schema) explicitly. */
  override def listTables(namespace: Array[String]): Array[CatIdent] = {
    val (l, ns, filter) = namespace match {
      case Array(db, schema) =>
        (lake.inDatabase(db), Array(db, schema), Some(schema))
      case Array(schema) => (lake, Array(schema), Some(schema))
      // Deeper namespaces must ERROR, not fall through to the unscoped
      // listing: `SHOW TABLES IN a.b.c` would otherwise silently list
      // every table of the catalog's database (the load/resolve paths
      // already throw for the same namespaces).
      case parts if parts.length > 2 =>
        throw new org.apache.spark.sql.catalyst.analysis
          .NoSuchNamespaceException(parts.toSeq)
      case _ => (lake, Array.empty[String], None)
    }
    l.tableNames
      .map { q =>
        val dot = q.indexOf('.')
        if (dot < 0) ("main", q) else (q.take(dot), q.drop(dot + 1))
      }
      .filter { case (schema, _) => filter.forall(_ == schema) }
      .map { case (schema, table) =>
        CatIdent.of(if (ns.isEmpty) Array(schema) else ns, table)
      }
      .toArray
  }

  override def dropTable(ident: CatIdent): Boolean =
    if (!tableExists(ident)) false
    else { val (l, n) = resolve(ident); l.dropTable(n); true }

  // Mirrors are read-only; mutation flows through CDC apply
  // (`/root/reference/src/table.rs` mirror contract). Refuse, pointing
  // at the API that owns the write path.
  override def createTable(ident: CatIdent, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "mooncake mirrors are created from a source snapshot " +
        "(Mooncake.createTable / createTableFromUri), not by SQL DDL — " +
        "the mirror is read-only; mutation arrives via CDC")

  override def alterTable(ident: CatIdent, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "mooncake mirrors evolve through CDC schema evolution, not ALTER")

  override def renameTable(from: CatIdent, to: CatIdent): Unit =
    throw new UnsupportedOperationException(
      "mooncake mirrors cannot be renamed — the name is the replication " +
        "binding")
}

object MooncakeCatalog {
  /** Files a DSv2 scan will open (`Dataset.inputFiles` does not
    * traverse BatchScanExec) — read off the built FileScan's index.
    * Shared by the prune-asserting oracle queries and specs. */
  def scannedFiles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan match {
          case f: org.apache.spark.sql.execution.datasources.v2.FileScan =>
            f.fileIndex.inputFiles.length
          case _ => 0
        }
    }.sum
}

/** One resolved mirror snapshot: schema from the manifest DDL, scans
  * via [[MooncakeScanBuilder]]. The manifest is pinned at resolution
  * time, so a concurrent CDC commit never tears a running query. */
private[lake] case class MooncakeTable(mirror: String, m: Manifest)
    extends Table with SupportsRead {

  override def name(): String = mirror

  override def schema(): StructType = StructType.fromDDL(m.schemaDdl)

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def properties(): util.Map[String, String] =
    Map(
      "commit_lsn" -> m.commitVersion.toString,
      "flush_lsn" -> m.flushVersion.toString,
      "version" -> m.version.toString,
      "files" -> m.files.size.toString).asJava

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = {
    val s = SparkSession.active
    ResourceCaps.enforce(s)
    new MooncakeScanBuilder(s, m, options)
  }
}

/** Scan builder wiring Spark's filter/column pushdown into manifest
  * file skipping, then delegating the physical read to the stock
  * vectorized [[ParquetScan]].
  *
  * - `pushFilters` keeps EVERY filter as post-scan residual (Spark
  *   re-applies row-level, so skipping can only cut IO, never change
  *   results) while recording the conjuncts for two pruning tiers:
  *   manifest file skipping here, row-group stats inside ParquetScan.
  * - `pruneColumns` narrows the read schema — the scan reads only the
  *   projected columns (`ReadSchema` in explain).
  */
private[lake] class MooncakeScanBuilder(spark: SparkSession, m: Manifest,
    options: CaseInsensitiveStringMap) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private val fullSchema = StructType.fromDDL(m.schemaDdl)
  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    filters // all residual — pruning is IO-only, rows re-filter
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** The v1 Filter tree's simple range conjuncts, in the (column, op,
    * value) shape [[Mooncake.pruneFiles]] consumes — the same subset
    * [[BoundsPruning.conjuncts]] extracts from a Column prune. v1
    * filters carry EXTERNAL literal types; dates normalize to the epoch
    * days the manifest's integer stats store. */
  private def conjuncts(fs: Seq[Filter]): Seq[(String, String, Any)] = {
    def norm(v: Any): Any = v match {
      case d: java.sql.Date => d.toLocalDate.toEpochDay
      case d: java.time.LocalDate => d.toEpochDay
      case other => other
    }
    fs.flatMap {
      case sources.EqualTo(a, v) => Seq((a, "=", norm(v)))
      case sources.GreaterThan(a, v) => Seq((a, ">", norm(v)))
      case sources.GreaterThanOrEqual(a, v) => Seq((a, ">=", norm(v)))
      case sources.LessThan(a, v) => Seq((a, "<", norm(v)))
      case sources.LessThanOrEqual(a, v) => Seq((a, "<=", norm(v)))
      case sources.And(l, r) => conjuncts(Seq(l, r))
      case _ => Nil
    }
  }

  override def build(): Scan = {
    val kept = Mooncake.pruneFiles(m, conjuncts(pushed.toSeq))
    val index = new InMemoryFileIndex(spark,
      kept.map(f => new HPath(f.path)),
      Map.empty[String, String], Some(fullSchema))
    ParquetScan(
      sparkSession = spark,
      hadoopConf = spark.sparkContext.hadoopConfiguration,
      fileIndex = index,
      dataSchema = fullSchema,
      readDataSchema = required,
      readPartitionSchema = StructType(Nil),
      pushedFilters = pushed,
      options = options)
  }
}
