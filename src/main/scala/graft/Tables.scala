package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders (see FIXTURES.md §2).
  *
  * All queries take the scale-factor dir as a parameter so the driver can
  * point them at sf0.001 / sf0.01 / sf0.1. Reads are plain parquet scans:
  * Catalyst pushes filters/projections into the scan (PushedFilters /
  * ReadSchema), which is the scale story — at 100 TB these would be
  * partitioned/bucketed directories and the same code pushes partition
  * pruning.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Weak session keys: a stopped session's cached DataFrames must not
  // pin the whole SparkContext graph in a long-lived JVM, and identity
  // hash collisions across sessions must not hand out DataFrames bound
  // to a dead context.
  private val cache = new java.util.WeakHashMap[SparkSession,
    scala.collection.concurrent.TrieMap[(String, String), DataFrame]]()

  /** When `spark.graft.cacheInputs=true` (set by Bench), fixture tables
    * are loaded once per session and kept in the in-memory columnar
    * cache — the buffer-pool role every warehouse gives repeated scans;
    * without it each of the ~65 bench queries re-lists and re-reads the
    * same parquet. Off by default so Verify measures cold plans. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (spark.conf.getOption("spark.graft.cacheInputs").contains("true")) {
      val perSession = cache.synchronized {
        var m = cache.get(spark)
        if (m == null) {
          m = scala.collection.concurrent.TrieMap.empty
          cache.put(spark, m)
        }
        m
      }
      perSession.getOrElseUpdate((dir, name), {
        val df = doLoad(spark, dir, name)
        // The driver's fixtures are ONE parquet file with ONE row group,
        // so the scan — and therefore the cached RDD every bench query
        // maps over — is a SINGLE partition: every pre-shuffle stage ran
        // one-threaded however many cores the session had. A real corpus
        // at 100 TB arrives as thousands of files/row groups and gets
        // map parallelism for free; re-split the cached fixture to match
        // (≈2 MB of compressed parquet per partition ≈ one task-sized
        // in-memory batch, capped at 2× cores; tiny dims stay 1).
        // Directory-shaped tables (Spark-written multi-file parquet)
        // must sum their data files — Files.size on the directory
        // itself returns ~4 KB of dirent metadata and would silently
        // skip the re-split. A failed probe is logged, not swallowed:
        // an unsplit fixture quietly serializes every pre-shuffle
        // stage, which is exactly the bug this exists to prevent.
        val bytes = try {
          val p = java.nio.file.Paths.get(s"$dir/$name.parquet")
          if (java.nio.file.Files.isDirectory(p)) {
            val walk = java.nio.file.Files.walk(p)
            try walk.filter(java.nio.file.Files.isRegularFile(_))
              .mapToLong(java.nio.file.Files.size(_)).sum()
            finally walk.close()
          } else java.nio.file.Files.size(p)
        } catch {
          case e: Exception =>
            System.err.println(
              s"[tables] size probe failed for $dir/$name.parquet " +
                s"(${e.getClass.getSimpleName}: ${e.getMessage}); " +
                "cache re-split skipped — scan may be single-partition")
            0L
        }
        val target = math.max(1L, math.min(
          spark.sparkContext.defaultParallelism.toLong * 2,
          bytes / (2L << 20))).toInt
        val split = if (target > 1) df.repartition(target) else df
        split.cache()
        split
      })
    } else doLoad(spark, dir, name)

  private def doLoad(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // Fixture generators have shipped events.ts under two physical
      // types: parquet TIMESTAMP(NANOS) — which Spark's vectorized reader
      // rejects, so nanosAsLong surfaces it as int64 nanos — and plain
      // TIMESTAMP(MICROS). Branch on the LOADED type and normalize both
      // to micros timestamp_ntz (DuckDB's naive micro-precision
      // TIMESTAMP), so oracle comparisons agree either way and a
      // driver-side fixture regeneration can't break the loader again.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
      import org.apache.spark.sql.types.LongType
      // withColumn replaces ts in place, preserving column order
      raw.schema("ts").dataType match {
        case LongType => // nanos-as-int64: truncate to micros
          raw.withColumn("ts",
            timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
        case _ => // already a timestamp type: just align the flavor
          raw.withColumn("ts", col("ts").cast("timestamp_ntz"))
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every fixture as a temp view so spark.sql(...) queries can
    * reference them by the same names the DuckDB oracle uses. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Register ONLY the named fixtures — SQL-path queries should pin the
    * tables they actually touch; registerAll eagerly loads (and under
    * cacheInputs pins) all ten. */
  def register(spark: SparkSession, dir: String, tables: String*): Unit =
    tables.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
