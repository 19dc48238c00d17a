package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Metadata-scale probe for the lake arm (VERDICT r16 gap #3): the
  * Delta/Iceberg/Mooncake control planes process log actions and
  * manifest entries DRIVER-side — correct (that is how every real
  * client works), but their cost scales with FILE COUNT, not row count.
  * A 100-TB table carries 10⁵-10⁶ add actions; nothing in the data-path
  * scale sweeps exercises that axis. This tool does, end-to-end through
  * the PUBLIC writer/reader APIs — no synthetic log formats, the
  * engine's own commits at high file counts:
  *
  *   - write a table whose ONE commit adds N files (repartition(N) on a
  *     range-clustered key so per-file bounds are tight),
  *   - cold-replay read + full count (N footers / planning),
  *   - readForKeys point probe (manifest/stats pruning must make this
  *     O(matching files), not O(N)),
  *   - Delta: checkpoint write at N adds, replay-from-checkpoint read,
  *     10 incremental commits then replay (checkpoint + JSON tail),
  *   - Iceberg: rewriteManifests at N entries,
  *   - Mooncake: snapshot read + point lookup + a CDC batch commit
  *     (carry-over manifest rewrite at N files).
  *
  * Run twice (e.g. N=10000 and N=100000) and compare per-file cost:
  * anything super-linear is a planning-path bug. Usage:
  *   graft.tools.MetaScaleProbe <scratchDir> [nFiles] [rowsPerFile]
  */
object MetaScaleProbe {
  def main(args: Array[String]): Unit = {
    val scratch = args.headOption.getOrElse("/tmp/metaprobe")
    val nFiles = args.lift(1).map(_.toInt).getOrElse(10000)
    val rowsPerFile = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-meta-scale-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.Scratch.dir("spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import java.nio.file.{Files, Paths}
    val root = Paths.get(scratch)
    if (Files.exists(root)) {
      val walk = Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    }
    Files.createDirectories(root)

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      val sec = (System.nanoTime() - t0) / 1e9
      results(name) = sec
      println(f"ARM $name%-40s $sec%9.3f s")
      r
    }
    // key-clustered: file i owns keys [i*rowsPerFile, (i+1)*rowsPerFile)
    def src: DataFrame = spark.range(nFiles.toLong * rowsPerFile)
      .select(col("id").as("k"), (col("id") % 97).as("v"))
      .repartitionByRange(nFiles, col("k"))
    val probeKey = (nFiles.toLong * rowsPerFile) / 2

    // --- Delta ------------------------------------------------------------
    val delta = s"$scratch/delta_t"
    timed("delta_write_1commit_N_adds") {
      graft.lake.DeltaCompat.write(src, delta, mode = "overwrite")
    }
    timed("delta_cold_read_count") {
      graft.lake.DeltaCompat.read(spark, delta).count()
    }
    timed("delta_readForKeys_plan_count") {
      import spark.implicits._
      graft.lake.DeltaCompat.readForKeys(spark, delta, "k",
        Seq(probeKey).toDF("k")).count()
    }
    timed("delta_checkpoint_write") {
      graft.lake.DeltaCompat.checkpoint(spark, delta)
    }
    timed("delta_replay_from_checkpoint_count") {
      graft.lake.DeltaCompat.read(spark, delta).count()
    }
    timed("delta_10_tail_commits") {
      import spark.implicits._
      (1 to 10).foreach { i =>
        graft.lake.DeltaCompat.write(
          Seq((-i.toLong, i.toLong)).toDF("k", "v"), delta)
      }
    }
    timed("delta_replay_cp_plus_tail_count") {
      graft.lake.DeltaCompat.read(spark, delta).count()
    }

    // --- Iceberg ----------------------------------------------------------
    val ice = s"$scratch/ice_t"
    timed("iceberg_write_1commit_N_files") {
      graft.lake.IcebergCompat.write(src, ice, mode = "overwrite")
    }
    timed("iceberg_cold_read_count") {
      graft.lake.IcebergCompat.read(spark, ice).count()
    }
    timed("iceberg_readForKeys_plan_count") {
      import spark.implicits._
      graft.lake.IcebergCompat.readForKeys(spark, ice, "k",
        Seq(probeKey).toDF("k")).count()
    }
    timed("iceberg_rewrite_manifests") {
      graft.lake.IcebergCompat.rewriteManifests(ice)
    }
    timed("iceberg_read_after_rewrite_count") {
      graft.lake.IcebergCompat.read(spark, ice).count()
    }

    // --- Mooncake ---------------------------------------------------------
    val lake = new graft.lake.Mooncake(s"$scratch/mooncake_wh")
    timed("mooncake_create_N_files") {
      lake.createTable(spark, "t", src, pk = Seq("k"),
        targetFileCount = Some(nFiles))
    }
    timed("mooncake_read_count") { lake.read(spark, "t").count() }
    timed("mooncake_point_lookup") {
      lake.readPoint(spark, "t", "k", probeKey).count()
    }
    timed("mooncake_cdc_commit_at_N_files") {
      import spark.implicits._
      lake.applyChanges(spark, "t",
        Seq((-1L, 5L, "I")).toDF("k", "v", "__op"), version = 2L)
    }

    val json = results.map { case (k, v) =>
      s""""$k":${String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))}"""
    }.mkString("{", ",", "}")
    println(s"""{"n_files":$nFiles,"rows_per_file":$rowsPerFile,"sec":$json}""")
    spark.stop()
  }
}
