package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dump `.explain("formatted")` for named SparkEntry queries to files —
  * the committed before/after plan evidence for optimization rounds
  * (plans/rN/<query>_<suffix>.txt). Uses the Bench session shape
  * (local[32], 32 shuffle partitions, AQE) but with the input cache OFF so
  * the parquet scan nodes (PushedFilters / ReadSchema) stay visible in the
  * dumped plan instead of InMemoryTableScan.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> [query ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3)
    Files.createDirectories(Paths.get(outDir))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("graft.orderedOutput", "true")
      .config("spark.local.dir", graft.Scratch.dir("spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val reg = SparkEntry.queries
    // Failures are counted and fail the EXIT CODE: a dump run that
    // breaks for every query must not look successful to a script and
    // silently leave stale evidence files behind.
    var failed = 0
    names.foreach { name =>
      reg.get(name) match {
        case Some(fn) =>
          try {
            // Building the frame runs any count-gate jobs, so the dumped
            // plan carries the broadcast decisions the bench run makes.
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
              txt.getBytes("UTF-8"))
            println(s"[plandump] wrote ${name}_$suffix.txt")
          } catch {
            case e: Throwable =>
              failed += 1
              println(s"[plandump] $name FAILED: ${e.getMessage}")
          }
        case None =>
          failed += 1
          println(s"[plandump] unknown query: $name")
      }
    }
    println(s"[plandump] done: ${names.length - failed} ok, $failed failed")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
