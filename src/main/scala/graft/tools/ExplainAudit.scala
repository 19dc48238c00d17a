package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Plan auditor: for each (or one named) SparkEntry query, print whether
  * the physical plan has WholeStageCodegen spans, parquet filter pushdown,
  * and broadcast joins — the three properties that keep these plans alive
  * at 100 TB. Usage: runMain graft.tools.ExplainAudit [sfDir] [query ...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only.contains(name)) {
        try {
          val df = fn(spark, sfDir)
          // AQE only finalizes (and shows codegen stages for) the plan
          // instance that actually executed — a noop write would spawn a
          // separate execution, so collect this one (audit runs on the
          // small sf). "*(n)" markers = whole-stage codegen stages.
          df.collect()
          val plan = df.queryExecution.executedPlan.toString
          // simple plan strings mark codegen stages as "*(n) Op", not
          // with the literal WholeStageCodegen node name
          val wscg = plan.contains("*(") || plan.contains("WholeStageCodegen")
          val pushed = plan.linesIterator
            .exists(l => l.contains("PushedFilters: [") &&
              !l.replaceAll(".*PushedFilters: \\[", "").startsWith("]"))
          val bcast = plan.contains("BroadcastHashJoin") ||
            plan.contains("BroadcastNestedLoopJoin")
          val smj = plan.contains("SortMergeJoin")
          println(f"$name%-28s wscg=$wscg%-5s pushdown=$pushed%-5s " +
            f"broadcast=$bcast%-5s sortmerge=$smj")
          if (args.length > 1) println(plan)
        } catch {
          case e: Throwable => println(f"$name%-28s EXPLAIN FAILED: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
