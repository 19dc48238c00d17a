package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{AnalyticsQueries, CurationQueries, EventQueries,
  HitsQueries, LakeQueries, Multimodal, PipelineQueries, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from the SURVEY.md §2
  * inventory, expressed Spark-first (DataFrame/Catalyst); [[oracleSql]]
  * carries the equivalent DuckDB SQL the driver hash-compares against.
  */
object SparkEntry {

  /** Flagship query (the README.md:91 filtered-aggregation shape, widened
    * to TPC-H Q1) on sf0.001; driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ LakeQueries.queries ++
      PipelineQueries.queries ++ EventQueries.queries ++
      AnalyticsQueries.queries ++ Multimodal.queries ++
      CurationQueries.queries ++ HitsQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ LakeQueries.oracleSql ++
      PipelineQueries.oracleSql ++ EventQueries.oracleSql ++
      AnalyticsQueries.oracleSql ++ Multimodal.oracleSql ++
      CurationQueries.oracleSql ++ HitsQueries.oracleSql
}
