package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.lake.Mooncake

/** Oracle-checked queries that drive the lake core (SURVEY.md §2.8–2.9)
  * end-to-end: mirror creation, a CDC batch (deletes + updates), and the
  * read-your-writes gated scan. The DuckDB oracle replays the same change
  * semantics in plain SQL over the source table — exactly the
  * "mirror converges to the source's final state" contract the reference's
  * sanity.sql regression checks. */
object LakeQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Mirror orders (o_orderkey is the replica identity), apply one CDC
    * batch (delete every 100th order; bump totalprice on every 97th), read
    * back through the version gate. lineitem is not used here because the
    * fixture's (l_orderkey, l_linenumber) is not unique — CDC addressing
    * requires a genuine key. */
  val cdcApply: Q = (s, dir) => {
    val lake = new Mooncake(
      java.nio.file.Files.createTempDirectory("graft-cdc-q").toString)
    val o = Tables.load(s, dir, "orders")
    lake.createTable(s, "orders_mirror", o, Seq("o_orderkey"))

    val deletes = o.filter(col("o_orderkey") % 100 === 0)
      .withColumn("__op", lit("D"))
    val updates = o.filter(col("o_orderkey") % 97 === 0 &&
        col("o_orderkey") % 100 =!= 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1)
      .withColumn("__op", lit("U"))
    lake.applyChanges(s, "orders_mirror", deletes.unionByName(updates),
      version = 2)

    lake.read(s, "orders_mirror", atLeastVersion = Some(2))
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey")
  }

  val cdcApplySql: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus,
      |  CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1
      |       ELSE o_totalprice END AS o_totalprice
      |FROM orders
      |WHERE o_orderkey % 100 <> 0
      |ORDER BY o_orderkey""".stripMargin

  /** The management surface: create two mirrors, snapshot one, list them —
    * checks the list_tables column contract (rows-only; the catalog is
    * ours, DuckDB has no equivalent to compare against). */
  val listTables: Q = (s, dir) => {
    val lake = new Mooncake(
      java.nio.file.Files.createTempDirectory("graft-list-q").toString)
    lake.createTable(s, "nation_mirror", Tables.load(s, dir, "nation"),
      Seq("n_nationkey"))
    lake.createTable(s, "region_mirror", Tables.load(s, dir, "region"),
      Seq("r_regionkey"))
    lake.createSnapshot("nation_mirror")
    lake.listTables(s).select("table", "commit_lsn", "flush_lsn")
      .orderBy("table")
  }

  val queries: Map[String, Q] = Map(
    "q_cdc_apply" -> cdcApply,
    "q_mooncake_list_tables" -> listTables,
  )

  val oracleSql: Map[String, String] = Map(
    "q_cdc_apply" -> cdcApplySql,
  )
}
