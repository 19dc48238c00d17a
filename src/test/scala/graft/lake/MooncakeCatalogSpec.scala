package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** SQL-named mirrors through the DataSourceV2 catalog: bare and
  * qualified resolution, manifest file skipping driven by pushed
  * filters, VERSION/TIMESTAMP AS OF time travel, SHOW/DROP, and the
  * read-only DDL contract. One warehouse per suite — Spark instantiates
  * a catalog ONCE per session, so all tests share its tables. */
class MooncakeCatalogSpec extends SparkSuite {
  import spark.implicits._

  private lazy val wh = tmpDir("mooncake-catalog-wh")
  private lazy val lake: Mooncake = {
    spark.conf.set("spark.sql.catalog.mooncake",
      "graft.lake.MooncakeCatalog")
    spark.conf.set("spark.sql.catalog.mooncake.warehouse", wh)
    // the shared test JVM may already have instantiated a `mooncake`
    // catalog against ANOTHER suite's warehouse (catalog plugins cache
    // by name per session) — drop the cache so this suite's conf binds
    org.apache.spark.sql.graft.ColumnBridge.resetCatalogs(spark)
    new Mooncake(wh)
  }

  test("bare and qualified names resolve; rows match the API read") {
    lake.createTable(spark, "cat_t",
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Seq("k"))
    val bare = spark.sql("SELECT k, v FROM mooncake.cat_t ORDER BY k")
      .as[(Long, String)].collect().toSeq
    assert(bare === Seq(1L -> "a", 2L -> "b"))
    val qualified = spark.sql(
      "SELECT k, v FROM mooncake.main.cat_t ORDER BY k")
      .as[(Long, String)].collect().toSeq
    assert(qualified === bare)
    // projection reaches the scan: only `v` in ReadSchema
    val plan = spark.sql("SELECT v FROM mooncake.cat_t")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && !plan.contains("struct<k:"),
      s"projection must prune columns at the scan:\n$plan")
  }

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Int =
    MooncakeCatalog.scannedFiles(df)

  test("pushed filters skip manifest files before any footer opens") {
    // two files with disjoint pk ranges (range-clustered backfill shape)
    val df = spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS n")
      .repartitionByRange(2, col("k"))
    lake.createTable(spark, "cat_prune", df, Seq("k"),
      targetFileBytes = 1L) // force the range-clustered path
    val all = spark.sql("SELECT * FROM mooncake.cat_prune")
    val pruned = spark.sql(
      "SELECT * FROM mooncake.cat_prune WHERE k >= 900")
    assert(scannedFiles(all) > 1)
    assert(scannedFiles(pruned) < scannedFiles(all),
      "manifest bounds must skip files the pushed filter excludes")
    assert(pruned.count() === 100)
    // row-level residual still applies when nothing prunes
    assert(spark.sql(
      "SELECT * FROM mooncake.cat_prune WHERE k % 2 = 0").count() === 500)
    // the filter is ALSO pushed into the parquet scan (row-group tier)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(k,900)"), s"plan:\n$plan")
  }

  test("VERSION AS OF and TIMESTAMP AS OF travel the manifest history") {
    lake.createTable(spark, "cat_tt",
      Seq((1L, 10L), (2L, 20L)).toDF("k", "n"), Seq("k"))
    val betweenMs = System.currentTimeMillis()
    Thread.sleep(20) // commitMs granularity
    lake.applyChanges(spark, "cat_tt",
      Seq((2L, 99L, "U")).toDF("k", "n", "__op"), version = 2)
    assert(spark.sql("SELECT n FROM mooncake.cat_tt WHERE k = 2")
      .as[Long].collect().toSeq === Seq(99L))
    assert(spark.sql(
      "SELECT n FROM mooncake.cat_tt VERSION AS OF 1 WHERE k = 2")
      .as[Long].collect().toSeq === Seq(20L))
    // timestamp between v1 and v2 resolves to v1 (Spark passes micros;
    // the literal is interpreted in the session zone, so format there)
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
    val ts = fmt.format(new java.util.Date(betweenMs))
    assert(spark.sql(
      s"SELECT n FROM mooncake.cat_tt TIMESTAMP AS OF '$ts' WHERE k = 2")
      .as[Long].collect().toSeq === Seq(20L))
    // before the table existed → loud error
    val early = fmt.format(new java.util.Date(betweenMs - 86400000L))
    intercept[Exception] {
      spark.sql(
        s"SELECT * FROM mooncake.cat_tt TIMESTAMP AS OF '$early'").collect()
    }
  }

  test("SHOW TABLES lists mirrors; DROP works; DDL mutation refuses") {
    lake.createTable(spark, "cat_ddl",
      Seq((1L, "x")).toDF("k", "v"), Seq("k"))
    val shown = spark.sql("SHOW TABLES IN mooncake.main")
      .select("tableName").as[String].collect().toSet
    assert(shown.contains("cat_ddl"))
    intercept[UnsupportedOperationException] {
      spark.sql("CREATE TABLE mooncake.main.nope (k BIGINT) USING parquet")
    }
    intercept[UnsupportedOperationException] {
      spark.sql("ALTER TABLE mooncake.main.cat_ddl ADD COLUMN z INT")
    }
    spark.sql("DROP TABLE mooncake.main.cat_ddl")
    intercept[Exception] {
      spark.sql("SELECT * FROM mooncake.main.cat_ddl").collect()
    }
  }

  test("database namespaces: d.s.t resolves, listings scope per database") {
    // two databases in ONE warehouse (functions.rs:104-109: moonlink
    // hosts many databases; every management call sees only its own)
    lake.createTable(spark, "shared_name",
      Seq((1L, "main-row")).toDF("k", "v"), Seq("k"))
    val dbB = lake.inDatabase("corpusb")
    dbB.createTable(spark, "shared_name",
      Seq((1L, "b-row"), (2L, "b-row2")).toDF("k", "v"), Seq("k"))
    dbB.createTable(spark, "only_b",
      Seq((9L, "z")).toDF("k", "v"), Seq("k"))

    // same schema.table name, disjoint per database — both through SQL
    assert(spark.sql("SELECT v FROM mooncake.shared_name")
      .as[String].collect().toSeq === Seq("main-row"))
    assert(spark.sql(
        "SELECT v FROM mooncake.corpusb.main.shared_name ORDER BY k")
      .as[String].collect().toSeq === Seq("b-row", "b-row2"))

    // listings are database-scoped: main never shows corpusb's tables
    // and vice versa (the reference's list_tables database filter)
    assert(lake.tableNames.forall(!_.contains("only_b")))
    assert(dbB.tableNames.toSet ===
      Set("main.only_b", "main.shared_name"))
    val shown = spark.sql("SHOW TABLES IN mooncake.corpusb.main")
      .select("tableName").as[String].collect().toSet
    assert(shown.contains("only_b") && shown.contains("shared_name"))
    assert(!spark.sql("SHOW TABLES IN mooncake.main")
      .select("tableName").as[String].collect().toSet.contains("only_b"))

    // the warehouse enumerates both scopes
    assert(lake.databaseNames === Seq("corpusb", "main"))

    // drop through the scoped namespace; main's same-named table stays
    spark.sql("DROP TABLE mooncake.corpusb.main.only_b")
    assert(dbB.tableNames === Seq("main.shared_name"))
    assert(spark.sql("SELECT count(*) FROM mooncake.shared_name")
      .as[Long].head() === 1L)
  }

  test("SHOW TABLES in a too-deep namespace errors, never lists unscoped") {
    // the load/resolve paths throw for a.b.c; listTables must match —
    // falling through to the catch-all branch would silently list ALL
    // tables of the catalog's database as if the namespace existed
    lake.createTable(spark, "depth_probe",
      Seq((1L, "x")).toDF("k", "v"), Seq("k"))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SHOW TABLES IN mooncake.a.b.c").collect()
    }
    assert(e.getMessage.toLowerCase.contains("schema") ||
      e.getMessage.toLowerCase.contains("namespace"), e.getMessage)
  }

  test("quoted mixed-case mirrors resolve exactly; unquoted SQL folds") {
    lake.createTable(spark, "\"CatMixed\"",
      Seq((1L, "m")).toDF("k", "v"), Seq("k"))
    // quoted (backticked) SQL reaches the mixed-case mirror as typed
    assert(spark.sql("SELECT v FROM mooncake.main.`CatMixed`")
      .as[String].collect().toSeq === Seq("m"))
    // SHOW TABLES lists the stored name verbatim, and it round-trips
    val shown = spark.sql("SHOW TABLES IN mooncake.main")
      .select("tableName").as[String].collect().toSet
    assert(shown.contains("CatMixed"))
    // unquoted identifiers still fold case-insensitively (the
    // reference's lexical rule): CAT_T resolves the lowercase mirror
    assert(spark.sql("SELECT count(*) FROM mooncake.main.CAT_T")
      .as[Long].collect().head === 2L)
  }

  test("resolution pins the manifest: a concurrent commit never tears") {
    lake.createTable(spark, "cat_pin",
      Seq((1L, 1L)).toDF("k", "n"), Seq("k"))
    val df = spark.sql("SELECT k, n FROM mooncake.cat_pin")
    lake.applyChanges(spark, "cat_pin",
      Seq((1L, 2L, "U")).toDF("k", "n", "__op"), version = 2)
    // the already-resolved frame still reads version-1 files
    assert(df.as[(Long, Long)].collect().toSeq === Seq(1L -> 1L))
    // a fresh resolution sees the commit
    assert(spark.sql("SELECT n FROM mooncake.cat_pin")
      .as[Long].collect().toSeq === Seq(2L))
  }
}
