package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** End-to-end specs for the lake core, replaying the reference's own
  * regression scenarios (SURVEY.md §5):
  *   - sanity.sql: INSERT+UPDATE(+implicit cast)+DELETE converges to
  *     rows (2,'b'),(3,'4')  (`expected/sanity.out:7-12`)
  *   - partitioned_table.sql: 100-row insert + tail delete → counts
  *     25 / 75 / 40  (`expected/partitioned_table.out:9-23`)
  */
class MooncakeSpec extends SparkSuite {
  import spark.implicits._

  private def freshLake() = new Mooncake(tmpDir("mooncake-wh"))

  private def rTable(rows: (Int, String)*): DataFrame =
    rows.toDF("a", "b")

  test("sanity.sql replay: CDC convergence with implicit cast") {
    val lake = freshLake()
    // CREATE TABLE r (a int, b text); INSERT (1,'a'),(2,'b'),(3,'c')
    lake.createTable(spark, "c", rTable(1 -> "a", 2 -> "b", 3 -> "c"), Seq("a"))
    // UPDATE r SET b = a + 1 WHERE a > 2  (int → text implicit cast)
    val updates = Seq((3, "U")).toDF("a", "__op")
      .withColumn("b", (col("a") + 1).cast("string"))
      .select("a", "b", "__op")
    lake.applyChanges(spark, "c", updates, version = 2)
    // DELETE FROM r WHERE a < 2
    val deletes = Seq((1, null: String, "D")).toDF("a", "b", "__op")
    lake.applyChanges(spark, "c", deletes, version = 3)

    val got = lake.read(spark, "c", atLeastVersion = Some(3))
      .orderBy("a").as[(Int, String)].collect().toSeq
    assert(got === Seq(2 -> "b", 3 -> "4"))
  }

  test("partitioned_table.sql replay: 25 / 75 / 40") {
    val lake = freshLake()
    val src = spark.range(0, 100)
      .select(col("id").cast("int").as("a"),
        concat(lit("val_"), col("id")).as("b"))
    lake.createTable(spark, "pt", src, Seq("a"))
    // DELETE WHERE a > 90
    val dels = spark.range(91, 100)
      .select(col("id").cast("int").as("a"),
        lit(null: String).as("b"), lit("D").as("__op"))
    lake.applyChanges(spark, "pt", dels, version = 2)

    val m = lake.read(spark, "pt", atLeastVersion = Some(2))
    assert(m.filter(col("a") < 25).count() === 25)
    assert(m.filter(col("a") < 75).count() === 75)
    assert(m.filter(col("a") < 25 || col("a") > 75).count() === 40)
  }

  test("read-your-writes gate rejects stale snapshots") {
    val lake = freshLake()
    lake.createTable(spark, "ryw", rTable(1 -> "x"), Seq("a"))
    assertThrows[StaleSnapshotException] {
      lake.read(spark, "ryw", atLeastVersion = Some(99))
    }
    // and a satisfied demand passes
    assert(lake.read(spark, "ryw", atLeastVersion = Some(1)).count() === 1)
  }

  test("last-op-per-key wins within a batch (I then D nets to absent)") {
    val lake = freshLake()
    lake.createTable(spark, "seq", rTable(1 -> "keep"), Seq("a"))
    val batch = Seq(
      (5, "new", "I", 1L),
      (5, "newer", "U", 2L),
      (1, null: String, "D", 3L),
      (1, "reborn", "I", 4L))
      .toDF("a", "b", "__op", "__seq")
    lake.applyChanges(spark, "seq", batch, version = 2)
    val got = lake.read(spark, "seq").orderBy("a")
      .as[(Int, String)].collect().toSeq
    assert(got === Seq(1 -> "reborn", 5 -> "newer"))
  }

  test("file skipping: untouched files are carried over, not rewritten") {
    val lake = freshLake()
    // Range-clustered backfill → files have disjoint key ranges.
    val src = spark.range(0, 1000)
      .select(col("id").as("a"), concat(lit("v"), col("id")).as("b"))
      .repartitionByRange(8, col("a"))
    lake.createTable(spark, "skip", src, Seq("a"))
    val before = lake.currentManifest("skip")
    assert(before.files.size === 8)

    // Delete two adjacent keys — only file(s) covering [100,101] rewrite.
    val dels = Seq((100L, null: String, "D"), (101L, null: String, "D"))
      .toDF("a", "b", "__op")
    lake.applyChanges(spark, "skip", dels, version = 2)
    val after = lake.currentManifest("skip")
    val carried = after.files.map(_.path).toSet
      .intersect(before.files.map(_.path).toSet)
    assert(carried.size >= 6,
      s"expected >=6 of 8 files carried over, got ${carried.size}")
    assert(lake.read(spark, "skip").count() === 998)
  }

  test("tableChanges diffs versions and prunes carried-over files") {
    val lake = freshLake()
    val src = spark.range(0, 1000)
      .select(col("id").as("a"), concat(lit("v"), col("id")).as("b"))
      .repartitionByRange(8, col("a"))
    lake.createTable(spark, "cdf", src, Seq("a"))
    val dels = Seq((100L, null: String, "D"), (101L, null: String, "D"))
      .toDF("a", "b", "__op")
    val upds = Seq((102L, "updated", "U")).toDF("a", "b", "__op")
    lake.applyChanges(spark, "cdf", dels.unionByName(upds), version = 2)

    val diff = lake.tableChanges(spark, "cdf", 1, 2)
    val rows = diff.select("a", "b", "_change")
      .as[(Long, String, String)].collect().toSet
    // deletes surface once; the update as its delete+insert pair
    assert(rows === Set(
      (100L, "v100", "delete"), (101L, "v101", "delete"),
      (102L, "v102", "delete"), (102L, "updated", "insert")))

    // Manifest-level pruning: carried-over files are never opened —
    // the diff's scan set is only the rewritten + replaced files.
    val opened = diff.inputFiles.toSet
    val carried = lake.currentManifest("cdf").files.map(_.path).toSet
      .intersect(lake.readVersion(spark, "cdf", 1).inputFiles.toSet)
    assert(opened.intersect(carried).isEmpty,
      s"diff must not open carried-over files")
    assert(opened.size <= 4, s"expected <=4 files opened, got ${opened.size}")
  }

  test("large backfill range-clusters itself: disjoint per-file key ranges") {
    val lake = freshLake()
    // Single-partition source, tiny target size → createTable must
    // range-cluster on the pk by itself (at real scale: 128 MB files).
    val src = spark.range(0, 5000)
      .select(col("id").as("a"), concat(lit("v"), col("id")).as("b"))
      .coalesce(1)
    lake.createTable(spark, "clus", src, Seq("a"), targetFileBytes = 16 * 1024)
    val files = lake.currentManifest("clus").files
    assert(files.size > 1, s"expected a clustered multi-file backfill")
    val ranges = files.map(f => (f.minKey.get, f.maxKey.get)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"file key ranges overlap: $ranges")
      case _ =>
    }
    assert(lake.read(spark, "clus").count() === 5000)
  }

  test("zorder compaction gives two-dimensional file skipping") {
    val lake = freshLake()
    val n = 4096L
    // b is decorrelated from a: linear clustering on a makes every file
    // span nearly the whole b range
    val src = spark.range(0, n)
      .select(col("id").as("a"),
        ((col("id") * 2654435761L) % n).as("b"),
        concat(lit("payload_"), col("id")).as("p"))
      .coalesce(1)
    lake.createTable(spark, "z", src, Seq("a"), targetFileBytes = 8 * 1024)
    // margins are loose on purpose: repartitionByRange samples with a
    // seed derived from rdd.id, so exact file counts/boundaries wobble
    // with prior activity in the suite-shared session
    val nFilesLinear = lake.currentManifest("z").files.size
    assert(nFilesLinear >= 6, s"want a multi-file table, got $nFilesLinear")

    // Linear clustering: a b-range scan prunes (almost) nothing.
    val bLo = 0L; val bHi = n / 16 - 1
    val linearOpened =
      lake.readRangeOn(spark, "z", "b", bLo, bHi).inputFiles.length
    assert(linearOpened >= nFilesLinear - 1,
      s"expected ~no pruning on b pre-zorder: $linearOpened/$nFilesLinear")

    lake.optimizeTable(spark, "z", mode = "zorder:a,b",
      targetFileBytes = 8 * 1024)
    val zFiles = lake.currentManifest("z").files.size
    assert(zFiles >= 6, s"zorder rewrite must keep multiple files: $zFiles")

    // Z-order: BOTH dimensions prune.
    val zOpenedB =
      lake.readRangeOn(spark, "z", "b", bLo, bHi).inputFiles.length
    val zOpenedA =
      lake.readRangeOn(spark, "z", "a", 0, n / 16 - 1).inputFiles.length
    assert(zOpenedB <= zFiles * 2 / 3,
      s"b-range must prune on a z-ordered table: $zOpenedB/$zFiles")
    assert(zOpenedA <= zFiles * 2 / 3,
      s"a-range must still prune on a z-ordered table: $zOpenedA/$zFiles")

    // and the answers stay exact
    val gotB = lake.readRangeOn(spark, "z", "b", bLo, bHi).count()
    val wantB = src.filter(col("b").between(bLo, bHi)).count()
    assert(gotB === wantB)
    assert(lake.read(spark, "z").count() === n)
  }

  test("3-column zorder prunes on the third dimension too") {
    val lake = freshLake()
    val n = 4096L
    // b and c are decorrelated from a (and each other): linear
    // clustering on a makes every file span nearly the full b and c
    // ranges, so pre-zorder a c-range scan opens ~everything
    val src = spark.range(0, n)
      .select(col("id").as("a"),
        ((col("id") * 2654435761L) % n).as("b"),
        ((col("id") * 40503L + 7L) % n).as("c"),
        concat(lit("payload_"), col("id")).as("p"))
      .coalesce(1)
    lake.createTable(spark, "z3", src, Seq("a"),
      targetFileBytes = 8 * 1024)
    val nLinear = lake.currentManifest("z3").files.size
    assert(nLinear >= 6, s"want a multi-file table, got $nLinear")
    val lo = 0L; val hi = n / 16 - 1
    val linearOpened =
      lake.readRangeOn(spark, "z3", "c", lo, hi).inputFiles.length
    assert(linearOpened >= nLinear - 1,
      s"expected ~no pruning on c pre-zorder: $linearOpened/$nLinear")

    lake.optimizeTable(spark, "z3", mode = "zorder:a,b,c",
      targetFileBytes = 8 * 1024)
    val zFiles = lake.currentManifest("z3").files.size
    assert(zFiles >= 6, s"zorder rewrite must keep multiple files: $zFiles")
    // ALL THREE dimensions prune after the 3-way interleave. Threshold
    // tolerates ±1 file of layout jitter (range-partition sampling can
    // shift a file boundary run-to-run, and at ~11 files the 3/4
    // fraction rounds harshly): genuine pruning = at least 2 files
    // skipped AND no worse than the fraction-plus-one.
    for (d <- Seq("a", "b", "c")) {
      val opened =
        lake.readRangeOn(spark, "z3", d, lo, hi).inputFiles.length
      assert(opened <= math.max(zFiles * 3 / 4, zFiles - 2),
        s"$d-range must prune on the 3-d z-ordered table: $opened/$zFiles")
    }
    // and the answers stay exact
    assert(lake.readRangeOn(spark, "z3", "c", lo, hi).count() ===
      src.filter(col("c").between(lo, hi)).count())
    assert(lake.read(spark, "z3").count() === n)
    // arity guard: 5 columns refuse
    intercept[IllegalArgumentException] {
      lake.optimizeTable(spark, "z3", mode = "zorder:a,b,c,a,b")
    }
  }

  test("non-plain-int columns get no manifest stats and never misprune") {
    val lake = freshLake()
    // decimal + timestamp are INT64 at the parquet physical layer with
    // unscaled/micros footer stats — recording those would prune against
    // logical filter values and silently drop rows
    val src = spark.range(0, 1000)
      .select(col("id").as("a"),
        (col("id").cast("double") / 100).cast("decimal(10,2)").as("dec"),
        timestamp_seconds(col("id")).cast("timestamp_ntz").as("ts"))
      .repartitionByRange(4, col("a"))
    lake.createTable(spark, "typed", src, Seq("a"))
    val files = lake.currentManifest("typed").files
    assert(files.forall(f => f.rangeOf("a").isDefined))
    assert(files.forall(f => f.rangeOf("dec").isEmpty),
      "unscaled decimal stats must not be recorded")
    assert(files.forall(f => f.rangeOf("ts").isEmpty),
      "micros timestamp stats must not be recorded")
    // no stats -> full scan with residual filter, still exact
    assert(lake.readRangeOn(spark, "typed", "dec", 0, 5).count() ===
      src.filter(col("dec").cast("long").between(0, 5)).count())
  }

  test("createTable from a stats-less source keeps its partitioning") {
    val lake = freshLake()
    // RDD-backed plans report the defaultSizeInBytes sentinel
    // (Long.MaxValue) — "unknown", not "huge". Pre-fix this truncated to
    // a negative file count and repartitionByRange(0, ...) threw.
    val rdd = spark.sparkContext.parallelize(
      (1 to 100).map(i => org.apache.spark.sql.Row(i.toLong, s"v$i")), 4)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("b",
        org.apache.spark.sql.types.StringType)))
    val src = spark.createDataFrame(rdd, schema)
    val bytes = src.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(bytes >= BigInt(Long.MaxValue),
      s"precondition: expected the sentinel size, got $bytes")
    lake.createTable(spark, "nostats", src, Seq("a"),
      targetFileBytes = 16 * 1024)
    assert(lake.read(spark, "nostats").count() === 100)
  }

  test("readRange opens only files whose key range intersects") {
    val lake = freshLake()
    val src = spark.range(0, 1000)
      .select(col("id").as("a"), concat(lit("v"), col("id")).as("b"))
      .repartitionByRange(8, col("a"))
    lake.createTable(spark, "pt", src, Seq("a"))
    assert(lake.currentManifest("pt").files.size === 8)

    val scan = lake.readRange(spark, "pt", 250, 260)
    val rows = scan.collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq === (250L to 260L))
    // Only the file(s) covering [250, 260] participate (125-row files).
    val filesScanned = scan.select(input_file_name()).distinct().count()
    assert(filesScanned <= 2, s"expected <=2 files scanned, got $filesScanned")
  }

  test("read(prune) skips files on any stat'd column; results unchanged") {
    val lake = freshLake()
    val src = spark.range(0, 1000)
      .select(col("id").as("a"), (col("id") * 3).as("c"),
        concat(lit("v"), col("id")).as("b"))
      .repartitionByRange(8, col("a"))
    lake.createTable(spark, "gp", src, Seq("a"))
    assert(lake.currentManifest("gp").files.size === 8)

    // leading-pk conjunct prunes through the pk range
    val byPk = lake.read(spark, "gp", prune = Some(col("a") >= 900))
    assert(byPk.select(input_file_name()).distinct().count() <= 2)
    assert(byPk.count() === 100)
    // NON-pk integer column prunes through the per-column footer stats
    // (c = 3a is range-clustered along with a)
    val byC = lake.read(spark, "gp", prune = Some(col("c") < 150))
    assert(byC.select(input_file_name()).distinct().count() <= 2)
    assert(byC.as[(Long, Long, String)].collect().map(_._1).sorted.toSeq
      === (0L until 50L))
    // string conjuncts have no manifest stats: full scan, exact rows
    val byB = lake.read(spark, "gp", prune = Some(col("b") === "v7"))
    assert(byB.count() === 1)
    // conjunction: both prunable conjuncts must agree to keep a file
    val none = lake.read(spark, "gp",
      prune = Some(col("a") >= 900 && col("c") < 150))
    assert(none.count() === 0)
    assert(none.select(input_file_name()).distinct().count() === 0)
  }

  test("snapshot + time travel") {
    val lake = freshLake()
    lake.createTable(spark, "tt", rTable(1 -> "a", 2 -> "b"), Seq("a"))
    val snapV = lake.createSnapshot("tt")
    lake.applyChanges(spark, "tt",
      Seq((1, null: String, "D")).toDF("a", "b", "__op"), version = 2)
    assert(lake.read(spark, "tt").count() === 1)
    assert(lake.readVersion(spark, "tt", snapV).count() === 2)
  }

  test("listTables exposes commit/flush frontiers like the reference") {
    val lake = freshLake()
    lake.createTable(spark, "lt1", rTable(1 -> "a"), Seq("a"))
    lake.createTable(spark, "lt2", rTable(2 -> "b"), Seq("a"), initialVersion = 7)
    val rows = lake.listTables(spark).orderBy("table").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("main.lt1", "main.lt2"))
    assert(rows.map(r => r.getLong(1) -> r.getLong(2)).toSeq ===
      Seq(1L -> 1L, 7L -> 7L))
    assert(lake.listTables(spark).columns.toSeq ===
      Seq("table", "commit_lsn", "flush_lsn", "iceberg_warehouse_location",
        "table_config"))
  }

  test("table_config persists at create and survives every rewrite") {
    val lake = freshLake()
    val cfg = Map("retention" -> "7d", "owner" -> "curation")
    lake.createTable(spark, "tc",
      rTable(1 -> "a", 2 -> "b", 3 -> "c"), Seq("a"), config = cfg)
    assert(Manifest.latest(lake.tableDir("tc")).get.tableConfig ===
      Some(cfg))
    // CDC apply, file load and optimize all carry it verbatim
    lake.applyChanges(spark, "tc",
      Seq((4, "d", "I")).toDF("a", "b", "__op"), version = 2)
    val pq = tmpDir("tc-pq")
    rTable(5 -> "e").write.mode("overwrite").parquet(pq)
    lake.loadFiles(spark, "tc", Seq(pq))
    lake.optimizeTable(spark, "tc", mode = "full")
    assert(Manifest.latest(lake.tableDir("tc")).get.tableConfig ===
      Some(cfg))
    // listTables surfaces the canonical sorted k=v form; unconfigured
    // tables list empty
    lake.createTable(spark, "tc2", rTable(9 -> "z"), Seq("a"))
    val byName = lake.listTables(spark).collect()
      .map(r => r.getString(0) -> r.getString(4)).toMap
    assert(byName("main.tc") === "owner=curation;retention=7d")
    assert(byName("main.tc2") === "")
  }

  test("loadFiles appends parquet / csv / json / orc into the mirror") {
    val lake = freshLake()
    lake.createTable(spark, "lf", rTable(1 -> "a"), Seq("a"))
    val pq = tmpDir("lf-pq")
    rTable(2 -> "b").write.mode("overwrite").parquet(pq)
    lake.loadFiles(spark, "lf", Seq(pq))
    val csv = tmpDir("lf-csv")
    rTable(3 -> "c").write.mode("overwrite").option("header", "true").csv(csv)
    lake.loadFiles(spark, "lf", Seq(csv), format = "csv")
    val js = tmpDir("lf-json")
    rTable(4 -> "d").write.mode("overwrite").json(js)
    lake.loadFiles(spark, "lf", Seq(js), format = "json")
    val orc = tmpDir("lf-orc")
    rTable(5 -> "e").write.mode("overwrite").orc(orc)
    lake.loadFiles(spark, "lf", Seq(orc), format = "orc")
    val got = lake.read(spark, "lf").orderBy("a").as[(Int, String)].collect()
    assert(got.toSeq === Seq(1 -> "a", 2 -> "b", 3 -> "c", 4 -> "d", 5 -> "e"))
  }

  test("optimizeTable full restores clustering; data packs small files") {
    val lake = freshLake()
    val src = spark.range(0, 500)
      .select(col("id").as("a"), lit("x").as("b"))
      .repartition(10) // deliberately fragmented, overlapping ranges
    lake.createTable(spark, "opt", src, Seq("a"))
    assert(lake.currentManifest("opt").files.size === 10)

    lake.optimizeTable(spark, "opt", mode = "data")
    val packed = lake.currentManifest("opt")
    assert(packed.files.size < 10)
    assert(lake.read(spark, "opt").count() === 500)

    lake.optimizeTable(spark, "opt", mode = "full",
      targetFileBytes = 4L * 1024)
    val full = lake.currentManifest("opt")
    // full mode range-clusters: per-file ranges must be disjoint
    val ranges = full.files.flatMap(f =>
      for { lo <- f.minKey; hi <- f.maxKey } yield (lo, hi)).sorted
    ranges.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
    assert(lake.read(spark, "opt").count() === 500)
  }

  test("dropTable removes the table") {
    val lake = freshLake()
    lake.createTable(spark, "gone", rTable(1 -> "a"), Seq("a"))
    lake.dropTable("gone")
    assertThrows[NoSuchElementException] { lake.read(spark, "gone") }
    assert(lake.listTables(spark).count() === 0)
  }

  test("deferred drop: aborted scope keeps the mirror, committed scope drops") {
    // the reference's rollback window (functions.rs:56-80): drop_table
    // runs at pre-commit, so a rolled-back DROP never destroys the mirror
    val lake = freshLake()
    lake.createTable(spark, "keepme", rTable(1 -> "a"), Seq("a"))
    assertThrows[RuntimeException] {
      lake.inTransaction {
        lake.dropTable("keepme")
        // intent registered, mirror still intact INSIDE the scope too
        // (the reference's moonlink table outlives the DROP statement
        // until commit)
        assert(lake.read(spark, "keepme").count() === 1)
        throw new RuntimeException("rollback")
      }
    }
    assert(lake.read(spark, "keepme").count() === 1,
      "aborted scope must keep the mirror")
    // committed scope executes the intent at exit
    lake.inTransaction { lake.dropTable("keepme") }
    assertThrows[NoSuchElementException] { lake.read(spark, "keepme") }
    assert(lake.listTables(spark).count() === 0)
  }

  test("nested scope aborts roll back their own drop intents only") {
    // Postgres discards a rolled-back SUBtransaction's pre-commit
    // callbacks even when the outer transaction commits: an inner
    // scope's throw, caught by the outer body, must not leave its
    // intents behind to fire at outer commit.
    val lake = freshLake()
    lake.createTable(spark, "inner_kept", rTable(1 -> "a"), Seq("a"))
    lake.createTable(spark, "outer_gone", rTable(1 -> "a"), Seq("a"))
    lake.inTransaction {
      lake.dropTable("outer_gone") // outer intent: survives to commit
      try lake.inTransaction {
        lake.dropTable("inner_kept") // inner intent: rolled back below
        throw new RuntimeException("subxact rollback")
      } catch { case _: RuntimeException => () } // outer catches + commits
    }
    assert(lake.read(spark, "inner_kept").count() === 1,
      "aborted nested scope's drop must be discarded")
    assertThrows[NoSuchElementException] { lake.read(spark, "outer_gone") }
  }

  test("drop-then-recreate inside one scope: the fresh table survives commit") {
    val lake = freshLake()
    lake.createTable(spark, "phoenix", rTable(1 -> "a"), Seq("a"))
    lake.inTransaction {
      lake.dropTable("phoenix")
      // recreate supersedes the pending drop (net DROP+CREATE, as in
      // Postgres); without the cancel, the stale intent would delete
      // the fresh mirror at commit
      lake.createTable(spark, "phoenix", rTable(2 -> "b"), Seq("a"))
    }
    val rows = lake.read(spark, "phoenix").collect()
    assert(rows.length === 1 && rows(0).getString(1) === "b",
      "commit must keep the recreated mirror, not delete it")
  }

  test("drop-then-recreate, scope ABORTS: the OLD mirror is restored") {
    // The recreate renames the old mirror aside instead of deleting it,
    // so an aborted scope keeps every mirror — including one a create
    // had superseded. (Postgres: the rolled-back DROP+CREATE leaves the
    // original table untouched.)
    val lake = freshLake()
    lake.createTable(spark, "lazarus", rTable(1 -> "a"), Seq("a"))
    assertThrows[RuntimeException] {
      lake.inTransaction {
        lake.dropTable("lazarus")
        lake.createTable(spark, "lazarus", rTable(2 -> "b"), Seq("a"))
        throw new RuntimeException("abort")
      }
    }
    val rows = lake.read(spark, "lazarus").collect()
    assert(rows.length === 1 && rows(0).getString(1) === "a",
      "abort must restore the ORIGINAL mirror, not keep the fresh one")
    assert(lake.tableNames.size === 1 &&
        !lake.tableNames.exists(_.contains("pending")),
      "no aside/trash residue may appear in listings")
  }

  test("nested recreate of an OUTER drop: abort restores and re-arms the drop") {
    // outer: DROP t; nested: CREATE t then abort. Postgres discards the
    // subxact's CREATE but keeps the outer DROP — at outer commit the
    // table must be gone; DURING the outer scope after the nested abort
    // the old mirror must be back on disk (intact for readers).
    val lake = freshLake()
    lake.createTable(spark, "reaper", rTable(1 -> "a"), Seq("a"))
    lake.inTransaction {
      lake.dropTable("reaper")
      try lake.inTransaction {
        lake.createTable(spark, "reaper", rTable(2 -> "b"), Seq("a"))
        throw new RuntimeException("subxact rollback")
      } catch { case _: RuntimeException => () }
      // nested abort restored the original mirror in place
      assert(lake.read(spark, "reaper").collect()(0).getString(1) === "a")
    }
    assertThrows[NoSuchElementException] { lake.read(spark, "reaper") }
  }

  test("invalid transitions are refused: duplicate create, stale version, torn commit") {
    val lake = freshLake()
    lake.createTable(spark, "g", rTable(1 -> "a"), Seq("a"))
    assertThrows[IllegalStateException] {
      lake.createTable(spark, "g", rTable(2 -> "b"), Seq("a"))
    }
    lake.applyChanges(spark, "g",
      Seq((2, "b", "I")).toDF("a", "b", "__op"), version = 2)
    // non-monotone batch version (checkpoint-replay class) is rejected
    assertThrows[IllegalArgumentException] {
      lake.applyChanges(spark, "g",
        Seq((3, "c", "I")).toDF("a", "b", "__op"), version = 2)
    }
    // a concurrent writer landing the same manifest version must fail
    val m = lake.currentManifest("g")
    assertThrows[IllegalStateException] {
      Manifest.commit(
        java.nio.file.Paths.get(lake.warehouse, "main.g").toString, m)
    }
  }

  test("createTableFromUri mirrors a remote location (src_uri parity)") {
    val lake = freshLake()
    // file-URI source (the testable connector here; jdbc: goes through
    // Spark's built-in JDBC source with deployment-provided drivers)
    val src = tmpDir("uri-src")
    rTable(1 -> "a", 2 -> "b", 3 -> "c").write.mode("overwrite").parquet(src)
    lake.createTableFromUri(spark, "uri_mirror", s"file:$src", Seq("a"))
    assert(lake.read(spark, "uri_mirror").orderBy("a")
      .as[(Int, String)].collect().toSeq === Seq(1 -> "a", 2 -> "b", 3 -> "c"))
    // csv by extension
    val csvSrc = tmpDir("uri-csv") + "/t.csv"
    rTable(4 -> "d").write.option("header", "true").mode("overwrite").csv(csvSrc)
    lake.createTableFromUri(spark, "uri_csv", csvSrc, Seq("a"))
    assert(lake.read(spark, "uri_csv").count() === 1)
    // jdbc plumbing demands the remote relation name up front
    assertThrows[IllegalArgumentException] {
      lake.createTableFromUri(spark, "uri_jdbc",
        "jdbc:postgresql://example/db", Seq("a"))
    }
  }

  test("bloom filters prune point-lookup files on a non-clustered column") {
    val lake = freshLake()
    // b = (a * 7919) % 1000 is a bijection on 0..999: every file's
    // [min,max] b-range spans ~[0,1000) (tier-1 min/max keeps ALL
    // files), each probe value lives in exactly ONE file — only the
    // bloom probe can tell which. If the writer option key, column
    // path, or hash/physical-type wiring were wrong, every failure
    // mode degrades to "keep the file" and kept.size stays 10.
    val src = spark.range(0, 1000)
      .select(col("id").as("a"), ((col("id") * 7919) % 1000).as("b"))
    lake.createTable(spark, "pt", src.repartition(10), Seq("a"),
      bloomColumns = Seq("b"))
    val m = lake.currentManifest("pt")
    assert(m.files.size === 10)
    val probe = 777L
    val actually = m.files.filter(f =>
      spark.read.parquet(f.path).filter(col("b") === probe).count() > 0)
      .map(_.path).toSet
    assert(actually.size === 1)
    val kept = m.files.filter(f => Manifest.bloomMightContain(
      java.nio.file.Paths.get(f.path), "b", probe)).map(_.path).toSet
    // no false negatives (correctness)...
    assert(actually.subsetOf(kept))
    // ...and real pruning (the feature's entire value): false positives
    // only, far fewer than "all files"
    assert(kept.size <= 3, s"bloom kept ${kept.size}/10 files — not pruning")
    // the lookup itself matches the plain filter
    val got = lake.readPoint(spark, "pt", "b", probe)
      .as[(Long, Long)].collect().toSeq.sorted
    val want = src.filter(col("b") === probe)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got === want && got.size === 1)
  }

  test("optimize index mode rotates bloom columns and rebuilds the probes") {
    val lake = freshLake()
    // Same bijection trick as the bloom-prune test: both b and c span
    // every file's min/max range, so only a bloom can prune.
    val src = spark.range(0, 1000)
      .select(col("id").as("a"), ((col("id") * 7919) % 1000).as("b"),
        ((col("id") * 6271) % 1000).as("c"))
    lake.createTable(spark, "idx", src.repartition(10), Seq("a"),
      bloomColumns = Seq("b"))
    // c has no bloom yet: every file keeps (might-contain everywhere).
    val m0 = lake.currentManifest("idx")
    assert(m0.files.count(f => Manifest.bloomMightContain(
      java.nio.file.Paths.get(f.path), "c", 777L)) === m0.files.size)

    // Rotate the declaration b -> c and rebuild.
    val m1 = lake.optimizeTable(spark, "idx", mode = "index:c")
    assert(m1.bloomColumns === Some(Seq("c")))
    val keptC = m1.files.filter(f => Manifest.bloomMightContain(
      java.nio.file.Paths.get(f.path), "c", 777L))
    assert(keptC.size <= 3, s"rotated bloom kept ${keptC.size} files")
    // the point lookup stays correct through the rotation
    val got = lake.readPoint(spark, "idx", "c", 777L)
      .select("a", "c").as[(Long, Long)].collect().toSeq
    assert(got === src.filter(col("c") === 777L)
      .select("a", "c").as[(Long, Long)].collect().toSeq)

    // Bare "index" rebuilds under the current declaration (still c),
    // and rows survive both rewrites untouched.
    val m2 = lake.optimizeTable(spark, "idx", mode = "index")
    assert(m2.bloomColumns === Some(Seq("c")))
    assert(lake.read(spark, "idx").count() === 1000)
    // unknown bloom columns are refused before any rewrite
    assertThrows[IllegalArgumentException] {
      lake.optimizeTable(spark, "idx", mode = "index:nope")
    }
  }

  test("applyChanges past the broadcast key limit falls back to shuffle") {
    val lake = freshLake()
    lake.createTable(spark, "bigbatch",
      spark.range(0, 1000).select(col("id").as("a"),
        concat(lit("v"), col("id")).as("b")), Seq("a"))
    // Force the backfill-sized path: every batch exceeds the limit, so
    // the survivor anti-join must shuffle instead of broadcasting — same
    // rows out either way, no driver-side key collection.
    spark.conf.set("spark.graft.cdc.broadcastKeyLimit", "10")
    try {
      val upd = spark.range(0, 500)
        .select(col("id").as("a"), lit("upd").as("b"), lit("U").as("__op"))
      lake.applyChanges(spark, "bigbatch", upd, version = 2)
      val got = lake.read(spark, "bigbatch")
      assert(got.count() === 1000)
      assert(got.filter(col("b") === "upd").count() === 500)
      assert(got.filter(col("a") < 500 && col("b") =!= "upd").count() === 0)
    } finally spark.conf.unset("spark.graft.cdc.broadcastKeyLimit")
  }

  test("identifier parsing follows the reference's lexical rules") {
    assert(Identifier.parse("Foo") === Identifier("main", "foo"))
    assert(Identifier.parse("s.T") === Identifier("s", "t"))
    assert(Identifier.parse("\"Mixed Case\"") === Identifier("main", "Mixed Case"))
    assert(Identifier.parse("\"a\"\"b\"") === Identifier("main", "a\"b"))
    assert(Identifier.parse("sch.\"T$x\"") === Identifier("sch", "T$x"))
    assertThrows[IllegalArgumentException] { Identifier.parse("1bad") }
    assertThrows[IllegalArgumentException] { Identifier.parse("a.b.c") }
  }

  test("bare names resolve against the session's current schema") {
    // reference: current_schema, not a constant (functions.rs:150-152).
    // Spark's untouched "default" database maps to the catalog default
    // "main" (asserted by the lexical cases above); a session that
    // switched schema is followed.
    spark.sql("CREATE DATABASE IF NOT EXISTS analytics")
    spark.catalog.setCurrentDatabase("analytics")
    try {
      assert(Identifier.parse("Foo") === Identifier("analytics", "foo"))
      assert(Identifier.parse("other.t") === Identifier("other", "t"))
    } finally spark.catalog.setCurrentDatabase("default")
    assert(Identifier.parse("Foo") === Identifier("main", "foo"))
  }

  test("percent-encoding matches the reference's URI-safety contract") {
    assert(PathCodec.percentEncode("plain-name_0.~") === "plain-name_0.~")
    assert(PathCodec.percentEncode("a b/c%d") === "a%20b%2Fc%25d")
    assert(PathCodec.percentEncode("naïve") === "na%C3%AFve")
    val tricky = "s3://bucket/päth with %/odd?&="
    assert(PathCodec.percentDecode(PathCodec.percentEncode(tricky)) === tricky)
    // third-party inputs: literal (unencoded) non-ASCII must pass
    // through as UTF-8, and '%' not followed by hex is a literal, not
    // a crash
    assert(PathCodec.percentDecode("café.parquet") === "café.parquet")
    assert(PathCodec.percentDecode("日本.parquet") === "日本.parquet")
    assert(PathCodec.percentDecode("100%x.parquet") === "100%x.parquet")
    assert(PathCodec.percentDecode("trail%4") === "trail%4")
  }

  test("date-pk mirrors CDC-apply and range-scan via epoch-day bounds") {
    // a DATE leading pk now has manifest stats (epoch days) — the CDC
    // key-bounds skip and the range row filter must use a date-safe
    // integer view (a plain cast("long") on a date is an
    // AnalysisException)
    val lake = freshLake()
    val rows = (0 until 40).map(i =>
      (java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(19000L + i)),
        s"v$i")).toDF("d", "v").repartitionByRange(4, col("d"))
    lake.createTable(spark, "datepk", rows, Seq("d"))
    assert(lake.currentManifest("datepk").files.size > 1)
    assert(lake.currentManifest("datepk").files.forall(_.minKey.isDefined))
    val dels = Seq((java.sql.Date.valueOf(
      java.time.LocalDate.ofEpochDay(19005L)), null: String, "D"))
      .toDF("d", "v", "__op")
    lake.applyChanges(spark, "datepk", dels, version = 2)
    assert(lake.read(spark, "datepk").count() === 39)
    // epoch-day range scan on the date pk prunes and filters correctly
    val r = lake.readRangeOn(spark, "datepk", "d", 19000L, 19009L)
    assert(r.count() === 9) // 19005 deleted
  }

  test("string and date manifest bounds prune files (API and SQL)") {
    val lake = new Mooncake(tmpDir("mooncake-strprune"))
    // three single-status files with disjoint string bounds AND
    // disjoint date ranges
    val rows = Seq(
      (1L, "A", java.sql.Date.valueOf("2020-01-05"), 10.0),
      (2L, "A", java.sql.Date.valueOf("2020-01-06"), 11.0),
      (3L, "M", java.sql.Date.valueOf("2021-06-01"), 12.0),
      (4L, "M", java.sql.Date.valueOf("2021-06-02"), 13.0),
      (5L, "Z", java.sql.Date.valueOf("2022-12-01"), 14.0),
      (6L, "Z", java.sql.Date.valueOf("2022-12-02"), 15.0))
      .toDF("k", "st", "d", "v")
      .repartitionByRange(3, col("st"))
    lake.createTable(spark, "strp", rows, Seq("k"))
    val all = lake.read(spark, "strp")
    assert(all.inputFiles.length === 3)
    // string equality opens ONE file
    val st = lake.read(spark, "strp", prune = Some(col("st") === "M"))
    assert(st.inputFiles.length === 1)
    assert(st.select("k").as[Long].collect().sorted.toSeq === Seq(3L, 4L))
    // string range
    assert(lake.read(spark, "strp",
      prune = Some(col("st") > "N")).inputFiles.length === 1)
    // date range prunes via epoch-day integer stats
    val dt = lake.read(spark, "strp",
      prune = Some(col("d") >= lit(java.sql.Date.valueOf("2021-01-01"))))
    assert(dt.inputFiles.length === 2)
    assert(dt.count() === 4)

    // and the SQL catalog shares the same pruning (pushed v1 filters,
    // external date literals normalized to epoch days)
    spark.conf.set("spark.sql.catalog.strcat", "graft.lake.MooncakeCatalog")
    spark.conf.set("spark.sql.catalog.strcat.warehouse", lake.warehouse)
    def scanned(df: org.apache.spark.sql.DataFrame): Int =
      MooncakeCatalog.scannedFiles(df)
    val sqlSt = spark.sql("SELECT k FROM strcat.main.strp WHERE st = 'M'")
    assert(scanned(sqlSt) === 1)
    assert(sqlSt.as[Long].collect().sorted.toSeq === Seq(3L, 4L))
    val sqlDt = spark.sql(
      "SELECT k FROM strcat.main.strp WHERE d >= DATE '2021-01-01'")
    assert(scanned(sqlDt) === 2)
    assert(sqlDt.collect().length === 4)
  }

  test("string bound truncation keeps bounds valid on long values") {
    // short strings pass through exact
    assert(Mooncake.truncLower("abc") === "abc")
    assert(Mooncake.truncUpper("abc") === Some("abc"))
    // long ASCII: lower is a 64-cp prefix, upper increments the last
    val long = "a" * 100
    val lo = Mooncake.truncLower(long)
    assert(lo === "a" * 64 && lo <= long)
    val Some(hi) = Mooncake.truncUpper(long)
    assert(hi === "a" * 63 + "b")
    assert(hi.length === 64 && hi.compareTo(long) > 0)
    // multi-byte code points truncate on cp boundaries and still bound
    val uni = "é" * 100
    val Some(uhi) = Mooncake.truncUpper(uni)
    import java.nio.charset.StandardCharsets.UTF_8
    assert(java.util.Arrays.compareUnsigned(
      uhi.getBytes(UTF_8), uni.getBytes(UTF_8)) > 0)
    val ulo = Mooncake.truncLower(uni)
    assert(ulo.codePointCount(0, ulo.length) === 64)
    // surrogate range is skipped when incrementing
    val nearSurr = ("x" * 63) + "퟿" + "tail-making-it-long" + ("y" * 60)
    val Some(shi) = Mooncake.truncUpper(nearSurr)
    assert(shi.codePointAt(shi.offsetByCodePoints(0, 63)) === 0xE000)
    // un-boundable: 64 max code points
    val maxStr = new String(Array.fill(65)(0x10FFFF), 0, 65)
    assert(Mooncake.truncUpper(maxStr) === None)
    // a file whose string column cannot be bounded still reads fine —
    // it simply never prunes
    val lake = new Mooncake(tmpDir("mooncake-unbounded"))
    lake.createTable(spark, "ub",
      Seq((1L, maxStr + "suffix"), (2L, "plain")).toDF("k", "s"), Seq("k"))
    assert(lake.read(spark, "ub",
      prune = Some(col("s") === "nope")).count() === 0)
  }

  test("tableChanges refuses a table whose schema already has _change") {
    val lake = freshLake()
    lake.createTable(spark, "cc",
      Seq((1, "x")).toDF("a", "_change"), Seq("a"))
    lake.applyChanges(spark, "cc",
      Seq((2, "y", "I")).toDF("a", "_change", "__op"), version = 2)
    intercept[IllegalArgumentException] {
      lake.tableChanges(spark, "cc", 1, 2)
    }
  }

  test("clusterColumns layout survives CDC apply and compaction") {
    val lake = new Mooncake(tmpDir("ccols-wh"))
    // pk is id (replica identity); LAYOUT clusters on ck — the probe key
    val df = (1 to 400).map(i => (i.toLong, (i % 20).toLong, s"v$i"))
      .toDF("id", "ck", "v")
    lake.createTable(spark, "c", df, Seq("id"), targetFileBytes = 2048,
      clusterBy = Seq("ck"))
    assert(lake.currentManifest("c").clusterColumns === Some(Seq("ck")))
    val total = lake.read(spark, "c").inputFiles.length
    assert(total >= 3, s"layout must be multi-file, got $total")
    // ck-clustered files prune on a ck key even though pk is id
    val got = lake.readForKeys(spark, "c", "ck", Seq(5L).toDF("ck"))
    assert(got.inputFiles.length < total)
    assert(got.count() === 20)

    // CDC apply: the layout column set rides the manifest through the
    // rewrite; a full compaction re-clusters on it too
    lake.applyChanges(spark, "c",
      Seq((1L, 5L, "x", "U")).toDF("id", "ck", "v", "__op"), version = 2)
    assert(lake.currentManifest("c").clusterColumns === Some(Seq("ck")))
    lake.optimizeTable(spark, "c", "full", targetFileBytes = 2048)
    val m = lake.currentManifest("c")
    assert(m.clusterColumns === Some(Seq("ck")))
    val total2 = lake.read(spark, "c").inputFiles.length
    val got2 = lake.readForKeys(spark, "c", "ck", Seq(5L).toDF("ck"))
    assert(total2 >= 3 && got2.inputFiles.length < total2,
      s"post-compaction layout must still prune " +
        s"(${got2.inputFiles.length} of $total2)")
    // 20 original ck=5 rows plus id=1, whose update moved it into ck=5
    assert(got2.count() === 21)
  }

  test("bulk insert-only CDC batches split into size-targeted files") {
    // A backfill-sized insert batch touches ZERO existing files; sizing
    // the rewrite from touched bytes alone would funnel it through one
    // task into one oversized file. The insert side's optimizer
    // estimate must contribute to the file budget.
    val lake = new Mooncake(tmpDir("bulk-wh"))
    lake.createTable(spark, "b", Seq((0L, "seed")).toDF("id", "v"),
      Seq("id"))
    spark.conf.set("spark.graft.targetFileBytes", "4096")
    try {
      val bulk = (1 to 5000).map(i => (i.toLong, s"value-$i-${"x" * 20}", "I"))
        .toDF("id", "v", "__op")
      lake.applyChanges(spark, "b", bulk, version = 2)
      val files = lake.currentManifest("b").files
      assert(files.size > 2,
        s"bulk insert landed in ${files.size} file(s) — not size-split")
      // the split is pk-range-clustered: per-file key ranges are tight
      val spans = files.flatMap(f =>
        for (lo <- f.minKey; hi <- f.maxKey) yield (lo, hi)).sortBy(_._1)
      assert(spans.size === files.size)
      assert(spans.zip(spans.drop(1)).forall { case ((_, h), (l, _)) => h <= l },
        s"file key ranges overlap: $spans")
      assert(lake.read(spark, "b").count() === 5001)
    } finally spark.conf.unset("spark.graft.targetFileBytes")
  }

  test("reset drops cached session state; post-reset reads are fresh") {
    val lake = new Mooncake(tmpDir("reset-wh"))
    lake.createTable(spark, "r", Seq((1, "a")).toDF("a", "b"), Seq("a"))
    // a long-lived session pins a frame; the mirror then moves on
    val pinned = lake.read(spark, "r").cache()
    assert(pinned.count() === 1)
    lake.applyChanges(spark, "r",
      Seq((2, "b", "I")).toDF("a", "b", "__op"), version = 2)
    lake.reset(spark)
    // every cached relation is gone and a fresh read sees the new version
    assert(spark.sharedState.cacheManager.isEmpty)
    assert(lake.read(spark, "r").count() === 2)
    // durable state untouched: version history still travels
    assert(lake.readVersion(spark, "r", 1).count() === 1)
  }
}
