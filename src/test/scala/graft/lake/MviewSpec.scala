package graft.lake

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Incremental materialized-view maintenance: after every refresh the MV
  * must equal a from-scratch aggregation of the base mirror's current
  * state, while the refresh stats prove the cost model (no base
  * re-aggregation unless a stored extremum was deleted). */
class MviewSpec extends SparkSuite {

  import spark.implicits._

  private def mkLake() = new Mooncake(tmpDir("mview-spec"))

  private val aggs = Seq(
    MvAgg("count", "*", "n"),
    MvAgg("sum", "v", "sum_v"),
    MvAgg("avg", "v", "avg_v"),
    MvAgg("min", "v", "min_v"),
    MvAgg("max", "v", "max_v"))

  /** From-scratch oracle with the same null semantics the view promises. */
  private def recompute(base: DataFrame): DataFrame =
    base.groupBy("g").agg(
      count(lit(1)).as("n"),
      sum("v").cast("decimal(38,2)").as("sum_v"),
      (sum(col("v")).cast("double") / count(col("v"))).as("avg_v"),
      min("v").as("min_v"),
      max("v").as("max_v"))

  private def assertMatches(mv: Mview, name: String, base: DataFrame): Unit = {
    val got = mv.read(spark, name)
      .select($"g", $"n", $"sum_v".cast("decimal(38,2)"), $"avg_v",
        $"min_v", $"max_v")
      .orderBy("g").collect().toSeq
    val want = recompute(base).orderBy("g").collect().toSeq
    assert(got == want)
  }

  private def rows(tuples: (Int, Long, Option[java.math.BigDecimal])*) =
    tuples.toDF("id", "g", "v")
      .select($"id", $"g", $"v".cast("decimal(12,2)"))

  private def d(s: String): Option[java.math.BigDecimal] =
    Some(new java.math.BigDecimal(s))

  test("additive batches fold without touching the base") {
    val lake = mkLake()
    val mv = new Mview(lake)
    val v1 = rows((1, 1L, d("10.00")), (2, 1L, d("20.00")),
      (3, 2L, d("5.50")), (4, 2L, None))
    lake.createTable(spark, "t", v1, Seq("id"))
    mv.create(spark, "t_mv", "t", Seq("g"), aggs)
    assertMatches(mv, "t_mv", lake.read(spark, "t"))

    // Inserts only — including a brand-new group and a null value.
    val batch = Seq((5, 1L, d("30.00")), (6, 3L, d("7.25")), (7, 3L, None))
      .toDF("id", "g", "v")
      .select($"id", $"g", $"v".cast("decimal(12,2)"))
      .withColumn("__op", lit("I"))
    lake.applyChanges(spark, "t", batch, version = 2)
    val st = mv.refresh(spark, "t_mv")
    assert(st.recomputedGroups == 0, "insert-only refresh must not re-aggregate")
    assert(st.affectedGroups == 2)
    assertMatches(mv, "t_mv", lake.read(spark, "t"))
  }

  test("definition writes are atomic renames: refresh re-save replaces the " +
      "file in place and leaves no temp litter") {
    val lake = mkLake()
    val mv = new Mview(lake)
    lake.createTable(spark, "t",
      rows((1, 1L, d("10.00")), (2, 2L, d("4.00"))), Seq("id"))
    mv.create(spark, "t_mv", "t", Seq("g"), aggs)
    lake.applyChanges(spark, "t",
      Seq((3, 1L, d("1.00"))).toDF("id", "g", "v")
        .select($"id", $"g", $"v".cast("decimal(12,2)"))
        .withColumn("__op", lit("I")), version = 2)
    mv.refresh(spark, "t_mv") // epilogue re-saves the def OVER the old one
    // the def is intact JSON (a torn plain write would park definition()
    // on a parse error permanently) and no temp file survived the rename
    assert(mv.definition("t_mv").base == "t")
    val litter = java.nio.file.Files.list(
        java.nio.file.Paths.get(lake.warehouse)).iterator()
      .asScala.map(_.getFileName.toString)
      .filter(n => n.startsWith(".mv") && n.endsWith(".tmp")).toSeq
    assert(litter.isEmpty, s"temp litter: $litter")
  }

  test("deleting a stored extremum re-aggregates only that group") {
    val lake = mkLake()
    val mv = new Mview(lake)
    val v1 = rows((1, 1L, d("10.00")), (2, 1L, d("20.00")),
      (3, 2L, d("5.50")), (4, 2L, d("6.50")))
    lake.createTable(spark, "t", v1, Seq("id"))
    mv.create(spark, "t_mv", "t", Seq("g"), aggs)

    // Delete group 1's max-carrier; group 2 gets a plain insert.
    val batch = Seq(
      (2, 1L, d("20.00"), "D"),
      (5, 2L, d("1.00"), "I"))
      .toDF("id", "g", "v", "__op")
      .select($"id", $"g", $"v".cast("decimal(12,2)"), $"__op")
    lake.applyChanges(spark, "t", batch, version = 2)
    val st = mv.refresh(spark, "t_mv")
    assert(st.recomputedGroups == 1)
    assertMatches(mv, "t_mv", lake.read(spark, "t"))
  }

  test("update moves an extremum; group vanishes when all rows delete") {
    val lake = mkLake()
    val mv = new Mview(lake)
    val v1 = rows((1, 1L, d("10.00")), (2, 1L, d("20.00")),
      (3, 2L, d("5.50")))
    lake.createTable(spark, "t", v1, Seq("id"))
    mv.create(spark, "t_mv", "t", Seq("g"), aggs)

    // U carries the new image (CDC semantics); old 20.00 max is gone.
    val b2 = Seq((2, 1L, d("2.00"), "U"), (3, 2L, d("5.50"), "D"))
      .toDF("id", "g", "v", "__op")
      .select($"id", $"g", $"v".cast("decimal(12,2)"), $"__op")
    lake.applyChanges(spark, "t", b2, version = 2)
    mv.refresh(spark, "t_mv")
    assertMatches(mv, "t_mv", lake.read(spark, "t"))
    assert(mv.read(spark, "t_mv").filter($"g" === 2).isEmpty,
      "fully-deleted group must leave the view")

    // Idempotence: base unchanged → no-op, no new MV version.
    val before = lake.currentManifest("t_mv").version
    val st = mv.refresh(spark, "t_mv")
    assert(st.affectedGroups == 0 && st.fromVersion == st.toVersion)
    assert(lake.currentManifest("t_mv").version == before)
  }

  test("filtered MV: per-image predicate, boundary crossings, no-base-touch") {
    val lake = mkLake()
    val mv = new Mview(lake)
    val v1 = rows((1, 1L, d("10.00")), (2, 1L, d("20.00")),
      (3, 2L, d("3.00")), (4, 2L, d("30.00")))
    lake.createTable(spark, "t", v1, Seq("id"))
    // Only rows with v >= 5 exist for the view.
    mv.create(spark, "t_mv", "t", Seq("g"), aggs, where = Some("v >= 5"))
    def recomputeF(base: DataFrame) = recompute(base.filter($"v" >= 5))
    def assertF(): Unit = {
      val got = mv.read(spark, "t_mv")
        .select($"g", $"n", $"sum_v".cast("decimal(38,2)"), $"avg_v",
          $"min_v", $"max_v")
        .orderBy("g").collect().toSeq
      val want = recomputeF(lake.read(spark, "t")).orderBy("g")
        .collect().toSeq
      assert(got == want)
    }
    assertF()

    def b(tuples: (Int, Long, Option[java.math.BigDecimal], String)*) =
      tuples.toDF("id", "g", "v", "__op")
        .select($"id", $"g", $"v".cast("decimal(12,2)"), $"__op")

    // A change entirely OUTSIDE the predicate must be a no-op refresh:
    // no affected groups, no new MV version.
    lake.applyChanges(spark, "t", b((3, 2L, d("4.00"), "U")), version = 2)
    val mvVer = lake.currentManifest("t_mv").version
    val st0 = mv.refresh(spark, "t_mv")
    assert(st0.affectedGroups == 0 && st0.recomputedGroups == 0)
    assert(lake.currentManifest("t_mv").version == mvVer,
      "out-of-predicate churn must not version the view")
    assertF()

    // Boundary crossings both ways: id=3 enters the view (4→6), id=2
    // leaves it (20→2). The exit deletes group 1's stored max carrier →
    // exactly one dirty group re-aggregates; group 2 sees only an
    // in-predicate insert image (its delete image 4.00 is filtered).
    lake.applyChanges(spark, "t",
      b((3, 2L, d("6.00"), "U"), (2, 1L, d("2.00"), "U")), version = 3)
    val st1 = mv.refresh(spark, "t_mv")
    assert(st1.recomputedGroups == 1, "only the exit-dirty group recomputes")
    assertF()
    assert(mv.read(spark, "t_mv").filter($"g" === 1).select("n")
      .as[Long].head() == 1L, "group 1 keeps only its in-predicate row")

    // Non-extremum in-predicate delete: group 2 holds {6.00, 30.00};
    // dropping 6.00 is min-tying... use an insert first to make a clean
    // middle value, then delete it — no extremum touched, no recompute.
    lake.applyChanges(spark, "t", b((5, 2L, d("8.00"), "I")), version = 4)
    assert(mv.refresh(spark, "t_mv").recomputedGroups == 0)
    lake.applyChanges(spark, "t", b((5, 2L, d("8.00"), "D")), version = 5)
    val st2 = mv.refresh(spark, "t_mv")
    assert(st2.recomputedGroups == 0,
      "non-extremum delete inside the predicate must not touch the base")
    assertF()
  }

  test("multi-version catch-up nets intermediate churn") {
    val lake = mkLake()
    val mv = new Mview(lake)
    lake.createTable(spark, "t",
      rows((1, 1L, d("10.00")), (2, 2L, d("20.00"))), Seq("id"))
    mv.create(spark, "t_mv", "t", Seq("g"), aggs)

    def b(tuples: (Int, Long, Option[java.math.BigDecimal], String)*) =
      tuples.toDF("id", "g", "v", "__op")
        .select($"id", $"g", $"v".cast("decimal(12,2)"), $"__op")
    // Three base versions before one refresh: insert → update → delete of
    // the same key nets to nothing; a second key survives mutated.
    lake.applyChanges(spark, "t", b((9, 1L, d("99.00"), "I"),
      (10, 2L, d("1.00"), "I")), version = 2)
    lake.applyChanges(spark, "t", b((9, 1L, d("98.00"), "U")), version = 3)
    lake.applyChanges(spark, "t", b((9, 1L, d("98.00"), "D"),
      (10, 2L, d("2.00"), "U")), version = 4)
    mv.refresh(spark, "t_mv")
    assertMatches(mv, "t_mv", lake.read(spark, "t"))
  }

  test("a crash between state apply and frontier write never double-folds") {
    // The hazard: refresh applies the delta to the MV state, then dies
    // BEFORE advancing the def's baseVersion. A naive next refresh
    // recomputes the same delta and folds it into state that already
    // contains it — counts and sums silently double. The write-ahead
    // intent (MvPending) makes the landed-but-unpromoted apply
    // detectable from the MV's own manifest version.
    val lake = mkLake()
    val mv = new Mview(lake)
    lake.createTable(spark, "t",
      rows((1, 1L, d("10.00")), (2, 2L, d("20.00"))), Seq("id"))
    mv.create(spark, "t_mv", "t", Seq("g"), aggs)
    val defPath = java.nio.file.Paths.get(lake.warehouse, "main.t_mv.mv.json")
    assert(java.nio.file.Files.exists(defPath), "spec expects this def layout")

    def b(tuples: (Int, Long, Option[java.math.BigDecimal], String)*) =
      tuples.toDF("id", "g", "v", "__op")
        .select($"id", $"g", $"v".cast("decimal(12,2)"), $"__op")
    lake.applyChanges(spark, "t", b((3, 1L, d("5.00"), "I")), version = 2)

    // CRASH-AFTER-APPLY: run the refresh (apply + promote), then rewind
    // the def file to what it looked like mid-refresh — old frontier,
    // intent present for the version the apply committed
    val defBefore = new String(java.nio.file.Files.readAllBytes(defPath),
      "UTF-8")
    mv.refresh(spark, "t_mv")
    val mvVersionAfter = lake.currentManifest("t_mv").commitVersion
    val crashed = defBefore.replaceFirst("\\}\\s*$",
      s""","pending":{"baseVersion":2,"mvVersion":$mvVersionAfter}}""")
    java.nio.file.Files.write(defPath, crashed.getBytes("UTF-8"))
    val stats = mv.refresh(spark, "t_mv")
    assert(stats.affectedGroups === 0L,
      s"landed apply must not re-fold: $stats")
    assertMatches(mv, "t_mv", lake.read(spark, "t"))

    // CRASH-BEFORE-APPLY: intent written but the apply never landed —
    // the next refresh discards the intent and refreshes normally
    lake.applyChanges(spark, "t", b((4, 2L, d("1.00"), "I")), version = 3)
    val current = new String(java.nio.file.Files.readAllBytes(defPath),
      "UTF-8")
    val preApply = current.replaceFirst("\\}\\s*$",
      s""","pending":{"baseVersion":3,"mvVersion":${mvVersionAfter + 7}}}""")
    java.nio.file.Files.write(defPath, preApply.getBytes("UTF-8"))
    val stats2 = mv.refresh(spark, "t_mv")
    assert(stats2.affectedGroups === 1L, s"unlanded intent must refresh: $stats2")
    assertMatches(mv, "t_mv", lake.read(spark, "t"))

    // CRASH-AFTER-APPLY + OUT-OF-BAND OPTIMIZE: the frontier watermark
    // rides the state commit and must SURVIVE a foreign rewrite of the
    // state mirror — version arithmetic over commitVersion would call
    // any post-optimize version "landed" (losing an unlanded delta),
    // and a watermark dropped by the rewrite would double-fold a landed
    // one. Neither may happen.
    lake.applyChanges(spark, "t", b((5, 1L, d("2.50"), "I")), version = 4)
    val defPre = new String(java.nio.file.Files.readAllBytes(defPath),
      "UTF-8")
    mv.refresh(spark, "t_mv") // apply lands, def promotes
    java.nio.file.Files.write(defPath, defPre.getBytes("UTF-8")) // crash sim
    lake.optimizeTable(spark, "t_mv", "full") // foreign commit on the state
    val stats3 = mv.refresh(spark, "t_mv")
    assert(stats3.affectedGroups === 0L,
      s"watermark must survive optimize and stop a re-fold: $stats3")
    assertMatches(mv, "t_mv", lake.read(spark, "t"))
  }
}
