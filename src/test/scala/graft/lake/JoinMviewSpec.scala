package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Incremental JOIN-view maintenance: after every refresh the state must
  * equal a from-scratch join of the two mirrors' current versions, while
  * the stats prove change-proportional work (and a same-frontier refresh
  * is a no-op). */
class JoinMviewSpec extends SparkSuite {

  import spark.implicits._

  private def mkLake() = new Mooncake(tmpDir("jmview-spec"))

  private def orders(ts: (Int, Int, Long)*): DataFrame =
    ts.toDF("oid", "ckey", "amt")
  private def custs(ts: (Int, String)*): DataFrame =
    ts.toDF("cid", "nation")

  private def recompute(lake: Mooncake): Seq[(Int, Int, Long, Int, String)] =
    lake.read(spark, "o").join(lake.read(spark, "c"),
        col("ckey") === col("cid"))
      .select($"oid", $"ckey", $"amt", $"cid", $"nation")
      .as[(Int, Int, Long, Int, String)].collect().sortBy(_._1).toSeq

  private def state(jmv: JoinMview): Seq[(Int, Int, Long, Int, String)] =
    jmv.read(spark, "oc")
      .select($"oid", $"ckey", $"amt", $"cid", $"nation")
      .as[(Int, Int, Long, Int, String)].collect().sortBy(_._1).toSeq

  private def setup(): (Mooncake, JoinMview) = {
    val lake = mkLake()
    lake.createTable(spark, "o",
      orders((1, 10, 100L), (2, 10, 200L), (3, 20, 300L)), Seq("oid"))
    lake.createTable(spark, "c",
      custs((10, "FR"), (20, "DE"), (30, "JP")), Seq("cid"))
    val jmv = new JoinMview(lake)
    jmv.create(spark, "oc", "o", "c", Seq("ckey"), Seq("cid"))
    (lake, jmv)
  }

  test("create equals the full join; inserts fold; re-refresh is a no-op") {
    val (lake, jmv) = setup()
    assert(state(jmv) === recompute(lake))
    lake.applyChanges(spark, "o",
      orders((4, 20, 400L), (5, 30, 500L)).withColumn("__op", lit("I")),
      version = 2)
    val st = jmv.refresh(spark, "oc")
    assert(st.affectedPairs === 2, "one pair per inserted order")
    assert(state(jmv) === recompute(lake))
    val st2 = jmv.refresh(spark, "oc")
    assert(st2.affectedPairs === 0 && st2.appliedOps === 0, "no-op")
  }

  test("right-side delete cascades; join-key update moves the pair") {
    val (lake, jmv) = setup()
    // delete customer 10 → orders 1,2 drop out of the view
    lake.applyChanges(spark, "c",
      custs((10, "FR")).withColumn("__op", lit("D")), version = 2)
    jmv.refresh(spark, "oc")
    assert(state(jmv) === recompute(lake))
    assert(state(jmv).map(_._1) === Seq(3))
    // order 3 re-points from customer 20 to 30: old pair D, new pair U
    lake.applyChanges(spark, "o",
      orders((3, 30, 300L)).withColumn("__op", lit("U")), version = 2)
    val st = jmv.refresh(spark, "oc")
    assert(state(jmv) === recompute(lake))
    assert(state(jmv).map(r => (r._1, r._4)) === Seq(3 -> 30))
    assert(st.affectedPairs >= 2, "old and new partner pairs both touched")
  }

  test("both sides move in one window, including the ΔA⋈ΔB pair") {
    val (lake, jmv) = setup()
    lake.applyChanges(spark, "o",
      orders((6, 40, 600L)).withColumn("__op", lit("I")), version = 2)
    lake.applyChanges(spark, "c",
      custs((40, "BR")).withColumn("__op", lit("I")), version = 2)
    // also touch an existing pair's payload from the right
    lake.applyChanges(spark, "c",
      custs((20, "DE2")).withColumn("__op", lit("U")), version = 3)
    jmv.refresh(spark, "oc")
    assert(state(jmv) === recompute(lake))
    assert(state(jmv).exists(r => r._1 == 6 && r._5 == "BR"),
      "the pair born from BOTH deltas must appear")
    assert(state(jmv).exists(r => r._3 == 300L && r._5 == "DE2"))
  }

  test("orphan insert advances the frontier; late partner completes it") {
    val (lake, jmv) = setup()
    lake.applyChanges(spark, "o",
      orders((7, 77, 700L)).withColumn("__op", lit("I")), version = 2)
    val st1 = jmv.refresh(spark, "oc")
    assert(st1.affectedPairs === 0 && st1.appliedOps === 0,
      "no partner yet — frontier-only advance")
    assert(state(jmv) === recompute(lake))
    // the partner arrives later: the OLD left side must still pair up
    lake.applyChanges(spark, "c",
      custs((77, "IT")).withColumn("__op", lit("I")), version = 2)
    val st2 = jmv.refresh(spark, "oc")
    assert(st2.affectedPairs === 1)
    assert(state(jmv) === recompute(lake))
    assert(state(jmv).exists(r => r._1 == 7 && r._5 == "IT"))
  }

  test("composes with Mview: incremental join -> incremental GROUP BY") {
    // the full IVM pipeline: orders ⋈ customers kept fresh by JoinMview,
    // revenue-per-nation kept fresh by an Mview OVER the join state —
    // both refreshes are change-proportional, and the top equals a
    // from-scratch join+aggregate after every window.
    val (lake, jmv) = setup()
    val mv = new Mview(lake)
    mv.create(spark, "rev_by_nation", "oc", Seq("nation"),
      Seq(MvAgg("count", "*", "n_orders"), MvAgg("sum", "amt", "rev")))
    def top(): Seq[(String, Long, Long)] =
      mv.read(spark, "rev_by_nation")
        .select($"nation", $"n_orders", $"rev".cast("long"))
        .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    def want(): Seq[(String, Long, Long)] =
      lake.read(spark, "o").join(lake.read(spark, "c"),
          col("ckey") === col("cid"))
        .groupBy("nation")
        .agg(count(lit(1)).as("n"), sum("amt").cast("long").as("r"))
        .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(top() === want())
    // window: an insert, a cascade delete, and a payload update
    lake.applyChanges(spark, "o",
      orders((4, 20, 400L)).withColumn("__op", lit("I")), version = 2)
    lake.applyChanges(spark, "c",
      custs((10, "FR")).withColumn("__op", lit("D")), version = 2)
    jmv.refresh(spark, "oc")
    mv.refresh(spark, "rev_by_nation")
    assert(top() === want())
    lake.applyChanges(spark, "o",
      orders((3, 20, 999L)).withColumn("__op", lit("U")), version = 3)
    jmv.refresh(spark, "oc")
    mv.refresh(spark, "rev_by_nation")
    assert(top() === want())
    assert(top().map(_._1).toSet === Set("DE"))
  }

  test("continuous maintenance: two CDC streams keep the join view fresh") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val (lake, jmv) = setup()
    val inO = MemoryStream[(Int, Int, Long, String, Long)]
    val inC = MemoryStream[(Int, String, String, Long)]
    val oChanges = inO.toDF().toDF("oid", "ckey", "amt", "__op", "__seq")
    val cChanges = inC.toDF().toDF("cid", "nation", "__op", "__seq")
    val ckptO = tmpDir("jmv-ckpt-o")
    val ckptC = tmpDir("jmv-ckpt-c")

    // batch 1: an insert on orders and a cascade-delete on customers,
    // each stream naming the join view — whichever runs second folds
    // BOTH windows (refresh diffs base versions, not batch ids)
    inO.addData((4, 20, 400L, "I", 1L))
    inC.addData((10, "FR", "D", 1L))
    graft.streaming.CdcStream.attach(lake, "o", oChanges, ckptO,
      maintainJoins = Seq("oc")).awaitTermination()
    graft.streaming.CdcStream.attach(lake, "c", cChanges, ckptC,
      maintainJoins = Seq("oc")).awaitTermination()
    assert(state(jmv) === recompute(lake))
    assert(!state(jmv).exists(_._4 == 10), "cascade landed via the stream")

    // batch 2 on one side only; restart on the same checkpoints
    inO.addData((3, 30, 333L, "U", 2L))
    graft.streaming.CdcStream.attach(lake, "o", oChanges, ckptO,
      maintainJoins = Seq("oc")).awaitTermination()
    assert(state(jmv) === recompute(lake))
    assert(state(jmv).exists(r => r._1 == 3 && r._4 == 30 && r._3 == 333L))
  }

  test("stale definition heals from the state's own watermarks") {
    val (lake, jmv) = setup()
    lake.applyChanges(spark, "o",
      orders((4, 20, 400L)).withColumn("__op", lit("I")), version = 2)
    jmv.refresh(spark, "oc")
    val healthy = jmv.definition("oc")
    // simulate the crash window: the apply landed, the definition
    // write did not (rewind the frontier on disk)
    val p = java.nio.file.Paths.get(lake.warehouse,
      Identifier.parse("oc").fileName + ".jmv.json")
    val stale = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      .replace(s""""leftVersion":${healthy.leftVersion}""",
        """"leftVersion":1""")
    java.nio.file.Files.write(p, stale.getBytes("UTF-8"))
    assert(jmv.definition("oc").leftVersion === 1L, "rewind took")
    val st = jmv.refresh(spark, "oc")
    assert(st.affectedPairs === 0 && st.appliedOps === 0,
      "heal promotes the frontier from the state commit — no re-apply")
    assert(jmv.definition("oc").leftVersion === healthy.leftVersion)
    assert(state(jmv) === recompute(lake))
  }

  test("filtered + projected view: predicate-crossing updates flip membership") {
    val lake = mkLake()
    lake.createTable(spark, "o",
      orders((1, 10, 100L), (2, 10, 900L), (3, 20, 300L)), Seq("oid"))
    lake.createTable(spark, "c",
      custs((10, "FR"), (20, "DE")), Seq("cid"))
    val jmv = new JoinMview(lake)
    // view: only amt >= 500, and only (pk pair +) amt — the nation
    // column never appears in the state schema
    jmv.create(spark, "ocf", "o", "c", Seq("ckey"), Seq("cid"),
      where = Some("amt >= 500"), projection = Seq("amt"))
    def st(): Seq[(Int, Int, Long)] = jmv.read(spark, "ocf")
      .select($"oid", $"cid", $"amt")
      .as[(Int, Int, Long)].collect().sortBy(_._1).toSeq
    assert(jmv.read(spark, "ocf").columns.toSet ===
      Set("oid", "cid", "amt"), "projection cut to pk pair + amt")
    assert(st() === Seq((2, 10, 900L)), "create applies the predicate")

    // CROSS OUT: order 2's amt drops below the cut — it stays in the
    // JOIN but must LEAVE the view (a raw-join MV would keep it).
    // CROSS IN: order 1 rises above the cut — enters the view.
    lake.applyChanges(spark, "o",
      orders((2, 10, 400L), (1, 10, 700L)).withColumn("__op", lit("U")),
      version = 2)
    val s1 = jmv.refresh(spark, "ocf")
    assert(st() === Seq((1, 10, 700L)),
      "crossing updates flip membership both directions")
    assert(s1.appliedOps >= 2, "one delete + one upsert")

    // predicate-invisible side effect: customer delete still cascades
    // even though no customer column besides the pk is projected
    lake.applyChanges(spark, "c",
      custs((10, "FR")).withColumn("__op", lit("D")), version = 2)
    jmv.refresh(spark, "ocf")
    assert(st() === Seq.empty, "cascade through the projected state")

    // non-crossing churn applies nothing: order 3 updates below the
    // cut on both sides of the update
    lake.applyChanges(spark, "o",
      orders((3, 20, 350L)).withColumn("__op", lit("U")), version = 3)
    val s3 = jmv.refresh(spark, "ocf")
    assert(st() === Seq.empty)
    assert(s3.appliedOps === 0,
      "an out-of-view update applies nothing to the state")
  }
}
