package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.expressions.{AggExpressions => AE,
  BloomExpressions => BF, BloomRuntime}

/** The bounded-state sketch aggregates run INSIDE watermarked streaming
  * aggregation — their buffers serialize into the state store, merge
  * across micro-batches, and finalize with the window. That is the 100 TB
  * streaming story: per-window state stays O(k)/O(m)/O(bits) no matter
  * how many events a window sees. */
class StreamingSketchSpec extends SparkSuite {
  import spark.implicits._

  private def t(minute: Long): Timestamp =
    Timestamp.valueOf(java.time.LocalDateTime.of(2026, 1, 1, 0, 0)
      .plusMinutes(minute))

  test("BoundedTopK in a streaming window equals the batch top-k") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val agg = input.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(AE.bounded_top_k(struct(col("v")), 3, Seq(true)).as("top"))
      .select(col("window.start").as("ws"),
        expr("transform(top, s -> s.v)").as("top"))
    val q = agg.writeStream.format("memory").queryName("topk_out")
      .outputMode("append").start()
    try {
      val hour0 = Seq(5L, 99L, 3L, 42L, 77L, 99L, 1L)
      input.addData(hour0.map(v => (t(v % 60), v)): _*)
      q.processAllAvailable()
      input.addData((t(200), 0L)) // advance watermark, finalize hour 0
      q.processAllAvailable()
      val rows = spark.table("topk_out").where(col("ws") === t(0))
        .select("top").as[Seq[Long]].collect()
      assert(rows.length === 1)
      assert(rows.head === hour0.sorted(Ordering[Long].reverse).take(3),
        s"streaming top-3 diverged: ${rows.head}")
    } finally q.stop()
  }

  test("FrequentItems in a streaming window honors the MG guarantee") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val agg = input.toDF().toDF("ts", "tok")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(AE.frequent_items(col("tok"), 2).as("f"), count("*").as("n"))
      .select(col("window.start").as("ws"), col("f"), col("n"))
    val q = agg.writeStream.format("memory").queryName("freq_out")
      .outputMode("append").start()
    try {
      // 12 'a', 3 'b', 1 each of c/d/e: N=18, m=2 -> every token with
      // count > N/3 = 6 (only 'a') must survive any merge order.
      val toks = Seq.fill(12)("a") ++ Seq.fill(3)("b") ++ Seq("c", "d", "e")
      toks.zipWithIndex.grouped(6).foreach { batch =>
        input.addData(batch.map { case (s, i) => (t(i % 60), s) }: _*)
        q.processAllAvailable()
      }
      input.addData((t(200), "z"))
      q.processAllAvailable()
      val row = spark.table("freq_out").where(col("ws") === t(0)).head()
      val items = row.getSeq[org.apache.spark.sql.Row](row.fieldIndex("f"))
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(row.getAs[Long]("n") === 18L)
      assert(items.contains("a"), s"guaranteed-heavy token missing: $items")
      // MG undercount bound: estimate >= true - N/(m+1)
      assert(items("a") >= 12L - 6L, s"undercount past the bound: $items")
    } finally q.stop()
  }

  test("BloomBuild in a streaming window never false-negatives its members") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val agg = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(BF.bloom_build(col("k"), 16384, 7).as("bloom"))
      .select(col("window.start").as("ws"), col("bloom"))
    val q = agg.writeStream.format("memory").queryName("bloom_out")
      .outputMode("append").start()
    try {
      val keys = (1L to 500L).map(_ * 2654435761L)
      keys.grouped(100).foreach { g =>
        input.addData(g.map(k => (t(k % 60), k)): _*)
        q.processAllAvailable()
      }
      input.addData((t(200), 0L))
      q.processAllAvailable()
      val bloom = spark.table("bloom_out").where(col("ws") === t(0))
        .head().getAs[Array[Byte]]("bloom")
      assert(keys.forall(BloomRuntime.mightContain(bloom, _, 7)),
        "a streamed member went missing — merge across micro-batches broke")
    } finally q.stop()
  }

  test("CountMinBuild in a streaming window: one-sided across micro-batches") {
    import graft.functions.expressions.{CmExpressions => CM, CmRuntime}
    implicit val sc = spark.sqlContext
    val D = 4
    val W = 256
    val input = MemoryStream[(Timestamp, Long)]
    val agg = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(CM.cm_build(col("k"), D, W).as("sk"), count("*").as("n"))
      .select(col("window.start").as("ws"), col("sk"), col("n"))
    val q = agg.writeStream.format("memory").queryName("cm_out")
      .outputMode("append").start()
    try {
      // hour 0 across THREE micro-batches: the d*w matrix must
      // serialize into the state store and merge by element-wise add
      val b1 = Seq.fill(7)(1L) ++ Seq(2L, 3L)
      val b2 = Seq.fill(5)(1L) ++ Seq(2L, 4L)
      val b3 = Seq(5L, 5L, 5L)
      input.addData(b1.map(v => (t(1), v)): _*)
      q.processAllAvailable()
      input.addData(b2.map(v => (t(2), v)): _*)
      q.processAllAvailable()
      input.addData(b3.map(v => (t(3), v)): _*)
      q.processAllAvailable()
      input.addData((t(200), 0L)) // finalize hour 0
      q.processAllAvailable()
      val row = spark.table("cm_out").where(col("ws") === t(0)).head()
      val sk = row.getAs[Array[Byte]]("sk")
      val n = row.getAs[Long]("n")
      val exact = (b1 ++ b2 ++ b3).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      assert(n === exact.values.sum)
      val eps = 3L * n / W + 1
      for ((k, cnt) <- exact) {
        val est = CmRuntime.estimate(sk, k, D, W)
        assert(est >= cnt, s"streamed merge under-counted $k: $est < $cnt")
        assert(est <= cnt + eps, s"bound blown for $k")
      }
    } finally q.stop()
  }
}
