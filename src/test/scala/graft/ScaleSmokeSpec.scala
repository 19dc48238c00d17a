package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

/** Scale smoke: the core operator shapes on 50M rows (~80x the sf0.1
  * bench fact table) in one local JVM. Not a benchmark — an existence
  * proof that the plans stay partition-parallel with no driver-side
  * materialization: if anything collects or buffers per-key on the
  * driver, this test is what dies. */
class ScaleSmokeSpec extends SparkSuite {

  test("50M-row aggregate / broadcast join / window stay distributed") {
    val n = 50L * 1000 * 1000
    val fact = spark.range(0, n, 1, 32)
      .select(col("id"), (col("id") % 1000).as("k"),
        (col("id") % 97).cast("double").as("v"))

    // partial+final hash aggregate: one shuffle of 1000 groups
    val agg = fact.groupBy("k")
      .agg(count(lit(1)).as("c"), sum("v").as("s"))
    assert(agg.count() === 1000)

    // broadcast dim join + filtered count
    val dim = spark.range(0, 1000).select(col("id").as("k"),
      (col("id") % 2 === 0).as("even"))
    val joined = fact.join(broadcast(dim), "k").filter(col("even"))
    assert(joined.count() === n / 2)

    // ranked window over 1000 partitions of 50k rows each
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("id"))
    val top = fact.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
    assert(top.count() === 2000)
  }

  test("50M-row diff and token-histogram shapes stay distributed") {
    val n = 50L * 1000 * 1000
    val base = spark.range(0, n, 1, 32)
      .select(col("id"), (col("id") % 1000000).as("payload"))

    // snapshot-diff shape: exceptAll both ways between two versions that
    // differ in 1000 rows — a full-width shuffle each way, no driver set
    val changed = base.withColumn("payload",
      when(col("id") % 50000 === 0, col("payload") + 1)
        .otherwise(col("payload")))
    val diff = changed.exceptAll(base).unionAll(base.exceptAll(changed))
    assert(diff.count() === 2000)

    // vocabulary shape: explode 4 tokens/row -> partial-agg count ->
    // top-k via TakeOrderedAndProject (never a full sort of the vocab)
    val vocab = spark.range(0, n / 10, 1, 32)
      .select(explode(array(
        (col("id") % 101).cast("string"),
        (col("id") % 103).cast("string"),
        (col("id") % 107).cast("string"),
        lit("the"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("token")).limit(5)
    val topTok = vocab.collect()
    assert(topTok.head.getString(0) === "the")
    assert(topTok.head.getLong(1) === n / 10)
  }

  test("connected components: 200k-node graph with a 4096-hop chain converges") {
    import spark.implicits._
    // 20k short chains of 10 nodes (the near-clique common case) plus
    // one 4096-node chain (diameter the pointer jump must fold in
    // ~log2(4096)=12 rounds — plain propagation would need 4096).
    // Driver state stays a per-round count; labels live on executors.
    val shortChains = spark.range(0, 200000, 1, 16)
      .filter(col("id") % 10 =!= 9)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    val longChain = spark.range(1000000, 1004095, 1, 4)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    val labels = graft.ops.ConnectedComponents
      .label(shortChains.unionAll(longChain))
    val byComp = labels.groupBy("comp").count()
    // 20k short components of size 10 + one long component of 4096
    assert(byComp.filter(col("count") === 10).count() === 20000)
    assert(byComp.filter(col("count") === 4096).count() === 1)
    assert(labels.filter(col("id") === 1004095L)
      .as[(Long, Long)].head()._2 === 1000000L)
  }

  test("deletion vectors: 5M-row table, 500k dead rows, scan-side filter") {
    val dir = tmpDir("scale-dv")
    val n = 5L * 1000 * 1000
    graft.lake.DeltaCompat.write(
      spark.range(0, n, 1, 16).select(col("id").as("k"),
        (col("id") % 1000).as("v")), dir)
    // delete every 10th row: the coordinates are CDC-scale driver work
    // (bounded by DV cardinality, which the log must hold anyway); the
    // APPLICATION is the part that must stay distributed — a broadcast
    // bitmap probe per row inside the scan, no rewrite, no shuffle
    graft.lake.DeltaCompat.delete(spark, dir, col("k") % 10 === 0)
    val after = graft.lake.DeltaCompat.read(spark, dir)
    assert(after.count() === n - n / 10)
    assert(after.filter(col("k") % 10 === 0).count() === 0)
    // and the original parts are untouched on disk (no rewrite)
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator().asScala.count(_.getFileName.toString.endsWith(".parquet")) === 16)
  }
}
