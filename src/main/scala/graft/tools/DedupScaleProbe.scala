package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}
import graft.ops.PipelineQueries

/** Dedup-path scale probe (dev tool): runs the heaviest near-dup
  * pipeline queries at a given fixture scale and reports, alongside the
  * wall times, the structural counters that decide 100 TB viability —
  * corpus size, LSH candidate-pair count, paired-doc count, cluster
  * count and the largest cluster. The claim under test: candidates grow
  * with TRUE duplication (pairs within LSH bands), never quadratically
  * with the corpus; scale_up.py replicates every document `factor`
  * times, so true duplication itself grows ~factor² within clusters —
  * the probe verifies candidates track that curve and nothing worse,
  * and that the consume side (CC + aggregates) keeps pace.
  *
  * Usage: java -cp ... graft.tools.DedupScaleProbe <sfdir> [query...]
  */
object DedupScaleProbe {

  private val Heavy = Seq("q_dedup_minhash", "q_dedup_clusters",
    "q_dedup_canonical", "q_split_leakproof", "q_dedup_incremental",
    "q_embed_communities")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val only = if (args.length > 1) args.drop(1).toSeq else Heavy
    // Counters and every query in ONE JVM accumulates shuffle files and
    // checkpoint blocks until a driver GC lets the ContextCleaner run —
    // at sf10 that exhausts /tmp before the cleaner wakes. With explicit
    // query args the counters are skipped so each query can run in its
    // own short-lived JVM (scratch freed at exit).
    val countersToo = args.length <= 1
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.cacheInputs", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val nDocs = Tables.load(spark, dir, "documents").count()
    println(s"PROBE docs=$nDocs dir=$dir")

    // structural counters: the LSH candidate set and its closure shape
    if (countersToo) {
    val pairs = PipelineQueries.minhashPairs(spark, dir).cache()
    try {
      val nPairs = pairs.count()
      val paired = pairs.select(col("doc_a").as("d"))
        .unionAll(pairs.select(col("doc_b").as("d")))
        .distinct().count()
      println(s"PROBE lsh_pairs=$nPairs paired_docs=$paired " +
        f"pairs_per_doc=${nPairs.toDouble / nDocs}%.2f " +
        f"allpairs_frac=${2.0 * nPairs / (nDocs.toDouble * (nDocs - 1))}%.6f")
      val labels = graft.ops.ConnectedComponents.label(
        pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
      val sizes = labels.groupBy("comp").agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("clusters"), max("n").as("biggest")).head()
      println(s"PROBE clusters=${sizes.getLong(0)} " +
        s"biggest_cluster=${sizes.getLong(1)}")
    } finally pairs.unpersist(blocking = false)
    }

    for (name <- only; fn <- SparkEntry.queries.get(name)) {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"PROBE $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    spark.stop()
  }
}
