package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.expressions.{HashExpressions => HE, SetVectorExpressions => SVE}
import graft.functions.{TextFunctions => TF}

/** INCREMENTAL corpus deduplication — the shape a training pipeline
  * actually runs: the corpus is already deduplicated once; every new
  * ingest batch must be checked against 100 TB of EXISTING documents
  * without rescanning or re-hashing them.
  *
  * The persisted state is the MinHash BAND INDEX as a mooncake table:
  * one row per (doc, band) carrying the band's LSH key and the doc's
  * shingle set. Checking a batch is then:
  *
  *   1. band the batch (per-row hashing, no shuffle),
  *   2. equi-join batch bands against the index on (band, key) — the
  *      batch side broadcasts, so the corpus index streams through ONE
  *      scan with NO shuffle (and mooncake manifest stats can skip
  *      index files whose key ranges cannot match),
  *   3. verify candidates with exact Jaccard INLINE — the shingles ride
  *      the matched index rows, so no second corpus pass fetches them.
  *
  * Storing shingles per band row duplicates them ×Bands; that is the
  * deliberate trade for a single-pass probe (the alternative — a
  * separate doc→shingles table — makes every batch check pay a second
  * corpus-wide join). Accepted batch docs append to the index through
  * the SAME CDC apply path every mirror uses ([[appendBatch]]), so a
  * streaming ingest ([[graft.streaming.CdcStream]]) keeps the index
  * live batch by batch.
  */
object IncrementalDedup {

  /** Band-index rows for a set of documents: (doc_id, band, key, sh).
    * Shingle-less docs (< 3 tokens) can never be near-dups — dropped,
    * same as the batch-global pipeline. */
  def bandIndex(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      SVE.word_shingles(col("text"), 3).as("sh"),
      HE.minhash_signature(HE.shingle_hashes(col("text"), 3)).as("sig"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), col("sh"),
        posexplode(TF.bandKeys(col("sig"))).as(Seq("band", "key")))
      .select(col("doc_id"), col("band"), col("key"), col("sh"))

  /** Materialize the index mirror from the initial corpus. The pk
    * (doc_id, band) is the CDC replica identity; the range-clustered
    * backfill gives doc_id-bounded files, so later maintenance touches
    * only the affected ranges. */
  def createIndex(s: SparkSession, lake: graft.lake.Mooncake,
      name: String, corpus: DataFrame): Unit =
    lake.createTable(s, name, bandIndex(corpus), Seq("doc_id", "band"))

  /** Near-dup pairs of `batch` docs against the INDEXED corpus:
    * (doc_a = corpus doc, doc_b = batch doc, jacc). The batch bands
    * broadcast; the index streams through one pruned scan. */
  def dupPairs(s: SparkSession, lake: graft.lake.Mooncake,
      name: String, batch: DataFrame): DataFrame = {
    val idx = lake.read(s, name)
    val probe = broadcast(bandIndex(batch)
      .select(col("band"), col("key"),
        col("doc_id").as("doc_b"), col("sh").as("shb")))
    idx.join(probe, Seq("band", "key"))
      .filter(col("doc_id") =!= col("doc_b"))
      .select(col("doc_id").as("doc_a"), col("doc_b"),
        col("sh").as("sha"), col("shb"))
      // dedupe band collisions on the ID PAIR alone — sha/shb are
      // functionally determined by the ids, and a full distinct() would
      // shuffle and compare the (xBands-duplicated) shingle arrays as
      // grouping keys for no semantic gain
      .dropDuplicates("doc_a", "doc_b")
      .select(col("doc_a"), col("doc_b"),
        SVE.jaccard_sim(col("sha"), col("shb")).as("jacc"))
      .filter(col("jacc") >= 0.5)
  }

  /** Append a batch's band rows to the index as one CDC insert batch —
    * the persisted corpus state advances without any rescan. */
  def appendBatch(s: SparkSession, lake: graft.lake.Mooncake,
      name: String, batch: DataFrame, version: Long): Unit = {
    lake.applyChanges(s, name,
      bandIndex(batch).withColumn("__op", lit("I")), version)
    ()
  }
}
