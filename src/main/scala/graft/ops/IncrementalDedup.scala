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
  *      scan with NO shuffle. The scan is SUBLINEAR in the index: the
  *      index files are range-clustered on the band-prefixed key (the
  *      manifest's `clusterColumns` layout — pk stays (doc_id, band)
  *      for CDC addressing), and the batch's keys push through
  *      [[graft.lake.Mooncake.readForKeys]], so each file's truncated
  *      string bounds on `key` skip every file whose key range holds no
  *      batch key. At 100 TB a batch opens at most (batch keys) files
  *      — independent of corpus size (probe key sets larger than
  *      readForKeys' `maxInSet` degrade to range-only bounds, so split
  *      giant batches or raise the cap),
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
    * `key` is the BAND-PREFIXED LSH key — fixed-width "%02d:" band then
    * the minhash-row concat — so key equality is (band, key) equality
    * in one column AND the key's string order is (band asc, key asc):
    * range-clustering on it gives files whose key bounds never straddle
    * a band, which is what lets a probe's key set prune files (a bare
    * LSH key is uniform WITHIN each band, so without the prefix every
    * file's key range spans the whole space and nothing can skip).
    * Shingle-less docs (< 3 tokens) can never be near-dups — dropped,
    * same as the batch-global pipeline. */
  def bandIndex(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      SVE.word_shingles(col("text"), 3).as("sh"),
      HE.minhash_signature(HE.shingle_hashes(col("text"), 3)).as("sig"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), col("sh"),
        posexplode(TF.bandKeys(col("sig"))).as(Seq("band", "key")))
      .select(col("doc_id"), col("band"),
        format_string("%02d:%s", col("band"), col("key")).as("key"),
        col("sh"))

  /** Materialize the index mirror from the initial corpus. The pk
    * (doc_id, band) is the CDC replica identity (insert-only batches of
    * new doc_ids stay pure appends under its leading-key skipping); the
    * PHYSICAL layout range-clusters on the band-prefixed key so the
    * probe's keys prune files — the two roles deliberately differ. */
  def createIndex(s: SparkSession, lake: graft.lake.Mooncake,
      name: String, corpus: DataFrame,
      targetFileBytes: Long = 128L * 1024 * 1024): Unit =
    lake.createTable(s, name, bandIndex(corpus), Seq("doc_id", "band"),
      targetFileBytes = targetFileBytes, clusterBy = Seq("key"))

  /** Near-dup pairs of `batch` docs against the INDEXED corpus:
    * (doc_a = corpus doc, doc_b = batch doc, jacc). The batch bands
    * broadcast; the index streams through one pruned scan. */
  def dupPairs(s: SparkSession, lake: graft.lake.Mooncake,
      name: String, batch: DataFrame,
      maxInSet: Int = 10000): DataFrame =
    dupPairsFromBands(s, lake, name, bandIndex(batch), maxInSet)

  /** [[dupPairs]] over an ALREADY-banded batch — lets a caller that
    * needs the bands anyway (the streaming loop) hash the batch once. */
  private[ops] def dupPairsFromBands(s: SparkSession,
      lake: graft.lake.Mooncake, name: String, batchBands: DataFrame,
      maxInSet: Int = 10000, jaccMin: Double = 0.5): DataFrame = {
    // Layout-format guard: the probe equi-joins on the BAND-PREFIXED
    // key. An index persisted by the pre-prefix layout carries bare
    // minhash keys under an identical schema — probing it would return
    // zero pairs silently. The manifest's truncated string stats keep
    // the first characters of the true min, so the "%02d:" prefix is
    // checkable without opening a file.
    val keyMin = lake.currentManifest(name).files
      .flatMap(_.colMinStr.flatMap(_.get("key"))).headOption
    require(keyMin.forall(_.matches("^\\d\\d:.*")),
      s"band index '$name' predates the band-prefixed key layout " +
        s"(key min ${keyMin.get.take(12)}…) — rebuild it with createIndex")
    // The batch side is broadcast-sized BY CONTRACT — the probe below
    // ships it whole to every executor — so collect it ONCE here: the
    // driver pays the same memory the broadcast already pays, the
    // banding executes exactly once for its two consumers (the pushed
    // key set and the probe build), and nothing stays persisted behind
    // (the previous persist() relied on ContextCleaner GC and could pin
    // executor storage across repeated batch-mode calls on a long-lived
    // driver). A caller-persisted bands frame (the streaming loop,
    // which also feeds the within-batch pairing and the append) reads
    // its cache; an unpersisted one executes once.
    val probeRows = batchBands
      .select(col("key"), col("doc_id").as("doc_b"), col("sh").as("shb"))
      .collect()
    val probeLocal = s.createDataFrame(
      java.util.Arrays.asList(probeRows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        batchBands.schema("key"),
        batchBands.schema("doc_id").copy(name = "doc_b"),
        batchBands.schema("sh").copy(name = "shb"))))
    // the batch's band keys prune the index scan to the files whose
    // key-clustered ranges intersect them — a manifest file-skip +
    // pushed IN row filter; the equi-join below re-checks exact
    // equality, so the superset predicate can only cut IO. `maxInSet`
    // bounds the pushed key set (batch docs × bands keys); raise it for
    // larger batches — past it the probe degrades to range-only bounds,
    // which a band-prefixed layout barely prunes.
    val idx = lake.readForKeys(s, name, "key", probeLocal.select("key"),
      maxInSet = maxInSet)
    val probe = broadcast(probeLocal)
    idx.join(probe, Seq("key"))
      .filter(col("doc_id") =!= col("doc_b"))
      // score BEFORE deduping band collisions: jaccard is a fused
      // codegen'd map and deterministic per id pair, so re-scoring a
      // pair that matched in several bands costs arithmetic only, while
      // deduping first would shuffle every candidate WITH both shingle
      // arrays — this way the dedup exchange carries (doc_a, doc_b,
      // jacc) and only for pairs already past the threshold
      .select(col("doc_id").as("doc_a"), col("doc_b"),
        SVE.jaccard_sim(col("sh"), col("shb")).as("jacc"))
      .filter(col("jacc") >= jaccMin)
      .dropDuplicates("doc_a", "doc_b")
  }

  /** Append a batch's band rows to the index as one CDC insert batch —
    * the persisted corpus state advances without any rescan. The apply
    * path re-clusters multi-file rewrites on the manifest's (band, key)
    * layout; a small batch lands as ONE (band, key)-sorted file that
    * every probe opens until `optimize_table` folds it into the
    * clustered layout — batch-sized, so the probe stays sublinear in
    * the CORPUS either way. */
  def appendBatch(s: SparkSession, lake: graft.lake.Mooncake,
      name: String, batch: DataFrame, version: Long): Unit = {
    lake.applyChanges(s, name,
      bandIndex(batch).withColumn("__op", lit("I")), version)
    ()
  }

  /** The production ingest loop in one attachment: a STREAMING frame of
    * (doc_id, text) documents; each micro-batch
    *
    *   1. probes the persisted index ([[dupPairs]] — sublinear scan),
    *   2. drops batch docs that near-duplicate the corpus OR a
    *      lower-id doc of the same batch (the deterministic exemplar
    *      rule, so a replay converges to the same survivors),
    *   3. appends only the SURVIVORS' band rows ([[appendBatch]]).
    *
    * Same replay-vs-out-of-band-safe gate as [[graft.streaming
    * .CdcStream.attach]] and [[VectorIndex.attachStream]]
    * ([[graft.streaming.CdcStream.applyVersioned]]): a post-crash
    * replayed batch is skipped by the applied-batch marker, while an
    * out-of-band commit on the index (the `optimizeTable` that
    * [[appendBatch]]'s doc recommends, or a manual apply) only SHIFTS
    * the batch's version — a bare `version > current` compare would
    * instead classify the next micro-batch as a replay and silently
    * drop its survivor band rows, letting future duplicates of those
    * docs sail through undetected forever. The batch is
    * banded ONCE and the bands pinned — the probe, the within-batch
    * pairing, and the append all reuse them (minhashing is the batch
    * side's dominant cost; recomputing it per consumer would triple
    * it). `maxInSet` caps the probe's pushed key set (docs × bands
    * keys per micro-batch); raise it for large batches or the probe
    * degrades to near-useless range-only pruning. */
  def attachStream(lake: graft.lake.Mooncake, name: String,
      docs: DataFrame, checkpointDir: String,
      jaccardMin: Double = 0.5,
      maxInSet: Int = 10000,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val base = graft.streaming.CdcStream.pinnedBase(
      lake, name, checkpointDir)
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        graft.streaming.CdcStream.applyVersioned(lake, name,
          checkpointDir, base, batchId) { version =>
          val bands = bandIndex(batch).persist()
          try {
            val vsCorpus = dupPairsFromBands(s, lake, name, bands,
                maxInSet = maxInSet, jaccMin = jaccardMin)
              .select(col("doc_b").as("doc_id"))
            // within-batch: lower-id exemplar survives
            val a = bands.select(col("key"),
              col("doc_id").as("doc_a"), col("sh").as("sha"))
            val b = bands.select(col("key"),
              col("doc_id").as("doc_b"), col("sh").as("shb"))
            // no pair-level dedup here: only doc_b survives the
            // projection and the union's distinct() below subsumes it —
            // a dropDuplicates(doc_a, doc_b) would be one extra shuffle
            // per micro-batch for nothing
            val vsBatch = a.join(broadcast(b),
                a("key") === b("key") && col("doc_a") < col("doc_b"))
              .filter(SVE.jaccard_sim(col("sha"), col("shb")) >= jaccardMin)
              .select(col("doc_b").as("doc_id"))
            val dropIds = vsCorpus.unionAll(vsBatch).distinct()
            val survivorBands = bands.join(broadcast(dropIds),
              Seq("doc_id"), "left_anti")
            lake.applyChanges(s, name,
              survivorBands.withColumn("__op", lit("I")), version)
          } finally {
            bands.unpersist(blocking = false)
            ()
          }
        }
        ()
      }
      .start()
  }
}
