package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.expressions.{SetVectorExpressions => SVE}
import graft.lake.Mooncake

/** Persisted IVF vector index over an embedding corpus, stored as
  * mooncake mirror tables — build ONCE, probe many, append
  * incrementally. `PipelineQueries.embedIvf` demonstrates the IVF math
  * in a single query (rebuild-per-query); this is the index-maintenance
  * story a serving pipeline needs at 100 TB:
  *
  *   - `<name>_centroids` — the model (k rows, driver-sized);
  *   - `<name>_postings` — (cluster, vec_id, embedding), range-clustered
  *     on cluster id, so every data file owns a tight cluster range and
  *     a probe's cluster key set prunes files via the manifest's
  *     integer bounds + the pushed IN list ([[graft.lake.RuntimeFilter]]
  *     contract through `readForKeys`): probing 2 of 1000 clusters
  *     opens ~2/1000 of the files, independent of corpus size.
  *
  * Appends assign against the EXISTING centroids (broadcast, fused
  * cosine kernel, shuffle-free) and land as one CDC insert batch —
  * O(batch), never an index rebuild. Centroids come from the caller:
  * [[KMeans.fit]] in production, any deterministic source where a
  * bit-exact oracle is needed (the `q_embed_index` pattern).
  *
  * Assignment/probe tie-break is everywhere (cos desc, cid asc) — the
  * same rule as embedIvf/KMeans, so all three agree on cluster
  * boundaries.
  */
object VectorIndex {

  private def centroidsTable(name: String) = s"${name}_centroids"
  private def postingsTable(name: String) = s"${name}_postings"

  /** Nearest-centroid assignment: collect the driver-sized model and
    * fuse the argmax into one per-row kernel — a narrow map with NO
    * exchange between the corpus scan and the assignment (the r8
    * cross-join + window shape re-shuffled k× corpus bytes). `vecs`:
    * (vec_id, embedding); `cents`: (cid, cv). Same (cos desc, cid asc)
    * tie-break, bit-identical cosines ([[CentroidModel]]). */
  private def assignTo(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val model = CentroidModel.collect(cents)
    val nc = SVE.nearest_centroid(col("embedding"), model)
    vecs.select(nc.getField("cluster").as("cluster"),
      col("vec_id"), col("embedding"))
  }

  /** Build the index: persist centroids and cluster-range-clustered
    * postings as mirror tables. `targetFiles` pins an explicit posting
    * file count (tests, known layouts); None (the default) lets
    * createTable size files from plan stats at ~128 MB — the right
    * at-scale behavior. Either way createTable performs the ONE range
    * shuffle; pre-partitioning here would just be re-shuffled by the
    * identical pk clustering downstream. */
  def build(s: SparkSession, lake: Mooncake, name: String,
      vecs: DataFrame, cents: DataFrame,
      targetFiles: Option[Int] = None): Unit = {
    lake.createTable(s, centroidsTable(name),
      cents.select(col("cid").cast("long").as("cid"), col("cv")),
      pk = Seq("cid"))
    lake.createTable(s, postingsTable(name), assignTo(vecs, cents),
      pk = Seq("cluster", "vec_id"), targetFileCount = targetFiles)
    ()
  }

  /** Append a batch: assign against the PERSISTED centroids (no
    * retrain, no corpus rescan) and commit one CDC insert batch. */
  def append(s: SparkSession, lake: Mooncake, name: String,
      batch: DataFrame, version: Long): Unit = {
    val cents = lake.read(s, centroidsTable(name))
      .select(col("cid"), col("cv"))
    lake.applyChanges(s, postingsTable(name),
      assignTo(batch, cents).withColumn("__op", lit("I")), version)
    ()
  }

  /** Continuous index maintenance: attach a STREAMING frame of (vec_id,
    * embedding) rows; each micro-batch assigns against the persisted
    * centroids and lands as one CDC insert, the batch id advancing the
    * postings version frontier. Same pinned-base idempotency contract
    * as [[graft.streaming.CdcStream.attach]] — a post-crash replayed
    * batch recomputes its original version and is skipped, never
    * double-appended. */
  def attachStream(lake: Mooncake, name: String, vectors: DataFrame,
      checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val base = graft.streaming.CdcStream.pinnedBase(
      lake, postingsTable(name), checkpointDir)
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // replay-vs-out-of-band-safe gate (see CdcStream.applyVersioned:
        // a bare version comparison would silently drop a batch after
        // any out-of-band commit, e.g. optimizeTable on the postings)
        graft.streaming.CdcStream.applyVersioned(lake,
          postingsTable(name), checkpointDir, base, batchId) { v =>
          append(batch.sparkSession, lake, name, batch, v)
        }
        ()
      }
      .start()
  }

  /** Probe: per query (qid, qv), rank the `nprobe` nearest clusters,
    * scan ONLY their postings (file skipping via the pushed cluster key
    * set), exact-cosine the candidates, return the top `k` per query as
    * (qid, rank, vec_id, cos). Queries are broadcast-sized by
    * assumption (a serving batch, not a corpus). */
  def probe(s: SparkSession, lake: Mooncake, name: String,
      queries: DataFrame, k: Int, nprobe: Int,
      excludeSelfId: Boolean = false): DataFrame = {
    val cents = lake.read(s, centroidsTable(name))
      .select(col("cid"), col("cv"))
    val pw = Window.partitionBy("qid").orderBy(col("pcos").desc, col("cid"))
    val probes = queries.join(broadcast(cents), lit(true))
      .select(col("qid"), col("qv"), col("cid"),
        SVE.cosine_sim(col("qv"), col("cv")).as("pcos"))
      .withColumn("prn", row_number().over(pw))
      .filter(col("prn") <= nprobe)
      .select(col("qid"), col("qv"), col("cid").as("cluster"))
    val cands = lake.readForKeys(s, postingsTable(name), "cluster",
      probes.select("cluster"))
    // excludeSelfId is for CORPUS-side queries (near-dup scans, where
    // qid IS a corpus vec_id). A serving batch's qids are an unrelated
    // id space — excluding there would silently drop any corpus vector
    // whose id happens to collide with a request id, so the default is
    // no exclusion.
    val scored = cands.join(broadcast(probes), Seq("cluster"))
      .filter(if (excludeSelfId) col("vec_id") =!= col("qid") else lit(true))
      .select(col("qid"), col("vec_id"),
        SVE.cosine_sim(col("qv"), col("embedding")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select("qid", "rank", "vec_id", "cos")
  }
}
