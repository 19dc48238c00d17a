package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.expressions.{BloomExpressions => BF,
  HashExpressions => HE, SetVectorExpressions => SVE}
import graft.functions.expressions.BloomRuntime

/** Corpus-curation operators a training-data pipeline runs after the
  * per-document analyses in [[PipelineQueries]]: dedup-cluster closure,
  * mixture-balancing stratified sampling, PII redaction, and train/eval
  * decontamination. All oracle-checked — sampling keep-decisions and
  * redaction regexes are deterministic integer/RE2-compatible constructs
  * DuckDB reproduces exactly.
  */
object CurationQueries {

  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  // ===========================================================================
  // Dedup clusters: connected components over MinHash near-dup pairs
  // ===========================================================================

  /** Near-dup clusters: transitive closure of the MinHash-LSH pair set
    * ([[PipelineQueries.minhashPairs]]) via [[ConnectedComponents]];
    * each doc in a cluster is labeled with the cluster's min doc_id
    * (the canonical survivor) and the cluster size. At 100 TB this is
    * the step that turns "A~B and B~C" into one kept document instead
    * of two — pair-level dedup alone under-deletes. The label loop
    * shuffles O(pairs) rows per hop; near-dup clusters are
    * LSH-band-connected near-cliques, so it converges in 2-3 hops.
    *
    * csize is a groupBy(comp).count() joined back — NOT a
    * comp-partitioned window. Web-scale near-dup graphs routinely grow
    * one giant component (boilerplate chains); a window partitioned on
    * the component key funnels that whole component through one task,
    * while the aggregate absorbs it map-side (partial count per input
    * partition) and the join-back skew is AQE-splittable. */
  val dedupClusters: Q = (s, dir) => {
    val edges = PipelineQueries.minhashPairs(s, dir)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    withClusterSizes(
      ConnectedComponents.requireBounded(ConnectedComponents.label(edges)))
      .select(col("id").as("doc_id"), col("comp").as("rep"), col("csize"))
      .orderBy("doc_id")
  }

  /** Attach per-cluster size to a (id, comp) label frame WITHOUT a
    * comp-partitioned window: groupBy(comp).count() (map-side partials
    * absorb a giant component) joined back (skew AQE-splittable). */
  private[graft] def withClusterSizes(labels: DataFrame): DataFrame = {
    val sizes = labels.groupBy("comp").agg(count(lit(1)).as("csize"))
    labels.join(sizes, "comp")
  }

  /** Oracle: same pair set (embedded verbatim as a CTE), closed by a
    * recursive reachability CTE; comp = min reachable id. MATERIALIZED
    * keeps DuckDB from evaluating the minhash pipeline once per CTE
    * reference (3x cheaper, identical rows). */
  val dedupClustersSql: String =
    s"""WITH RECURSIVE pairs AS MATERIALIZED (
       |  SELECT doc_a, doc_b FROM (${PipelineQueries.minhashPairsSql})
       |), edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT doc_b AS src, doc_a AS dst FROM pairs
       |), reach AS (
       |  SELECT src AS id, dst AS r FROM edges
       |  UNION
       |  SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r
       |), labels AS (
       |  SELECT id AS doc_id, least(id, min(r)) AS rep FROM reach GROUP BY id
       |)
       |SELECT doc_id, rep, count(*) OVER (PARTITION BY rep) AS csize
       |FROM labels ORDER BY doc_id""".stripMargin

  /** Quality-aware canonical selection — the dedup pipeline's ACTUAL
    * keep/drop decision: every document gets a cluster rep (its
    * [[dedupClusters]] component, itself when it is in no near-dup
    * pair) and a `keep` verdict — true only for the best doc of its
    * cluster (longest text, ties to the smallest doc_id). min-id
    * survivorship (what [[PipelineQueries.dedupExact]] reports) throws
    * away the best copy whenever the canonical-by-id happens to be a
    * truncated variant; real curation keeps the argmax-quality copy.
    *
    * Scale shape: the label frame holds only docs incident to a
    * near-dup pair (≪ corpus), the corpus joins it once on doc_id, and
    * the keep verdict is a groupBy(rep).agg(max_by) joined back — NOT a
    * rep-partitioned window. A giant near-dup component (web
    * boilerplate) would funnel through one window task; max_by is a
    * DeclarativeAggregate with map-side partials, so the hot key is
    * absorbed before the shuffle and the join-back skew is
    * AQE-splittable. No global sort beyond the verify harness's. */
  val dedupCanonical: Q = (s, dir) => {
    val d = docs(s, dir).select(col("doc_id"), col("n_chars"))
    val edges = PipelineQueries.minhashPairs(s, dir)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val labels =
      ConnectedComponents.requireBounded(ConnectedComponents.label(edges))
    val labeled = d.join(labels, d("doc_id") === labels("id"), "left")
      .select(d("doc_id"), coalesce(col("comp"), d("doc_id")).as("rep"),
        col("n_chars"))
    canonicalKeep(labeled).orderBy("doc_id")
  }

  /** Per-cluster argmax keep verdict over a (doc_id, rep, n_chars)
    * frame WITHOUT a rep-partitioned window: best doc by (n_chars DESC,
    * doc_id ASC) = max_by over the (n_chars, -doc_id) struct — a
    * DeclarativeAggregate with map-side partials — joined back. */
  private[graft] def canonicalKeep(labeled: DataFrame): DataFrame = {
    val best = labeled.groupBy("rep")
      .agg(max_by(col("doc_id"),
        struct(col("n_chars"), (-col("doc_id")).as("nid"))).as("best_id"))
    labeled.join(best, "rep")
      .select(col("doc_id"), col("rep"),
        (col("doc_id") === col("best_id")).as("keep"))
  }

  /** Oracle: the [[dedupClustersSql]] closure, left-joined onto the
    * corpus, argmax by (n_chars DESC, doc_id). */
  val dedupCanonicalSql: String =
    s"""WITH RECURSIVE pairs AS MATERIALIZED (
       |  SELECT doc_a, doc_b FROM (${PipelineQueries.minhashPairsSql})
       |), edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT doc_b AS src, doc_a AS dst FROM pairs
       |), reach AS (
       |  SELECT src AS id, dst AS r FROM edges
       |  UNION
       |  SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r
       |), labels AS (
       |  SELECT id, least(id, min(r)) AS rep FROM reach GROUP BY id
       |), lab AS (
       |  SELECT d.doc_id, coalesce(l.rep, d.doc_id) AS rep, d.n_chars
       |  FROM documents d LEFT JOIN labels l ON d.doc_id = l.id
       |)
       |SELECT doc_id, rep,
       |  (row_number() OVER (PARTITION BY rep
       |     ORDER BY n_chars DESC, doc_id) = 1) AS keep
       |FROM lab ORDER BY doc_id""".stripMargin

  // ===========================================================================
  // Stratified sampling: per-language corpus cap (mixture balancing)
  // ===========================================================================

  /** Deterministic stratified sample capping every language at ~100
    * docs: per-lang keep rate = min(1, 100/count), applied by an LCG
    * hash of doc_id against the rate in permille. The rate table is a
    * handful of rows — broadcast — so the corpus pass is shuffle-free:
    * count-aggregate (map-side combined) + broadcast-join + filter.
    * This is mixture balancing for training-set composition; the same
    * shape serves any per-stratum quota (source, quality bucket). */
  val sampleStratified: Q = (s, dir) => {
    val d = docs(s, dir)
    // greatest(1, ...): past 100k docs the floored permille hits 0 and
    // would DELETE the stratum outright instead of capping it — keep at
    // least 1‰ so huge languages stay represented (binds only past
    // 100k docs/stratum; no fixture scale reaches it, so the clamp
    // changes no oracle hash).
    val rates = d.groupBy("lang").agg(count(lit(1)).as("cnt"))
      .select(col("lang"),
        greatest(lit(1L),
          floor(least(lit(1.0), lit(100.0) / col("cnt").cast("double")) * 1000)
            .cast("bigint")).as("permille"))
    // The LCG input is doc_id folded into [0, 1048573) first — spelled as
    // ((x % p) + p) % p so Spark and DuckDB compute the identical
    // non-negative residue. Multiplying raw doc_id would wrap silently in
    // Spark but raise a BIGINT-overflow error in DuckDB for ids ≳ 8.4e9,
    // and a negative product makes `% 1000` negative (always kept).
    val folded = (col("doc_id") % 1048573L + 1048573L) % 1048573L
    d.join(broadcast(rates), "lang")
      .filter((folded * 1103515245L + 12345L) % 1000 < col("permille"))
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  val sampleStratifiedSql: String =
    """WITH r AS (
      |  SELECT lang,
      |    greatest(1, CAST(floor(least(CAST(1.0 AS DOUBLE),
      |      100.0 / CAST(count(*) AS DOUBLE)) * 1000) AS BIGINT)) AS permille
      |  FROM documents GROUP BY lang)
      |SELECT d.doc_id, d.lang
      |FROM documents d JOIN r ON d.lang = r.lang
      |WHERE (((d.doc_id % 1048573 + 1048573) % 1048573) * 1103515245 + 12345) % 1000 < r.permille
      |ORDER BY d.doc_id""".stripMargin

  // ===========================================================================
  // PII redaction
  // ===========================================================================

  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII redaction: replace emails and IPv4 addresses with placeholder
    * tokens, reporting per-doc match counts and the hash of the scrubbed
    * text. The synthetic corpus carries no PII, so the fixture is
    * enriched deterministically (doc_id-derived email / IP appended on
    * both engine and oracle side) — the operator under test is the
    * regex scrub itself. Patterns are RE2-compatible (no backrefs or
    * lookaround) so Java and DuckDB match identically. Per-row, no
    * shuffle; regexes run inside whole-stage codegen. */
  val textRedact: Q = (s, dir) => {
    val enriched = concat(col("text"),
      when(col("doc_id") % 7 === 0,
        concat(lit(" contact u"), col("doc_id").cast("string"),
          lit("@example.com"))).otherwise(lit("")),
      when(col("doc_id") % 11 === 0,
        concat(lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
          lit("."), (col("doc_id") % 100).cast("string"))).otherwise(lit("")))
    docs(s, dir)
      .select(col("doc_id"), enriched.as("t"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("t"), lit(emailRe), lit(0)))
          .cast("bigint").as("n_email"),
        size(regexp_extract_all(col("t"), lit(ipRe), lit(0)))
          .cast("bigint").as("n_ip"),
        md5(regexp_replace(regexp_replace(col("t"), emailRe, "<EMAIL>"),
          ipRe, "<IP>")).as("red_hash"))
      .orderBy("doc_id")
  }

  val textRedactSql: String = {
    val enriched =
      "text || CASE WHEN doc_id % 7 = 0 THEN ' contact u' || " +
        "CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END" +
        " || CASE WHEN doc_id % 11 = 0 THEN ' from 10.0.' || " +
        "CAST(doc_id % 256 AS VARCHAR) || '.' || " +
        "CAST(doc_id % 100 AS VARCHAR) ELSE '' END"
    s"""WITH e AS (SELECT doc_id, $enriched AS t FROM documents)
       |SELECT doc_id,
       |  len(regexp_extract_all(t, '$emailRe')) AS n_email,
       |  len(regexp_extract_all(t, '$ipRe')) AS n_ip,
       |  md5(regexp_replace(regexp_replace(t, '$emailRe', '<EMAIL>', 'g'),
       |    '$ipRe', '<IP>', 'g')) AS red_hash
       |FROM e ORDER BY doc_id""".stripMargin
  }

  // ===========================================================================
  // Train/eval decontamination: shared-n-gram overlap
  // ===========================================================================

  /** Decontamination scan: training docs sharing >= 2 distinct 3-word
    * shingles with any eval-set doc (eval set = doc_id % 100 = 0, the
    * stand-in for a benchmark suite). Eval shingles are a tiny set —
    * broadcast — so the corpus side is one map-local explode + broadcast
    * hash join + partial-aggregated count: the 100 TB corpus is never
    * shuffled. This is the standard n-gram-overlap contamination check
    * run before training on scraped data. */
  val contamination: Q = (s, dir) => {
    val sh = docs(s, dir)
      .select(col("doc_id"), explode(SVE.word_shingles(col("text"), 3)).as("g"))
    val ev = sh.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id").as("eval_doc"), col("g"))
    val train = sh.filter(col("doc_id") % 100 =!= 0)
      .select(col("doc_id").as("train_doc"), col("g"))
    train.join(broadcast(ev), "g")
      .groupBy("train_doc", "eval_doc")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)
      .orderBy("train_doc", "eval_doc")
  }

  val contaminationSql: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |s AS (SELECT doc_id, ${PipelineQueries.sqlShingles} AS sh FROM t),
       |x AS (SELECT doc_id, unnest(sh) AS g FROM s),
       |e AS (SELECT doc_id AS eval_doc, g FROM x WHERE doc_id % 100 = 0),
       |tr AS (SELECT doc_id AS train_doc, g FROM x WHERE doc_id % 100 <> 0)
       |SELECT train_doc, eval_doc, count(*) AS n_shared
       |FROM tr JOIN e USING (g)
       |GROUP BY train_doc, eval_doc
       |HAVING count(*) >= 2
       |ORDER BY train_doc, eval_doc""".stripMargin

  /** Bloom-filter decontamination — the SCALE spelling of
    * [[contamination]]. The n-gram join there shuffles the candidate
    * set; here the eval-set shingle hashes fold into ONE fixed-size bit
    * array ([[graft.functions.expressions.BloomBuild]] — state O(m)
    * regardless of eval cardinality, merged by bitwise OR), sized from a
    * pre-counted eval cardinality (16 bits/key, k=7 → ~7e-4 FP; keys
    * are the WIDE ~60-bit shingle hashes, so key-space collisions stay
    * below the filter's own FP rate at any eval size), and the
    * corpus probes it as a narrow codegen'd per-row kernel
    * ([[graft.functions.expressions.BloomCountContained]]): at 100 TB
    * the DECISION leg never shuffles, never explodes, never joins — the
    * only exchange is the source-level summary rows.
    *
    * Verified under the HLL/heavy-hitters in-band pattern: sketches
    * can't hash-match an oracle, but their CONTRACT can. Output carries
    * the exact per-source contamination counts (the harness leg — the
    * same broadcast n-gram join as [[contamination]], which DuckDB
    * reproduces) plus two booleans the oracle expects TRUE:
    * `no_false_negative` (every doc's bloom evidence count >= its exact
    * shared-shingle count — Bloom filters cannot miss, so a FALSE here
    * is a broken filter) and `fp_within_bound` (total FP excess <=
    * 16 + 1% of probes, ~14x the expected FP mass — a saturated or
    * mis-sized filter flips it). */
  val decontaminateBloom: Q = (s, dir) => {
    val d = docs(s, dir)
    val isEval = col("doc_id") % 100 === 0
    // Build side: eval-set shingle hashes -> sized Bloom filter. Both
    // actions run on the (small by definition) eval side only.
    val evHashes = d.filter(isEval)
      .select(explode(HE.shingle_hashes_wide(col("text"), 3)).as("h"))
    val numBits = BloomRuntime.sizeBits(evHashes.count())
    val bloom = evHashes.agg(BF.bloom_build(col("h"), numBits, 7).as("b"))
      .head().getAs[Array[Byte]](0)
    // Harness leg: exact shared-shingle counts via the broadcast join.
    val evShingles = d.filter(isEval)
      .select(explode(SVE.word_shingles(col("text"), 3)).as("g")).distinct()
    val train = d.filter(!isEval)
    val exactHits = train
      .select(col("doc_id"), explode(SVE.word_shingles(col("text"), 3)).as("g"))
      .join(broadcast(evShingles), "g")
      .groupBy("doc_id").agg(count(lit(1)).as("exact_hits"))
    // Decision leg: narrow map over the corpus — no explode, no join.
    train
      .select(col("doc_id"), col("source"),
        BF.bloom_count_contained(HE.shingle_hashes_wide(col("text"), 3), bloom, 7)
          .cast("bigint").as("bloom_hits"),
        size(HE.shingle_hashes_wide(col("text"), 3)).cast("bigint").as("n_sh"))
      .join(exactHits, Seq("doc_id"), "left")
      .na.fill(0L, Seq("exact_hits"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("exact_hits") >= 2, 1)).as("n_flagged"),
        (min(col("bloom_hits") - col("exact_hits")) >= 0)
          .as("no_false_negative"),
        ((sum(col("bloom_hits")) - sum(col("exact_hits")))
          <= lit(16L) + expr("sum(n_sh) DIV 100")).as("fp_within_bound"))
      .orderBy("source")
  }

  val decontaminateBloomSql: String =
    s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
       |s AS (SELECT doc_id, source, ${PipelineQueries.sqlShingles} AS sh FROM t),
       |x AS (SELECT doc_id, source, unnest(sh) AS g FROM s),
       |ev AS (SELECT DISTINCT g FROM x WHERE doc_id % 100 = 0),
       |hits AS (SELECT x.doc_id, count(*) AS h FROM x JOIN ev USING (g)
       |         WHERE x.doc_id % 100 <> 0 GROUP BY x.doc_id),
       |tr AS (SELECT s.doc_id, s.source, coalesce(h.h, 0) AS h
       |       FROM s LEFT JOIN hits h ON s.doc_id = h.doc_id
       |       WHERE s.doc_id % 100 <> 0)
       |SELECT source, count(*) AS n_docs,
       |  count(CASE WHEN h >= 2 THEN 1 END) AS n_flagged,
       |  TRUE AS no_false_negative, TRUE AS fp_within_bound
       |FROM tr GROUP BY source ORDER BY source""".stripMargin

  /** Mixture-weighted corpus allocation (the DoReMi / data-mixing
    * class): spend a fixed sample budget (175 docs) across languages
    * according to TARGET per-mille weights, not the corpus's natural
    * proportions — integer quotas by the largest-remainder method
    * (floor everyone, then +1 to the largest fractional remainders,
    * ties by lang; availability clamps implicitly — a language cannot
    * yield more heap rows than it has docs), then take each language's
    * quota of docs by deterministic LCG-hash rank.
    *
    * Scale shape: quotas derive from a language-count-sized frame
    * (one partial-aggregated count), and selection is
    * [[graft.functions.expressions.BoundedTopK]] per language — a
    * bounded heap (<= budget rows per partial buffer) that discards
    * losers MAP-SIDE, so the corpus is never globally sorted and never
    * fully shuffled; the exchange moves one <=175-row heap per
    * partition per language. The window row_number spelling the oracle
    * uses would shuffle every row. */
  val mixWeights: Q = (s, dir) => {
    val budget = 175
    val weights = Seq(("en", 505L), ("zh", 165L), ("es", 143L),
      ("de", 117L), ("fr", 70L))
    import s.implicits._
    val w = weights.toDF("lang", "pm")
    val base = w
      .withColumn("b", expr(s"($budget * pm) DIV 1000"))
      .withColumn("rem", expr(s"$budget * pm - 1000 * (($budget * pm) DIV 1000)"))
    val wleft = Window.orderBy(col("rem").desc, col("lang"))
    val wall = Window.partitionBy()
    val quota = base
      .withColumn("leftover", lit(budget.toLong) - sum("b").over(wall))
      .withColumn("q",
        col("b") + when(row_number().over(wleft) <= col("leftover"), 1L)
          .otherwise(0L))
      .select("lang", "q")
    // ONE corpus pass: the map-side lang filter keeps only weighted
    // languages, and no availability count is needed — the heap can't
    // emit more rows than a language has, so rk <= q clamps to
    // availability by construction.
    val folded = (col("doc_id") % 1048573L + 1048573L) % 1048573L
    val picked = docs(s, dir)
      .filter(col("lang").isin(weights.map(_._1): _*))
      .select(col("lang"), col("doc_id"),
        ((folded * 1103515245L + 12345L) % 1000000L).as("h"))
      .groupBy("lang")
      .agg(graft.functions.expressions.AggExpressions
        .bounded_top_k(struct(col("h"), col("doc_id")), budget,
          Seq(false, false)).as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("i", "s")))
      .select(col("lang"), (col("i") + 1).cast("bigint").as("rk"),
        col("s.doc_id").as("doc_id"))
    picked.join(broadcast(quota), "lang")
      .filter(col("rk") <= col("q"))
      .select(col("lang"), col("doc_id"), col("rk"))
      .orderBy("lang", "rk")
  }

  val mixWeightsSql: String =
    """WITH w AS (SELECT * FROM (VALUES ('en', 505), ('zh', 165),
      |    ('es', 143), ('de', 117), ('fr', 70)) AS w(lang, pm)),
      |base AS (SELECT lang, (175 * pm) // 1000 AS b,
      |    175 * pm - 1000 * ((175 * pm) // 1000) AS rem FROM w),
      |alloc AS (SELECT lang,
      |    b + CASE WHEN row_number() OVER (ORDER BY rem DESC, lang)
      |          <= 175 - (SELECT sum(b) FROM base) THEN 1 ELSE 0 END AS q
      |  FROM base),
      |avail AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
      |quota AS (SELECT a.lang, least(a.q, v.cnt) AS quota
      |  FROM alloc a JOIN avail v USING (lang)),
      |r AS (SELECT lang, doc_id,
      |    CAST(row_number() OVER (PARTITION BY lang ORDER BY
      |      ((doc_id % 1048573 + 1048573) % 1048573 * 1103515245 + 12345)
      |        % 1000000, doc_id) AS BIGINT) AS rk
      |  FROM documents)
      |SELECT r.lang, r.doc_id, r.rk FROM r JOIN quota USING (lang)
      |WHERE r.rk <= quota ORDER BY lang, rk""".stripMargin

  /** Temperature-based multilingual resampling (the mT5/XLM-R p^(1/τ)
    * class, τ = 2): unlike [[mixWeights]]' EXPLICIT targets, the
    * sampling weights derive from the corpus's own language counts —
    * weight_l = ⌊√n_l⌋ flattens the natural distribution so low-resource
    * languages are upsampled. A 300-draw budget is split by
    * largest-remainder over those weights; each language's draws cycle
    * its docs in deterministic LCG-hash order, so a language whose
    * quota exceeds its n_l repeats docs with an explicit `epoch`
    * column — exactly the repeat factor a training mixture reports.
    * √ of a BIGINT is correctly rounded IEEE on both engines and only
    * lands on an integer when exact, so ⌊√n⌋ carries no float-parity
    * risk.
    *
    * Scale shape: ONE corpus pass — a single groupBy(lang) carries both
    * the count and a [[graft.functions.expressions.BoundedTopK]] heap
    * (≤ budget rows per partial buffer, losers dropped map-side), so
    * the corpus is never globally sorted or fully shuffled. Quotas and
    * the draw expansion are language-count-sized; the draw→doc mapping
    * is an equi-join on (lang, position) between two budget-bounded
    * frames. */
  val sampleTemperature: Q = (s, dir) => {
    val budget = 300L
    val folded = (col("doc_id") % 1048573L + 1048573L) % 1048573L
    val agged = docs(s, dir)
      .select(col("lang"), col("doc_id"),
        ((folded * 1103515245L + 12345L) % 1000000L).as("h"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        graft.functions.expressions.AggExpressions
          .bounded_top_k(struct(col("h"), col("doc_id")), budget.toInt,
            Seq(false, false)).as("top"))
    val wall = Window.partitionBy()
    val wleft = Window.orderBy(col("rem").desc, col("lang"))
    val alloc = agged.select(col("lang"), col("n"), col("top"))
      .withColumn("wt", expr("CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT)"))
      .withColumn("wsum", sum("wt").over(wall))
      .withColumn("b", expr(s"($budget * wt) DIV wsum"))
      .withColumn("rem", expr(s"$budget * wt - wsum * (($budget * wt) DIV wsum)"))
      .withColumn("leftover", lit(budget) - sum("b").over(wall))
      .withColumn("quota",
        col("b") + when(row_number().over(wleft) <= col("leftover"), 1L)
          .otherwise(0L))
    val ranked = alloc
      .select(col("lang"), posexplode(col("top")).as(Seq("i", "s")))
      .select(col("lang"), (col("i") + 1).cast("bigint").as("pos"),
        col("s.doc_id").as("doc_id"))
    // quota can floor to 0 for a tiny language under heavy skew (its
    // largest-remainder rank falls past the leftover) — and Spark's
    // sequence(1, 0) DESCENDS to [1, 0] instead of being empty, so the
    // guard is a correctness filter, not an optimization.
    alloc.filter(col("quota") > 0)
      .select(col("lang"), col("n"),
        explode(expr("sequence(CAST(1 AS BIGINT), quota)")).as("rk"))
      .withColumn("pos", (col("rk") - 1) % col("n") + 1)
      .withColumn("epoch", expr("(rk - 1) DIV n + 1"))
      .join(ranked, Seq("lang", "pos"))
      .select(col("lang"), col("rk"), col("epoch"), col("doc_id"))
      .orderBy("lang", "rk")
  }

  val sampleTemperatureSql: String =
    """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
      |  FROM documents GROUP BY lang),
      |w AS (SELECT lang, n, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT)
      |    AS wt FROM c),
      |tot AS (SELECT CAST(sum(wt) AS BIGINT) AS wsum FROM w),
      |base AS (SELECT lang, n, wt, (300 * wt) // wsum AS b,
      |    300 * wt - wsum * ((300 * wt) // wsum) AS rem
      |  FROM w CROSS JOIN tot),
      |alloc AS (SELECT lang, n,
      |    b + CASE WHEN row_number() OVER (ORDER BY rem DESC, lang)
      |          <= 300 - (SELECT sum(b) FROM base) THEN 1 ELSE 0 END AS quota
      |  FROM base),
      |r AS (SELECT lang, doc_id,
      |    CAST(row_number() OVER (PARTITION BY lang ORDER BY
      |      ((doc_id % 1048573 + 1048573) % 1048573 * 1103515245 + 12345)
      |        % 1000000, doc_id) AS BIGINT) AS pos
      |  FROM documents),
      |draws AS (SELECT lang, n, unnest(range(1, quota + 1)) AS rk FROM alloc)
      |SELECT d.lang, CAST(d.rk AS BIGINT) AS rk,
      |  CAST((d.rk - 1) // d.n + 1 AS BIGINT) AS epoch, r.doc_id
      |FROM draws d JOIN r ON d.lang = r.lang
      |  AND ((d.rk - 1) % d.n) + 1 = r.pos
      |ORDER BY d.lang, rk""".stripMargin

  /** Per-source document cap (the RefinedWeb/FineWeb "domain cap"
    * class): no single source may contribute more than CAP docs to the
    * mixture, and when a source is over cap its LONGEST documents win
    * (n_chars desc, doc_id tiebreak — a deterministic stand-in for a
    * quality ranking). The output carries each kept doc's in-source
    * rank plus the source's total, so the drop accounting
    * (total − kept) is auditable per source.
    *
    * Scale shape: ONE corpus pass — a single groupBy(source) carries
    * the count and a [[graft.functions.expressions.BoundedTopK]] heap,
    * so every partial buffer holds ≤ CAP rows and the corpus is never
    * globally sorted or rank-windowed; a 100 TB crawl with a million
    * sources shuffles CAP-bounded heaps, not documents. */
  val sourceCap: Q = (s, dir) => {
    val cap = 40
    val agged = docs(s, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_total"),
        graft.functions.expressions.AggExpressions
          .bounded_top_k(struct(col("n_chars"), col("doc_id")), cap,
            Seq(true, false)).as("top"))
    agged.select(col("source"), col("n_total"),
        posexplode(col("top")).as(Seq("i", "d")))
      .select(col("source"), (col("i") + 1).cast("bigint").as("rk"),
        col("d.doc_id").as("doc_id"), col("d.n_chars").as("n_chars"),
        col("n_total"))
      .orderBy("source", "rk")
  }

  val sourceCapSql: String =
    """WITH r AS (SELECT source, doc_id, n_chars,
      |    CAST(row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rk,
      |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_total
      |  FROM documents)
      |SELECT source, rk, doc_id, n_chars, n_total
      |FROM r WHERE rk <= 40 ORDER BY source, rk""".stripMargin

  // ===========================================================================
  // Length-bucketed batching: padding-efficient training batches
  // ===========================================================================

  /** Length-bucketed batching — the padding-minimizer every training
    * dataloader runs: docs bucket by token length (16-token bands),
    * each bucket's docs fill fixed-size batches of 8 in doc_id order,
    * and the report accounts the padding each batch would pay
    * (max_len·rows − Σlen, the tokens a same-batch pad-to-max wastes).
    *
    * Scale shape — the [[RelationalQueries.windowRankGlobal]] two-level
    * rank GENERALIZED to a low-cardinality partition key: a plain
    * `row_number() OVER (PARTITION BY bucket)` would pull each bucket
    * (corpus/12 rows) through ONE task; instead the corpus
    * range-repartitions on (bucket, doc_id), ranks per
    * (range-partition, bucket) — uniform window partitions — and adds
    * per-bucket prefix offsets from a #partitions×#buckets-row frame.
    * The checkpoint pins one boundary sample for both consumers (the
    * windowRankGlobal discipline). All arithmetic integral. */
  val batchByLength: Q = (s, dir) => {
    val t0 = docs(s, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("bucket", expr("n_tokens div 16"))
    val ranged0 = t0
      .repartitionByRange(col("bucket"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .withColumn("lrank", row_number().over(
        Window.partitionBy("pid", "bucket").orderBy("doc_id")))
    val ranged = CheckpointScope.checkpoint("batch_by_length.ranged", ranged0)
    val offsets = ranged.groupBy("pid", "bucket")
      .agg(count(lit(1)).as("n"))
      .withColumn("offset",
        coalesce(sum("n").over(Window.partitionBy("bucket").orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid").as("o_pid"), col("bucket").as("o_bucket"),
        col("offset"))
    ranged.join(offsets, col("pid") === col("o_pid") &&
        col("bucket") === col("o_bucket"))
      .withColumn("idx", col("offset") + col("lrank") - 1)
      .withColumn("batch_id", expr("idx div 8"))
      .groupBy("bucket", "batch_id")
      .agg(count(lit(1)).as("batch_rows"),
        max("n_tokens").as("max_len"),
        sum("n_tokens").as("sum_len"))
      .select(col("bucket"), col("batch_id"), col("batch_rows"),
        col("max_len"), col("sum_len"),
        (col("max_len") * col("batch_rows") - col("sum_len"))
          .as("padding"))
      .orderBy("bucket", "batch_id")
  }

  val batchByLengthSql: String =
    """WITH t AS (SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |b AS (SELECT doc_id, n_tokens, n_tokens // 16 AS bucket FROM t),
      |i AS (SELECT bucket, n_tokens,
      |    row_number() OVER (PARTITION BY bucket ORDER BY doc_id) - 1
      |      AS idx
      |  FROM b)
      |SELECT bucket, idx // 8 AS batch_id,
      |  count(*) AS batch_rows, max(n_tokens) AS max_len,
      |  CAST(sum(n_tokens) AS BIGINT) AS sum_len,
      |  CAST(max(n_tokens) * count(*) - sum(n_tokens) AS BIGINT)
      |    AS padding
      |FROM i GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ===========================================================================
  // Sequence packing: token-budget batches for training
  // ===========================================================================

  /** Sequence packing: assign docs to fixed-token-budget packs (budget
    * 2000 whitespace tokens) by greedy running-total fill, longest
    * first, independently per `source` stratum. A doc whose arrival
    * crosses a budget multiple starts the next pack (document
    * atomicity; packs may overflow by at most one doc — the standard
    * streaming-pack relaxation). Pack ids are (source, pack_no) pairs,
    * never a corpus-wide sequence.
    *
    * Scale shape — the [[batchByLength]] two-level decomposition, for
    * a RUNNING TOTAL instead of a rank: a plain `sum OVER (PARTITION BY
    * source)` would pull a dominant stratum (real corpora are routinely
    * >80% one source) through ONE task — the giant-component window
    * class the round-13 verdict flagged on the dedup consumers. Instead
    * the corpus range-partitions on (source, n_tok desc, doc_id) —
    * source-contiguous ordered ranges — takes local running sums per
    * (range-partition, source) over uniform window partitions, and adds
    * per-source prefix offsets from a #partitions×#sources-row frame:
    * offset + local cum = the single-window running total EXACTLY. The
    * checkpoint pins one boundary sample for both consumers (the
    * windowRankGlobal discipline). */
  /** Pre-checkpoint fragment of [[packSequences]]: range-partitioned
    * per-doc local running sums. Exposed so the plan guard in
    * CurationSpec can see the pid-keyed window — `localCheckpoint`
    * truncates lineage, hiding this Window from the final plan. */
  private[graft] def packRanged(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("bigint").as("n_tok"))
      .repartitionByRange(col("source"), col("n_tok").desc, col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .withColumn("lcum", sum(col("n_tok")).over(
        Window.partitionBy("pid", "source")
          .orderBy(col("n_tok").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))

  val packSequences: Q = (s, dir) => {
    val ranged = CheckpointScope.checkpoint("pack_sequences.ranged",
      packRanged(s, dir))
    val offsets = ranged.groupBy("pid", "source")
      .agg(sum("n_tok").as("ptot"))
      .withColumn("offset",
        coalesce(sum("ptot").over(Window.partitionBy("source")
          .orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid").as("o_pid"), col("source").as("o_source"),
        col("offset"))
    ranged.join(offsets, col("pid") === col("o_pid") &&
        col("source") === col("o_source"))
      .withColumn("pack_no",
        floor((col("offset") + col("lcum") - col("n_tok")) / 2000))
      .select(col("doc_id"), col("source"), col("n_tok"), col("pack_no"))
      .orderBy("doc_id")
  }

  val packSequencesSql: String =
    """SELECT doc_id, source, n_tok,
      |  CAST(floor((cum - n_tok) / 2000.0) AS BIGINT) AS pack_no
      |FROM (
      |  SELECT doc_id, source, n_tok,
      |    sum(n_tok) OVER (PARTITION BY source
      |      ORDER BY n_tok DESC, doc_id
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM (SELECT doc_id, source,
      |          len(string_split(text, ' ')) AS n_tok FROM documents))
      |ORDER BY doc_id""".stripMargin

  // ===========================================================================
  // Deterministic epoch shuffle, split assignment, embedding quantization
  // ===========================================================================

  /** Deterministic global shuffle — the per-epoch corpus reorder a
    * training run does before sharding. The order key is a Lehmer-style
    * LCG of doc_id (folded to 63-bit-safe range exactly like
    * [[sampleStratified]]), so the permutation reproduces from the seed
    * constants alone — no stored state, any worker can compute any
    * shard's order. Spark executes the orderBy as a range-partitioned
    * distributed sort (sampled bounds, no single reducer): the one
    * shuffle a 100 TB epoch reorder actually needs. */
  val shuffleEpoch: Q = (s, dir) => {
    val folded = (col("doc_id") % 1048573L + 1048573L) % 1048573L
    docs(s, dir)
      .select(col("doc_id"),
        ((folded * 48271L + 11L) % 1000003L).as("shuffle_key"), col("lang"))
      .orderBy("shuffle_key", "doc_id")
  }

  val shuffleEpochSql: String =
    """SELECT doc_id,
      |  (((doc_id % 1048573 + 1048573) % 1048573) * 48271 + 11) % 1000003
      |    AS shuffle_key,
      |  lang
      |FROM documents ORDER BY shuffle_key, doc_id""".stripMargin

  // ===========================================================================
  // Shared split hashing: the folded-LCG permille band
  // ===========================================================================

  /** Permille band of an id: fold into [0, 1048573) as ((x%p)+p)%p (the
    * identical non-negative residue in Spark and DuckDB — a raw product
    * would wrap in Spark but raise BIGINT overflow in DuckDB, and a
    * negative product makes %1000 negative), then one LCG step mod
    * 1000. The ONE definition both split surfaces ([[splitAssign]],
    * [[splitLeakproof]]) hash with — Scala and SQL spellings side by
    * side so the constants cannot desynchronize. */
  private def permilleBand(id: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val folded = (id % 1048573L + 1048573L) % 1048573L
    (folded * 1103515245L + 12345L) % 1000L
  }

  private def sqlPermilleBand(id: String): String =
    s"((($id % 1048573 + 1048573) % 1048573) * 1103515245 + 12345) % 1000"

  /** LEAKAGE-SAFE train/val/test split: the split hash runs on the
    * near-dup CLUSTER representative, not the document — so a document
    * and its near-duplicates land in the SAME split by construction.
    * Hashing doc_ids directly (q_split_assign, the standard recipe)
    * leaks: a train doc's near-duplicate in test inflates eval, the
    * classic contamination path deduplication papers warn about. This
    * is the composition the pipeline actually ships: MinHash pair
    * generation → connected components → LCG on the component rep.
    *
    * Scale shape: the label frame holds only pair-incident docs
    * (≪ corpus, [[dedupCanonical]]'s precedent), the corpus joins it
    * once on doc_id, and the split is a per-row LCG — appending
    * un-entangled data reassigns nothing, while a NEW near-dup edge
    * correctly re-banks its component (the price of the guarantee).
    * Oracle: the recursive-CTE closure + the same LCG on the rep. */
  val splitLeakproof: Q = (s, dir) => {
    val d = docs(s, dir).select(col("doc_id"))
    val edges = PipelineQueries.minhashPairs(s, dir)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val labels =
      ConnectedComponents.requireBounded(ConnectedComponents.label(edges))
    val labeled = d.join(labels, d("doc_id") === labels("id"), "left")
      .select(d("doc_id"), coalesce(col("comp"), d("doc_id")).as("rep"))
    val pm = permilleBand(col("rep"))
    labeled.select(col("doc_id"), col("rep"),
        when(pm < 800, "train").when(pm < 900, "val")
          .otherwise("test").as("split"))
      .orderBy("doc_id")
  }

  val splitLeakproofSql: String =
    s"""WITH RECURSIVE pairs AS MATERIALIZED (
       |  SELECT doc_a, doc_b FROM (${PipelineQueries.minhashPairsSql})
       |), edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT doc_b AS src, doc_a AS dst FROM pairs
       |), reach AS (
       |  SELECT src AS id, dst AS r FROM edges
       |  UNION
       |  SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r
       |), labels AS (
       |  SELECT id AS doc_id, least(id, min(r)) AS rep FROM reach GROUP BY id
       |), alldocs AS (
       |  SELECT d.doc_id, coalesce(l.rep, d.doc_id) AS rep
       |  FROM documents d LEFT JOIN labels l USING (doc_id)
       |), banded AS (
       |  SELECT doc_id, rep, ${sqlPermilleBand("rep")} AS pm
       |  FROM alldocs)
       |SELECT doc_id, rep,
       |  CASE WHEN pm < 800 THEN 'train' WHEN pm < 900 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM banded ORDER BY doc_id""".stripMargin

  /** Train/val/test assignment by hash (90/5/5 permille bands of the
    * folded LCG) — stable under corpus growth: a doc's split never
    * depends on other rows, so appending data reassigns nothing. The
    * compared output is the stratification summary — per (lang, split)
    * doc counts and character mass — which is also what a pipeline
    * monitors for mixture drift. */
  val splitAssign: Q = (s, dir) => {
    val pm = permilleBand(col("doc_id"))
    docs(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        when(pm < 900, "train").when(pm < 950, "val")
          .otherwise("test").as("split"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("lang", "split")
  }

  val splitAssignSql: String =
    s"""SELECT lang, split, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM (
      |  SELECT doc_id, lang, n_chars,
      |    CASE WHEN pm < 900 THEN 'train' WHEN pm < 950 THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM (SELECT *, ${sqlPermilleBand("doc_id")} AS pm
      |        FROM documents))
      |GROUP BY lang, split ORDER BY lang, split""".stripMargin

  /** Embedding post-processing for serving: L2 norm + symmetric int8
    * quantization (floor(x/norm*127)) as fused single-pass codegen
    * kernels — an interpreted higher-order-function spelling would
    * re-evaluate a per-element expression tree, the same ~100x penalty
    * the minhash kernels eliminated. Left-fold double accumulation
    * keeps the DuckDB list_reduce oracle bit-exact; floor (not round)
    * keeps quantization ties deterministic across engines. The q8
    * vector is emitted stringified (array_join) — compared outputs
    * never carry raw array columns, per the harness convention
    * established by q_agg_array: the driver's comparator sorts rows
    * via pandas, which cannot hash raw arrays. */
  val embedQuantize: Q = (s, dir) => {
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), SVE.l2_norm(col("embedding")).as("l2_norm"),
        array_join(SVE.quantize8(col("embedding")), ",").as("q8"))
      .orderBy("vec_id")
  }

  val embedQuantizeSql: String =
    """SELECT vec_id,
      |  sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |    list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |    (a, x) -> a + x)) AS l2_norm,
      |  array_to_string(
      |    CASE WHEN l2_norm = 0 THEN list_transform(embedding, x -> 0)
      |         ELSE list_transform(embedding,
      |           x -> CAST(floor(CAST(x AS DOUBLE) / l2_norm * 127.0) AS INT))
      |    END, ',') AS q8
      |FROM embeddings ORDER BY vec_id""".stripMargin

  /** Fixed-window chunking with overlap — how documents longer than a
    * context window become training samples (window 64 tokens, stride
    * 48 → 16-token overlap carrying context across boundaries). Pure
    * per-row explode: no shuffle at all until a downstream op needs
    * one, so the corpus chunks map-locally at any scale. The compared
    * output hashes every chunk's text, so token-slicing drift between
    * engines cannot hide. */
  val chunkWindows: Q = (s, dir) => {
    val winSize = 64
    val strideN = 48
    val toks = split(col("text"), " ")
    val nChunks = greatest(lit(1),
      ceil((size(toks).cast("double") - winSize) / strideN + 1).cast("int"))
    docs(s, dir)
      .select(col("doc_id"), toks.as("w"), nChunks.as("nc"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("nc") - 1),
          i => array_join(slice(col("w"), i * strideN + 1, lit(winSize)), " "))))
      .select(col("doc_id"), col("pos").as("chunk_idx"),
        graft.functions.expressions.HashExpressions.poly_hash(col("col"))
          .as("chunk_hash"),
        size(split(col("col"), " ")).cast("bigint").as("n_tok"))
      .orderBy("doc_id", "chunk_idx")
  }

  val chunkWindowsSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w,
      |    greatest(1, CAST(ceil((len(string_split(text, ' ')) - 64) / 48.0 + 1)
      |      AS INT)) AS nc
      |  FROM documents),
      |c AS (SELECT doc_id, i AS chunk_idx,
      |    array_to_string(w[(i*48+1):(i*48+64)], ' ') AS chunk
      |  FROM t, unnest(range(0, nc)) AS u(i))
      |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(range(1, length(chunk)+1),
      |      i -> CAST(unicode(chunk[CAST(i AS INT)]) AS BIGINT))),
      |    (a, x) -> (a * 31 + x) % 1000000007) AS chunk_hash,
      |  CAST(len(string_split(chunk, ' ')) AS BIGINT) AS n_tok
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  /** CONTENT-DEFINED chunking (the Rabin/gear family): a chunk boundary
    * falls after token i whenever polyhash(token_i) % 16 == 0, so
    * boundaries are a function of the CONTENT at the boundary, not of
    * offsets — insert a sentence early in a document and every later
    * chunk of [[chunkWindows]] shifts (its dedup/embedding cache
    * misses), while these chunks re-align at the first boundary after
    * the edit. That re-alignment is why storage dedup and incremental
    * embedding pipelines chunk this way; expected chunk length is the
    * modulus (~16 tokens). Same scale shape as the fixed windows: pure
    * per-row lambda arithmetic and one explode, zero shuffle. */
  val chunkCdc: Q = (s, dir) => {
    import graft.functions.expressions.{DocExpressions => DE}
    // ONE fused codegen kernel emits the finished chunk tuples per doc
    // (DocOps.cdcChunks — same hash fold, same %16 boundary rule as
    // the HOF spelling the oracle keeps); the explode then carries
    // only the chunk structs, where the HOF plan dragged the full
    // word + boundary arrays through every exploded row
    docs(s, dir)
      .select(col("doc_id"), explode(DE.cdc_chunks(col("text"))).as("c"))
      .select(col("doc_id"), col("c.chunk_id").as("chunk_id"),
        col("c.start_tok").as("start_tok"), col("c.end_tok").as("end_tok"),
        col("c.n_tokens").as("n_tokens"))
      .orderBy("doc_id", "chunk_id")
  }

  val chunkCdcSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |h AS (SELECT doc_id, w,
      |    list_transform(w, x -> list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(1, length(x)+1),
      |        i -> CAST(unicode(x[CAST(i AS INT)]) AS BIGINT))),
      |      (a, c) -> (a * 31 + c) % 1000000007)) AS hs
      |  FROM t),
      |b AS (SELECT doc_id, w,
      |    list_prepend(CAST(1 AS BIGINT),
      |      list_transform(list_filter(range(1, len(w)),
      |        i -> hs[CAST(i AS INT)] % 16 = 0),
      |        i -> CAST(i + 1 AS BIGINT))) AS starts
      |  FROM h),
      |c AS (SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
      |    starts[CAST(k AS INT)] AS start_tok,
      |    CASE WHEN k < len(starts) THEN starts[CAST(k AS INT) + 1] - 1
      |         ELSE CAST(len(w) AS BIGINT) END AS end_tok
      |  FROM b, unnest(range(1, len(starts)+1)) AS u(k))
      |SELECT doc_id, chunk_id, start_tok, end_tok,
      |  end_tok - start_tok + 1 AS n_tokens
      |FROM c ORDER BY doc_id, chunk_id""".stripMargin

  // ===========================================================================
  // Graph centrality over the near-dup graph (iterative PageRank)
  // ===========================================================================

  /** PageRank over the MinHash near-dup graph — the graph-analytics
    * twin of [[dedupClusters]]: components tell you WHICH docs belong
    * together, centrality ranks how CONNECTED each doc is inside its
    * duplication neighborhood (a template/boilerplate detector: high
    * rank = a doc many near-dups point at). Three damped iterations
    * (d = 0.85), all INTEGER arithmetic — ranks are micro-units
    * (1e6 = 1.0) and every division is integral (`div` / DuckDB `//`),
    * so both engines agree bit-for-bit; no float mass accounting.
    *
    * Scale shape — the pregel pattern as plain DataFrames: the edge
    * list (∝ true duplicates, from the banded LSH join — never n²) is
    * computed ONCE and persisted with its out-degrees; each iteration
    * is one hash join ranks⋈edges (both sides partitioned by the join
    * key; AQE reuses the exchange layout) plus one groupBy(dst) with
    * map-side partial sums. Per-hop cost is O(|edges|), independent of
    * the iteration count; nothing driver-side except the 3-step loop.
    * Isolated docs never enter the join — they re-enter through the
    * LEFT join against the corpus with the base rank. */
  val graphPagerank: Q = (s, dir) => {
    val pairs = PipelineQueries.minhashPairs(s, dir)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val ids = docs(s, dir).select(col("doc_id").as("id"))
    PageRank.run(ids, pairs, iters = 3)
      .select(col("id").as("doc_id"), col("pr"))
      .orderBy("doc_id")
  }

  /** Oracle: the same three iterations UNROLLED as CTE layers —
    * recursive CTEs cannot aggregate over their own reference, and a
    * fixed iteration count needs no recursion anyway. Sums are cast
    * back to BIGINT per layer (DuckDB widens sum(BIGINT) → HUGEINT). */
  val graphPagerankSql: String = {
    def hop(prev: String, c: String, nxt: String) =
      s"""$c AS (SELECT dst, sum(r // outdeg) AS in_sum
         |  FROM ed JOIN $prev ON ed.src = $prev.id GROUP BY dst),
         |$nxt AS (SELECT d.doc_id AS id,
         |    CAST(150000 + (85 * coalesce(in_sum, 0)) // 100 AS BIGINT) AS r
         |  FROM documents d LEFT JOIN $c ON d.doc_id = $c.dst)""".stripMargin
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT doc_a, doc_b FROM (${PipelineQueries.minhashPairsSql})
       |), edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT doc_b AS src, doc_a AS dst FROM pairs
       |), deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
       |ed AS (SELECT e.src, e.dst, d.outdeg FROM edges e JOIN deg d USING (src)),
       |r0 AS (SELECT doc_id AS id, CAST(1000000 AS BIGINT) AS r FROM documents),
       |${hop("r0", "c1", "r1")},
       |${hop("r1", "c2", "r2")},
       |${hop("r2", "c3", "r3")}
       |SELECT id AS doc_id, r AS pr FROM r3 ORDER BY doc_id""".stripMargin
  }

  // ===========================================================================
  // Curriculum schedule
  // ===========================================================================

  /** Curriculum training order: stage the corpus easy→hard, shuffle
    * WITHIN each stage. Difficulty proxy = average word length in
    * centi-chars, computed integer-exact ((100·Σ|word|) div n_words) so
    * both engines agree bit-for-bit; stage boundaries are the corpus
    * quartiles (438/450/463 at the shipped fixtures), FIXED constants
    * rather than per-run ntile so a doc's stage is a pure function of
    * its own text — append-stable, like [[splitAssign]]'s hash splits.
    * The in-stage order is the [[shuffleEpoch]] LCG under a different
    * multiplier (69621, a classic Lehmer constant), so curriculum and
    * epoch-shuffle orders are decorrelated.
    *
    * Scale: difficulty and order key are narrow per-row maps (zero
    * shuffle); the (stage, ord) output order is the one range-
    * partitioned sort a curriculum emission actually is — a trainer
    * consumes the corpus IN this order, so the sort is the semantics,
    * not harness ceremony. */
  val curriculumOrder: Q = (s, dir) => {
    val words = split(col("text"), " ")
    val totalChars = aggregate(
      transform(words, w => length(w).cast("long")),
      lit(0L), (a, x) => a + x)
    val folded = (col("doc_id") % 1048573L + 1048573L) % 1048573L
    docs(s, dir)
      .select(col("doc_id"),
        (totalChars * 100L).as("cc"), size(words).cast("long").as("nw"),
        ((folded * 69621L + 11L) % 1000003L).as("ord"))
      // `div` (integral), not `/` (double): same truncation as DuckDB //
      .selectExpr("doc_id", "cc div nw AS difficulty", "ord")
      .withColumn("stage",
        when(col("difficulty") < 438, 1L)
          .when(col("difficulty") < 450, 2L)
          .when(col("difficulty") < 463, 3L)
          .otherwise(4L))
      .select("doc_id", "difficulty", "stage", "ord")
      .orderBy("stage", "ord", "doc_id")
  }

  val curriculumOrderSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |d AS (SELECT doc_id,
      |    (100 * list_reduce(list_prepend(CAST(0 AS BIGINT),
      |       list_transform(w, x -> CAST(length(x) AS BIGINT))),
      |       (a, x) -> a + x)) // len(w) AS difficulty,
      |    (((doc_id % 1048573 + 1048573) % 1048573) * 69621 + 11) % 1000003
      |      AS ord
      |  FROM t)
      |SELECT doc_id, difficulty,
      |  CASE WHEN difficulty < 438 THEN 1
      |       WHEN difficulty < 450 THEN 2
      |       WHEN difficulty < 463 THEN 3
      |       ELSE 4 END AS stage,
      |  ord
      |FROM d ORDER BY stage, ord, doc_id""".stripMargin

  // ===========================================================================
  // registry
  // ===========================================================================

  val queries: Map[String, Q] = Map(
    "q_curriculum_order" -> curriculumOrder,
    "q_graph_pagerank" -> graphPagerank,
    "q_dedup_clusters" -> dedupClusters,
    "q_dedup_canonical" -> dedupCanonical,
    "q_sample_stratified" -> sampleStratified,
    "q_text_redact" -> textRedact,
    "q_contamination" -> contamination,
    "q_decontaminate_bloom" -> decontaminateBloom,
    "q_mix_weights" -> mixWeights,
    "q_source_cap" -> sourceCap,
    "q_sample_temperature" -> sampleTemperature,
    "q_pack_sequences" -> packSequences,
    "q_batch_by_length" -> batchByLength,
    "q_shuffle_epoch" -> shuffleEpoch,
    "q_split_assign" -> splitAssign,
    "q_split_leakproof" -> splitLeakproof,
    "q_embed_quantize" -> embedQuantize,
    "q_chunk_windows" -> chunkWindows,
    "q_chunk_cdc" -> chunkCdc,
  )

  val oracleSql: Map[String, String] = Map(
    "q_curriculum_order" -> curriculumOrderSql,
    "q_graph_pagerank" -> graphPagerankSql,
    "q_dedup_clusters" -> dedupClustersSql,
    "q_dedup_canonical" -> dedupCanonicalSql,
    "q_sample_stratified" -> sampleStratifiedSql,
    "q_text_redact" -> textRedactSql,
    "q_contamination" -> contaminationSql,
    "q_decontaminate_bloom" -> decontaminateBloomSql,
    "q_mix_weights" -> mixWeightsSql,
    "q_source_cap" -> sourceCapSql,
    "q_sample_temperature" -> sampleTemperatureSql,
    "q_pack_sequences" -> packSequencesSql,
    "q_batch_by_length" -> batchByLengthSql,
    "q_shuffle_epoch" -> shuffleEpochSql,
    "q_split_assign" -> splitAssignSql,
    "q_split_leakproof" -> splitLeakproofSql,
    "q_embed_quantize" -> embedQuantizeSql,
    "q_chunk_windows" -> chunkWindowsSql,
    "q_chunk_cdc" -> chunkCdcSql,
  )
}
