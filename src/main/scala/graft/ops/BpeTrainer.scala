package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Iterative BPE merge training (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units") — the loop that
  * connects merge-candidate MINING ([[PipelineQueries.textBpePairs]])
  * to tokenizer APPLY ([[PipelineQueries.tokenizeSubword]]): mine the
  * best adjacent pair, adopt it, re-tokenize, re-mine, k rounds.
  *
  * 100 TB shape — the classic trainer trick IS the distributed shape:
  * the corpus is scanned ONCE to build the word-frequency table
  * (map-side-combined groupBy; vocabulary-sized output, sublinear in
  * the corpus by Heaps' law), and every training round runs over that
  * vocab-sized table, so k rounds cost k small jobs INDEPENDENT of
  * corpus size. Driver state is the adopted merge list (k entries) —
  * nothing row-scaled ever reaches the driver in the training loop.
  * Per round: one flatMap→groupBy→TakeOrdered(1) argmax job (pair
  * space Zipf-bounded, map-side partials) and one replacement-count
  * fold; the growing merge table rides the closures as an ordinary
  * broadcast-serialized reference object.
  *
  * Determinism: argmax breaks ties by (count DESC, left ASC, right
  * ASC); application is greedy left-to-right — both engines of the
  * in-band contract (distributed vs single-JVM reference) and the
  * DuckDB oracle's rank-1 recompute share those rules exactly.
  *
  * Ref behavior: the reference delegates tokenizer pipelines to SQL
  * (SURVEY.md §0); this is the training-side operator a real LLM-data
  * deployment adds on top. */
object BpeTrainer {

  /** One adopted merge: rank, the pair, its simple adjacent-pair count
    * at adoption (overlap-counted, the classic mining statistic), and
    * the number of greedy left-to-right replacements applying it
    * performed (the exact token-count reduction). */
  case class Merge(rank: Int, left: String, right: String,
      nMined: Long, nApplied: Long)

  /** Greedy left-to-right application of ONE merge; returns the new
    * token list and the replacement count. */
  def applyMerge(toks: Array[String], a: String, b: String)
      : (Array[String], Long) = {
    val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
    var i = 0
    var n = 0L
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
        out += a + b
        n += 1
        i += 2
      } else {
        out += toks(i)
        i += 1
      }
    }
    (out.toArray, n)
  }

  /** BPE apply: characters, then each merge greedily in rank order. */
  def tokenize(word: String, merges: Seq[(String, String)]): Array[String] = {
    var toks = word.map(_.toString).toArray
    merges.foreach { case (a, b) => toks = applyMerge(toks, a, b)._1 }
    toks
  }

  /** Distributed trainer: up to `k` rounds over the word-frequency
    * table. Stops early when no pair occurs at least twice (merging a
    * count-1 pair can never compress). Each round re-tokenizes the
    * DISTINCT words under the merges adopted so far — counts are
    * weighted by word frequency, so the result equals training on the
    * raw corpus at a vanishing fraction of the cost. */
  def train(words: Dataset[(String, Long)], k: Int): Seq[Merge] = {
    val spark = words.sparkSession
    import spark.implicits._
    var mined = Vector.empty[(String, String, Long)]
    var merges = Vector.empty[(String, String)]
    var r = 1
    var done = false
    while (r <= k && !done) {
      val m = merges // stable closure capture (not the mutating var)
      val best = words.flatMap { case (w, c) =>
        val t = tokenize(w, m)
        (0 until t.length - 1).iterator.map(i => (t(i), t(i + 1), c))
      }.toDF("a", "b", "c")
        .groupBy("a", "b").agg(sum("c").as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      best.headOption.filter(_._3 >= 2L) match {
        case Some((a, b, n)) =>
          merges :+= ((a, b))
          mined :+= ((a, b, n))
          r += 1
        case None => done = true
      }
    }
    // nApplied for EVERY rank in one pass: replaying the merge table
    // left-to-right per word yields, at step r, exactly the replacement
    // count applyMerge would have reported at adoption time (the word is
    // tokenized by merges 1..r-1 when merge r applies). Folding this out
    // of the round loop halves the per-round Spark jobs — round latency,
    // not data volume, dominates this operator (the word table is
    // vocab-sized), and 12 fixed-latency reduce jobs were most of the
    // measured wall at sf0.1.
    if (mined.isEmpty) Seq.empty
    else {
      val table = mined.map(t => (t._1, t._2))
      val applied = words.map { case (w, c) =>
        var toks = w.map(_.toString).toArray
        table.map { case (a, b) =>
          val (t2, n) = applyMerge(toks, a, b)
          toks = t2
          n * c
        }.toArray
      }.reduce { (x, y) =>
        val z = new Array[Long](x.length)
        var i = 0
        while (i < x.length) { z(i) = x(i) + y(i); i += 1 }
        z
      }
      mined.zipWithIndex.map { case ((a, b, n), i) =>
        Merge(i + 1, a, b, n, applied(i))
      }
    }
  }

  /** Single-JVM reference trainer over a collected word table — the
    * independent implementation the in-band contract compares against
    * (hash-map counting + local argmax vs shuffle aggregate +
    * TakeOrdered). Harness-scale only: the word table it consumes is
    * vocabulary-sized, the same bound the recall-contract legs use. */
  def referenceTrain(words: Array[(String, Long)], k: Int): Seq[Merge] = {
    val out = Vector.newBuilder[Merge]
    var merges = Vector.empty[(String, String)]
    var r = 1
    var done = false
    while (r <= k && !done) {
      val counts =
        scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((w, c) <- words) {
        val t = tokenize(w, merges)
        var i = 0
        while (i < t.length - 1) {
          val key = (t(i), t(i + 1))
          counts.update(key, counts.getOrElse(key, 0L) + c)
          i += 1
        }
      }
      val best = counts.toSeq
        .sortBy { case ((a, b), n) => (-n, a, b) }.headOption
      best.filter(_._2 >= 2L) match {
        case Some(((a, b), n)) =>
          var applied = 0L
          for ((w, c) <- words)
            applied += applyMerge(tokenize(w, merges), a, b)._2 * c
          merges :+= ((a, b))
          out += Merge(r, a, b, n, applied)
          r += 1
        case None => done = true
      }
    }
    out.result()
  }

  /** Rounds the oracle query trains for. */
  val Rounds = 12

  /** Oracle query: train `Rounds` merges over the documents corpus and
    * emit a one-row contract (the sketch-family in-band pattern):
    *
    *   - `first_left`/`first_right`/`first_n`, `tokens_before`,
    *     `n_merges` — DuckDB recomputes these EXACTLY (rank-1 argmax is
    *     plain char-pair counting; later ranks need iteration SQL
    *     cannot express);
    *   - `conserved` — token-count conservation across the whole run:
    *     tokens_before − Σ nApplied == tokens_after, cross-checking
    *     k+1 independent distributed jobs against each other;
    *   - `ref_match` — the distributed trainer equals the single-JVM
    *     reference trainer merge-for-merge (counts, ranks, ties);
    *   - `non_increasing` — adopted mined counts never increase with
    *     rank (any post-merge pair occurrence maps to a pre-merge
    *     occurrence, so the max can only fall).
    *
    * The oracle expects every boolean TRUE. */
  val bpeTrain: (SparkSession, String) => DataFrame = (s, dir) => {
    import s.implicits._
    val words = Tables.load(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .as[(String, Long)]
      .persist()
    try {
      val ms = train(words, Rounds)
      // the oracle hardcodes n_merges = Rounds; an early-stopping corpus
      // must fail HERE with a named cause, not as a confusing oracle
      // row-mismatch downstream
      require(ms.length == Rounds,
        s"BPE training early-stopped at ${ms.length} of $Rounds merges " +
          "(corpus ran out of repeated pairs) — the oracle's fixed " +
          s"n_merges=$Rounds cannot match; use a larger fixture or " +
          "lower Rounds")
      val pairs = ms.map(m => (m.left, m.right))
      val (before, after) = words.map { case (w, c) =>
        (c * w.length, c * tokenize(w, pairs).length)
      }.toDF("b", "a")
        .agg(sum("b").cast("long"), sum("a").cast("long"))
        .as[(Long, Long)].collect()(0)
      val conserved = before - ms.map(_.nApplied).sum == after
      val refMatch = referenceTrain(words.collect(), Rounds) == ms
      val nonInc = ms.map(_.nMined)
        .sliding(2).forall(p => p.length < 2 || p(0) >= p(1))
      val first = ms.head
      Seq((ms.length.toLong, first.left, first.right, first.nMined,
        before, conserved, refMatch, nonInc))
        .toDF("n_merges", "first_left", "first_right", "first_n",
          "tokens_before", "conserved", "ref_match", "non_increasing")
    } finally words.unpersist()
  }

  val bpeTrainSql: String =
    s"""WITH wx AS (SELECT unnest(string_split(text, ' ')) AS w
       |  FROM documents),
       |wf AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM wx
       |  WHERE length(w) > 0 GROUP BY w),
       |p AS (SELECT substr(w, CAST(i AS INT), 1) AS a,
       |    substr(w, CAST(i AS INT) + 1, 1) AS b, c
       |  FROM (SELECT w, c, unnest(range(1, length(w))) AS i FROM wf)),
       |pc AS (SELECT a, b, CAST(sum(c) AS BIGINT) AS n
       |  FROM p GROUP BY a, b),
       |best AS (SELECT a, b, n FROM pc ORDER BY n DESC, a, b LIMIT 1)
       |SELECT CAST($Rounds AS BIGINT) AS n_merges,
       |  a AS first_left, b AS first_right, n AS first_n,
       |  (SELECT CAST(sum(CAST(length(w) AS BIGINT) * c) AS BIGINT)
       |   FROM wf) AS tokens_before,
       |  TRUE AS conserved, TRUE AS ref_match, TRUE AS non_increasing
       |FROM best""".stripMargin
}
