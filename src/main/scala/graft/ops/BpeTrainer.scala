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
  def train(words: Dataset[(String, Long)], k: Int): Seq[Merge] =
    trainFull(words, k)._1

  /** Rows collected per mining pass (pairs + triples interleaved).
    * Bounds the driver state; larger values lower the uncollected-count
    * floor and so let a pass adopt longer merge batches. */
  private val MineTopK = 512

  /** [[train]] plus the (tokens_before, tokens_after) corpus totals,
    * folded into the same final pass that computes per-rank nApplied —
    * one reduce job instead of a reduce plus a separate aggregate.
    *
    * MULTI-MERGE BATCHING (sequential-BPE-exact): the wall here is the
    * NUMBER of sequential fixed-latency jobs, not data (the word table
    * is vocab-sized), so each mining pass counts adjacent PAIRS and
    * TRIPLES in one aggregate, collects the global top-[[MineTopK]]
    * keys, and adopts as many merges as are PROVABLY what the
    * one-merge-per-pass loop would have adopted:
    *
    *   - the first adoption of a pass is the exact global pair argmax
    *     (collected with its exact count, trusted when its count beats
    *     the collection floor — ties at the floor fall back to a
    *     pairs-only argmax job);
    *   - a further pair (a,b) with count n is adopted only when (1) its
    *     tokens are DISJOINT from every merge already adopted this
    *     pass — merging (x,y) can then neither destroy nor create an
    *     (a,b) adjacency, so n is exactly the count the fresh pass
    *     would mine — and (2) n STRICTLY exceeds every possible count
    *     of a pair the batch's merges create: a new pair (w,xy) occurs
    *     at most count(triple w,x,y) times and (xy,w) at most
    *     count(triple x,y,w) times (greedy merges a subset of
    *     occurrences), and any triple NOT collected counts at most the
    *     collection floor. Remaining old pairs rank at or below (a,b)
    *     in the same (count desc, left, right) order the fresh pass
    *     would use, and merging only ever lowers their counts.
    *
    *   The first unprovable candidate ends the batch; the next pass
    *   re-mines with exact counts. Worst case (every top pair shares a
    *   token) this degrades to the old one-merge-per-pass loop; the
    *   Sennrich fixture adopts its 4 merges in 3 passes, the shipped
    *   corpora cut the pass count roughly in half. */
  private[ops] def trainFull(words: Dataset[(String, Long)], k: Int)
      : (Seq[Merge], Long, Long) = {
    val spark = words.sparkSession
    import spark.implicits._
    var mined = Vector.empty[(String, String, Long)]
    var merges = Vector.empty[(String, String)]
    var done = false
    while (mined.length < k && !done) {
      val m = merges // stable closure capture (not the mutating var)
      val top = words.flatMap { case (w, c) =>
        val t = tokenize(w, m)
        val ps = (0 until t.length - 1).iterator
          .map(i => (t(i), t(i + 1), null: String, c))
        val ts = (0 until t.length - 2).iterator
          .map(i => (t(i), t(i + 1), t(i + 2), c))
        ps ++ ts
      }.toDF("a", "b", "z", "c")
        .groupBy("a", "b", "z").agg(sum("c").as("n"))
        .orderBy(col("n").desc, col("a"), col("b"), asc_nulls_first("z"))
        .limit(MineTopK)
        .collect()
      // Any key (pair or triple) NOT collected has count <= floor: the
      // list is the global top-K under a total order on (n, key).
      val floor = if (top.length >= MineTopK) top.last.getLong(3) else 0L
      val pairsL = top.iterator.filter(_.isNullAt(2))
        .map(r => (r.getString(0), r.getString(1), r.getLong(3))).toVector
      val tripsL = top.iterator.filterNot(_.isNullAt(2))
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getLong(3))).toVector
      var batch = Vector.empty[(String, String)]
      var endPass = false
      var i = 0
      while (!endPass && !done && i < pairsL.length && mined.length < k) {
        val (a, b, n) = pairsL(i)
        if (batch.isEmpty) {
          // Exact global argmax — provided its count clears the floor
          // (an uncollected pair tied AT the floor would sort after
          // every collected row, hence lexicographically after (a,b),
          // so >= floor suffices for pairs; triples are handled by the
          // strict bound below for later candidates).
          if (n < 2L) { done = true }
          else if (n >= floor) {
            merges :+= ((a, b)); mined :+= ((a, b, n)); batch :+= ((a, b))
          } else endPass = true // degenerate: argmax not provably collected
        } else {
          val toks = batch.iterator.flatMap(p => Iterator(p._1, p._2)).toSet
          val disjoint = !toks(a) && !toks(b)
          // Highest possible count of any pair a batch merge creates.
          val bound = batch.iterator.map { case (x, y) =>
            val rel = tripsL.iterator.collect {
              case (ta, tb, _, tn) if ta == x && tb == y => tn
              case (_, tb, tz, tn) if tb == x && tz == y => tn
            }
            (rel ++ Iterator(floor)).max
          }.max
          if (n >= 2L && disjoint && n > bound) {
            merges :+= ((a, b)); mined :+= ((a, b, n)); batch :+= ((a, b))
          } else endPass = true
        }
        i += 1
      }
      if (!done && batch.isEmpty) {
        // Fallback (ties at the collection floor, or a pathological
        // all-triples top list): one pairs-only exact argmax job — the
        // original per-round shape.
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
            merges :+= ((a, b)); mined :+= ((a, b, n))
          case None => done = true
        }
      }
    }
    // nApplied for EVERY rank in one pass: replaying the merge table
    // left-to-right per word yields, at step r, exactly the replacement
    // count applyMerge would have reported at adoption time (the word is
    // tokenized by merges 1..r-1 when merge r applies). The same pass
    // carries the corpus token totals in two extra slots — the
    // conservation identity's before/after used to be a second job.
    val table = mined.map(t => (t._1, t._2))
    def add(x: Array[Long], y: Array[Long]): Array[Long] = {
      val z = new Array[Long](x.length)
      var i = 0
      while (i < x.length) { z(i) = x(i) + y(i); i += 1 }
      z
    }
    // rdd.aggregate (not Dataset.reduce): a zero value keeps the empty-
    // corpus case total instead of throwing on reduce-of-nothing.
    val stats = words.map { case (w, c) =>
      var toks = w.map(_.toString).toArray
      val per = table.map { case (a, b) =>
        val (t2, n) = applyMerge(toks, a, b)
        toks = t2
        n * c
      }.toArray
      per :+ (c * w.length.toLong) :+ (c * toks.length.toLong)
    }.rdd.treeAggregate(new Array[Long](table.length + 2))(add, add)
    val ms = mined.zipWithIndex.map { case ((a, b, n), i) =>
      Merge(i + 1, a, b, n, stats(i))
    }
    (ms, stats(mined.length), stats(mined.length + 1))
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
      // trainFull carries tokens_before/after in the SAME final pass
      // that computes per-rank nApplied — the standalone aggregate job
      // this query used to pay is gone (round latency, not data volume,
      // is this operator's wall).
      val (ms, before, after) = trainFull(words, Rounds)
      // the oracle hardcodes n_merges = Rounds; an early-stopping corpus
      // must fail HERE with a named cause, not as a confusing oracle
      // row-mismatch downstream
      require(ms.length == Rounds,
        s"BPE training early-stopped at ${ms.length} of $Rounds merges " +
          "(corpus ran out of repeated pairs) — the oracle's fixed " +
          s"n_merges=$Rounds cannot match; use a larger fixture or " +
          "lower Rounds")
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
