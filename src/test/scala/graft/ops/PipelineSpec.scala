package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.{TextFunctions => TF, VectorFunctions => VF}

/** Semantic checks the DuckDB oracle can't express: signature invariance,
  * LSH recall against brute-force truth, ANN recall of the IVF path. */
class PipelineSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("minhash: identical texts get identical signatures; disjoint differ") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "the quick brown fox jumps over the lazy dog again today"),
      (3L, "completely different words appear here nothing matches at all ever"))
      .toDF("id", "text")
      .select(col("id"),
        TF.minhashSignature(TF.shingleHashes(col("text"), 3)).as("sig"))
    val sigs = df.orderBy("id").as[(Long, Seq[Long])].collect()
    assert(sigs(0)._2 === sigs(1)._2)
    assert(sigs(0)._2 !== sigs(2)._2)
    assert(sigs(0)._2.length === TF.NumHashes)
  }

  test("minhash-LSH finds every high-jaccard pair the exact scan finds") {
    // Ground truth: exact all-pairs 3-shingle jaccard >= 0.8 (tiny sf).
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        array_distinct(TF.wordShingles(TF.tokens(col("text")), 3)).as("sh"))
    val truth = d.as("a").join(d.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        TF.jaccard(col("a.sh"), col("b.sh")).as("j"))
      .filter(col("j") >= 0.8)
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2)).toSet
    assert(truth.nonEmpty, "fixture should contain near-duplicates")

    val lsh = PipelineQueries.dedupMinhash(spark, sf)
      .filter(col("jacc") >= 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // 4 bands × 4 rows: P(candidate) = 1-(1-j^4)^4 → ≈0.88 at j=0.8,
    // ≈0.9987 at j=0.95. Demand totality only where theory promises it,
    // and high overall recall at 0.8.
    val truthHigh = d.as("a").join(d.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        TF.jaccard(col("a.sh"), col("b.sh")).as("j"))
      .filter(col("j") >= 0.95)
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2)).toSet
    assert(truthHigh.subsetOf(lsh),
      s"LSH missed ${truthHigh.diff(lsh).size} of ${truthHigh.size} j>=0.95 pairs")
    val recall = truth.intersect(lsh).size.toDouble / truth.size
    assert(recall >= 0.75, s"LSH recall $recall at j>=0.8 below s-curve expectation")
  }

  test("simhash: identical docs collide, hamming to near-dup is small") {
    val sh = Seq(
      (1L, "spark query engine for columnar analytics at scale"),
      (2L, "spark query engine for columnar analytics at scale"),
      (3L, "spark query engine for columnar analytics at speed"))
      .toDF("id", "text")
      .select(col("id"), TF.simhash(transform(TF.tokens(col("text")),
        t => TF.polyHashStr(t))).as("sh"))
      .orderBy("id").as[(Long, Long)].collect()
    assert(sh(0)._2 === sh(1)._2)
    val hamming = java.lang.Long.bitCount(sh(0)._2 ^ sh(2)._2)
    assert(hamming <= 12, s"near-identical docs hamming $hamming")
  }

  test("cosine: self-similarity is 1, IVF recall vs brute force >= 0.5") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val self = e.filter(col("vec_id") === 0)
      .select(VF.cosine(col("embedding"), col("embedding")).as("c"))
      .as[Double].head()
    assert(math.abs(self - 1.0) < 1e-12)

    val exact = PipelineQueries.embedTopK(spark, sf)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = PipelineQueries.embedIvf(spark, sf)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    // Fixture vectors are near-isotropic (weak cluster structure), so
    // probing 2 of 10 modulo-sampled centroids bounds recall well below a
    // trained k-means index; this guards against regressions, not quality.
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF recall $recall too low (probe=2)")
  }

  test("bigram LM: conditional micro-probs match a hand count") {
    val dir = tmpDir("bigram-lm")
    Seq((0L, "a b a b c"), (1L, "a b b q")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    // bigrams: doc0 (a,b)(b,a)(a,b)(b,c); doc1 (a,b)(b,b)(b,q)
    // context a: c1=3, only (a,b) ×3 → p = 1e6
    // context b: c1=4, four continuations ×1 → p = 250000, top-3 by w2
    val got = PipelineQueries.textBigramLm(spark, dir)
      .as[(String, Long, String, Long, Long, Long)].collect().toSeq
    assert(got.filter(_._1 == "a") ===
      Seq(("a", 1L, "b", 3L, 3L, 1000000L)))
    assert(got.filter(_._1 == "b") === Seq(
      ("b", 1L, "a", 1L, 4L, 250000L),
      ("b", 2L, "b", 1L, 4L, 250000L),
      ("b", 3L, "c", 1L, 4L, 250000L)))
  }

  test("IVF+PQ: contract flags all true, candidates within probed clusters") {
    val out = PipelineQueries.embedIvfPq(spark, sf)
      .as[(Long, Boolean, Boolean)].collect()
    assert(out.length === 8)
    assert(out.forall(_._2), "ADC+re-rank must recover >=7/10 of the " +
      "exact top-10 within the probed clusters")
    assert(out.forall(_._3), "each query's probes must hold >=10 candidates")
  }

  test("substring dedup: hash-join pairs equal string-window ground truth") {
    // Ground truth on the actual fixture, computed the way the hash path
    // MUST behave: join docs on the literal 8-token window STRING (no
    // hashes anywhere), same 2..16-doc boilerplate band, >= 2 windows.
    val win = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        explode(array_distinct(TF.wordShingles(TF.tokens(col("text")), 8)))
          .as("s"))
    val keep = win.groupBy("s").count()
      .filter(col("count").between(2, 16)).select("s")
    val w2 = win.join(keep, Seq("s"))
    val truth = w2.as("a")
      .join(w2.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id"), col("b.doc_id")).count()
      .filter(col("count") >= 2)
      .select(col("a.doc_id"), col("b.doc_id"))
      .as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "fixture should contain verbatim-overlap twins")

    val got = PipelineQueries.dedupSubstring(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got === truth,
      s"hash-window pairs diverge: extra=${got.diff(truth)} missing=${truth.diff(got)}")
  }

  test("FPS coreset equals the greedy brute force; each pick is max-min") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import graft.functions.expressions.SetVectorOps
    val vecs = graft.Tables.load(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1)
    // brute-force greedy FPS through the SAME cosine kernel (bit-exact)
    def cos(a: Array[Float], b: Array[Float]): Double =
      SetVectorOps.cosineF(ArrayData.toArrayData(a), ArrayData.toArrayData(b))
    var sel = Vector(vecs.head._1)
    val selVecs = scala.collection.mutable.ArrayBuffer(vecs.head._2)
    val expect = scala.collection.mutable.ArrayBuffer[(Int, Long, Option[Double])](
      (1, sel.head, None))
    for (r <- 2 to 8) {
      val cands = vecs.filterNot(v => sel.contains(v._1))
        .map { case (id, v) => (id, selVecs.map(cos(v, _)).max) }
      val (id, ms) = cands.minBy { case (id, ms) => (ms, id) }
      sel :+= id
      selVecs += vecs.find(_._1 == id).get._2
      expect += ((r, id, Some(ms)))
    }
    val got = PipelineQueries.embedCoreset(spark, sf)
      .as[(Int, Long, Option[Double])].collect().sortBy(_._1).toSeq
    assert(got === expect.toSeq)
    // diversity property: every later pick's max-sim-at-selection is
    // monotone non-decreasing (the max-min radius shrinks)
    val sims = got.drop(1).map(_._3.get)
    assert(sims === sims.sorted, s"FPS radii must be monotone: $sims")
  }

  test("importance resampling: kept docs are target-like, flag matches score") {
    val r = PipelineQueries.sampleImportance(spark, sf)
      .as[(Long, Long, Long, Boolean)].collect()
    assert(r.nonEmpty)
    // keep flag is exactly the >= 1e6 mean-importance rule
    r.foreach { case (id, sum, n, keep) =>
      assert(keep === (sum.toDouble / n >= 1e6), s"doc $id flag/score mismatch") }
    // directionality: the target class (lang=en) must score higher on
    // average than the rest — the whole point of the estimator
    val lang = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang").as[(Long, String)].collect().toMap
    val (en, rest) = r.partition(x => lang(x._1) == "en")
    def mean(xs: Array[(Long, Long, Long, Boolean)]) =
      xs.map(x => x._2.toDouble / x._3).sum / xs.length
    assert(mean(en) > mean(rest),
      f"en mean ${mean(en)}%.0f not above non-en ${mean(rest)}%.0f")
  }

  test("perplexity filter: rare-token docs surface in the high-surprisal tail") {
    val r = PipelineQueries.textPerplexity(spark, sf)
      .as[(Long, Long, Long, Double, Boolean)].collect()
    assert(r.nonEmpty)
    r.foreach { case (id, sum, n, avg, keep) =>
      assert(math.abs(avg - sum.toDouble / n) < 1e-9)
      assert(keep === (avg <= 31e6), s"doc $id flag/threshold mismatch") }
    // The doc holding the corpus's rarest token must score above median.
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), explode(TF.tokens(col("text"))).as("tk"))
    val rarest = toks.groupBy("tk").count()
      .orderBy(col("count"), col("tk")).as[(String, Long)].head()._1
    val holder = toks.filter(col("tk") === rarest)
      .select("doc_id").as[Long].head()
    val byDoc = r.map(x => x._1 -> x._4).toMap
    val median = r.map(_._4).sorted.apply(r.length / 2)
    assert(byDoc(holder) > median,
      s"doc $holder holds rarest token '$rarest' but scores at/below median")
  }

  test("subword tokenizer: fold equals a reference greedy over every word") {
    // brute-force maximal munch in plain Scala — the independent truth
    // the bounded struct-fold must reproduce exactly
    val v4 = Set("park", "quer", "scan", "slow", "line", "grou")
    val v3 = Set("mer", "par", "row", "all", "ord", "ust")
    val v2 = Set("er", "st", "or", "ow", "in", "at", "ar", "to", "as")
    def greedy(w: String): (Long, Long) = {
      var o = 0; var nt = 0L; var nf = 0L
      while (o < w.length) {
        if (v4.contains(w.slice(o, o + 4))) o += 4
        else if (v3.contains(w.slice(o, o + 3))) o += 3
        else if (v2.contains(w.slice(o, o + 2))) o += 2
        else { o += 1; nf += 1 }
        nt += 1
      }
      (nt, nf)
    }
    val got = PipelineQueries.tokenizeSubword(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    got.foreach { case (id, nw, nt, nf) =>
      val words = texts(id).split(" ", -1)
      assert(nw === words.length.toLong)
      val (wnt, wnf) = words.map(greedy).foldLeft((0L, 0L)) {
        case ((a, b), (c, d)) => (a + c, b + d)
      }
      assert(nt === wnt, s"doc $id token count")
      assert(nf === wnf, s"doc $id fallback count")
    }
    // the vocab actually fires: strictly fewer tokens than chars-in-words
    assert(got.exists { case (id, _, nt, _) =>
      nt < texts(id).count(_ != ' ').toLong })
  }

  test("classifier: score equals brute-force hashed-feature recompute") {
    def polyHash(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    def weight(h: Long): Long =
      (h % 4096L) * 2654435761L % 4194304L - 2097152L
    val got = PipelineQueries.textClassify(spark, sf)
      .as[(Long, Long, Long, Long, Boolean)].collect()
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    got.foreach { case (id, nUni, nBi, score, keep) =>
      val ws = texts(id).split(" ", -1)
      val want = ws.map(w => weight(polyHash(w))).sum +
        ws.sliding(2).filter(_.length == 2)
          .map(p => weight(polyHash(p(0) + " " + p(1)))).sum
      assert(nUni === ws.length.toLong)
      assert(nBi === math.max(ws.length - 1, 0).toLong)
      assert(score === want, s"doc $id score")
      assert(keep === (score > 0L))
    }
    // the frozen model actually separates: both verdicts occur
    assert(got.exists(_._5) && got.exists(!_._5))
  }

  test("postings: df equals list length, lists sorted, bounds hold") {
    val rows = PipelineQueries.textPostings(spark, sf)
      .as[(String, Long, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (sh, df, psStr) =>
      val ps = psStr.split(",").map(_.toLong).toSeq
      assert(df === ps.length.toLong, s"$sh df vs list")
      assert(df >= 2 && df <= 20, s"$sh df bound")
      assert(ps == ps.sorted && ps.distinct.size == ps.size, s"$sh order")
    }
  }

  test("communities: union-find parity, mutual edges co-membered, majority exact") {
    import spark.implicits._
    val rows = PipelineQueries.embedCommunities(spark, sf)
      .as[(Long, Long, Long, Int)].collect()
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(rows.length.toLong === n, "every vector gets a community")

    // brute-force union-find over the SAME mutual edge set
    val edges = PipelineQueries.embedKnnGraph(spark, sf)
      .filter(org.apache.spark.sql.functions.col("mutual"))
      .select("src", "dst").as[(Long, Long)].collect()
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val got = rows.map(r => r._1 -> r._2).toMap
    rows.foreach { case (v, comm, _, _) =>
      val want = if (parent.contains(v) || edges.exists(e =>
        e._1 == v || e._2 == v)) find(v) else v
      assert(comm === want, s"vec $v community")
    }
    // community size + majority label recompute
    val labels = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label").as[(Long, Int)].collect().toMap
    rows.groupBy(_._2).foreach { case (comm, g) =>
      assert(g.forall(_._3 === g.length.toLong), s"csize of $comm")
      val hist = g.groupBy(r => labels(r._1)).view.mapValues(_.size)
      val want = hist.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      assert(g.forall(_._4 === want), s"majority label of $comm")
    }
    // every mutual edge is intra-community
    edges.foreach { case (a, b) =>
      assert(got(a) === got(b), s"edge ($a,$b) straddles communities")
    }
  }

  test("negative mining: ranks contiguous, labels differ, hard flag exact") {
    val rows = PipelineQueries.mineNegatives(spark, sf)
      .as[(Long, Long, Long, Double, Double, Boolean)].collect()
    val labels = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label").as[(Long, Int)].collect().toMap
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (qid, g) =>
      assert(g.map(_._2).sorted.toSeq === (1L to g.length).toSeq,
        s"anchor $qid ranks")
      // negatives strictly ordered; every negative's label differs
      val byRank = g.sortBy(_._2)
      assert(byRank.map(_._4).toSeq === byRank.map(_._4).sorted.reverse.toSeq)
      g.foreach { r =>
        assert(labels(r._3) !== labels(qid), s"anchor $qid neg ${r._3}")
        assert(r._6 === (r._4 > r._5), "hard = neg outranks best positive")
      }
    }
  }

  test("kNN graph: per-node top-3 equals in-cluster brute force, mutual exact") {
    val rows = PipelineQueries.embedKnnGraph(spark, sf)
      .as[(Long, Long, Long, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    // ranks contiguous from 1, cosine non-increasing within each src
    rows.groupBy(_._1).foreach { case (src, g) =>
      assert(g.map(_._2).sorted.toSeq === (1L to g.length).toSeq, s"src $src")
      val byRank = g.sortBy(_._2)
      assert(byRank.map(_._4).toSeq === byRank.map(_._4).sorted.reverse.toSeq,
        s"src $src cosine order")
      assert(g.length <= 3)
    }
    // mutual flag: exact recompute from the edge set itself
    val edgeSet = rows.map(r => (r._1, r._3)).toSet
    rows.foreach { r =>
      assert(r._5 === edgeSet.contains((r._3, r._1)),
        s"mutual flag wrong on ${(r._1, r._3)}")
    }
    // spot-check brute force within one cluster: rebuild assignments
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val model = CentroidModel.collect(
      base.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("cid"), col("v").as("cv")))
    import graft.functions.expressions.{SetVectorExpressions => SVE}
    val assigned = base.select(col("vec_id"), col("v"),
      SVE.nearest_centroid(col("v"), model).getField("cluster").as("cluster"))
      .as[(Long, Seq[Double], Long)].collect()
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val oneCluster = assigned.groupBy(_._3).values.maxBy(_.length)
    for ((vid, v, _) <- oneCluster.take(5)) {
      val expect = oneCluster.filter(_._1 != vid)
        .map { case (o, ov, _) => (cos(v, ov), o) }
        .sortBy { case (c, o) => (-c, o) }.take(3).map(_._2).toSeq
      val got = rows.filter(_._1 == vid).sortBy(_._2).map(_._3).toSeq
      assert(got === expect, s"node $vid top-3 differs from brute force")
    }
  }

  test("bitext plan: rank+sum share one exchange per pair-frame side") {
    // the vec_a windows (rank, top-k sum) and the vec_b windows must
    // each plan over ONE hash exchange of the pair frame — the r17
    // regression this pins doubled both (4 pair-frame shuffles)
    val phys = PipelineQueries.mineBitext(spark, sf)
      .queryExecution.executedPlan.toString
    def count(sub: String): Int = sub.r.findAllIn(phys).length
    assert(count("hashpartitioning\\(vec_a") == 1,
      s"vec_a side must exchange once:\n$phys")
    assert(count("hashpartitioning\\(vec_b") == 1,
      s"vec_b side must exchange once:\n$phys")
  }

  test("simhash plan: the banded self-join carries no doc-id lists") {
    // the quadratic in-bucket pairing must move 16-byte signature rows;
    // the collect_list doc ids attach AFTER the hamming filter + dedup
    val qe = PipelineQueries.dedupSimhash(spark, sf).queryExecution
    val joins = qe.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.condition.exists(c =>
            c.references.exists(a =>
              a.name == "hi" || a.name == "lo")) => j
    }
    assert(joins.nonEmpty, "banded self-join missing from the plan")
    joins.foreach { j =>
      val carried = (j.left.output ++ j.right.output).map(_.name)
      assert(!carried.contains("ids") && !carried.contains("ida") &&
        !carried.contains("idb"),
        s"self-join must not carry doc-id lists, got: $carried")
    }
  }

  test("bitext margin: best-target, sums and mutual flag match brute force") {
    val out = PipelineQueries.mineBitext(spark, sf)
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(out.nonEmpty)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label", "embedding")
      .as[(Long, Int, Array[Float])].collect()
    def cosMicro(x: Array[Float], y: Array[Float]): Long = {
      var d = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < x.length) {
        d += x(i).toDouble * y(i).toDouble
        nx += x(i).toDouble * x(i).toDouble
        ny += y(i).toDouble * y(i).toDouble
        i += 1
      }
      math.floor(d / (math.sqrt(nx) * math.sqrt(ny)) * 1000000).toLong
    }
    val as = e.filter(_._2 == 0); val bs = e.filter(_._2 == 1)
    val pos = (for { a <- as; b <- bs; c = cosMicro(a._3, b._3) if c > 0 }
      yield (a._1, b._1, c)).toSeq
    def topSum(g: Seq[(Long, Long)]): Long = // (otherId, c) desc, id tiebreak
      g.sortBy(p => (-p._2, p._1)).take(4).map(_._2).sum
    val aTop = pos.groupBy(_._1).view
      .mapValues(g => g.map(p => (p._2, p._3))).toMap
    val bTop = pos.groupBy(_._2).view
      .mapValues(g => g.map(p => (p._1, p._3))).toMap
    out.foreach { case (va, vb, c, m, mutual) =>
      val best = aTop(va).minBy(p => (-p._2, p._1))
      assert((best._1, best._2) === ((vb, c)), s"$va best target")
      val want = 8L * c * 1000000L / (topSum(aTop(va)) + topSum(bTop(vb)))
      assert(m === want, s"$va margin")
      assert(m > 1060000L)
      val bBest = bTop(vb).minBy(p => (-p._2, p._1))
      assert(mutual === (bBest._1 == va), s"$va mutual")
    }
    // completeness: every source whose best pair clears the margin is in
    val wantAs = aTop.keys.filter { va =>
      val best = aTop(va).minBy(p => (-p._2, p._1))
      val m = 8L * best._2 * 1000000L /
        (topSum(aTop(va)) + topSum(bTop(best._1)))
      m > 1060000L
    }.toSeq.sorted
    assert(out.map(_._1).sorted.toSeq === wantAs)
  }

  test("normalized dedup collapses case/punct variants byte-exact misses") {
    // craft a documents fixture with re-encodes of one page
    val dir = tmpDir("norm-dedup")
    Seq(
      (1L, "Hello, World! This is a Test.", "en", "a", 29L),
      (2L, "hello world  this is a test", "en", "b", 28L),
      (3L, "HELLO WORLD... this is a TEST", "en", "c", 29L),
      (4L, "a different document entirely", "en", "d", 29L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = PipelineQueries.dedupNormalized(spark, dir)
      .as[(String, Long, Long, Long)].collect()
    assert(out.length === 2, "two normalized groups")
    val big = out.find(_._3 == 3L).get
    assert(big._2 === 1L, "keeper is the min doc_id")
    assert(big._4 === 2L, "three raw hashes collapsed, two were missed " +
      "by byte-exact dedup")
    assert(out.find(_._3 == 1L).get._4 === 0L, "singleton gains nothing")
    // byte-exact on the same fixture finds NO duplicate groups
    val exact = PipelineQueries.dedupExact(spark, dir)
      .as[(String, Long, Long)].collect()
    assert(exact.forall(_._3 == 1L))
  }

  test("rank fusion: RRF scores recompute from ranks, legs independent") {
    val out = PipelineQueries.rankFusion(spark, sf)
      .as[(Long, Option[Long], Option[Long], Long)].collect()
    assert(out.length === 10)
    // score is exactly the integer RRF of whichever ranks are present
    out.foreach { case (id, bm, cs, rrf) =>
      val want = bm.map(r => 1000000L / (60 + r)).getOrElse(0L) +
        cs.map(r => 1000000L / (60 + r)).getOrElse(0L)
      assert(rrf === want, s"doc $id rrf")
      assert(bm.isDefined || cs.isDefined, s"doc $id has no leg")
      bm.foreach(r => assert(r >= 1 && r <= 20))
      cs.foreach(r => assert(r >= 1 && r <= 20))
    }
    // output sorted by fused score desc, id tiebreak
    val key = out.map(r => (-r._4, r._1)).toSeq
    assert(key === key.sorted, "fusion ordering")
    // both legs contributed somewhere in the top-10 (hybrid, not one-leg)
    assert(out.exists(_._2.isDefined) && out.exists(_._3.isDefined))
  }
}
