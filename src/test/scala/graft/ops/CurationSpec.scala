package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class CurationSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("connected components: chain + separate clique get min-id labels") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3) plus triangle 10-11-12
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("src", "dst")
    val got = ConnectedComponents.label(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("connected components: bridge doc merges two cliques") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (3L, 4L), (2L, 3L)).toDF("src", "dst")
    val got = ConnectedComponents.label(edges)
      .as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(1L))
  }

  test("connected components: 100-node path converges (pointer jumping)") {
    import spark.implicits._
    // Diameter-99 chain: plain min-propagation needs 99 rounds; the
    // pointer-jump accelerated loop must finish inside the default
    // maxIter=25 (O(log d) rounds) with every node labelled 0.
    val edges = (0L until 99L).map(i => (i, i + 1)).toDF("src", "dst")
    // localThreshold=0 pins the DISTRIBUTED loop — the default gate
    // would close this tiny graph on the driver and test nothing
    val got = ConnectedComponents.label(edges, localThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 100 && got.values.forall(_ == 0L))
  }

  test("connected components: local and distributed strategies agree") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong,
      rnd.nextInt(120).toLong)).filter(p => p._1 != p._2)
      .toDF("src", "dst")
    val local = ConnectedComponents.label(edges)
      .as[(Long, Long)].collect().toMap
    val dist = ConnectedComponents.label(edges, localThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert(local === dist)
  }

  test("connected components: non-integral ids keep the distributed path's contract") {
    import spark.implicits._
    // string ids cannot take the long-cast local union-find; the gate
    // must route them to the distributed loop regardless of edge count
    val edges = Seq(("a", "b"), ("b", "c"), ("x", "y"))
      .toDF("src", "dst")
    val got = ConnectedComponents.label(edges)
      .as[(String, String)].collect().toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a",
      "x" -> "x", "y" -> "x"))
  }

  test("connected components: local path skips null-endpoint edges") {
    import spark.implicits._
    val edges = Seq((Some(1L), Some(2L)), (Some(2L), None),
      (None, Some(5L)), (Some(3L), Some(3L))).toDF("src", "dst")
    val got = ConnectedComponents.label(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("connected components: non-convergence is loud, not silent") {
    import spark.implicits._
    val edges = (0L until 40L).map(i => (i, i + 1)).toDF("src", "dst")
    // maxIter=2 cannot close a 40-hop chain even with jumping
    // (distributed path pinned — union-find has no iteration budget)
    assertThrows[IllegalStateException] {
      ConnectedComponents.label(edges, maxIter = 2, localThreshold = 0)
        .collect()
    }
  }

  test("pagerank: hub outranks leaves, isolated node sits at base rank") {
    import spark.implicits._
    // star: 1 is the hub of 2,3,4; node 99 is isolated
    val ids = Seq(1L, 2L, 3L, 4L, 99L).toDF("id")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val got = PageRank.run(ids, pairs, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got(99L) === 150000L, "isolated node = base rank after any hop")
    assert(Seq(2L, 3L, 4L).map(got).distinct.size === 1,
      "symmetric leaves tie exactly")
    assert(got(1L) > got(2L), "hub must outrank its leaves")
    assert(got.values.forall(_ >= 150000L), "base rank is a floor")
  }

  test("pagerank: bit-deterministic across runs, 2-clique symmetric") {
    import spark.implicits._
    val ids = Seq(1L, 2L).toDF("id")
    val pairs = Seq((1L, 2L)).toDF("src", "dst")
    val a = PageRank.run(ids, pairs, 3).as[(Long, Long)].collect().toMap
    val b = PageRank.run(ids, pairs, 3).as[(Long, Long)].collect().toMap
    assert(a === b, "integer arithmetic: reruns are bit-identical")
    assert(a(1L) === a(2L), "symmetric pair ranks equally")
    // closed 2-clique under d=0.85: r converges toward 1e6; after 3
    // integer hops the exact value is reproducible arithmetic
    assert(a(1L) === 1000000L - 1 || a(1L) === 1000000L,
      s"closed pair stays at ~unit mass, got ${a(1L)}")
  }

  test("curriculum: stages partition by difficulty, order is in-stage LCG") {
    import spark.implicits._
    val rows = CurationQueries.curriculumOrder(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length.toLong === nDocs)
    // stage is the fixed threshold function of difficulty — monotone
    rows.foreach { case (_, diff, stage, _) =>
      val want = if (diff < 438) 1L else if (diff < 450) 2L
        else if (diff < 463) 3L else 4L
      assert(stage === want)
    }
    // emission order: rows arrive sorted by (stage, ord, doc_id)
    val keys = rows.map(r => (r._3, r._4, r._1)).toSeq
    assert(keys === keys.sorted, "output IS the curriculum order")
    // the in-stage shuffle decorrelates from doc_id order: within the
    // largest stage, ord must not be monotone in doc_id
    val biggest = rows.groupBy(_._3).maxBy(_._2.length)._2
    val byId = biggest.sortBy(_._1).map(_._4).toSeq
    assert(byId !== byId.sorted, "in-stage order must be shuffled")
  }

  test("dedup clusters: reps are cluster minima, csize consistent") {
    val r = CurationQueries.dedupClusters(spark, sf)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.nonEmpty, "fixture should contain near-dup clusters")
    val byRep = r.groupBy(_._2)
    byRep.foreach { case (rep, members) =>
      assert(members.map(_._1).min == rep, s"rep $rep is not cluster min")
      assert(members.forall(_._3 == members.length), s"csize wrong for $rep")
      assert(members.length >= 2, "clusters come from pairs: size >= 2")
    }
  }

  test("content-defined chunks cover exactly and re-align after an edit") {
    import spark.implicits._
    // coverage/adjacency on the fixture: chunks tile each doc exactly
    val rows = CurationQueries.chunkCdc(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    val nToks = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "CAST(size(split(text, ' ')) AS BIGINT)")
      .as[(Long, Long)].collect().toMap
    rows.groupBy(_._1).foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._3 === 1L, s"doc $doc must start at token 1")
      assert(sorted.last._4 === nToks(doc), s"doc $doc must end at len")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 === a._4 + 1, s"gap in doc $doc")
        case _ =>
      }
    }
    // THE content-defined property: prefixing a token shifts every
    // boundary by one but creates/destroys none beyond the first chunk,
    // so all chunks after the first re-align (fixed windows all shift)
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .orderBy("doc_id").select("text").as[String].head()
    val dir = tmpDir("cdc-chunks")
    Seq((0L, base), (1L, "zzz " + base)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val two = CurationQueries.chunkCdc(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
    def spans(doc: Long) = two.filter(_._1 == doc).sortBy(_._2)
      .map(c => (c._3, c._4)).drop(1)
    assert(spans(0L).map { case (s0, e0) => (s0 + 1, e0 + 1) }.toSeq ===
      spans(1L).toSeq, "chunks after the first must re-align under a prefix edit")
  }

  test("canonical selection keeps exactly the best doc of every cluster") {
    import spark.implicits._
    val rows = CurationQueries.dedupCanonical(spark, sf)
      .as[(Long, Long, Boolean)].collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length.toLong === nDocs, "one verdict per document")
    // exactly one keeper per rep
    val byRep = rows.groupBy(_._2)
    assert(byRep.values.forall(_.count(_._3) === 1))
    // the keeper is the argmax-(n_chars, -doc_id) of its cluster
    val chars = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toMap
    byRep.values.filter(_.length > 1).foreach { cluster =>
      val kept = cluster.find(_._3).get._1
      val best = cluster.map(_._1)
        .minBy(id => (-chars(id), id))
      assert(kept === best, s"cluster ${cluster.head._2}")
    }
    // clusters exist in the fixture (else the test proves nothing)
    assert(byRep.values.exists(_.length > 1))
    // a doc in no near-dup pair is its own rep and kept
    val singles = rows.filter(r => byRep(r._2).length == 1)
    assert(singles.nonEmpty && singles.forall(r => r._1 == r._2 && r._3))
  }

  test("stratified sample caps every language near the quota") {
    val d = graft.Tables.load(spark, sf, "documents")
    val total = d.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = CurationQueries.sampleStratified(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    total.foreach { case (lang, n) =>
      val k = kept.getOrElse(lang, 0L)
      if (n <= 100) assert(k == n, s"$lang under quota must keep all")
      // LCG-hash thinning is approximate: allow 2x slack on the cap
      else assert(k <= 200, s"$lang kept $k of $n, cap ~100")
    }
  }

  test("redaction scrubs every enriched email/ip and counts them") {
    val r = CurationQueries.textRedact(spark, sf)
    val bad = r.filter(
      (col("doc_id") % 7 === 0 && col("n_email") < 1) ||
        (col("doc_id") % 11 === 0 && col("n_ip") < 1)).count()
    assert(bad == 0, "every enriched doc must report a redaction")
    // spot-check an actual replacement
    val row = r.filter(col("doc_id") === 0).collect().head
    assert(row.getLong(1) >= 1 && row.getLong(2) >= 1)
  }

  test("sequence packing: packs fill to budget, overflow bounded by one doc") {
    val rows = CurationQueries.packSequences(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(3), r.getLong(2)))
    val packs = rows.groupBy(t => (t._1, t._2))
      .map { case (_, m) => m.map(_._3).sum }
    // every doc fits somewhere, and no pack exceeds budget + one max doc
    val maxDoc = rows.map(_._3).max
    assert(packs.forall(_ <= 2000 + maxDoc), "pack overflow beyond one doc")
    // non-final packs are at least half full (greedy longest-first)
    assert(packs.count(_ >= 1000) >= packs.size / 2)
  }

  test("sequence packing: two-level running total == single-window; " +
      "no source-keyed window") {
    import org.apache.spark.sql.expressions.Window
    val df = CurationQueries.packSequences(spark, sf)
    // plan: every per-DOC window must be keyed by the range-partition
    // id — a bare source-keyed window would single-task a dominant
    // stratum. Checked on the logical Window nodes' partitionSpec
    // (NOT a plan-text substring: "ORDER BY pid" in the offsets
    // window satisfies a contains("pid") check vacuously). The one
    // whitelisted pid-less window is the per-source prefix-offset
    // window, which runs AFTER groupBy(pid, source) on a frame
    // bounded at #partitions × #sources rows and orders by pid.
    // the per-doc window lives BEHIND the localCheckpoint barrier, so
    // inspect the pre-checkpoint fragment for it...
    val rangedWins = CurationQueries.packRanged(spark, sf)
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
    assert(rangedWins.nonEmpty &&
      rangedWins.forall(_.partitionSpec.exists(
        _.references.exists(_.name == "pid"))),
      "per-doc running-sum window lost its pid partition key")
    // ...and the post-checkpoint plan for the whitelist
    val wins = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    val pidless = wins.filterNot(
      _.partitionSpec.exists(_.references.exists(_.name == "pid")))
    pidless.foreach { w =>
      val pKeys = w.partitionSpec.flatMap(_.references.map(_.name))
      val oKeys = w.orderSpec.flatMap(_.child.references.map(_.name))
      assert(pKeys == Seq("source") && oKeys.contains("pid"),
        s"unexpected pid-less window: partitionBy=$pKeys orderBy=$oKeys")
    }
    // values: exactly the single-window spelling
    val single = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("bigint").as("n_tok"))
      .withColumn("pack_no",
        floor((sum(col("n_tok")).over(
          Window.partitionBy("source")
            .orderBy(col("n_tok").desc, col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          - col("n_tok")) / 2000))
      .select("doc_id", "source", "n_tok", "pack_no")
      .orderBy("doc_id").collect()
    val got = df.collect()
    assert(got.length === single.length && got.nonEmpty)
    got.zip(single).foreach { case (a, b) =>
      assert(a === b, s"two-level diverged: $a vs $b")
    }
  }

  test("chunk windows: full coverage, bounded size, stride overlap") {
    val d = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = CurationQueries.chunkWindows(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(3)))
    chunks.groupBy(_._1).foreach { case (doc, cs) =>
      val n = d(doc)
      // chunk count matches the stride formula; every chunk <= window
      val want = math.max(1, math.ceil((n - 64).toDouble / 48 + 1).toInt)
      assert(cs.length === want, s"doc $doc with $n tokens")
      assert(cs.forall(_._3 <= 64))
      // chunks except the last are full windows; indexes are dense
      assert(cs.map(_._2).sorted.toSeq === (0 until want))
      if (want > 1)
        assert(cs.filter(_._2 < want - 1).forall(_._3 == 64L))
      // stride coverage: total distinct tokens covered = n
      val lastStart = (want - 1) * 48
      assert(lastStart < n && lastStart + cs.maxBy(_._2)._3 == n)
    }
  }

  test("contamination pairs share at least two shingles and exclude eval-eval") {
    val r = CurationQueries.contamination(spark, sf).collect()
    assert(r.forall(_.getLong(2) >= 2))
    assert(r.forall(row => row.getLong(0) % 100 != 0))
    assert(r.forall(row => row.getLong(1) % 100 == 0))
  }

  test("temperature sampling: sqrt-weight quotas, cycling epochs, 300 draws") {
    import spark.implicits._
    val out = CurationQueries.sampleTemperature(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(out.length === 300, "budget fully spent")
    val counts = graft.Tables.load(spark, sf, "documents")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // recompute largest-remainder quotas from floor(sqrt(n))
    val wt = counts.view.mapValues(n => math.sqrt(n.toDouble).toLong).toMap
    val wsum = wt.values.sum
    val base = wt.view.mapValues(w => 300L * w / wsum).toMap
    val leftover = 300L - base.values.sum
    val bump = wt.keys.toSeq
      .sortBy(l => (-(300L * wt(l) % wsum), l)).take(leftover.toInt).toSet
    val quota = base.map { case (l, b) => l -> (b + (if (bump(l)) 1L else 0L)) }
    val got = out.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    assert(got === quota.filter(_._2 > 0L), "per-language draw counts")
    out.groupBy(_._1).foreach { case (lang, g) =>
      val n = counts(lang)
      // rk dense from 1, epoch = ceil(rk / n), docs cycle: same doc at
      // rk and rk + n
      assert(g.map(_._2).sorted.toSeq === (1L to g.length))
      g.foreach { case (_, rk, ep, _) => assert(ep === (rk - 1) / n + 1) }
      val byRk = g.map(r => r._2 -> r._4).toMap
      byRk.foreach { case (rk, doc) =>
        byRk.get(rk + n).foreach(d2 => assert(d2 === doc, s"$lang cycle"))
      }
      // within one epoch, no document repeats
      g.groupBy(_._3).values.foreach { e =>
        assert(e.map(_._4).distinct.length === e.length, s"$lang epoch dup")
      }
    }
    // upsampling happened: some language needs a second epoch at this sf
    // only if its quota exceeds its doc count — assert consistency either way
    out.filter(_._3 > 1L).foreach { case (lang, _, _, _) =>
      assert(got(lang) > counts(lang), s"$lang epoch>1 implies quota > n")
    }
  }

  test("temperature sampling: a zero-quota language emits NO draws") {
    import spark.implicits._
    // 350² + 350² + 1 docs → weights (350, 350, 1), wsum 701: the tiny
    // language floors to 0 and its remainder (300) ranks BELOW the big
    // languages' (551), so the 2 leftover bumps skip it — quota 0.
    // Spark's sequence(1, 0) descends to [1, 0] instead of empty, so
    // without the quota>0 guard this emitted phantom draws.
    val dir = tmpDir("temp-zero-quota")
    spark.range(245001).select(
      col("id").as("doc_id"), lit("word word").as("text"),
      when(col("id") < 122500, "aa")
        .when(col("id") < 245000, "bb").otherwise("cc").as("lang"),
      lit("s").as("source"), lit(9L).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CurationQueries.sampleTemperature(spark, dir)
      .as[(String, Long, Long, Long)].collect()
    assert(out.length === 300, "budget exactly spent")
    val byLang = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byLang === Map("aa" -> 150, "bb" -> 150),
      "zero-quota language contributes nothing, bumps go by remainder")
    assert(out.forall(r => r._2 >= 1 && r._3 >= 1), "no phantom rk/epoch")
  }

  test("source cap: nothing over cap, longest docs win, totals honest") {
    import spark.implicits._
    val out = CurationQueries.sourceCap(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    val raw = graft.Tables.load(spark, sf, "documents")
      .select("source", "doc_id", "n_chars")
      .as[(String, Long, Long)].collect()
    val bySource = raw.groupBy(_._1)
    out.groupBy(_._1).foreach { case (src, g) =>
      val all = bySource(src)
      assert(g.length <= 40, s"$src over cap")
      assert(g.length === math.min(40, all.length), s"$src kept count")
      assert(g.forall(_._5 == all.length), s"$src n_total")
      // ranks dense; kept set = top-40 by (n_chars desc, doc_id asc)
      assert(g.map(_._2).sorted.toSeq === (1L to g.length))
      val want = all.sortBy(d => (-d._3, d._2)).take(40)
      val got = g.sortBy(_._2)
      assert(got.map(_._3).toSeq === want.map(_._2).toSeq, s"$src keep set")
      assert(got.map(_._4).toSeq === want.map(_._3).toSeq, s"$src n_chars")
    }
    // every source appears
    assert(out.map(_._1).distinct.sorted.toSeq ===
      bySource.keys.toSeq.sorted)
  }

  test("leakproof split: no near-dup cluster straddles a split boundary") {
    import spark.implicits._
    val rows = CurationQueries.splitLeakproof(spark, sf)
      .as[(Long, Long, String)].collect()
    assert(rows.nonEmpty)
    // the guarantee itself: one split per cluster rep
    rows.groupBy(_._2).foreach { case (rep, g) =>
      assert(g.map(_._3).distinct.length === 1,
        s"cluster $rep straddles splits: ${g.map(_._3).distinct.toSeq}")
    }
    // every MinHash near-dup pair shares a split (the leak q_split_assign
    // permits: doc-id hashing CAN separate a pair — this one cannot)
    val split = rows.map(r => r._1 -> r._3).toMap
    val pairs = PipelineQueries.minhashPairs(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "fixture must contain near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(split(a) === split(b), s"pair ($a,$b) split across sets")
    }
    // all three splits exist and every doc is assigned exactly once
    assert(rows.map(_._3).distinct.toSet === Set("train", "val", "test"))
    assert(rows.map(_._1).distinct.length === rows.length)
  }

  test("dominant component: aggregate consume shapes survive a 50% giant") {
    import spark.implicits._
    // One star swallowing HALF the paired vertices (0 — 1..499, 500 of
    // 1000) plus 250 disjoint pairs. The pre-r14 window shape
    // (Window.partitionBy(comp)) funnels the giant through one task;
    // the groupBy+join shapes must produce the same answers with
    // map-side partial aggregation.
    val giant = (1L to 499L).map(i => (0L, i))
    val pairs = (0L until 250L).map(i => (1000L + 2 * i, 1001L + 2 * i))
    val edges = (giant ++ pairs).toDF("src", "dst")
    val labels = ConnectedComponents.label(edges).cache()
    try {
      val sized = CurationQueries.withClusterSizes(labels)
        .groupBy("csize").count().as[(Long, Long)].collect().toMap
      assert(sized === Map(500L -> 500L, 2L -> 500L))
      // canonical keep: quality = id % 97; giant argmax is n_chars=96,
      // ties (96, 193, 290, 387, 484) broken to the smallest doc_id
      val labeled = labels.select(col("id").as("doc_id"),
        col("comp").as("rep"), (col("id") % 97).as("n_chars"))
      val kept = CurationQueries.canonicalKeep(labeled)
        .filter(col("keep")).select("rep", "doc_id")
        .as[(Long, Long)].collect().toMap
      assert(kept(0L) === 96L)
      // exactly one keep per cluster, incl. all 250 pair clusters
      assert(kept.size === 251)
      pairs.foreach { case (a, b) =>
        assert(kept(a) === (if (a % 97 >= b % 97) a else b))
      }
    } finally labels.unpersist(blocking = false)
  }

  test("giant-component guard: throws past maxFrac, passes bounded") {
    import spark.implicits._
    val giant = (1L to 599L).map(i => (0L, i)) // 600 of 1000 = 60%
    val pairs = (0L until 200L).map(i => (1000L + 2 * i, 1001L + 2 * i))
    val labels =
      ConnectedComponents.label((giant ++ pairs).toDF("src", "dst"))
    val ex = intercept[IllegalStateException] {
      ConnectedComponents.requireBounded(labels)
    }
    assert(ex.getMessage.contains("Giant near-dup component"))
    // the same graph passes a deliberately raised policy knob
    ConnectedComponents.requireBounded(labels, maxFrac = 0.7)
    // and a pairs-only graph passes the default
    val ok = ConnectedComponents.label(pairs.toDF("src", "dst"))
    assert(ConnectedComponents.requireBounded(ok).count() === 400L)
  }
}
