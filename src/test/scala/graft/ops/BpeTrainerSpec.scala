package graft.ops

import graft.SparkSuite

/** The BPE training loop: hand-verifiable merges on the classic
  * Sennrich fixture, overlap/greedy semantics, termination, the
  * conservation identity, and distributed == reference parity on the
  * real corpus. */
class BpeTrainerSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def ds(words: (String, Long)*) = {
    import spark.implicits._
    spark.createDataset(words)
  }

  test("Sennrich fixture: first merges are hand-computable, ties break lexicographically") {
    // low×5, lower×2, newest×6, widest×3 — the paper's worked example
    // (adapted): (e,s) and (s,t) both count 9; lexicographic tie-break
    // adopts (e,s) first, then (es,t) at 9, then (l,o) and (lo,w) at 7.
    val words = ds("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L)
    val ms = BpeTrainer.train(words, 4)
    assert(ms.map(m => (m.left, m.right, m.nMined)) === Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L), ("lo", "w", 7L)))
    // tokenize under the trained table: "lowest" = low + es+t
    assert(BpeTrainer.tokenize("lowest",
      ms.map(m => (m.left, m.right))).toSeq === Seq("low", "est"))
  }

  test("overlap counting vs greedy application: aaa mines 2 per word, applies 1") {
    val words = ds("aaa" -> 3L)
    val ms = BpeTrainer.train(words, 1)
    assert(ms.length === 1)
    assert((ms.head.left, ms.head.right) === ("a", "a"))
    assert(ms.head.nMined === 6L, "adjacent pairs overlap-counted: 2 x 3")
    assert(ms.head.nApplied === 3L, "greedy left-to-right replaces once per word")
    // conservation on this fixture: 9 chars - 3 replacements = 6 tokens
    val after = BpeTrainer.tokenize("aaa", Seq(("a", "a"))).length * 3
    assert(9L - ms.head.nApplied === after)
  }

  test("termination: no pair reaching count 2 adopts nothing") {
    assert(BpeTrainer.train(ds("ab" -> 1L, "cd" -> 1L), 5).isEmpty)
    // and the loop stops early rather than padding ranks
    val ms = BpeTrainer.train(ds("xy" -> 2L, "ab" -> 1L), 5)
    assert(ms.length === 1 && (ms.head.left, ms.head.right) === ("x", "y"))
  }

  test("property: batched distributed trainer equals reference on random corpora") {
    // The multi-merge batching adopts several merges from one mining
    // pass when provably safe; a tiny alphabet maximizes shared tokens,
    // overlap ties and merge-created pairs — the cases the safety
    // conditions must catch. Any divergence from the one-merge-per-pass
    // reference is a bug.
    val rnd = new scala.util.Random(42)
    (1 to 10).foreach { trial =>
      val alphabet = "abc"
      val nWords = 3 + rnd.nextInt(8)
      val corpus = (1 to nWords).map { _ =>
        val len = 1 + rnd.nextInt(7)
        val w = (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length)))
          .mkString
        w -> (1L + rnd.nextInt(5))
      }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq
      val k = 1 + rnd.nextInt(8)
      val dist = BpeTrainer.train(ds(corpus: _*), k)
      val ref = BpeTrainer.referenceTrain(corpus.toArray, k)
      assert(dist === ref, s"trial $trial corpus=$corpus k=$k")
    }
  }

  test("real corpus: distributed equals reference, contract booleans hold") {
    import spark.implicits._
    val rows = BpeTrainer.bpeTrain(spark, sf).collect()
    assert(rows.length === 1)
    val r = rows(0)
    assert(r.getLong(0) === BpeTrainer.Rounds.toLong, "all rounds adopted")
    assert(r.getBoolean(5), "conservation identity")
    assert(r.getBoolean(6), "distributed == reference trainer")
    assert(r.getBoolean(7), "adopted counts non-increasing")

    // independent recompute of the conservation identity from the
    // reference trainer alone (no shared code path with the query's
    // distributed sums)
    val words = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("explode(split(text, ' ')) AS w")
      .where("length(w) > 0")
      .groupBy("w").count()
      .as[(String, Long)].collect()
    val ms = BpeTrainer.referenceTrain(words, BpeTrainer.Rounds)
    val pairs = ms.map(m => (m.left, m.right))
    val before = words.map { case (w, c) => c * w.length }.sum
    val after = words.map { case (w, c) =>
      c * BpeTrainer.tokenize(w, pairs).length
    }.sum
    assert(before === r.getLong(4), "tokens_before matches")
    assert(before - ms.map(_.nApplied).sum === after)
    // each merge genuinely compresses
    ms.foreach(m => assert(m.nApplied >= 1L, s"rank ${m.rank} applied 0"))
  }
}
