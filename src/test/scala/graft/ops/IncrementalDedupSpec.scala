package graft.ops

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.lake.Mooncake
import graft.streaming.CdcStream

/** Incremental corpus dedup: the MinHash band index lives as a mooncake
  * mirror; incoming batches probe it (broadcast band join, no corpus
  * rescan) and then append THROUGH the standard CDC stream — so a later
  * batch deduplicates against everything earlier batches added. */
class IncrementalDedupSpec extends SparkSuite {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while rain falls softly " +
      "on the quiet village roofs tonight"

  test("streamed batches grow the index; later batches dedup against them") {
    val lake = new Mooncake(tmpDir("incdedup-wh"))
    val corpus = Seq(
      1L -> base,
      2L -> "completely different text about distributed query engines and columnar storage formats")
      .toDF("doc_id", "text")
    IncrementalDedup.createIndex(spark, lake, "idx", corpus)

    // batch 1: doc 10 is a one-word edit of doc 1 — found against the
    // initial corpus
    val b1 = Seq(10L -> base.replace("dog", "cat")).toDF("doc_id", "text")
    val d1 = IncrementalDedup.dupPairs(spark, lake, "idx", b1)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(d1 === Set(1L -> 10L))

    // batch 1 flows into the index THROUGH the CDC stream: the change
    // feed is the banded transform of the incoming docs, applied by the
    // same attach/apply machinery as any mirror
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val changes = IncrementalDedup.bandIndex(
      input.toDF().toDF("doc_id", "text")).withColumn("__op", lit("I"))
    val ckpt = tmpDir("incdedup-ckpt")
    input.addData(10L -> base.replace("dog", "cat"))
    CdcStream.attach(lake, "idx", changes, ckpt).awaitTermination()
    assert(lake.read(spark, "idx").select("doc_id").distinct().count() === 3)

    // batch 2: doc 20 edits DOC 10's LAST word (not in the initial
    // corpus; a tail edit flips exactly one shingle, so the LSH bands
    // deterministically collide) — only a live index finds it
    val b2 = Seq(20L -> base.replace("dog", "cat")
        .replace("tonight", "today"))
      .toDF("doc_id", "text")
    val d2 = IncrementalDedup.dupPairs(spark, lake, "idx", b2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(d2.contains(10L -> 20L),
      s"batch 2 must dedup against the streamed batch 1 doc, got $d2")

    // a second stream batch through the SAME checkpoint appends doc 20
    input.addData(20L -> base.replace("dog", "cat")
      .replace("tonight", "today"))
    CdcStream.attach(lake, "idx", changes, ckpt).awaitTermination()
    // the index now holds 4 docs × 4 band rows
    assert(lake.read(spark, "idx").select("doc_id").distinct().count() === 4)

    // unrelated text: no pairs, and the probe broadcast the batch side
    val clean = Seq(30L -> "entirely novel words nobody wrote before in this tiny corpus today")
      .toDF("doc_id", "text")
    assert(IncrementalDedup.dupPairs(spark, lake, "idx", clean).count() === 0)
    val plan = IncrementalDedup.dupPairs(spark, lake, "idx", b2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"batch side must broadcast — the corpus index never shuffles:\n$plan")
  }

  test("attachStream: dedup-filtered ingest, within-batch exemplar, restart-safe") {
    implicit val sc = spark.sqlContext
    val lake = new Mooncake(tmpDir("incdedup-stream-wh"))
    val corpus = Seq(
      1L -> base,
      2L -> "completely different text about distributed query engines and columnar storage formats")
      .toDF("doc_id", "text")
    IncrementalDedup.createIndex(spark, lake, "sidx", corpus)

    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val ckpt = tmpDir("incdedup-stream-ckpt")

    // batch 0: doc 10 = near-dup of corpus doc 1 (dropped vs corpus);
    // docs 20/21 = novel text + its twin (21 dropped vs 20, the
    // lower-id within-batch exemplar); doc 30 = novel (kept)
    val novel = "unique prose about streaming ingestion pipelines " +
      "checking every incoming document against a persisted index today"
    input.addData(
      10L -> base.replace("dog", "cat"),
      20L -> novel,
      21L -> novel.replace("today", "tomorrow"),
      30L -> "another entirely separate subject matter concerning parquet file layouts and manifests")
    IncrementalDedup.attachStream(lake, "sidx", docs, ckpt)
      .awaitTermination()
    val afterB0 = lake.read(spark, "sidx").select("doc_id").distinct()
      .as[Long].collect().toSet
    assert(afterB0 === Set(1L, 2L, 20L, 30L),
      s"survivors wrong: $afterB0")

    // restart on the same checkpoint: batch 1's doc 40 duplicates the
    // STREAMED doc 20 — only a live index catches it; doc 50 is novel
    input.addData(
      40L -> novel.replace("prose", "text"),
      50L -> "final completely fresh document mentioning nothing seen before anywhere")
    IncrementalDedup.attachStream(lake, "sidx", docs, ckpt)
      .awaitTermination()
    val afterB1 = lake.read(spark, "sidx").select("doc_id").distinct()
      .as[Long].collect().toSet
    assert(afterB1 === Set(1L, 2L, 20L, 30L, 50L),
      s"batch-1 survivors wrong: $afterB1")
    // version frontier advanced once per applied batch
    assert(lake.currentManifest("sidx").commitVersion === 3L)
  }

  test("attachStream: out-of-band optimizeTable between batches loses no survivors") {
    // The regression this pins: a bare `version > current` gate reads an
    // out-of-band commit (the optimizeTable appendBatch's own doc
    // recommends) as "my version is taken → replay" and silently drops
    // the NEXT micro-batch's survivor band rows — in a dedup index,
    // dropped rows mean future duplicates sail through undetected. The
    // marker-based CdcStream.applyVersioned gate tells the two apart.
    implicit val sc = spark.sqlContext
    val lake = new Mooncake(tmpDir("incdedup-oob-wh"))
    val corpus = Seq(
      1L -> base,
      2L -> "completely different text about distributed query engines and columnar storage formats")
      .toDF("doc_id", "text")
    IncrementalDedup.createIndex(spark, lake, "oidx", corpus)

    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val ckpt = tmpDir("incdedup-oob-ckpt")

    // batch 0 streams in a novel doc
    val novel = "unique prose about streaming ingestion pipelines " +
      "checking every incoming document against a persisted index today"
    input.addData(20L -> novel)
    IncrementalDedup.attachStream(lake, "oidx", docs, ckpt)
      .awaitTermination()
    assert(lake.read(spark, "oidx").select("doc_id").distinct().count() === 3)

    // OUT-OF-BAND commit: compact the index — consumes a version number
    // outside the stream's base+batchId accounting
    lake.optimizeTable(spark, "oidx", mode = "full")
    val vAfterOpt = lake.currentManifest("oidx").commitVersion

    // batch 1: a novel survivor PLUS a duplicate of the streamed doc 20.
    // Under the buggy gate this whole batch is silently skipped: doc 30
    // vanishes and doc 40's duplication goes undetected forever.
    input.addData(
      30L -> "another entirely separate subject matter concerning parquet file layouts and manifests",
      40L -> novel.replace("today", "tomorrow"))
    IncrementalDedup.attachStream(lake, "oidx", docs, ckpt)
      .awaitTermination()
    val ids = lake.read(spark, "oidx").select("doc_id").distinct()
      .as[Long].collect().toSet
    assert(ids === Set(1L, 2L, 20L, 30L),
      s"out-of-band optimize must not drop batch-1 survivors: $ids")
    // the apply landed AFTER the optimize's version, shifted not skipped
    assert(lake.currentManifest("oidx").commitVersion === vAfterOpt + 1)

    // and a REPLAY is still a replay: re-attaching with no new data
    // must not re-append or advance the version
    IncrementalDedup.attachStream(lake, "oidx", docs, ckpt)
      .awaitTermination()
    assert(lake.currentManifest("oidx").commitVersion === vAfterOpt + 1)
    assert(lake.read(spark, "oidx").select("doc_id").distinct().count() === 4)
  }

  test("probe is sublinear: a multi-file index opens only matching-key files") {
    val lake = new Mooncake(tmpDir("incdedup-prune"))
    // 60 docs of distinct vocabulary → 240 band rows whose keys spread
    // across the (band, key)-clustered layout; tiny target file size
    // forces a multi-file index so skip counts are observable.
    val words = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima")
    val corpus = (0 until 60).map { i =>
      val w = (0 until 12).map(j => words((i * 5 + j * 7) % 12) + i)
      (i.toLong, w.mkString(" "))
    }.toDF("doc_id", "text")
    IncrementalDedup.createIndex(spark, lake, "pidx", corpus,
      targetFileBytes = 512)
    val total = lake.read(spark, "pidx").inputFiles.length
    assert(total >= 4, s"layout must be multi-file, got $total")

    // one batch doc: a tail edit of corpus doc 7 — its band keys hit a
    // handful of (band, key) ranges, so the probe must SKIP most files
    val d7 = corpus.filter(col("doc_id") === 7L)
      .select("text").as[String].head()
    val batch = Seq(700L -> (d7.split(" ").init.mkString(" ") + " zulu"))
      .toDF("doc_id", "text")
    val pairs = IncrementalDedup.dupPairs(spark, lake, "pidx", batch)
    val opened = pairs.inputFiles.count(_.contains("pidx"))
    assert(opened < total,
      s"probe opened all $total index files — no file skipping")
    assert(pairs.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      === Set(7L -> 700L))

    // the same probe against a deliberately UNclustered index (pk-only
    // layout) cannot skip — the clustering is what buys the pruning
    lake.createTable(spark, "flat", IncrementalDedup.bandIndex(corpus),
      Seq("doc_id", "band"), targetFileBytes = 512)
    val flatTotal = lake.read(spark, "flat").inputFiles.length
    val flatOpened = IncrementalDedup.dupPairs(spark, lake, "flat", batch)
      .inputFiles.count(_.contains("flat"))
    assert(flatOpened === flatTotal,
      "doc_id-clustered layout unexpectedly skipped key-probe files")

    // an index persisted by the PRE-prefix layout (bare minhash keys)
    // must refuse loudly — a silent zero-pair probe would let every
    // duplicate through
    val legacy = IncrementalDedup.bandIndex(corpus)
      .withColumn("key", substring(col("key"), 4, Int.MaxValue))
    lake.createTable(spark, "legacy", legacy, Seq("doc_id", "band"))
    val e = intercept[IllegalArgumentException] {
      IncrementalDedup.dupPairs(spark, lake, "legacy", batch).count()
    }
    assert(e.getMessage.contains("band-prefixed"))
  }
}
