package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The two-level global rank: exact equality with the single-sort
  * spelling, and a plan that range-partitions and ranks per partition
  * instead of pulling the corpus through one task's window. */
class GlobalRankSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("decomposed rank equals the single-sort rank exactly") {
    import spark.implicits._
    val got = RelationalQueries.windowRankGlobal(spark, sf)
      .as[(Long, Double, Long)].collect().sortBy(_._1)
    assert(got.nonEmpty)
    // independent single-JVM recompute: sort by (price desc, key asc)
    val want = got.map(r => (r._1, r._2))
      .sortBy { case (k, p) => (-p, k) }
      .zipWithIndex.map { case ((k, _), i) => k -> (i + 1L) }.toMap
    got.foreach { case (k, _, r) =>
      assert(r === want(k), s"order $k global rank")
    }
    // ranks are a permutation of 1..n (no gap, no dup)
    assert(got.map(_._3).sorted.toSeq === (1L to got.length).toSeq)
  }

  test("plan: range exchange + pid-partitioned window, never a corpus-wide window") {
    // the ranked stage (audited directly — the full query reads it
    // through a checkpoint that hides its lineage)
    val stage = RelationalQueries.rankedLocal(spark, sf)
    val sphys = stage.queryExecution.executedPlan.toString
    assert(sphys.toLowerCase.contains("rangepartitioning"),
      s"rank key must range-repartition:\n$sphys")
    assert("windowspecdefinition\\(pid".r.findFirstIn(sphys).isDefined,
      s"local rank must partition by pid:\n$sphys")
    // the assembled query: no corpus-keyed unpartitioned window — the
    // only unpartitioned window is the #partitions-row offset frame
    val phys = RelationalQueries.windowRankGlobal(spark, sf)
      .queryExecution.executedPlan.toString
    assert("windowspecdefinition\\(o_".r.findFirstIn(phys).isEmpty,
      s"no corpus-keyed unpartitioned window allowed:\n$phys")
    // both consumers read the ONE checkpointed partitioning (boundary
    // sampling must not run twice — rdd.id-seeded samples differ)
    assert(phys.contains("ExistingRDD") || phys.contains("Scan ExistingRDD"),
      s"ranked stage must be materialized once via checkpoint:\n$phys")
  }

  test("length-bucketed batching: chunks equal an in-JVM recompute, batches full") {
    import spark.implicits._
    val got = CurationQueries.batchByLength(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    // recompute: bucket docs by token-length band, chunk doc_id order by 8
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "CAST(size(split(text, ' ')) AS LONG) AS n")
      .as[(Long, Long)].collect()
    val want = docs.groupBy { case (_, n) => n / 16 }.flatMap {
      case (bucket, ds) =>
        ds.sortBy(_._1).grouped(8).zipWithIndex.map { case (g, bi) =>
          val lens = g.map(_._2)
          (bucket, bi.toLong) ->
            (g.length.toLong, lens.max, lens.sum,
              lens.max * g.length - lens.sum)
        }
    }
    assert(got.length === want.size)
    got.foreach { case (b, bi, rows, mx, sm, pad) =>
      assert(want((b, bi)) === ((rows, mx, sm, pad)),
        s"bucket $b batch $bi")
    }
    // every batch except possibly the last of its bucket is FULL
    got.groupBy(_._1).foreach { case (b, g) =>
      val lastBatch = g.map(_._2).max
      g.foreach { case (_, bi, rows, _, _, _) =>
        assert(bi == lastBatch || rows == 8L, s"bucket $b batch $bi short")
      }
    }
  }
}
