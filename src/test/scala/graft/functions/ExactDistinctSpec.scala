package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}
import graft.functions.expressions.{AggExpressions => AE, LongSet}

/** ExactDistinctLong must equal Spark's count(DISTINCT) exactly on real
  * data — including the 0L value (the set's reserved empty slot rides a
  * flag), nulls (skipped), duplicates across partitions (merge is
  * set-union), and the serialize/deserialize round-trip the sort-based
  * aggregation fallback uses. */
class ExactDistinctSpec extends SparkSuite {

  test("== built-in count(DISTINCT) on events user_id, incl. user 0") {
    val ev = Tables.load(spark, "/root/testdata/sf0.01", "events")
    // user_id 0 EXISTS in the fixture — exercises the hasZero flag
    assert(ev.filter(col("user_id") === 0L).count() > 0)
    val got = ev.groupBy("event_type")
      .agg(AE.exact_distinct_long(col("user_id")).as("mine"),
        countDistinct(col("user_id")).as("builtin"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(1) === r.getLong(2), s"type=${r.getString(0)}")
    }
  }

  test("nulls skipped; empty group counts 0") {
    import spark.implicits._
    val df = Seq[(String, Option[Long])](
      ("a", Some(1L)), ("a", Some(1L)), ("a", None), ("a", Some(0L)),
      ("b", None)).toDF("g", "v")
    val rows = df.groupBy("g")
      .agg(AE.exact_distinct_long(col("v")).as("d"))
      .orderBy("g").collect()
    assert(rows(0).getLong(1) === 2L) // {1, 0}
    assert(rows(1).getLong(1) === 0L) // all null
  }

  test("repartitioned input (forced multi-partition merge) agrees") {
    import spark.implicits._
    val df = (1L to 100000L).map(i => (i % 7, i % 1234)).toDF("g", "v")
      .repartition(16)
    val rows = df.groupBy("g")
      .agg(AE.exact_distinct_long(col("v")).as("mine"),
        countDistinct(col("v")).as("builtin"))
      .collect()
    rows.foreach(r => assert(r.getLong(1) === r.getLong(2)))
  }

  test("LongSet: grow, zero flag, serde round-trip density") {
    val s = new LongSet(new Array[Long](16), 0, hasZero = false)
    val vals = (1L to 10000L).map(v => v * 2654435761L) :+ 0L
    vals.foreach(s.add)
    vals.foreach(s.add) // idempotent
    assert(s.count === 10001L)
    // union with an overlapping set
    val t = new LongSet(new Array[Long](16), 0, hasZero = false)
    (5000L to 15000L).map(v => v * 2654435761L).foreach(t.add)
    if (t.hasZero) s.hasZero = true
    t.foreachEntry(s.add)
    assert(s.count === 15001L)
  }

  test("high-duplication past the spill chunk: state stays O(distinct), no spurious ceiling") {
    // A group whose distinct exceeds the spill chunk used to overlap
    // EVERY spilled run with every prior one: the pending-run total —
    // what the cardinality ceiling was checked against — grew O(rows),
    // so enough duplicated input tripped 'cardinality exceeded' for a
    // group whose true distinct is tiny next to MaxEntries. The
    // incremental merge must keep the exact count and never throw.
    val s = new LongSet(new Array[Long](16), 0, hasZero = false)
    val distinct = LongSet.CompactThreshold // 2^18 — one chunk's worth
    // 80 full passes over the same value set: pending totals would
    // reach 80 × 2^18 ≈ 21M unmerged entries, ~160× the distinct size
    var pass = 0
    while (pass < 80) {
      var v = 1L
      while (v <= distinct) { s.add(v * 2654435761L); v += 1 }
      pass += 1
    }
    assert(s.count === distinct.toLong)
  }

  test("a deserialized partial reads correctly without an intervening add/union") {
    // count()/foreachEntry() on a fresh rawBlob wrapper must decode the
    // blob, not silently read as empty.
    val src = new LongSet(new Array[Long](16), 0, hasZero = false)
    (1L to 1000L).foreach(v => src.add(v * 7919L))
    src.add(0L)
    val blob = src.serializeBlob()
    val back = new LongSet(null, 0, hasZero = false)
    back.rawBlob = blob
    assert(back.count === 1001L)
    var n = 0L
    val seen = scala.collection.mutable.Set.empty[Long]
    val back2 = new LongSet(null, 0, hasZero = false)
    back2.rawBlob = blob
    back2.foreachEntry { v => n += 1; seen += v }
    assert(n === 1000L && seen.size === 1000) // hasZero rides the flag
  }
}
