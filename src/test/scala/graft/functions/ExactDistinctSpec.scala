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
}
