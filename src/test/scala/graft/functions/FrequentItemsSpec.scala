package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.expressions.{AggExpressions => AE}

/** Misra–Gries guarantee under real partial/merge execution: every item
  * with true count > N/(m+1) survives with undercount ≤ N/(m+1), and
  * the summary never exceeds its capacity — regardless of partitioning
  * (the merge path is exercised by spreading the stream). */
class FrequentItemsSpec extends SparkSuite {
  import spark.implicits._

  private def check(df: org.apache.spark.sql.DataFrame, col0: String,
      m: Int): Unit = {
    val sk = df.agg(AE.frequent_items(col(col0), m).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item").as("item"), col("e.est").as("est"))
      .as[(Long, Long)].collect().toMap
    assert(sk.size <= m, s"capacity exceeded: ${sk.size} > $m")
    val exact = df.groupBy(col0).agg(count(lit(1)).as("cnt"))
      .as[(Long, Long)].collect().toMap
    val n = exact.values.sum
    val heavy = exact.filter { case (_, c) => c * (m + 1) > n }
    assert(heavy.nonEmpty, "fixture must have heavy items")
    heavy.foreach { case (item, cnt) =>
      val est = sk.get(item)
      assert(est.isDefined, s"heavy item $item (cnt=$cnt, N=$n) missing")
      assert(est.get <= cnt, s"overcount for $item: ${est.get} > $cnt")
      assert((cnt - est.get) * (m + 1) <= n,
        s"undercount bound broken for $item: est=${est.get} cnt=$cnt N=$n")
    }
  }

  test("zipf-ish longs: heavy items survive across 16 partitions") {
    // item i ∈ [0, 40) with frequency ∝ 1/(i+1) plus a 4000-count head:
    // item 0 clears N/(m+1) even at m=3; 40 distinct > m so counters
    // churn hard
    val rows = (0 until 40).flatMap(i =>
      Seq.fill(if (i == 0) 4000 else 2000 / (i + 1))(i.toLong))
    check(rows.toDF("v").repartition(16), "v", m = 8)
    check(rows.toDF("v").repartition(1), "v", m = 8)
    check(rows.toDF("v").repartition(16), "v", m = 3)
  }

  test("binary items are rejected at analysis (no value equality)") {
    val df = Seq(Array[Byte](1, 2)).toDF("b")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(AE.frequent_items(col("b"), 4)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("frequent_items"))
  }

  test("string items round-trip buffers and serialization") {
    val rows = (0 until 30).flatMap(i =>
      Seq.fill(1500 / (i + 1))(s"token-$i"))
    val df = rows.toDF("tk").repartition(8)
    val sk = df.agg(AE.frequent_items(col("tk"), 6).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item").as("item"), col("e.est").as("est"))
      .as[(String, Long)].collect().toMap
    assert(sk.size <= 6)
    // token-0 (count 1500 of ~5900, > N/7) must be present
    assert(sk.contains("token-0"), s"token-0 missing from $sk")
  }
}
