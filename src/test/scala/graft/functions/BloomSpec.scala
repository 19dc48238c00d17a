package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.expressions.{BloomExpressions => BF, BloomRuntime,
  HashExpressions => HE}
import graft.ops.CurationQueries

/** The Bloom set sketch must be false-positive-only (a member can never
  * be reported absent), merge-order independent (bitwise OR), and probe
  * as a narrow map — the decontamination decision leg never shuffles the
  * corpus. */
class BloomSpec extends SparkSuite {
  import spark.implicits._

  private val members: Seq[Long] = (1L to 2000L).map(i => i * 2654435761L)
  private val nonMembers: Seq[Long] = (1L to 20000L).map(i => i * 7046029254386353L + 13L)

  private def buildBloom(df: org.apache.spark.sql.DataFrame, bits: Int): Array[Byte] =
    df.agg(BF.bloom_build(col("h"), bits, 7)).head().getAs[Array[Byte]](0)

  test("no false negatives, FP rate within the sized bound") {
    val bits = BloomRuntime.sizeBits(members.size.toLong)
    val bloom = buildBloom(members.toDF("h"), bits)
    assert(members.forall(BloomRuntime.mightContain(bloom, _, 7)))
    val fps = nonMembers.count(BloomRuntime.mightContain(bloom, _, 7))
    // sized for ~7e-4; assert a 14x margin (1%)
    assert(fps <= nonMembers.size / 100,
      s"$fps false positives out of ${nonMembers.size}")
  }

  test("merge is order-independent: 16-partition build == 1-partition build") {
    val bits = 1 << 15
    val one = buildBloom(members.toDF("h").coalesce(1), bits)
    val many = buildBloom(members.toDF("h").repartition(16), bits)
    assert(java.util.Arrays.equals(one, many))
  }

  test("countContained brackets the exact membership count") {
    val bits = BloomRuntime.sizeBits(members.size.toLong)
    val bloom = buildBloom(members.toDF("h"), bits)
    val probes = members.take(50) ++ nonMembers.take(500)
    val df = Seq(probes).toDF("hs")
    val counted = df.select(
      BF.bloom_count_contained(col("hs"), bloom, 7).as("c")).head().getInt(0)
    assert(counted >= 50, "a member was missed — impossible for a Bloom filter")
    assert(counted <= 50 + 5, s"FP excess too high: ${counted - 50}")
  }

  test("decision leg plans as a narrow map: no Exchange before the summary agg") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bloom = buildBloom(
      docs.filter(col("doc_id") % 100 === 0)
        .select(explode(HE.shingle_hashes(col("text"), 3)).as("h")),
      1 << 16)
    val probe = docs.filter(col("doc_id") % 100 =!= 0)
      .select(col("doc_id"),
        BF.bloom_count_contained(HE.shingle_hashes(col("text"), 3), bloom, 7)
          .as("bloom_hits"))
    val plan = probe.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"probe leg shuffled:\n$plan")
  }

  test("q_decontaminate_bloom contract holds on the fixture") {
    val out = CurationQueries.decontaminateBloom(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("no_false_negative"), r.toString)
      assert(r.getAs[Boolean]("fp_within_bound"), r.toString)
    }
  }
}
