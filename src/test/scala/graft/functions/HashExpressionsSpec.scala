package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.expressions.{HashExpressions => HE}
import graft.functions.{TextFunctions => TF}

/** The codegen'd hash expressions must be value-identical to the
  * Column-lambda formulations (which the DuckDB oracle mirrors) — this is
  * the contract that lets the fast path replace the reference path
  * without touching oracle parity. */
class HashExpressionsSpec extends SparkSuite {
  import spark.implicits._

  private def d = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("poly_hash == fold formulation on all fixture docs") {
    val bad = d.select(
        HE.poly_hash(col("text")).as("fast"),
        TF.polyHashStr(col("text")).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(bad === 0)
  }

  test("shingle_hashes == distinct-shingle hash formulation (order too)") {
    val bad = d.select(
        HE.shingle_hashes(col("text"), 3).as("fast"),
        TF.shingleHashes(col("text"), 3).as("slow"))
      .filter(not(col("fast") === col("slow"))).count()
    assert(bad === 0)
  }

  test("minhash_signature == lambda formulation") {
    val bad = d.select(
        HE.minhash_signature(HE.shingle_hashes(col("text"), 3)).as("fast"),
        TF.minhashSignature(TF.shingleHashes(col("text"), 3)).as("slow"))
      .filter(not(col("fast") === col("slow"))).count()
    assert(bad === 0)
  }

  test("simhash == lambda formulation") {
    val bad = d.select(
        HE.simhash(HE.poly_hash_array(TF.tokens(col("text")))).as("fast"),
        TF.simhash(transform(TF.tokens(col("text")),
          t => TF.polyHashStr(t))).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(bad === 0)
  }

  test("expressions survive whole-stage codegen (no fallback exception)") {
    // Force codegen path and check a known value computed both ways.
    val one = Seq("ab c ab c ab").toDF("t")
      .select(HE.poly_hash(col("t")).as("h")).as[Long].head()
    var acc = 0L
    "ab c ab c ab".foreach(ch => acc = (acc * 31 + ch) % TF.P)
    assert(one === acc)
  }
}
