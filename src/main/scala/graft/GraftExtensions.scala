package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expressions._

/** SparkSessionExtensions entry point: registers the graft expression
  * library as SQL functions, so `spark.sql("SELECT graft_minhash(...)")`
  * works next to the Column API. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "4.1.0", "", "scala_udf")

  /** Extra args must not be silently dropped and zero args must not
    * surface as a bare head-of-empty-list error. */
  private def checkArity(name: String, n: Int, exprs: Seq[Expression]): Unit =
    if (exprs.length != n) throw new IllegalArgumentException(
      s"$name expects $n argument(s), got ${exprs.length}")

  private def unary(name: String, usage: String, f: Expression => Expression)
      : (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) =
    (FunctionIdentifier(name), info(name, usage),
      exprs => { checkArity(name, 1, exprs); f(exprs.head) })

  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(unary("graft_poly_hash",
      "polynomial rolling hash of a string mod 1e9+7", PolyHashString))
    e.injectFunction(unary("graft_shingle_hashes",
      "hashes of distinct 3-word shingles", ShingleHashes(_, 3)))
    e.injectFunction(unary("graft_minhash",
      "16-slot MinHash signature of a hash array", MinHashSignature))
    e.injectFunction(unary("graft_simhash",
      "32-bit SimHash of a hash array", SimHash))
    e.injectFunction((FunctionIdentifier("graft_jaccard"),
      info("graft_jaccard", "jaccard similarity of two distinct arrays"),
      exprs => { checkArity("graft_jaccard", 2, exprs)
        JaccardSim(exprs(0), exprs(1)) }))
    e.injectFunction((FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "cosine similarity of two float vectors"),
      exprs => { checkArity("graft_cosine", 2, exprs)
        CosineSim(exprs(0), exprs(1)) }))
    e.injectFunction(unary("graft_word_shingles",
      "distinct 3-word shingles of a string", WordShingles(_, 3)))
    e.injectFunction(unary("graft_l2norm",
      "L2 norm of a float vector", L2NormF))
    e.injectFunction(unary("graft_quantize8",
      "symmetric int8 quantization of a float vector", Quantize8))
    e.injectFunction((FunctionIdentifier("graft_bloom_build"),
      info("graft_bloom_build",
        "Bloom filter (binary) over a long-hash column: " +
          "(hashes, numBits, numHashes) with foldable int sizing"),
      exprs => { checkArity("graft_bloom_build", 3, exprs)
        BloomBuild(exprs.head, intArg("graft_bloom_build", exprs(1)),
          intArg("graft_bloom_build", exprs(2))).toAggregateExpression() }))
    e.injectFunction((FunctionIdentifier("graft_bloom_contains"),
      info("graft_bloom_contains",
        "might-contain probe: (bloom binary, key long, foldable numHashes)"),
      exprs => { checkArity("graft_bloom_contains", 3, exprs)
        BloomMightContain(exprs(0), exprs(1),
          intArg("graft_bloom_contains", exprs(2))) }))
    e.injectFunction((FunctionIdentifier("graft_cm_build"),
      info("graft_cm_build",
        "Count-Min sketch (binary) over a long-hash column: " +
          "(hashes, foldable depth, foldable width)"),
      exprs => { checkArity("graft_cm_build", 3, exprs)
        CountMinBuild(exprs.head, intArg("graft_cm_build", exprs(1)),
          intArg("graft_cm_build", exprs(2))).toAggregateExpression() }))
    e.injectFunction((FunctionIdentifier("graft_cm_estimate"),
      info("graft_cm_estimate",
        "Count-Min point estimate: (sketch binary, key long, " +
          "foldable depth, foldable width) — must match the build's d/w"),
      exprs => { checkArity("graft_cm_estimate", 4, exprs)
        CountMinEstimate(exprs(0), exprs(1),
          intArg("graft_cm_estimate", exprs(2)),
          intArg("graft_cm_estimate", exprs(3))) }))
    e.injectFunction((FunctionIdentifier("graft_frequent_items"),
      info("graft_frequent_items",
        "Misra-Gries heavy hitters: (column, foldable capacity m)"),
      exprs => { checkArity("graft_frequent_items", 2, exprs)
        FrequentItems(exprs.head, intArg("graft_frequent_items", exprs(1)))
          .toAggregateExpression() }))
    e.injectFunction((FunctionIdentifier("graft_percentiles"),
      info("graft_percentiles",
        "exact interpolated percentiles of a numeric column " +
          "(varargs foldable percentage scalars in [0, 1])"),
      exprs => {
        if (exprs.length < 2) throw new IllegalArgumentException(
          "graft_percentiles expects a column plus at least one " +
            s"percentage, got ${exprs.length} argument(s)")
        ExactPercentiles(exprs.head,
          exprs.tail.map(percentage)).toAggregateExpression()
      }))
  }

  /** Evaluate a foldable int argument (sizing parameters must be
    * literals — they shape the aggregation buffer before any row). */
  private def intArg(fn: String, e: Expression): Int =
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn: sizing argument must be a literal, got $e")
    else e.eval() match {
      case i: java.lang.Integer => i
      case l: java.lang.Long => math.toIntExact(l)
      case other => throw new IllegalArgumentException(
        s"$fn: sizing argument must be an integer literal, got $other")
    }

  /** Evaluate a foldable percentage argument numerically — SQL parses an
    * unsuffixed literal like `0.5` as DECIMAL(1,1), not DOUBLE. */
  private def percentage(e: Expression): Double = e.eval() match {
    case d: java.lang.Double => d
    case f: java.lang.Float => f.toDouble
    case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
    case n: java.lang.Number => n.doubleValue
    case other => throw new IllegalArgumentException(
      s"graft_percentiles: percentage must be a numeric literal, got $other")
  }
}
