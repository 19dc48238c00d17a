package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextFunctions

/** JVM hot-path implementations of the text-hash kernels. Kept as a plain
  * object with static forwarders so generated code can call them directly
  * (`HashOps.polyHash(s)` inside whole-stage codegen).
  *
  * Semantics are EXACTLY the Column-lambda formulations in
  * [[graft.functions.TextFunctions]] (same fold, same constants) — the
  * DuckDB oracle reproduces both. The expressions below exist purely for
  * throughput: the interpreted higher-order-function path re-evaluates a
  * per-character expression tree (~150× slower per doc on the bench).
  */
object HashOps {
  val P: Long = TextFunctions.P
  private val A: Array[Long] = TextFunctions.MinhashA.toArray
  private val B: Array[Long] = TextFunctions.MinhashB.toArray

  /** acc = (acc*31 + charAt(i)) % P, left to right. (UTF-16 units ==
    * code points for the ASCII fixtures; matches ascii()/DuckDB on
    * ASCII.) */
  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      acc = (acc * 31 + str.charAt(i)) % P
      i += 1
    }
    acc
  }

  /** polyHash of every element of a string array. */
  def polyHashArray(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = if (arr.isNullAt(i)) 0L
        else polyHash(arr.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Hashes of the DISTINCT k-word shingles of a single-space-tokenized
    * text — DELEGATES shingle construction to
    * [[SetVectorOps.wordShingles]] so LSH candidate generation (this)
    * and Jaccard verification (that) can never drift apart. */
  def shingleHashes(text: UTF8String, k: Int): ArrayData = {
    val shingles = SetVectorOps.wordShingles(text, k)
    val n = shingles.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = polyHash(shingles.getUTF8String(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Second independent poly-hash fold (base 131, prime 998244353) —
    * combined with [[polyHash]] it widens the key space to ~2^60. */
  val P2: Long = 998244353L
  def polyHash2(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      acc = (acc * 131 + str.charAt(i)) % P2
      i += 1
    }
    acc
  }

  /** WIDE (~60-bit) hashes of the distinct k-word shingles:
    * polyHash(s)·P2 + polyHash2(s) — max (P−1)·P2 + P2−1 ≈ 1.0e18,
    * exact in BIGINT on both engines (no wrap to mirror), and the
    * birthday-collision floor that makes a 30-bit key space unusable
    * for containment/bloom keys at corpus scale (~1e9 values saturate
    * at ~1e5 distinct windows) moves past 1e9 distinct keys. */
  def shingleHashesWide(text: UTF8String, k: Int): ArrayData = {
    val shingles = SetVectorOps.wordShingles(text, k)
    val n = shingles.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      out(i) = polyHash(s) * P2 + polyHash2(s)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 16-slot MinHash signature (empty input → all-P sentinel slots). */
  def minhashSig(hashes: ArrayData): ArrayData = {
    val n = hashes.numElements()
    val out = new Array[Long](A.length)
    var p = 0
    while (p < A.length) {
      var best = P
      var i = 0
      while (i < n) {
        val v = (A(p) * hashes.getLong(i) + B(p)) % P
        if (v < best) best = v
        i += 1
      }
      out(p) = best
      p += 1
    }
    new GenericArrayData(out)
  }

  /** 32-bit SimHash over token hashes (bit j set iff the +1/-1 vote over
    * bit j of each hash is positive). */
  def simhash(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    var result = 0L
    var j = 0
    while (j < 32) {
      var vote = 0L
      var i = 0
      while (i < n) {
        vote += (if (((hashes.getLong(i) >> j) & 1L) == 1L) 1L else -1L)
        i += 1
      }
      if (vote > 0) result |= (1L << j)
      j += 1
    }
    result
  }
}

private[expressions] trait HashOpsCall { self: UnaryExpression =>
  /** Fully-qualified static call target for codegen. */
  final def ops = "graft.functions.expressions.HashOps"
  override def nullable: Boolean = child.nullable
}

/** polyHash(string) → long, codegen'd. */
case class PolyHashString(child: Expression)
    extends UnaryExpression with HashOpsCall {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    HashOps.polyHash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$ops.polyHash($c)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** polyHash of each array element → array<long>, codegen'd. */
case class PolyHashArray(child: Expression)
    extends UnaryExpression with HashOpsCall {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    HashOps.polyHashArray(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$ops.polyHashArray($c)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** Distinct k-word shingle hashes of a text → array<long>, codegen'd. */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with HashOpsCall {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    HashOps.shingleHashes(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$ops.shingleHashes($c, $k)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Distinct k-word shingle WIDE (~60-bit) hashes → array<long>, codegen'd. */
case class ShingleHashesWide(child: Expression, k: Int)
    extends UnaryExpression with HashOpsCall {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    HashOps.shingleHashesWide(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$ops.shingleHashesWide($c, $k)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** MinHash signature of a hash array → array<long>, codegen'd. */
case class MinHashSignature(child: Expression)
    extends UnaryExpression with HashOpsCall {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    HashOps.minhashSig(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$ops.minhashSig($c)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** SimHash of a hash array → long, codegen'd. */
case class SimHash(child: Expression)
    extends UnaryExpression with HashOpsCall {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    HashOps.simhash(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$ops.simhash($c)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** Column-level wrappers. */
object HashExpressions {
  import ColumnBridge.{column, expression => expr}

  def poly_hash(c: Column): Column = column(PolyHashString(expr(c)))
  def poly_hash_array(c: Column): Column = column(PolyHashArray(expr(c)))
  def shingle_hashes(c: Column, k: Int): Column = column(ShingleHashes(expr(c), k))
  def shingle_hashes_wide(c: Column, k: Int): Column =
    column(ShingleHashesWide(expr(c), k))
  def minhash_signature(c: Column): Column = column(MinHashSignature(expr(c)))
  def simhash(c: Column): Column = column(SimHash(expr(c)))
}
