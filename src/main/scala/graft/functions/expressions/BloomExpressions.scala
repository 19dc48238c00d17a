package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes,
  Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType,
  LongType}

/** Blocked-free classic Bloom filter over 64-bit keys, used as a
  * BROADCASTABLE set sketch: build once over a small key population
  * (benchmark/eval-set n-gram hashes), then probe the 100 TB corpus
  * map-side — the probe is a narrow per-row kernel, so the corpus never
  * shuffles and never joins to decide membership. False-positive-only
  * by construction (a set bit can lie, a clear bit cannot), which is the
  * safe error direction for decontamination: an FP over-removes a clean
  * document, never leaks a contaminated one.
  *
  * Bit placement is Kirsch–Mitzenmacher double hashing
  * (h1 + i*h2 mod m) over a splitmix64-finalized key — k probes from
  * one 64-bit hash, the standard public construction. Build and probe
  * share these statics so the two sides can never drift.
  */
object BloomRuntime {
  /** splitmix64 finalizer — disperses the low-entropy poly-hash keys
    * across all 64 bits before double hashing. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def h2Of(h1: Long): Long = (mix(h1) << 1) | 1L

  /** Set the k bits of `key` in a little-endian bit array (bit i lives
    * in byte i>>>3, mask 1<<(i&7)). Zero-length filters are inert. */
  def setBits(bits: Array[Byte], key: Long, numHashes: Int): Unit = {
    if (bits.length == 0) return
    val m = bits.length.toLong << 3
    val h1 = mix(key)
    val h2 = h2Of(h1)
    var i = 0
    var h = h1
    while (i < numHashes) {
      val idx = java.lang.Long.remainderUnsigned(h, m)
      bits((idx >>> 3).toInt) = (bits((idx >>> 3).toInt) | (1 << (idx & 7L).toInt)).toByte
      h += h2
      i += 1
    }
  }

  /** True iff all k bits of `key` are set (i.e. key MIGHT be in the set;
    * false is definite absence). A zero-length filter holds the empty
    * set — the SQL probe accepts arbitrary binaries, so this must not
    * divide by m = 0. */
  def mightContain(bits: Array[Byte], key: Long, numHashes: Int): Boolean = {
    if (bits.length == 0) return false
    val m = bits.length.toLong << 3
    val h1 = mix(key)
    val h2 = h2Of(h1)
    var i = 0
    var h = h1
    while (i < numHashes) {
      val idx = java.lang.Long.remainderUnsigned(h, m)
      if ((bits((idx >>> 3).toInt) & (1 << (idx & 7L).toInt)) == 0) return false
      h += h2
      i += 1
    }
    true
  }

  /** Number of elements of a long array the filter might contain — the
    * per-document contamination evidence count, fused into one call so
    * the probe side needs no explode/join. Null elements don't count. */
  def countContained(bits: Array[Byte], keys: ArrayData, numHashes: Int): Int = {
    val n = keys.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!keys.isNullAt(i) && mightContain(bits, keys.getLong(i), numHashes)) c += 1
      i += 1
    }
    c
  }

  /** Smallest power of two >= 16n bits (>= 2^14) — sizes a filter for
    * ~7e-4 FP rate at k=7, from a pre-counted build-side cardinality.
    * Caps at 2^28 bits (32 MB — the broadcast budget); past ~16.7M
    * build keys the FP rate degrades and the caller's in-band FP bound
    * reports it. Keys should come from a WIDE (~60-bit) hash
    * ([[HashOps.shingleHashesWide]]) — with 30-bit keys, key-space
    * collisions alone would exceed the filter's own FP rate long before
    * the cap. */
  def sizeBits(n: Long): Int = {
    var m = 1 << 14
    while (m.toLong < 16L * n && m < (1 << 28)) m <<= 1
    m
  }
}

/** Builds the filter: TypedImperativeAggregate whose state is the fixed
  * m-bit array itself — O(m) regardless of input cardinality, merged by
  * bitwise OR (set union), so partial aggregation combines map-side and
  * the exchange moves one bit array per partition, never the keys. */
case class BloomBuild(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression]
  with ImplicitCastInputTypes {

  require(numBits >= 64 && (numBits & 7) == 0, s"numBits must be a multiple of 8 >= 64: $numBits")
  require(numHashes >= 1 && numHashes <= 16, s"numHashes out of range: $numHashes")

  // Narrower integrals implicit-cast to LONG at analysis; anything else
  // is an analysis error, never a runtime ClassCastException.
  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(LongType)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](numBits >>> 3)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) BloomRuntime.setBits(buf, v.asInstanceOf[Long], numHashes)
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buf.length) { buf(i) = (buf(i) | other(i)).toByte; i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): BloomBuild =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomBuild =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BloomBuild =
    copy(child = c)
}

/** Probe kernel: how many elements of an array<long> the (driver-collected,
  * codegen-referenced) filter might contain. Stays inside whole-stage
  * codegen — the bit array rides along as a referenced object, so the
  * generated code is one static call per row. */
case class BloomCountContained(child: Expression, bloom: Array[Byte], numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(numHashes >= 1 && numHashes <= 16,
    s"numHashes out of range: $numHashes (k=0 would make every probe TRUE)")
  override def inputTypes: Seq[ColumnBridge.AbstractType] =
    Seq(ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(v: Any): Any =
    BloomRuntime.countContained(bloom, v.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBits", bloom, "byte[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.BloomRuntime.countContained($ref, $c, $numHashes)")
  }
  override protected def withNewChildInternal(c: Expression): BloomCountContained =
    copy(child = c)
}

/** SQL-surface probe: both the filter and the key are child expressions
  * (the filter side is typically a literal from a prior build query), so
  * `graft_bloom_contains(bloom, key, k)` composes in plain SQL. */
case class BloomMightContain(left: Expression, right: Expression, numHashes: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  // k is part of the filter's identity: k=0 degenerates to always-TRUE
  // and a build/probe k mismatch can FALSE-NEGATIVE (probing a bit the
  // build never set) — the one error direction a Bloom filter must
  // never have. Range-check here; matching build k is the caller's
  // contract (documented on BloomBuild).
  require(numHashes >= 1 && numHashes <= 16,
    s"numHashes out of range: $numHashes")
  override def inputTypes: Seq[ColumnBridge.AbstractType] =
    Seq(BinaryType, LongType)
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  override protected def nullSafeEval(bloom: Any, key: Any): Any =
    BloomRuntime.mightContain(bloom.asInstanceOf[Array[Byte]],
      key.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, k) =>
      s"graft.functions.expressions.BloomRuntime.mightContain($b, $k, $numHashes)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : BloomMightContain = copy(left = l, right = r)
}

/** Column-level wrappers. */
object BloomExpressions {
  import ColumnBridge.{column, expression => expr}

  def bloom_build(c: Column, numBits: Int, numHashes: Int): Column =
    column(BloomBuild(expr(c), numBits, numHashes).toAggregateExpression())
  def bloom_count_contained(c: Column, bloom: Array[Byte], numHashes: Int): Column =
    column(BloomCountContained(expr(c), bloom, numHashes))
  def bloom_might_contain(bloom: Column, key: Column, numHashes: Int): Column =
    column(BloomMightContain(expr(bloom), expr(key), numHashes))
}
