package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression,
  ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Count–Min sketch (Cormode & Muthukrishnan 2005) over 64-bit keys —
  * the point-frequency member of the sketch family (HLL = cardinality,
  * Misra–Gries = heavy hitters, GK = quantiles, Bloom = membership).
  * State is a fixed depth×width counter matrix: O(d·w) regardless of
  * input cardinality, partial-aggregated map-side and merged by
  * element-wise ADD, so the exchange moves one small matrix per
  * partition — at 100 TB the corpus never shuffles to estimate a
  * frequency. Error is ONE-SIDED: est ≥ true always (every counter a
  * key touches only ever over-counts via collisions), and
  * est ≤ true + ⌈e·N/w⌉ with probability 1−(1/e)^d — the error
  * direction a frequency gate wants (never under-reports a hot key).
  *
  * Row hashing derives d independent bucket functions from one
  * splitmix64 finalizer ([[BloomRuntime.mix]]) with a per-row seed —
  * build and estimate share these statics so the two sides can never
  * drift (the BloomExpressions discipline). */
object CmRuntime {

  /** Bucket of `key` in sketch row `row` (0-based), width `w`. */
  def bucket(key: Long, row: Int, w: Int): Int =
    java.lang.Long.remainderUnsigned(
      BloomRuntime.mix(key + 0x9e3779b97f4a7c15L * (row + 1)), w.toLong).toInt

  def add(counters: Array[Long], key: Long, depth: Int, w: Int): Unit = {
    var r = 0
    while (r < depth) {
      counters(r * w + bucket(key, r, w)) += 1L
      r += 1
    }
  }

  /** Serialized layout: an 8-byte header (int32 depth, int32 width,
    * little-endian) then the d·w row-major int64 counters — the Spark
    * CountMinSketch convention of carrying geometry IN the bytes. The
    * header exists because a byte-LENGTH check alone cannot catch a
    * same-size transposition (build 4×2048 read as 8×1024 passes
    * d·w·8 but mis-indexes every counter and can UNDER-report,
    * silently breaking the one-sided guarantee). Bytes of EXACTLY
    * d·w·8 are accepted as the legacy v0 headerless layout so sketches
    * persisted before the header landed (state-store checkpoints,
    * cached warehouses) still decode; only legacy bytes keep v0's
    * weaker length-only geometry check. */
  val HeaderBytes = 8

  /** min over rows — the CM estimate. A zero-length sketch (empty
    * input group) estimates 0 for every key. BOTH stored dimensions
    * must equal the caller's: a mismatch mis-indexes, so it refuses
    * loudly instead (Bloom derives m from the bytes; CM's geometry
    * can't be derived, so it rides the header and is checked). */
  def estimate(bytes: Array[Byte], key: Long, depth: Int, w: Int): Long = {
    if (bytes.length == 0) return 0L
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // Legacy v0 layout (pre-header builds — e.g. a streaming state-store
    // checkpoint written before the geometry header landed): exactly
    // d·w·8 raw counters, no header. The headered form is 8 bytes
    // longer for the same geometry, so the two can never collide.
    val legacy = bytes.length == depth.toLong * w * 8
    if (!legacy) {
      val sd = bb.getInt(0)
      val sw = bb.getInt(4)
      if (sd != depth || sw != w ||
          bytes.length != HeaderBytes + sd.toLong * sw * 8)
        throw new IllegalArgumentException(
          s"sketch geometry is ${sd}x$sw (${bytes.length} bytes); estimate " +
            s"called with depth=$depth width=$w — d/w must match the build")
    }
    val base = if (legacy) 0 else HeaderBytes
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = bb.getLong(base + ((r * w + bucket(key, r, w)) << 3))
      if (c < best) best = c
      r += 1
    }
    best
  }

  def toBytes(counters: Array[Long], depth: Int, w: Int): Array[Byte] = {
    require(counters.length == depth * w,
      s"counter matrix ${counters.length} != $depth x $w")
    val bb = java.nio.ByteBuffer.allocate(HeaderBytes + (counters.length << 3))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(depth).putInt(w)
    var i = 0
    while (i < counters.length) { bb.putLong(counters(i)); i += 1 }
    bb.array()
  }

  /** Counters only — header validated against the expected geometry;
    * legacy headerless bytes (length == d·w·8 exactly) decode as-is. */
  def fromBytes(bytes: Array[Byte], depth: Int, w: Int): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val legacy = bytes.length == depth.toLong * w * 8
    if (!legacy) {
      val sd = bb.getInt(0)
      val sw = bb.getInt(4)
      require(sd == depth && sw == w,
        s"sketch geometry ${sd}x$sw does not match expected ${depth}x$w")
    }
    val base = if (legacy) 0 else HeaderBytes
    val out = new Array[Long](depth * w)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(base + (i << 3)); i += 1 }
    out
  }
}

/** Builds the sketch: binary output = 8-byte (depth, width) header then
  * the depth×width little-endian int64 counters, row-major. */
case class CountMinBuild(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression]
  with ImplicitCastInputTypes {

  require(depth >= 1 && depth <= 16, s"depth out of range: $depth")
  require(width >= 16 && width <= (1 << 24), s"width out of range: $width")
  // the serialized sketch (8-byte header + d*w longs) must fit a JVM
  // byte array
  require(depth.toLong * width * 8 + CmRuntime.HeaderBytes <= Int.MaxValue,
    s"sketch too large: $depth x $width longs exceeds 2^31 bytes")

  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) CmRuntime.add(buf, v.asInstanceOf[Long], depth, width)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    CmRuntime.toBytes(buf, depth, width)
  override def serialize(buf: Array[Long]): Array[Byte] =
    CmRuntime.toBytes(buf, depth, width)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    CmRuntime.fromBytes(bytes, depth, width)

  override def withNewMutableAggBufferOffset(o: Int): CountMinBuild =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinBuild =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CountMinBuild =
    copy(child = c)
}

/** Point estimate: `graft_cm_estimate(sketch, key)` — both sides are
  * child expressions so the sketch (typically a 1-row aggregate result
  * cross-joined on) composes in plain SQL. depth/width are part of the
  * sketch's identity; a mismatch mis-indexes, so they ride the call
  * explicitly (the BloomMightContain k contract). */
case class CountMinEstimate(left: Expression, right: Expression,
    depth: Int, width: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  require(depth >= 1 && depth <= 16, s"depth out of range: $depth")
  require(width >= 16 && width <= (1 << 24), s"width out of range: $width")
  require(depth.toLong * width * 8 + CmRuntime.HeaderBytes <= Int.MaxValue,
    s"sketch too large: $depth x $width longs exceeds 2^31 bytes")

  override def inputTypes: Seq[ColumnBridge.AbstractType] =
    Seq(BinaryType, LongType)
  override def dataType: DataType = LongType

  override protected def nullSafeEval(sketch: Any, key: Any): Any =
    CmRuntime.estimate(sketch.asInstanceOf[Array[Byte]],
      key.asInstanceOf[Long], depth, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, k) =>
      s"graft.functions.expressions.CmRuntime.estimate($s, $k, $depth, $width)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : CountMinEstimate = copy(left = l, right = r)
}

/** Column-level wrappers. */
object CmExpressions {
  import ColumnBridge.{column, expression => expr}

  def cm_build(c: Column, depth: Int, width: Int): Column =
    column(CountMinBuild(expr(c), depth, width).toAggregateExpression())
  def cm_estimate(sketch: Column, key: Column, depth: Int, width: Int): Column =
    column(CountMinEstimate(expr(sketch), expr(key), depth, width))
}
