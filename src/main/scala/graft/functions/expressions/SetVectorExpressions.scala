package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen kernels for set similarity and vector similarity — value-
  * identical to the Column formulations they replace (first-occurrence
  * distinct order; left-fold double accumulation), so oracle parity is
  * untouched. */
object SetVectorOps {

  /** Distinct k-word shingles as strings, first-occurrence order (matches
    * array_distinct(transform(...concat_ws...))). */
  def wordShingles(text: UTF8String, k: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < k)
      return new GenericArrayData(Array.empty[AnyRef])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + k <= toks.length) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < k) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = UTF8String.fromString(it.next()); p += 1 }
    new GenericArrayData(out)
  }

  /** Jaccard of two distinct string arrays: |∩| / (|a|+|b|-|∩|) — same
    * integer sizes and single double division as the two-pass
    * array_intersect formulation. */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val set = new java.util.HashSet[UTF8String](na * 2)
    var i = 0
    while (i < na) { set.add(a.getUTF8String(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < nb) {
      if (set.contains(b.getUTF8String(i))) inter += 1
      i += 1
    }
    inter.toDouble / (na + nb - inter)
  }

  /** Cosine of two float vectors with LEFT-FOLD double accumulation per
    * term — bit-identical to the zip_with/aggregate formulation and to
    * DuckDB's list_reduce oracle. */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Band keys for the wide random-hyperplane LSH family (16 bands × 8
    * planes — see VectorFunctions.wideBandKeys): all 128 projections in
    * one fused pass per row. A Column-level spelling of the same math
    * (128 zip_with/aggregate folds over 64 literal arrays) generates
    * megabytes of bytecode per plan — enough to flood the JVM code
    * cache and disable JIT for every later query in the session; this
    * kernel is a few hundred bytes. Weights are ±1 from the same
    * seeded finalizer, cached per dimension count. */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Double]]]()

  private def mix64(seed: Long): Long = {
    var x = seed
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33; x
  }

  // 32 bands × 8 planes: per-pair miss at bit-agreement p is
  // (1-p^8)^32 ≈ 6e-7 at the planted cos-0.93 strength (p≈0.88). 16
  // bands (≈8e-4) was enough for deterministic 100% recall on the sf0.1
  // pair population but statistically guaranteed misses once the sf1
  // fixture holds ~15k qualifying pairs — recall targets must survive
  // the 100× scale-up, so the band count buys the margin (candidates
  // stay single-digit-%: a random pair passes ≥1 of 32 bands at ≤3.2%).
  val WideBands = 32
  val WideRows = 8

  private def planes(dims: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent(dims, d =>
      Array.tabulate(WideBands * WideRows, d)((p, i) =>
        if ((mix64(p.toLong * 7919L + i) & 1L) == 0L) -1.0 else 1.0))

  def wideBandKeys(v: ArrayData, dims: Int): ArrayData = {
    val w = planes(dims)
    val x = new Array[Double](dims)
    var i = 0
    while (i < dims) { x(i) = v.getDouble(i); i += 1 }
    val keys = new Array[Any](WideBands)
    var b = 0
    while (b < WideBands) {
      var key = b.toLong << 50
      var j = 0
      while (j < WideRows) {
        val wp = w(b * WideRows + j)
        var proj = 0.0
        var k = 0
        while (k < dims) { proj += x(k) * wp(k); k += 1 }
        if (proj > 0.0) key += 1L << j
        j += 1
      }
      keys(b) = key
      b += 1
    }
    new GenericArrayData(keys)
  }

  /** L2 norm of a float vector — left-fold double accumulation, so the
    * DuckDB list_reduce oracle reproduces it bit-exactly. */
  def l2normF(a: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      acc += x * x
      i += 1
    }
    math.sqrt(acc)
  }

  /** Symmetric int8 quantization of a float vector: scale to the unit
    * sphere, then floor(x/norm * 127) per element — the storage-
    * shrinking step before an ANN index ships to serving. Zero vectors
    * quantize to zeros (no 0/0). floor (not round) keeps ties
    * deterministic across engines. */
  def quantize8(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val norm = l2normF(a)
    val out = new Array[Int](n)
    if (norm != 0.0) {
      var i = 0
      while (i < n) {
        out(i) = math.floor(a.getFloat(i).toDouble / norm * 127.0).toInt
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  /** Same fused left-fold cosine over double vectors (the planted-dup
    * LSH fixture carries doubles end-to-end — no float round-trip). */
  def cosineD(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(v: Any): Any =
    SetVectorOps.wordShingles(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.SetVectorOps.wordShingles($c, $k)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetVectorOps.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.expressions.SetVectorOps.jaccard($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
}

case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetVectorOps.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.expressions.SetVectorOps.cosineF($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
}

case class WideBandKeys(child: Expression, dims: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(v: Any): Any =
    SetVectorOps.wideBandKeys(v.asInstanceOf[ArrayData], dims)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.SetVectorOps.wideBandKeys($c, $dims)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class L2NormF(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(v: Any): Any =
    SetVectorOps.l2normF(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.SetVectorOps.l2normF($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class Quantize8(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(v: Any): Any =
    SetVectorOps.quantize8(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.SetVectorOps.quantize8($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class CosineSimD(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetVectorOps.cosineD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.expressions.SetVectorOps.cosineD($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
}

/** Shuffle-free nearest-centroid assignment: argmax over the broadcast
  * centroid model, fused into ONE kernel per row. Returns
  * struct(cluster long, cos double) where `cluster` is the cid of the
  * winning centroid under the canonical (cos desc, cid asc) tie-break —
  * the exact ordering the row_number()-window formulation produced, so
  * swapping the window for this expression leaves every assignment (and
  * thus every oracle hash) unchanged.
  *
  * Why an expression and not k literal struct columns (the
  * [[graft.ops.KMeans]] r8 shape): at k = 1000 × d = 512 a literal
  * array-of-structs plan is ~500k expression nodes — enough to blow the
  * 64 KB JIT method limit and fall out of codegen; this node is O(1)
  * plan size at any k, the matrix riding along as a reference object.
  * At 100 TB the win is structural: the n×k cross-join + window
  * alternative re-shuffles k× corpus bytes; this is a narrow map.
  *
  * Per-pair math is bit-identical to [[SetVectorOps.cosineF]] /
  * [[SetVectorOps.cosineD]] (left-fold double accumulation; the float
  * path widens each element exactly, and the collected centroid doubles
  * ARE the exact widenings). Comparison uses java.lang.Double.compare,
  * matching Spark's SQL double ordering (NaN greatest, -0.0 < 0.0).
  * Element type (float vs double vector) is taken from the child's
  * array type, as the two cosine kernels require matched inputs. */
case class NearestCentroid(child: Expression, cids: Seq[Long],
    cents: Seq[Seq[Double]]) extends UnaryExpression {
  require(cids.nonEmpty, "nearest_centroid needs at least one centroid")
  require(cids.length == cents.length,
    s"cid count ${cids.length} != centroid count ${cents.length}")

  override def dataType: DataType = StructType(Seq(
    StructField("cluster", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false)))
  override def nullable: Boolean = child.nullable

  private lazy val floatIn: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val cidArr: Array[Long] = cids.toArray
  @transient private lazy val centArr: Array[Array[Double]] =
    cents.map(_.toArray).toArray

  def compute(v: ArrayData): InternalRow = {
    val n = v.numElements()
    val x = new Array[Double](n)
    var i = 0
    if (floatIn) while (i < n) { x(i) = v.getFloat(i).toDouble; i += 1 }
    else while (i < n) { x(i) = v.getDouble(i); i += 1 }
    var nx = 0.0
    i = 0
    while (i < n) { nx += x(i) * x(i); i += 1 }
    var bestCid = 0L
    var bestCos = 0.0
    var first = true
    var c = 0
    while (c < centArr.length) {
      val cv = centArr(c)
      var dot = 0.0
      var nc = 0.0
      i = 0
      while (i < n) { dot += x(i) * cv(i); nc += cv(i) * cv(i); i += 1 }
      val cos = dot / (math.sqrt(nx) * math.sqrt(nc))
      val cmp = java.lang.Double.compare(cos, bestCos)
      if (first || cmp > 0 || (cmp == 0 && cidArr(c) < bestCid)) {
        bestCos = cos; bestCid = cidArr(c); first = false
      }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestCid, bestCos))
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroid", this)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object SetVectorExpressions {
  import ColumnBridge.{column, expression => expr}

  def word_shingles(c: Column, k: Int): Column = column(WordShingles(expr(c), k))
  def jaccard_sim(a: Column, b: Column): Column =
    column(JaccardSim(expr(a), expr(b)))
  def cosine_sim(a: Column, b: Column): Column =
    column(CosineSim(expr(a), expr(b)))
  def cosine_sim_d(a: Column, b: Column): Column =
    column(CosineSimD(expr(a), expr(b)))
  def wide_band_keys(v: Column, dims: Int): Column =
    column(WideBandKeys(expr(v), dims))
  def l2_norm(v: Column): Column = column(L2NormF(expr(v)))
  def quantize8(v: Column): Column = column(Quantize8(expr(v)))

  /** struct(cluster, cos) of the nearest centroid — see
    * [[NearestCentroid]]. `cents` is the collected driver-sized model. */
  def nearest_centroid(v: Column, cents: Seq[(Long, Array[Double])]): Column =
    column(NearestCentroid(expr(v), cents.map(_._1),
      cents.map(_._2.toIndexedSeq)))
}
