package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization kernels: per-subspace nearest-codeword encoding
  * and asymmetric (query-vs-codes) distance. The codebooks ride INSIDE
  * the expression (a few KB of doubles serialized with the plan via
  * `addReferenceObj`), so executors need no side-channel state — the
  * same shipping model as a broadcast literal, which is what makes the
  * kernels cluster-safe. */
object PqOps {

  /** codes[j] = argmin_k L2²(v[j·dsub..), books[j][k]) — ties to the
    * lowest code, so encoding is deterministic. */
  def encode(v: ArrayData, books: Array[Array[Array[Double]]]): ArrayData = {
    val m = books.length
    val dsub = books(0)(0).length
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val bj = books(j)
      var best = 0
      var bestD = Double.MaxValue
      var k = 0
      while (k < bj.length) {
        val c = bj(k)
        var dist = 0.0
        var i = 0
        while (i < dsub) {
          val diff = v.getDouble(j * dsub + i) - c(i)
          dist += diff * diff
          i += 1
        }
        if (dist < bestD) { bestD = dist; best = k }
        k += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  /** Asymmetric distance: Σ_j L2²(q_sub_j, books[j][codes[j]]) — the
    * query stays exact, only the corpus side is quantized. Touches only
    * the SELECTED codeword per subspace (m·dsub flops/row, no ksub
    * factor). */
  def adc(q: ArrayData, codes: ArrayData,
      books: Array[Array[Array[Double]]]): Double = {
    val m = books.length
    val dsub = books(0)(0).length
    var dist = 0.0
    var j = 0
    while (j < m) {
      val c = books(j)(codes.getInt(j))
      var i = 0
      while (i < dsub) {
        val diff = q.getDouble(j * dsub + i) - c(i)
        dist += diff * diff
        i += 1
      }
      j += 1
    }
    dist
  }
}

case class PqEncode(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(v: Any): Any =
    PqOps.encode(v.asInstanceOf[ArrayData], books)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.PqOps.encode($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class PqAdc(left: Expression, right: Expression,
    books: Array[Array[Array[Double]]]) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(q: Any, codes: Any): Any =
    PqOps.adc(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData], books)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    defineCodeGen(ctx, ev,
      (q, c) => s"graft.functions.expressions.PqOps.adc($q, $c, $ref)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object PqExpressions {
  import ColumnBridge.{column, expression => expr}

  def pq_encode(v: Column, books: Array[Array[Array[Double]]]): Column =
    column(PqEncode(expr(v), books))
  def pq_adc(q: Column, codes: Column,
      books: Array[Array[Array[Double]]]): Column =
    column(PqAdc(expr(q), expr(codes), books))
}
