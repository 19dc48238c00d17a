package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression,
  GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document kernels for the classifier and the subword
  * tokenizer. Both operators are pure per-row maps, but their
  * transform/aggregate spellings run INTERPRETED — Spark's higher-order
  * functions never enter whole-stage codegen, and a custom expression
  * inside their lambdas is re-evaluated through the interpreter per
  * element (the same ~100×-per-doc tax HashOps exists to remove). Each
  * kernel is one static call per row inside codegen; semantics are
  * EXACTLY the Column spellings' (same splits, same folds, same
  * constants), which the DuckDB oracles and the brute-force spec arms
  * pin. */
object DocOps {

  private val P = 1000000007L

  private def foldChars(acc0: Long, s: String): Long = {
    var acc = acc0
    var i = 0
    while (i < s.length) { acc = (acc * 31 + s.charAt(i)) % P; i += 1 }
    acc
  }

  /** Hashed-linear-model scoring: struct(n_uni, n_bi, score). Bigram
    * hashes continue the previous word's fold through the separator —
    * h(w1 ⧺ ' ' ⧺ w2) = fold(fold(h(w1), ' '), w2) — so no bigram
    * string is ever materialized. */
  def classify(text: UTF8String): InternalRow = {
    val words = text.toString.split(" ", -1)
    var score = 0L
    var prevHash = 0L
    var i = 0
    while (i < words.length) {
      val h = foldChars(0L, words(i))
      score += (h % 4096L) * 2654435761L % 4194304L - 2097152L
      if (i > 0) {
        val hb = foldChars((prevHash * 31 + ' ') % P, words(i))
        score += (hb % 4096L) * 2654435761L % 4194304L - 2097152L
      }
      prevHash = h
      i += 1
    }
    new GenericInternalRow(Array[Any](words.length.toLong,
      math.max(words.length - 1, 0).toLong, score))
  }

  // Greedy maximal-munch vocabulary (frozen; must stay identical to the
  // PipelineQueries.SubV* constants the oracle embeds).
  private val V4 = Set("park", "quer", "scan", "slow", "line", "grou")
  private val V3 = Set("mer", "par", "row", "all", "ord", "ust")
  private val V2 = Set("er", "st", "or", "ow", "in", "at", "ar", "to", "as")

  /** Greedy subword counts: struct(n_words, n_tokens, n_fallback).
    * UNLIKE the 8-step bounded fold (sized to the fixtures' longest
    * word), the kernel loops to each word's actual end — any word
    * length tokenizes fully. */
  def subwordCounts(text: UTF8String): InternalRow = {
    val words = text.toString.split(" ", -1)
    var nt = 0L
    var nf = 0L
    var w = 0
    while (w < words.length) {
      val s = words(w)
      var o = 0
      while (o < s.length) {
        if (o + 4 <= s.length && V4.contains(s.substring(o, o + 4))) o += 4
        else if (o + 3 <= s.length && V3.contains(s.substring(o, o + 3))) o += 3
        else if (o + 2 <= s.length && V2.contains(s.substring(o, o + 2))) o += 2
        else { o += 1; nf += 1 }
        nt += 1
      }
      w += 1
    }
    new GenericInternalRow(Array[Any](words.length.toLong, nt, nf))
  }

  /** Content-defined chunk tuples of one document: array of
    * struct(chunk_id, start_tok, end_tok, n_tokens), 1-based token
    * positions — a boundary falls AFTER token i (1 ≤ i < n) when
    * polyHash(token_i) % 16 == 0, exactly the chunkCdc fold. Emitting
    * the finished tuples per doc means the explode carries only the
    * chunk structs — the HOF spelling dragged the full word and
    * boundary arrays through every exploded row. */
  def cdcChunks(text: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val words = text.toString.split(" ", -1)
    val n = words.length
    val starts = new scala.collection.mutable.ArrayBuffer[Long](8)
    starts += 1L
    var i = 1
    while (i < n) {
      if (foldChars(0L, words(i - 1)) % 16L == 0L) starts += i + 1L
      i += 1
    }
    val out = new Array[Any](starts.length)
    var k = 0
    while (k < starts.length) {
      val start = starts(k)
      val end = if (k + 1 < starts.length) starts(k + 1) - 1 else n.toLong
      out(k) = new GenericInternalRow(
        Array[Any](k + 1L, start, end, end - start + 1))
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

case class ClassifyFeatures(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_uni", LongType, nullable = false),
    StructField("n_bi", LongType, nullable = false),
    StructField("score", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(v: Any): Any =
    DocOps.classify(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.DocOps.classify($c)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

case class SubwordCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_fallback", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(v: Any): Any =
    DocOps.subwordCounts(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.DocOps.subwordCounts($c)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

case class CdcChunks(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StructType(Seq(
      StructField("chunk_id", LongType, nullable = false),
      StructField("start_tok", LongType, nullable = false),
      StructField("end_tok", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false))),
      containsNull = false)
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(v: Any): Any =
    DocOps.cdcChunks(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.DocOps.cdcChunks($c)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

object DocExpressions {
  import ColumnBridge.{column, expression => expr}

  def classify_features(c: Column): Column = column(ClassifyFeatures(expr(c)))
  def subword_counts(c: Column): Column = column(SubwordCounts(expr(c)))
  def cdc_chunks(c: Column): Column = column(CdcChunks(expr(c)))
}
