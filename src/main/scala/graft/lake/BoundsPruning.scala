package graft.lake

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.types._

/** File-skipping machinery shared by the lake readers
  * ([[IcebergCompat]] manifest bounds, [[DeltaCompat]] add.stats):
  * extract the simple range conjuncts of a pushed predicate, and decide
  * from per-file [lower, upper] bounds whether a file can possibly hold
  * a matching row. One implementation so the two formats' keep/drop
  * decisions can never drift.
  *
  * The contract is strictly conservative: a file is dropped only when a
  * conjunct PROVABLY excludes it. Unknown operators, undecodable
  * bounds, incomparable types, missing columns all keep the file — and
  * callers re-apply the full predicate to the surviving rows, so
  * pruning can only ever cut IO, never change results. */
private[lake] object BoundsPruning {

  /** An all-integral IN list pre-sorted at extraction, so the per-file
    * probe is a binary search instead of a linear scan — a 10k-key
    * runtime filter against a 100k-file manifest is 1.7M comparisons
    * instead of 1e9. Produced by [[conjuncts]]; consumed by [[keeps]]. */
  final case class SortedLongKeys(sorted: Array[Long]) {
    /** Any key within [lo, hi]? */
    def anyIn(lo: Long, hi: Long): Boolean = {
      val i = java.util.Arrays.binarySearch(sorted, lo)
      val from = if (i >= 0) i else -(i + 1)
      from < sorted.length && sorted(from) <= hi
    }
  }

  /** Split a pushed predicate into (column, op, literal) range
    * conjuncts — the same simple-comparison subset a DSv2 source
    * advertises as pushed filters. The Column is ANALYZED against an
    * empty frame of the table schema first (Spark 4 Columns are
    * ColumnNode trees, not catalyst expressions, until analysis), so
    * extraction sees resolved AttributeReference/Literal nodes, with
    * type-promotion Casts folded on the literal side. */
  def conjuncts(spark: SparkSession, schema: StructType,
      c: Column): Seq[(String, String, Any)] = {
    import org.apache.spark.sql.catalyst.{expressions => ce}
    import org.apache.spark.sql.catalyst.plans.logical
    val analyzed = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .filter(c).queryExecution.analyzed
    val conds = analyzed.collect { case f: logical.Filter => f.condition }
    def split(e: ce.Expression): Seq[ce.Expression] = e match {
      case ce.And(l, r) => split(l) ++ split(r)
      case o => Seq(o)
    }
    def name(e: ce.Expression): Option[String] = e match {
      case a: ce.AttributeReference => Some(a.name)
      case _ => None
    }
    // the analyzer wraps literals in type-promotion Casts; anything
    // foldable (no attributes) evaluates to its constant
    def lit(e: ce.Expression): Option[Any] =
      if (!e.foldable) None
      else Option(e.eval(null)).map {
        case u: org.apache.spark.unsafe.types.UTF8String => u.toString
        case o => o
      }
    def flip(op: String): String = op match {
      case ">" => "<"
      case ">=" => "<="
      case "<" => ">"
      case "<=" => ">="
      case o => o
    }
    def bin(l: ce.Expression, r: ce.Expression, op: String) =
      (name(l), lit(r)) match {
        case (Some(n), Some(v)) => Some((n, op, v))
        case _ => (name(r), lit(l)) match {
          case (Some(n), Some(v)) => Some((n, flip(op), v))
          case _ => None
        }
      }
    conds.flatMap(split).flatMap {
      case ce.EqualTo(l, r) => bin(l, r, "=")
      case ce.GreaterThan(l, r) => bin(l, r, ">")
      case ce.GreaterThanOrEqual(l, r) => bin(l, r, ">=")
      case ce.LessThan(l, r) => bin(l, r, "<")
      case ce.LessThanOrEqual(l, r) => bin(l, r, "<=")
      // IN over a literal list (what a runtime key filter pushes): a
      // file survives iff SOME value can fall inside its bounds — a
      // scattered-but-selective key set then skips every file whose
      // range holds no key at all, which the [min, max] conjuncts
      // alone can never prove. Null literals are dropped (a null can
      // prove no match); an all-null/empty list emits nothing.
      case ce.In(a, vs) if vs.forall(_.foldable) =>
        name(a).map(n => (n, "in", packKeys(vs.flatMap(lit))))
          .filter(_._3 != Nil)
      case ce.InSet(a, vs) =>
        name(a).map { n =>
          val conv = vs.toSeq.filter(_ != null).map {
            case u: org.apache.spark.unsafe.types.UTF8String => u.toString
            case o => o
          }
          (n, "in", packKeys(conv))
        }.filter(_._3 != Nil)
      case _ => None
    }
  }

  private def isIntegral(v: Any): Boolean = v match {
    case _: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer |
      _: java.lang.Long => true
    case _ => false
  }

  /** Pack an IN list for [[keeps]]: all-integral lists pre-sort into a
    * binary-searchable [[SortedLongKeys]]; mixed/string lists stay a
    * Seq (linear probe); empty lists collapse to Nil (caller drops the
    * conjunct — no values can prove nothing). */
  private def packKeys(vs: Seq[Any]): Any =
    if (vs.isEmpty) Nil
    else if (vs.forall(isIntegral))
      SortedLongKeys(
        vs.map(_.asInstanceOf[java.lang.Number].longValue).toArray.sorted)
    else vs

  /** Total-order compare where a comparison is defined; None (→ keep
    * the file) across types we don't order. Integral pairs compare as
    * longs (a double round-trip collapses values ≥ 2^53 and
    * strict-inequality pruning would then drop files whose rows match);
    * strings compare as unsigned UTF-8 bytes — the order parquet stats,
    * Iceberg bounds, and Spark's UTF8String all use (Java's UTF-16
    * compareTo disagrees on supplementary characters). */
  def cmp(a: Any, b: Any): Option[Int] = {
    def integral(v: Any): Boolean = v match {
      case _: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer |
        _: java.lang.Long => true
      case _ => false
    }
    (a, b) match {
      case (x: java.lang.Number, y: java.lang.Number)
          if integral(x) && integral(y) =>
        Some(java.lang.Long.compare(x.longValue, y.longValue))
      case (x: java.lang.Number, y: java.lang.Number) =>
        Some(java.lang.Double.compare(x.doubleValue, y.doubleValue))
      case (x: String, y: String) =>
        import java.nio.charset.StandardCharsets.UTF_8
        Some(java.util.Arrays.compareUnsigned(
          x.getBytes(UTF_8), y.getBytes(UTF_8)))
      case (x: java.lang.Boolean, y: java.lang.Boolean) =>
        Some(x.compareTo(y))
      case _ => None
    }
  }

  /** Can a file with the given [lo, hi] bounds for the conjunct's
    * column possibly hold a row satisfying `col op v`? Missing or
    * incomparable bounds → yes. */
  def keeps(lo: Option[Any], hi: Option[Any], op: String, v: Any): Boolean =
    op match {
      case "=" => lo.flatMap(cmp(_, v)).forall(_ <= 0) &&
        hi.flatMap(cmp(_, v)).forall(_ >= 0)
      case ">" => hi.flatMap(cmp(_, v)).forall(_ > 0)
      case ">=" => hi.flatMap(cmp(_, v)).forall(_ >= 0)
      case "<" => lo.flatMap(cmp(_, v)).forall(_ < 0)
      case "<=" => lo.flatMap(cmp(_, v)).forall(_ <= 0)
      case "in" => v match {
        // integral fast path: one binary search per file; non-integral
        // bounds (or a missing side) degrade conservatively
        case ks: SortedLongKeys =>
          val l = lo match {
            case None => Some(Long.MinValue)
            case Some(b) if isIntegral(b) =>
              Some(b.asInstanceOf[java.lang.Number].longValue)
            case _ => None // incomparable bound type → keep
          }
          val h = hi match {
            case None => Some(Long.MaxValue)
            case Some(b) if isIntegral(b) =>
              Some(b.asInstanceOf[java.lang.Number].longValue)
            case _ => None
          }
          (l, h) match {
            case (Some(a), Some(b)) => ks.anyIn(a, b)
            case _ => true
          }
        // survives iff some value can sit inside [lo, hi]; a value the
        // bounds type can't compare keeps the file (never prune a guess)
        case vs: Seq[_] => vs.exists(x =>
          lo.flatMap(cmp(_, x)).forall(_ <= 0) &&
            hi.flatMap(cmp(_, x)).forall(_ >= 0))
        case _ => true
      }
      case _ => true
    }

  /** ISO calendar date → epoch-day long, the representation a pushed
    * date conjunct carries ([[conjuncts]] evaluates the analyzed
    * Literal, and catalyst's internal date value IS the epoch day) —
    * tz-free on both sides, so the compare is exact. Unparseable →
    * None (keep). */
  private def dateBound(s: String): Option[Any] =
    try Some(java.time.LocalDate.parse(s).toEpochDay: java.lang.Long)
    catch { case _: java.time.format.DateTimeParseException => None }

  /** Parse a JSON stats value (Delta add.stats minValues/maxValues) to
    * a comparable JVM value per the column's Spark type. Types whose
    * JSON encoding we don't map (timestamps, decimals) → None — never
    * prune on a guess. Dates map (ISO text → epoch day, tz-free —
    * date partitioning being the most common Delta layout, this is the
    * bound that cuts a time-range scan). Float/double are deliberately
    * unmapped: stats writers exclude NaN from min/max (JSON cannot even
    * encode it) while Spark orders NaN greater than every value, and
    * Delta stats carry no NaN count to prove absence — so an fp bound
    * can never PROVABLY exclude a file. */
  def jsonBound(node: com.fasterxml.jackson.databind.JsonNode,
      t: DataType): Option[Any] =
    if (node == null || node.isNull) None
    else t match {
      case ByteType | ShortType | IntegerType | LongType
          if node.isIntegralNumber => Some(node.asLong())
      case StringType if node.isTextual => Some(node.asText())
      case BooleanType if node.isBoolean => Some(node.asBoolean())
      case DateType if node.isTextual => dateBound(node.asText())
      case _ => None
    }

  /** Parse a Delta partitionValues string to a comparable JVM value per
    * the column's Spark type — a partition value is an exact [v, v]
    * bound. Timestamp partition values stay unmapped: their string
    * form is session-zone-dependent in real writers, and a zone drift
    * between writer and pruner would misprune. */
  def partitionBound(s: String, t: DataType): Option[Any] =
    if (s == null) None
    else t match {
      case ByteType | ShortType | IntegerType | LongType =>
        s.toLongOption.map(v => v: java.lang.Long)
      case FloatType | DoubleType =>
        s.toDoubleOption.map(v => v: java.lang.Double)
      case StringType => Some(s)
      case BooleanType => s.toBooleanOption.map(v => v: java.lang.Boolean)
      case DateType => dateBound(s)
      case _ => None
    }
}
