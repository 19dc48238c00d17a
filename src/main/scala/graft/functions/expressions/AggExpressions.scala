package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Add, AttributeReference,
  BoundReference, Cast, CreateNamedStruct, Divide, Expression, If,
  ImplicitCastInputTypes, IsNull, Literal, Multiply, UnscaledValue}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  DeclarativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, Decimal,
  DecimalType, DoubleType, LongType, StructField, StructType}

/** Growable flat double buffer — the aggregation state of
  * [[ExactPercentiles]]. Primitive array, no boxing. */
final class DoubleBuffer(var values: Array[Double], var n: Int) {
  def add(v: Double): Unit = {
    if (n == values.length) {
      val grown = new Array[Double](math.max(16, values.length * 2))
      System.arraycopy(values, 0, grown, 0, n)
      values = grown
    }
    values(n) = v
    n += 1
  }
  def addAll(o: DoubleBuffer): Unit = {
    var i = 0
    while (i < o.n) { add(o.values(i)); i += 1 }
  }
}

/** Exact interpolated percentiles over a double column as a
  * TypedImperativeAggregate (§2.10's sketch-state API): the state is a
  * flat primitive Array[Double] per group, merged by concatenation and
  * sorted once at eval. Value-identical to Spark's built-in
  * `percentile` — same `position = p * (n-1)` and the same
  * `(higher-position)*lower + (position-lower)*higher` interpolation —
  * but without its boxed value→count hashmap, which is the built-in's
  * bottleneck on mostly-distinct doubles (2.4x on the bench).
  *
  * Scale note: state is O(group rows) like the built-in's map — exact
  * percentiles fundamentally hold the group. At 100 TB you'd trade
  * exactness for `approx_percentile` (t-digest, bounded state); this
  * operator is the exact baseline the oracle can check.
  */
case class ExactPercentiles(
    child: Expression,
    percentages: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DoubleBuffer] with ImplicitCastInputTypes
  with UnaryLike[Expression] {

  // Numeric inputs are implicitly cast to double by the analyzer;
  // non-numeric inputs fail analysis instead of CCEing at runtime.
  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(DoubleType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): DoubleBuffer =
    new DoubleBuffer(new Array[Double](16), 0)

  override def update(buf: DoubleBuffer, input: InternalRow): DoubleBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: DoubleBuffer, other: DoubleBuffer): DoubleBuffer = {
    buf.addAll(other)
    buf
  }

  override def eval(buf: DoubleBuffer): Any = {
    if (buf.n == 0) return null
    val sorted = java.util.Arrays.copyOf(buf.values, buf.n)
    java.util.Arrays.sort(sorted)
    val out = percentages.map { p =>
      val position = p * (buf.n - 1)
      val lower = math.floor(position)
      val higher = math.ceil(position)
      if (lower == higher) sorted(lower.toInt)
      else (higher - position) * sorted(lower.toInt) +
        (position - lower) * sorted(higher.toInt)
    }
    new GenericArrayData(out.toArray)
  }

  override def serialize(buf: DoubleBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.values(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): DoubleBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val arr = new Array[Double](math.max(16, n))
    var i = 0
    while (i < n) { arr(i) = bb.getDouble; i += 1 }
    new DoubleBuffer(arr, n)
  }

  override def withNewMutableAggBufferOffset(o: Int): ExactPercentiles =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ExactPercentiles =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ExactPercentiles =
    copy(child = c)
}

/** Single-pass exact moments (n, Σx, Σx²) of a decimal column as a
  * DeclarativeAggregate — pure Catalyst expressions, so the whole
  * update/merge path lives inside whole-stage codegen'd HashAggregate
  * (no imperative buffer at all; the third aggregate API next to
  * `Aggregator` and `TypedImperativeAggregate`).
  *
  * State is long "cents": `UnscaledValue` of the decimal input, so sums
  * are exact integers and the final doubles are correctly-rounded
  * divisions by 10^scale — bit-identical to
  * `CAST(sum(decimal) AS DOUBLE)` in both engines. Bounds: Σ|x|·10^s
  * and Σx²·10^2s must stay under 2^53 (exactness) — fine for
  * quantity-like columns at any n this engine meets; money columns at
  * extreme n would move s2 to a decimal buffer. */
case class DecimalMoments(child: Expression)
  extends DeclarativeAggregate with UnaryLike[Expression] {

  private def scaleOf: Int = child.dataType.asInstanceOf[DecimalType].scale

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("s1", DoubleType, nullable = false),
    StructField("s2", DoubleType, nullable = false)))
  override def nullable: Boolean = false

  private lazy val n = AttributeReference("n", LongType, nullable = false)()
  private lazy val c1 = AttributeReference("c1", LongType, nullable = false)()
  private lazy val c2 = AttributeReference("c2", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(n, c1, c2)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(0L))

  override lazy val updateExpressions: Seq[Expression] = {
    val cents = UnscaledValue(child)
    Seq(
      If(IsNull(child), n, Add(n, Literal(1L))),
      If(IsNull(child), c1, Add(c1, cents)),
      If(IsNull(child), c2, Add(c2, Multiply(cents, cents))))
  }

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Add(n.left, n.right), Add(c1.left, c1.right), Add(c2.left, c2.right))

  override lazy val evaluateExpression: Expression = CreateNamedStruct(Seq(
    Literal("n"), n,
    Literal("s1"),
    Divide(Cast(c1, DoubleType), Literal(math.pow(10, scaleOf))),
    Literal("s2"),
    Divide(Cast(c2, DoubleType), Literal(math.pow(10, 2 * scaleOf)))))

  override protected def withNewChildInternal(c: Expression): DecimalMoments =
    copy(child = c)
}

/** Exact SUM over a decimal column with PURE LONG per-row arithmetic —
  * the 100 TB replacement for Spark's built-in `sum(decimal)` whose
  * accumulator crosses precision 18 and falls back to a BigDecimal-
  * backed buffer (an object op per row; 4 such sums are most of TPC-H
  * Q1's cost at 60M rows). The unscaled long splits into three signed
  * 21-bit limbs (top = v>>42, mid = (v>>21) & 2^21-1, lo = v & 2^21-1;
  * exact for negatives since top keeps the sign), each limb summed in
  * its own LONG column — overflow-free while rows-per-group < 2^42 —
  * and the true sum is reconstructed ONCE per group at eval in
  * decimal(38): top·2^42 + mid·2^21 + lo, rescaled to the input's
  * scale. DeclarativeAggregate: update/merge are Add/shift/mask
  * expressions, so the whole aggregate stays inside whole-stage
  * codegen with no boxing anywhere. Value-identical to the built-in
  * (same exact integer arithmetic; returns decimal(38, s)). */
case class UnscaledSum(child: Expression, longScale: Int = -1)
  extends DeclarativeAggregate with UnaryLike[Expression] {

  // Either a decimal child (unscaled via reinterpret, scale from its
  // type) or an ALREADY-UNSCALED long child with an explicit scale —
  // the latter lets callers do per-row decimal PRODUCTS in pure long
  // arithmetic too (a (18,2)×(18,2) product is precision 37, so even
  // the per-row multiply is BigDecimal-backed in Spark; unscaled
  // longs multiply for free when the product fits 2^63).
  private def scaleOf: Int = child.dataType match {
    case d: DecimalType => d.scale
    case _ => longScale
  }

  private def unscaledChild: Expression = child.dataType match {
    case _: DecimalType => UnscaledValue(child)
    case _ => child
  }

  override def dataType: DataType = DecimalType(38, scaleOf)
  override def nullable: Boolean = true

  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val mid = AttributeReference("mid", LongType, nullable = false)()
  private lazy val top = AttributeReference("top", LongType, nullable = false)()
  private lazy val cnt = AttributeReference("cnt", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(lo, mid, top, cnt)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(0L), Literal(0L))

  override lazy val updateExpressions: Seq[Expression] = {
    import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd, ShiftRight}
    val v = unscaledChild
    val mask = Literal((1L << 21) - 1)
    Seq(
      If(IsNull(child), lo, Add(lo, BitwiseAnd(v, mask))),
      If(IsNull(child), mid,
        Add(mid, BitwiseAnd(ShiftRight(v, Literal(21)), mask))),
      If(IsNull(child), top, Add(top, ShiftRight(v, Literal(42)))),
      If(IsNull(child), cnt, Add(cnt, Literal(1L))))
  }

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Add(lo.left, lo.right), Add(mid.left, mid.right),
    Add(top.left, top.right), Add(cnt.left, cnt.right))

  override lazy val evaluateExpression: Expression = {
    // top·2^42 + mid·2^21 + lo, in decimal(38,0) (each limb sum fits a
    // long; the weighted recombination may not), then rescale by 10^-s
    // via a decimal divide that is exact (the value IS a multiple of
    // 10^-s by construction)
    val d38 = DecimalType(38, 0)
    val weighted = Add(
      Add(
        Multiply(Cast(top, d38), Literal(Decimal(1L << 42), d38)),
        Multiply(Cast(mid, d38), Literal(Decimal(1L << 21), d38))),
      Cast(lo, d38))
    val scaled = Cast(
      Divide(
        Cast(weighted, DecimalType(38, scaleOf)),
        Literal(Decimal(math.pow(10, scaleOf).toLong),
          DecimalType(18, 0))),
      DecimalType(38, scaleOf))
    If(org.apache.spark.sql.catalyst.expressions.EqualTo(cnt, Literal(0L)),
      Literal(null, DecimalType(38, scaleOf)), scaled)
  }

  override protected def withNewChildInternal(c: Expression): UnscaledSum =
    copy(child = c)
}

/** Length-prefixed UnsafeRow framing shared by the row-buffer
  * aggregates ([[BoundedTopK]], [[FrequentItems]]): count, then
  * per-row length + bytes. One implementation so a framing fix can
  * never drift between the two. */
private[expressions] object RowFraming {
  def write(rows: Seq[InternalRow],
      ser: org.apache.spark.sql.catalyst.expressions.UnsafeProjection)
      : Array[Byte] = {
    val parts = rows.map { r =>
      val u = ser(r)
      val bytes = new Array[Byte](u.getSizeInBytes)
      u.writeToMemory(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET)
      bytes
    }
    val bb = ByteBuffer.allocate(4 + parts.map(4 + _.length).sum)
    bb.putInt(parts.length)
    parts.foreach { p => bb.putInt(p.length); bb.put(p) }
    bb.array()
  }

  /** Each returned row owns its byte array — safe to hold. */
  def read(bytes: Array[Byte], numFields: Int): Seq[InternalRow] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    (0 until n).map { _ =>
      val len = bb.getInt
      val part = new Array[Byte](len)
      bb.get(part)
      val u = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(
        numFields)
      u.pointTo(part, len)
      u
    }
  }
}

/** Bounded sorted buffer of struct rows — the aggregation state of
  * [[BoundedTopK]]: at most k rows, best-first. */
final class TopKBuffer(val rows: scala.collection.mutable.ArrayBuffer[InternalRow])

/** Per-group top-k as a BOUNDED-HEAP aggregate — the scale path beside
  * the window/QUALIFY spelling: `row_number() OVER (PARTITION BY g
  * ORDER BY …) <= k` shuffles EVERY row of every group and sorts each
  * partition; this keeps at most k rows per group in each partial
  * buffer, so the map side discards the losers before the exchange and
  * the shuffle carries ≤ k·groups·tasks rows — at 100 TB the
  * difference between moving the table and moving the answer.
  *
  * `child` is a struct whose FIRST `desc.length` fields are the sort
  * key (per-field descending flags, window-identical null placement:
  * asc → nulls first, desc → nulls last; give the key a unique
  * tie-break field for determinism); the remaining fields are payload.
  * Returns the k best rows as array<struct> best-first, so
  * `posexplode` index + 1 IS the window's row_number.
  *
  * A NULL struct VALUE (a nullable struct column, not an inline
  * `struct(...)`) is skipped — the unit being ranked is a row, and a
  * null row has no fields to rank; null SORT FIELDS inside a non-null
  * struct rank exactly like the window. Build the struct inline to
  * stay row-for-row identical to the window spelling. */
case class BoundedTopK(
    child: Expression,
    k: Int,
    desc: Seq[Boolean],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer]
  with UnaryLike[Expression] {
  require(k > 0, s"k must be positive, got $k")
  require(desc.nonEmpty, "at least one sort field")

  @transient private lazy val structType = {
    val st = child.dataType.asInstanceOf[StructType]
    require(desc.length <= st.length,
      s"bounded_top_k: ${desc.length} sort flags for a " +
        s"${st.length}-field struct")
    st
  }
  @transient private lazy val fieldOrds: Array[Ordering[Any]] =
    structType.fields.take(desc.length).map(f =>
      org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(f.dataType)).toArray
  @transient private lazy val ser =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(structType)

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false

  /** Window-ordering compare: negative = a ranks before b. */
  private def cmp(a: InternalRow, b: InternalRow): Int = {
    var i = 0
    while (i < desc.length) {
      val dt = structType.fields(i).dataType
      val an = a.isNullAt(i)
      val bn = b.isNullAt(i)
      val c =
        if (an && bn) 0
        else if (an) { if (desc(i)) 1 else -1 } // asc: nulls first
        else if (bn) { if (desc(i)) -1 else 1 } // desc: nulls last
        else {
          val base = fieldOrds(i).compare(a.get(i, dt), b.get(i, dt))
          if (desc(i)) -base else base
        }
      if (c != 0) return c
      i += 1
    }
    0
  }

  private def insert(buf: TopKBuffer, row: InternalRow): Unit = {
    val rows = buf.rows
    if (rows.length == k && cmp(row, rows.last) >= 0) return
    // binary search: first index whose row ranks after `row` (stable —
    // equal keys keep arrival order)
    var lo = 0
    var hi = rows.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cmp(row, rows(mid)) < 0) hi = mid else lo = mid + 1
    }
    rows.insert(lo, row.copy())
    if (rows.length > k) { rows.remove(rows.length - 1); () }
  }

  override def createAggregationBuffer(): TopKBuffer =
    new TopKBuffer(scala.collection.mutable.ArrayBuffer.empty)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[InternalRow])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.rows.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.rows.toArray[Any])

  override def serialize(buf: TopKBuffer): Array[Byte] =
    RowFraming.write(buf.rows.toSeq, ser)

  override def deserialize(bytes: Array[Byte]): TopKBuffer =
    new TopKBuffer(scala.collection.mutable.ArrayBuffer.from(
      RowFraming.read(bytes, structType.length)))

  override def withNewMutableAggBufferOffset(o: Int): BoundedTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BoundedTopK =
    copy(child = c)
}

/** Misra–Gries counter state of [[FrequentItems]]: at most `m` (item →
  * undercount) entries. */
final class FreqBuffer(val counts: scala.collection.mutable.HashMap[Any, Long])

/** Heavy hitters (frequent items) as a BOUNDED-STATE sketch aggregate —
  * the Misra–Gries summary (merged per Agarwal et al.'s mergeable-
  * summaries rule): at most `m` counters per buffer regardless of
  * cardinality, merged by pairwise sum then subtracting the (m+1)-th
  * largest count. The ORDER-INDEPENDENT guarantee the oracle contract
  * rides on: every item with true count > N/(m+1) is present, and each
  * reported estimate undercounts by at most N/(m+1). (Estimates
  * themselves DO depend on partial-merge order — only the guarantee is
  * deterministic, which is why the checked query compares booleans,
  * not estimates; the HLL in-band pattern.)
  *
  * At 100 TB this replaces the exact token-count shuffle (vocabulary-
  * cardinality state) with m counters per map task — the same
  * bounded-vs-unbounded trade approx_count_distinct makes for
  * count(DISTINCT). Returns array<struct<item, est>> sorted
  * (est desc, item asc). */
case class FrequentItems(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqBuffer]
  with UnaryLike[Expression] {
  require(m > 0, s"capacity must be positive, got $m")

  // The counters key a JVM HashMap on eval results, which needs VALUE
  // equality: atomic types qualify (UTF8String included), but binary
  // (Array[Byte] — reference equality, every occurrence a fresh key)
  // and nested types do not — reject them at analysis, not silently
  // mis-count at runtime.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            "frequent_items does not support binary items (no value " +
              "equality) — hash or encode them first")
      case dt
          if dt == org.apache.spark.sql.types.StringType ||
            dt == org.apache.spark.sql.types.BooleanType ||
            dt == org.apache.spark.sql.types.DateType ||
            dt == org.apache.spark.sql.types.TimestampType ||
            dt == org.apache.spark.sql.types.TimestampNTZType ||
            dt.isInstanceOf[org.apache.spark.sql.types.NumericType] =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"frequent_items does not support $t items")
    }

  @transient private lazy val entryType = StructType(Seq(
    StructField("item", child.dataType, nullable = false),
    StructField("est", LongType, nullable = false)))
  @transient private lazy val ser =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(entryType)
  @transient private lazy val itemOrd: Ordering[Any] =
    org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(child.dataType)

  override def dataType: DataType = ArrayType(entryType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): FreqBuffer =
    new FreqBuffer(scala.collection.mutable.HashMap.empty)

  override def update(buf: FreqBuffer, input: InternalRow): FreqBuffer = {
    val v = child.eval(input)
    if (v != null) {
      // eval results may alias reused buffers — copy before keying
      val key = v match {
        case u: org.apache.spark.unsafe.types.UTF8String => u.clone()
        case o => o
      }
      val c = buf.counts
      c.get(key) match {
        case Some(n) => c.update(key, n + 1)
        case None if c.size < m => c.update(key, 1L)
        case None =>
          // classic MG: a full summary meeting a new item decrements
          // every counter by one (the new item's count cancels too)
          val dead = c.iterator.collect {
            case (k, 1L) => k
          }.toList
          c.mapValuesInPlace((_, n) => n - 1)
          dead.foreach(c.remove)
      }
    }
    buf
  }

  override def merge(buf: FreqBuffer, other: FreqBuffer): FreqBuffer = {
    val c = buf.counts
    other.counts.foreach { case (k, n) =>
      c.update(k, c.getOrElse(k, 0L) + n)
    }
    if (c.size > m) {
      // subtract the (m+1)-th largest count from everything, drop ≤0 —
      // the mergeable-summaries rule that preserves the N/(m+1) bound
      val sorted = c.values.toArray
      java.util.Arrays.sort(sorted)
      val cut = sorted(sorted.length - m - 1)
      val dead = c.iterator.collect {
        case (k, n) if n <= cut => k
      }.toList
      c.mapValuesInPlace((_, n) => n - cut)
      dead.foreach(c.remove)
    }
    buf
  }

  override def eval(buf: FreqBuffer): Any = {
    val entries = buf.counts.toArray.sortWith { (a, b) =>
      if (a._2 != b._2) a._2 > b._2 else itemOrd.compare(a._1, b._1) < 0
    }
    new GenericArrayData(entries.map { case (k, n) =>
      InternalRow(k, n): Any
    })
  }

  override def serialize(buf: FreqBuffer): Array[Byte] =
    RowFraming.write(
      buf.counts.toSeq.map { case (k, n) => InternalRow(k, n) }, ser)

  override def deserialize(bytes: Array[Byte]): FreqBuffer = {
    val counts = scala.collection.mutable.HashMap.empty[Any, Long]
    RowFraming.read(bytes, 2).foreach { u =>
      val key = u.get(0, child.dataType) match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
        case o => o
      }
      counts.update(key, u.getLong(1))
    }
    new FreqBuffer(counts)
  }

  override def withNewMutableAggBufferOffset(o: Int): FrequentItems =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FrequentItems =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FrequentItems =
    copy(child = c)
}

/** Distinct-set aggregation state of [[ExactDistinctLong]] — a
  * log-structured accumulator: an UNSORTED append buffer (the update
  * phase) plus SORTED DEDUPED RUNS (compactions and merged partials),
  * collapsed by balanced pairwise merge-dedup at eval. 0 rides the
  * `hasZero` flag so empty-ness never needs a sentinel.
  *
  * Why not a hash set: at 100M events the per-(partition, group)
  * partial sets reach ~150k entries — multi-MB tables whose every add
  * is a cache miss, plus growth-rehash churn; hash-merging the ~95M
  * exchanged entries repeats the same random-probe pattern on even
  * bigger tables. SCALE.md round-14 measured the class at 13-16x
  * DuckDB on exactly that. Appends are sequential stores; compaction
  * sorts L2-resident chunks; run merges are sequential scans — the
  * whole lifecycle is cache-friendly and allocation-light.
  *
  * Memory: the buffer sort-dedupes IN PLACE whenever it fills, grows
  * only while dedup keeps it over half full, and spills a sorted run
  * at [[LongSet.CompactThreshold]] — so per-group state is O(distinct
  * + threshold chunk), duplicates never accumulate, and a
  * high-duplication group stays at its distinct size. Blob layout:
  * int32 n, flags byte (bit0 hasZero, bit1 sorted), n longs; legacy
  * flag values 0/1 decode as unsorted (sorted on arrival), so
  * pre-run-format blobs still merge correctly.
  *
  * Constructor args name the append buffer (`table`/`size` kept for
  * the original hash-set signature the specs construct directly). */
final class LongSet(var table: Array[Long], var size: Int,
    var hasZero: Boolean) {

  /** Serialized form when this instance is an unmerged deserialized
    * partial; null once decoded. */
  var rawBlob: Array[Byte] = null

  /** Sorted deduped runs (compaction spills + merged partials). */
  private var runs: java.util.ArrayList[Array[Long]] = null
  private var runsTotal: Long = 0L

  def add(v: Long): Unit = {
    if (rawBlob != null) decodeSelf()
    if (v == 0L) { hasZero = true; return }
    if (size == table.length) makeRoom()
    table(size) = v
    size += 1
  }

  /** Sort-dedupe the buffer in place; grow while dedup leaves it over
    * half full, spill a run at the threshold. Amortized O(log) sorts
    * per element, and duplication collapses as early as it appears. */
  private def makeRoom(): Unit = {
    java.util.Arrays.sort(table, 0, size)
    size = dedupeInPlace(table, size)
    if (size > (table.length >> 1)) {
      if (table.length < LongSet.CompactThreshold)
        table = java.util.Arrays.copyOf(table,
          math.max(16, table.length * 2))
      else {
        addRun(java.util.Arrays.copyOf(table, size))
        size = 0
      }
    }
  }

  private def dedupeInPlace(a: Array[Long], n: Int): Int = {
    if (n == 0) return 0
    var w = 1
    var i = 1
    while (i < n) {
      if (a(i) != a(w - 1)) { a(w) = a(i); w += 1 }
      i += 1
    }
    w
  }

  private def failCardinality(): Nothing =
    throw new IllegalStateException(
      s"ExactDistinctLong: per-group distinct cardinality exceeded " +
        s"${LongSet.MaxEntries} — use approx_count_distinct or the " +
        "two-level groupBy spelling for unbounded groups")

  /** Distinct count (collapses all state into one run first). */
  def count: Long = {
    collapse()
    val base = if (runs == null || runs.isEmpty) 0L
      else runs.get(0).length.toLong
    base + (if (hasZero) 1L else 0L)
  }

  /** Iterate every non-zero distinct entry (callers own `hasZero`). */
  def foreachEntry(f: Long => Unit): Unit = {
    collapse()
    if (runs != null && !runs.isEmpty) {
      val r = runs.get(0)
      var i = 0
      while (i < r.length) { f(r(i)); i += 1 }
    }
  }

  /** Fold `other` into this state: a sorted partial blob is collected
    * as a run by one sequential decode; live state contributes its
    * runs and its (compacted) buffer. */
  def union(other: LongSet): Unit = {
    if (rawBlob != null) decodeSelf()
    if (other.rawBlob != null) {
      decodeBlobInto(other.rawBlob)
    } else {
      if (other.hasZero) hasZero = true
      if (other.runs != null) {
        val it = other.runs.iterator()
        while (it.hasNext) addRun(it.next())
      }
      if (other.size > 0) {
        java.util.Arrays.sort(other.table, 0, other.size)
        other.size = other.dedupeInPlace(other.table, other.size)
        addRun(java.util.Arrays.copyOf(other.table, other.size))
      }
    }
  }

  private def decodeBlobInto(blob: Array[Byte]): Unit = {
    val bb = ByteBuffer.wrap(blob)
    val n = bb.getInt
    val flags = bb.get()
    if ((flags & 1) != 0) hasZero = true
    if (n == 0) return
    val arr = new Array[Long](n)
    if ((flags & 4) != 0) {
      // delta-varint: raw first value, then n-1 unsigned LEB128 gaps
      var prev = bb.getLong
      arr(0) = prev
      var i = 1
      while (i < n) {
        var d = 0L
        var shift = 0
        var b = bb.get()
        while ((b & 0x80) != 0) {
          d |= (b & 0x7fL) << shift
          shift += 7
          b = bb.get()
        }
        d |= (b & 0x7fL) << shift
        prev += d
        arr(i) = prev
        i += 1
      }
    } else {
      var i = 0
      while (i < n) { arr(i) = bb.getLong; i += 1 }
      if ((flags & 2) == 0) java.util.Arrays.sort(arr) // legacy unsorted
    }
    addRun(arr)
  }

  /** Distinct size after the last full run-merge — the floor the
    * incremental-merge trigger doubles against, so merge work stays
    * amortized O(1) per entry while run memory stays O(distinct). */
  private var mergedFloor: Long = 0L

  private def addRun(arr: Array[Long]): Unit = {
    if (arr.length == 0) return
    if (runs == null) runs = new java.util.ArrayList[Array[Long]]()
    runsTotal += arr.length
    runs.add(arr)
    // runsTotal counts CROSS-RUN DUPLICATES (runs overlap until merged),
    // so it is an upper bound, not the distinct count. For a group whose
    // distinct exceeds the spill chunk, every chunk overlaps every prior
    // run — unmerged, state would grow O(rows) and a group far below
    // MaxEntries true-distinct would trip the ceiling spuriously. Merge
    // incrementally whenever the bound doubles past the last merged
    // size (geometric trigger → amortized O(1) merge work per entry),
    // and only fail on a POST-merge (exact) count.
    if (runs.size > 1 &&
        (runsTotal > LongSet.MaxEntries ||
         runsTotal >= math.max(mergedFloor * 2, LongSet.MergeFloorMin))) {
      mergeRuns()
      if (runsTotal > LongSet.MaxEntries) failCardinality()
    }
  }

  /** Merge the run list into ONE sorted deduped run via balanced
    * pairwise merge — sequential scans only, duplicates dropped at
    * first collision. Does not touch the append buffer. */
  private def mergeRuns(): Unit = {
    if (runs == null || runs.size <= 1) {
      if (runs != null && runs.size == 1) runsTotal = runs.get(0).length.toLong
      mergedFloor = runsTotal
      return
    }
    var cur = runs
    while (cur.size > 1) {
      val next = new java.util.ArrayList[Array[Long]]((cur.size + 1) / 2)
      var i = 0
      while (i < cur.size) {
        if (i + 1 < cur.size) next.add(mergeDedup(cur.get(i), cur.get(i + 1)))
        else next.add(cur.get(i))
        i += 2
      }
      cur = next
    }
    runs = cur
    runsTotal = cur.get(0).length.toLong
    mergedFloor = runsTotal
  }

  /** Collapse blob + buffer + runs into ONE sorted deduped run. Decodes
    * a pending raw blob first so every read path (count, foreachEntry,
    * serialize) sees materialized state — a freshly-deserialized
    * partial must not silently read as empty. */
  private def collapse(): Unit = {
    if (rawBlob != null) decodeSelf()
    if (size > 0) {
      java.util.Arrays.sort(table, 0, size)
      size = dedupeInPlace(table, size)
      addRun(java.util.Arrays.copyOf(table, size))
      size = 0
    }
    mergeRuns()
  }

  private def mergeDedup(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](a.length + b.length)
    var i = 0
    var j = 0
    var k = 0
    while (i < a.length && j < b.length) {
      val x = a(i)
      val y = b(j)
      if (x < y) { out(k) = x; k += 1; i += 1 }
      else if (x > y) { out(k) = y; k += 1; j += 1 }
      else { out(k) = x; k += 1; i += 1; j += 1 }
    }
    while (i < a.length) { out(k) = a(i); k += 1; i += 1 }
    while (j < b.length) { out(k) = b(j); k += 1; j += 1 }
    if (k == out.length) out else java.util.Arrays.copyOf(out, k)
  }

  /** The whole state as ONE sorted blob, gaps delta-varint-encoded
    * (flags bit1 | bit2): a sorted deduped run over a dense-ish value
    * space serializes at 1-2 bytes per entry instead of 8 — at 100M
    * events the exact-distinct exchange drops from ~650 MB to ~100 MB,
    * which is most of what the merge stage moves. Worst case
    * (adversarially sparse 64-bit values) is 10-byte varints on a few
    * gaps, still bounded by ~1.25x the raw layout. */
  def serializeBlob(): Array[Byte] = {
    if (rawBlob != null) return rawBlob
    collapse()
    val entries: Array[Long] =
      if (runs == null || runs.isEmpty) Array.emptyLongArray
      else runs.get(0)
    if (entries.length > LongSet.MaxEntries) failCardinality()
    // pass 1: size the gaps
    var bytes = 0L
    var i = 1
    while (i < entries.length) {
      val d = entries(i) - entries(i - 1)
      bytes += (63 - java.lang.Long.numberOfLeadingZeros(d)) / 7 + 1
      i += 1
    }
    val head = 5 + (if (entries.length > 0) 8 else 0)
    if (head + bytes > Int.MaxValue - 8) failCardinality()
    val out = new Array[Byte](head + bytes.toInt)
    val bb = ByteBuffer.wrap(out)
    bb.putInt(entries.length)
    bb.put(((if (hasZero) 1 else 0) | 2 | 4).toByte)
    if (entries.length > 0) {
      bb.putLong(entries(0))
      var k = bb.position()
      i = 1
      while (i < entries.length) {
        var d = entries(i) - entries(i - 1)
        while ((d & ~0x7fL) != 0L) {
          out(k) = ((d & 0x7f) | 0x80).toByte
          k += 1
          d >>>= 7
        }
        out(k) = d.toByte
        k += 1
        i += 1
      }
    }
    out
  }

  /** Materialize a raw-blob wrapper into live state. */
  private def decodeSelf(): Unit = {
    val blob = rawBlob
    rawBlob = null
    if (table == null) table = new Array[Long](16)
    decodeBlobInto(blob)
  }
}

object LongSet {
  /** Append-buffer spill point: 2^18 longs = 2 MiB per group chunk —
    * big enough that compaction sorts amortize to ~nothing, small
    * enough that a partial\'s working set stays cache-adjacent. */
  val CompactThreshold: Int = 1 << 18

  /** Hard per-group cardinality ceiling: past 2^27 entries the
    * serialized blob (5 + 8*n bytes) would no longer fit an
    * Int-sized array — fail loudly rather than wrap and corrupt.
    * Enforced against the POST-merge exact distinct count, never the
    * duplicate-inflated pending-run total. */
  val MaxEntries: Int = 1 << 27

  /** Incremental-merge floor: below this many pending run entries the
    * geometric trigger stays quiet (small groups merge once at eval);
    * above it, runs merge whenever the pending total doubles past the
    * last merged size — 4 spill chunks' worth. */
  val MergeFloorMin: Long = 4L * CompactThreshold
}

/** Exact COUNT(DISTINCT long) as a single-pass set aggregate.
  *
  * Spark plans `count(DISTINCT x)` (and the equivalent hand-written
  * two-level groupBy) by exchanging the DEDUPED (group, x) pairs as
  * rows — at 100M events that shuffle is UnsafeRow-encoded tens of
  * millions of rows and dominates the distinct-class queries
  * (SCALE.md round-14: 13-16x DuckDB while the scan class sits at
  * 1.5-1.8x). This operator carries the distinct set ITSELF as the
  * aggregation state: map-side partials dedup into an open-addressing
  * long set and the exchange moves one packed ~9-bytes-per-distinct
  * blob per (partition, group) instead of a row per distinct value —
  * same exactness, a fraction of the exchange volume, and the merge
  * is set-union.
  *
  * Scale policy: state is O(distinct values per group) on the heap
  * (ObjectHashAggregate falls back to sort-based merge with
  * serialized buffers under memory pressure), so this is the right
  * plan when per-group cardinality is bounded (dashboard dimensions:
  * users per domain/device/phrase). For unbounded per-group
  * cardinality the two-level shuffle spelling remains the fallback,
  * and the HLL sketch (2% contract, bounded state) is the 100 TB
  * default — all three spellings live in the registry. */
case class ExactDistinctLong(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongSet] with ImplicitCastInputTypes
  with UnaryLike[Expression] {

  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): LongSet =
    new LongSet(new Array[Long](16), 0, hasZero = false)

  // Unboxed per-row path: after BindReferences the child of a plain
  // column ref IS a BoundReference, so update can read the long
  // straight off the UnsafeRow. The generic eval path boxes a
  // java.lang.Long PER ROW — at 100M events that is ~1.6 GB of young-
  // gen churn, the GC sensitivity SCALE.md measured as the 2.6-10.7 s
  // spread on the exact-distinct class.
  @transient private lazy val boundOrdinal: Int = child match {
    case b: BoundReference if b.dataType == LongType && !b.nullable =>
      b.ordinal
    case _ => -1
  }
  @transient private lazy val boundNullableOrdinal: Int = child match {
    case b: BoundReference if b.dataType == LongType => b.ordinal
    case _ => -1
  }

  override def update(buf: LongSet, input: InternalRow): LongSet = {
    if (boundOrdinal >= 0) buf.add(input.getLong(boundOrdinal))
    else if (boundNullableOrdinal >= 0) {
      val o = boundNullableOrdinal
      if (!input.isNullAt(o)) buf.add(input.getLong(o))
    } else {
      val v = child.eval(input)
      if (v != null) buf.add(v.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: LongSet, other: LongSet): LongSet = {
    buf.union(other)
    buf
  }

  override def eval(buf: LongSet): Any = buf.count

  // one sorted flagged blob — see LongSet's layout note
  override def serialize(buf: LongSet): Array[Byte] = buf.serializeBlob()

  override def deserialize(bytes: Array[Byte]): LongSet = {
    // O(1) wrap — [[LongSet.union]] collects the sorted entries as a
    // run; decoding into a hash table here would be thrown away
    val set = new LongSet(null, 0, hasZero = false)
    set.rawBlob = bytes
    set
  }

  override def withNewMutableAggBufferOffset(o: Int): ExactDistinctLong =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ExactDistinctLong =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ExactDistinctLong =
    copy(child = c)
}

/** Approximate COUNT(DISTINCT long) — dense HyperLogLog with 2^14
  * registers (16 KiB fixed state per group, ~0.81% standard error),
  * the bounded-state estimator the 100 TB plan runs next to the exact
  * spelling. Exists because Spark's `approx_count_distinct` update
  * path boxes its input per row and costs ~3x a plain grouped count at
  * 100M events; this one reads the long straight off the UnsafeRow
  * (same BoundReference fast path as [[ExactDistinctLong]]) and merges
  * by bytewise register max. Standard HLL estimator (Flajolet et al.)
  * with the linear-counting small-range correction — estimates are
  * engine-specific by contract; queries compare them to the exact
  * count under an accuracy BOUND, never value-to-value. */
case class HllDistinctLong(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with ImplicitCastInputTypes
  with UnaryLike[Expression] {

  import HllDistinctLong.{M, P}

  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  @transient private lazy val boundOrdinal: Int = child match {
    case b: BoundReference if b.dataType == LongType => b.ordinal
    case _ => -1
  }

  private def mix(v: Long): Long = {
    var h = v
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^ (h >>> 33)
  }

  private def offer(buf: Array[Byte], v: Long): Unit = {
    val h = mix(v)
    val idx = (h >>> (64 - P)).toInt
    // rank = leading zeros of the remaining 64-P bits, + 1; the OR'd
    // sentinel bit caps it at 64-P+1 for the all-zero tail
    val rank =
      (java.lang.Long.numberOfLeadingZeros((h << P) | (1L << (P - 1))) + 1)
        .toByte
    if (rank > buf(idx)) buf(idx) = rank
  }

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    if (boundOrdinal >= 0) {
      if (!input.isNullAt(boundOrdinal))
        offer(buf, input.getLong(boundOrdinal))
    } else {
      val v = child.eval(input)
      if (v != null) offer(buf, v.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      val r = buf(i)
      sum += java.lang.Double.longBitsToDouble((1023L - r) << 52) // 2^-r
      if (r == 0) zeros += 1
      i += 1
    }
    val raw = alpha * M.toDouble * M.toDouble / sum
    val est =
      if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
      else raw
    math.rint(est).toLong
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllDistinctLong =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllDistinctLong =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HllDistinctLong =
    copy(child = c)
}

object HllDistinctLong {
  /** log2(registers): 2^14 × 1 B = 16 KiB per group, SE ≈ 0.81% —
    * a 5% accuracy contract sits at ~6σ. */
  val P: Int = 14
  val M: Int = 1 << P
}

object AggExpressions {
  import ColumnBridge.{column, expression => expr}

  /** Exact count-distinct of a long column via packed-set state
    * ([[ExactDistinctLong]]): one aggregation pass, set-blob exchange. */
  def exact_distinct_long(c: Column): Column =
    column(ExactDistinctLong(expr(c)).toAggregateExpression())

  /** Approximate count-distinct of a long column via dense HLL
    * ([[HllDistinctLong]]): 16 KiB fixed state, ~0.81% SE, unboxed
    * update — the bounded-state sibling of [[exact_distinct_long]]. */
  def hll_distinct_long(c: Column): Column =
    column(HllDistinctLong(expr(c)).toAggregateExpression())

  /** Array of exact interpolated percentiles of a double column. */
  def exact_percentiles(c: Column, ps: Seq[Double]): Column =
    column(ExactPercentiles(expr(c), ps).toAggregateExpression())

  /** Exact decimal SUM with pure-long per-row arithmetic
    * ([[UnscaledSum]]) — value-identical to the built-in. */
  def unscaled_sum(c: Column): Column =
    column(UnscaledSum(expr(c)).toAggregateExpression())

  /** [[UnscaledSum]] over an ALREADY-UNSCALED long expression carrying
    * `scale` implied decimal places — for per-row decimal products
    * done in long arithmetic. */
  def unscaled_sum_long(c: Column, scale: Int): Column =
    column(UnscaledSum(expr(c), scale).toAggregateExpression())

  /** Reinterpret a decimal column as its unscaled long (free). */
  def unscaled(c: Column): Column = column(UnscaledValue(expr(c)))

  /** Struct(n, s1, s2) of exact single-pass moments of a decimal column. */
  def decimal_moments(c: Column): Column =
    column(DecimalMoments(expr(c)).toAggregateExpression())

  /** k best struct rows under per-field (desc?) ordering, best-first —
    * the bounded-heap top-k ([[BoundedTopK]]). */
  def bounded_top_k(c: Column, k: Int, desc: Seq[Boolean]): Column =
    column(BoundedTopK(expr(c), k, desc).toAggregateExpression())

  /** Misra–Gries heavy hitters: array<struct<item, est>> with ≤ m
    * entries ([[FrequentItems]]). */
  def frequent_items(c: Column, m: Int): Column =
    column(FrequentItems(expr(c), m).toAggregateExpression())
}
