package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Add, AttributeReference,
  Cast, CreateNamedStruct, Divide, Expression, If, ImplicitCastInputTypes,
  IsNull, Literal, Multiply, UnscaledValue}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  DeclarativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType,
  DoubleType, LongType, StructField, StructType}

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

/** Open-addressing set of longs — the aggregation state of
  * [[ExactDistinctLong]]. Power-of-two table, fmix64 probe hash,
  * 0 reserved as the empty slot (a real 0 rides the `hasZero` flag);
  * primitive array, no boxing, ~9 bytes/entry serialized. */
final class LongSet(var table: Array[Long], var size: Int,
    var hasZero: Boolean) {

  private def mix(v: Long): Long = {
    var h = v
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^ (h >>> 33)
  }

  def add(v: Long): Unit = {
    if (v == 0L) { hasZero = true; return }
    if ((size + 1).toLong * 2 > table.length) grow()
    val mask = table.length - 1
    var i = (mix(v) & mask).toInt
    while (table(i) != 0L) {
      if (table(i) == v) return
      i = (i + 1) & mask
    }
    table(i) = v
    size += 1
  }

  private def grow(): Unit = {
    // Fail LOUDLY at a capacity where the serialized blob (5 + 8·n
    // bytes) still fits an Int-sized array — past it the Int
    // arithmetic in add/serialize would wrap and CORRUPT the set
    // rather than OOM cleanly. 2^27 entries ≈ 1 GiB per-group state
    // is already far beyond this aggregate's bounded-cardinality
    // contract; the HLL sketch or the two-level shuffle spelling is
    // the right plan there (see ExactDistinctLong scaladoc).
    if (table.length >= LongSet.MaxCapacity)
      throw new IllegalStateException(
        s"ExactDistinctLong: per-group distinct cardinality exceeded " +
          s"${LongSet.MaxCapacity / 2} — use hll_distinct or the " +
          "two-level groupBy spelling for unbounded groups")
    val old = table
    table = new Array[Long](math.max(16, old.length * 2))
    size = 0
    var i = 0
    while (i < old.length) {
      if (old(i) != 0L) add(old(i))
      i += 1
    }
  }

  def count: Long = size.toLong + (if (hasZero) 1L else 0L)

  def foreachEntry(f: Long => Unit): Unit = {
    var i = 0
    while (i < table.length) {
      if (table(i) != 0L) f(table(i))
      i += 1
    }
  }
}

object LongSet {
  /** Largest table we grow to: 2^28 slots → 2^27 entries at the 50%
    * load ceiling, whose serialized form (5 + 8·2^27 ≈ 1 GiB) still
    * fits a JVM byte array with room to spare. */
  val MaxCapacity: Int = 1 << 28
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

  override def update(buf: LongSet, input: InternalRow): LongSet = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: LongSet, other: LongSet): LongSet = {
    if (other.hasZero) buf.hasZero = true
    other.foreachEntry(buf.add)
    buf
  }

  override def eval(buf: LongSet): Any = buf.count

  override def serialize(buf: LongSet): Array[Byte] = {
    val bb = ByteBuffer.allocate(5 + 8 * buf.size)
    bb.putInt(buf.size)
    bb.put(if (buf.hasZero) 1.toByte else 0.toByte)
    buf.foreachEntry(bb.putLong(_))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongSet = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val hasZero = bb.get() == 1
    // next power of two holding n at <=50% load (long arithmetic:
    // n near 2^30 would wrap `n * 2` as Int and under-allocate)
    var cap = 16
    while (cap.toLong < n.toLong * 2) cap <<= 1
    val set = new LongSet(new Array[Long](cap), 0, hasZero)
    var i = 0
    while (i < n) { set.add(bb.getLong); i += 1 }
    set
  }

  override def withNewMutableAggBufferOffset(o: Int): ExactDistinctLong =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ExactDistinctLong =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ExactDistinctLong =
    copy(child = c)
}

object AggExpressions {
  import ColumnBridge.{column, expression => expr}

  /** Exact count-distinct of a long column via packed-set state
    * ([[ExactDistinctLong]]): one aggregation pass, set-blob exchange. */
  def exact_distinct_long(c: Column): Column =
    column(ExactDistinctLong(expr(c)).toAggregateExpression())

  /** Array of exact interpolated percentiles of a double column. */
  def exact_percentiles(c: Column, ps: Seq[Double]): Column =
    column(ExactPercentiles(expr(c), ps).toAggregateExpression())

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
