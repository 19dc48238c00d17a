package graft.lake

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{col, pmod, substring}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg partition transforms, straight from the table-format spec
  * ("Partition Transforms" + Appendix B "32-bit Hash Requirements"):
  *
  *   - `identity` — the value itself;
  *   - `bucket[N]` — `(murmur3_x86_32(canonical bytes) & MaxInt) % N`,
  *     where int/long hash their 8 little-endian bytes (so int 34 and
  *     long 34 bucket identically, as the spec requires), strings their
  *     UTF-8 bytes;
  *   - `truncate[W]` — `v - (((v % W) + W) % W)` for int/long (floors
  *     toward -inf), leading-W-chars for strings.
  *
  * The hash is implemented here rather than borrowed because Spark's
  * Murmur3_x86_32 variant diverges from the reference algorithm on
  * non-4-byte-aligned tails — a silent bucket mismatch against real
  * Iceberg writers. Spec test vectors pin it in IcebergCompatSpec.
  */
object IcebergTransforms {

  /** Reference murmur3_x86_32 (public domain algorithm), seed 0. */
  def murmur3(bytes: Array[Byte], seed: Int = 0): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = seed
    val nblocks = bytes.length / 4
    var i = 0
    while (i < nblocks) {
      val o = 4 * i
      var k1 = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    var k1 = 0
    val tail = nblocks * 4
    val rem = bytes.length & 3
    if (rem == 3) k1 ^= (bytes(tail + 2) & 0xff) << 16
    if (rem >= 2) k1 ^= (bytes(tail + 1) & 0xff) << 8
    if (rem >= 1) {
      k1 ^= bytes(tail) & 0xff
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
    }
    h1 ^= bytes.length
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** int/long hash: murmur3 of the value's 8 little-endian bytes. */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    murmur3(b)
  }

  def hashString(s: String): Int =
    murmur3(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def bucketOf(v: Any, n: Int): Integer = v match {
    case null => null
    case i: Int => (hashLong(i.toLong) & Integer.MAX_VALUE) % n
    case l: Long => (hashLong(l) & Integer.MAX_VALUE) % n
    case s: String => (hashString(s) & Integer.MAX_VALUE) % n
    case other => throw new UnsupportedOperationException(
      s"Iceberg bucket over ${other.getClass.getSimpleName} out of scope")
  }

  // Static-forwarder call targets for generated code (a top-level
  // object's methods compile to Java statics; nested ones do not).
  def bucketLong(v: Long, n: Int): Int =
    (hashLong(v) & Integer.MAX_VALUE) % n
  def bucketUtf8(s: UTF8String, n: Int): Int =
    (murmur3(s.getBytes) & Integer.MAX_VALUE) % n

  /** `bucket[N]` as a native codegen'd expression — the write path
    * stages every row through this, and a Scala UDF there would box
    * each value, break the stage's whole-stage codegen span, and
    * serialize a closure per task for what is four integer multiplies.
    * Accepts LongType (ints are cast by the caller — the spec hashes
    * int and long identically) and StringType (murmur3 of the UTF-8
    * bytes, taken straight off the UTF8String — no String round-trip). */
  case class IcebergBucket(child: Expression, buckets: Int)
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = child.nullable
    // MUST be a def: the analyzer copies this node via
    // withNewChildInternal while the child is still unresolved, and an
    // eager val would call dataType on an unresolved attribute and throw
    private def isString = child.dataType == StringType
    override protected def nullSafeEval(v: Any): Any =
      if (isString) bucketUtf8(v.asInstanceOf[UTF8String], buckets)
      else bucketLong(v.asInstanceOf[Long], buckets)
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val fn = if (isString) "bucketUtf8" else "bucketLong"
      defineCodeGen(ctx, ev, c =>
        s"graft.lake.IcebergTransforms.$fn($c, $buckets)")
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncateRe = """truncate\[(\d+)\]""".r
  private val TimeTransforms = Set("year", "month", "day", "hour")

  /** Result type of `transform` applied to a `source`-typed column.
    * Time transforms store epoch-relative ordinals (years/months/days/
    * hours since 1970) as ints, per the spec. */
  def resultType(transform: String, source: DataType): DataType =
    transform match {
      case "identity" => source
      case BucketRe(_) => IntegerType
      case TruncateRe(_) => source
      case t if TimeTransforms(t) => IntegerType
      case other => throw new UnsupportedOperationException(
        s"Iceberg partition transform '$other' out of this writer's scope")
    }

  /** Spec field name convention for a derived partition field. */
  def fieldName(transform: String, source: String): String = transform match {
    case "identity" => source
    case BucketRe(_) => s"${source}_bucket"
    case TruncateRe(_) => s"${source}_trunc"
    case t if TimeTransforms(t) => s"${source}_$t"
    case other => throw new UnsupportedOperationException(
      s"Iceberg partition transform '$other' out of this writer's scope")
  }

  /** The UTC calendar date of a TimestampType column, independent of
    * the session timezone: epoch seconds → UTC day ordinal (tz-free
    * arithmetic) → DateType (tz-free calendar). The spec defines time
    * transforms over UTC; year()/month() applied to TimestampType
    * directly would decompose in the SESSION zone and a non-UTC caller
    * would write partition tuples real engines disagree with. */
  private def utcDate(c: Column): Column = {
    val F = org.apache.spark.sql.functions
    F.date_add(F.lit(java.sql.Date.valueOf("1970-01-01")),
      F.floor(c.cast(LongType).cast(DoubleType) / 86400d).cast(IntegerType))
  }

  /** Spark column computing the transform of `source` (used to stage
    * hive-layout partition dirs; one expression, no extra pass). */
  def expr(transform: String, source: String, sourceType: DataType): Column = {
    val F = org.apache.spark.sql.functions
    (transform, sourceType) match {
      case ("identity", _) => col(source)
      case (BucketRe(n), IntegerType | LongType) =>
        ColumnBridge.column(IcebergBucket(
          ColumnBridge.expression(col(source).cast(LongType)), n.toInt))
      case (BucketRe(n), StringType) =>
        ColumnBridge.column(IcebergBucket(
          ColumnBridge.expression(col(source)), n.toInt))
      case (TruncateRe(w), IntegerType | LongType) =>
        col(source) - pmod(col(source), F.lit(w.toInt))
      case (TruncateRe(w), StringType) =>
        substring(col(source), 1, w.toInt)
      // Time transforms: epoch-relative ordinals per the spec, always
      // decomposed in UTC. DateType and TimestampNTZType are tz-free
      // already; TimestampType goes through utcDate so a non-UTC
      // session cannot skew the tuple.
      case ("year", DateType | TimestampNTZType) =>
        (F.year(col(source)) - 1970).cast(IntegerType)
      case ("year", TimestampType) =>
        (F.year(utcDate(col(source))) - 1970).cast(IntegerType)
      case ("month", DateType | TimestampNTZType) =>
        ((F.year(col(source)) - 1970) * 12 + F.month(col(source)) - 1)
          .cast(IntegerType)
      case ("month", TimestampType) =>
        val d = utcDate(col(source))
        ((F.year(d) - 1970) * 12 + F.month(d) - 1).cast(IntegerType)
      case ("day", DateType | TimestampNTZType) =>
        F.datediff(col(source), F.lit("1970-01-01")).cast(IntegerType)
      case ("day", TimestampType) =>
        F.floor(col(source).cast(LongType).cast(DoubleType) / 86400d)
          .cast(IntegerType)
      case ("hour", TimestampType | TimestampNTZType) =>
        F.floor(col(source).cast(LongType) / 3600L).cast(IntegerType)
      case (t, st) => throw new UnsupportedOperationException(
        s"Iceberg transform '$t' over $st out of this writer's scope")
    }
  }

  /** Parse a partition value staged as a hive dir segment back to the
    * transform's result type. */
  def parseStaged(v: Option[String], t: DataType): Any = v match {
    case None => null
    case Some(s) => t match {
      case StringType => s
      case IntegerType => s.toInt
      case LongType => s.toLong
      case BooleanType => s.toBoolean
      case FloatType => s.toFloat
      case DoubleType => s.toDouble
      // identity date partitions: Spark stages the dir value as the ISO
      // calendar date; the manifest tuple stores the spec's epoch-day
      // int (avro int + date logical type)
      case DateType => java.time.LocalDate.parse(s).toEpochDay.toInt
      case other => throw new UnsupportedOperationException(
        s"Spark type $other out of scope as an Iceberg partition value")
    }
  }
}
