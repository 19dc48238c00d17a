package graft.lake

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path, Paths}
import java.util.UUID
import java.util.zip.CRC32

import org.roaringbitmap.RoaringBitmap

/** Delta deletion-vector storage, straight from the public protocol spec
  * (delta-io PROTOCOL.md, "Deletion Vectors" + "Deletion Vector Format"):
  *
  *   - a DV is a set of deleted row indexes of one parquet file, stored
  *     as a 64-bit Roaring bitmap in the RoaringFormatSpec "portable"
  *     layout prefixed by a 4-byte little-endian magic (1681511377);
  *   - DV files hold one format-version byte (1) then one or more DV
  *     blobs, each `[dataSize: 4-byte BE][data][CRC32(data): 4-byte BE]`,
  *     with the descriptor's `offset` pointing at the dataSize word;
  *   - descriptors reference storage as `u` (UUID-named file in the table
  *     root, the UUID Z85-encoded), `p` (absolute path), or `i` (inline,
  *     the data itself Z85-encoded).
  *
  * The 32-bit buckets inside the 64-bit layout reuse Spark's own
  * org.roaringbitmap dependency — the serialized form is the standard
  * portable format that library reads and writes natively, so interop
  * with real writers (which use the same library) is exact.
  *
  * Membership checks hand executors a sorted long array per file
  * (broadcast) — DV cardinality is bounded by rows-per-file, and binary
  * search costs no per-row object churn inside the scan filter.
  */
object DeletionVectors {

  val FormatVersion: Byte = 1
  val Magic: Int = 1681511377

  // ---------------------------------------------------------------------
  // Z85 (ZeroMQ base-85): the spec's encoding for UUIDs and inline DVs
  // ---------------------------------------------------------------------

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Decode: Array[Int] = {
    val t = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => t(c.toInt) = i }
    t
  }

  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, s"Z85 input must be 4n bytes: ${bytes.length}")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xffL); j += 1 }
      var div = 85L * 85 * 85 * 85
      while (div > 0) {
        sb.append(Z85Alphabet(((v / div) % 85).toInt))
        div /= 85
      }
      i += 4
    }
    sb.toString
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"Z85 input must be 5n chars: ${s.length}")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    var o = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Decode(c) else -1
        require(d >= 0, s"invalid Z85 char '$c'")
        v = v * 85 + d
        j += 1
      }
      var shift = 24
      while (shift >= 0) {
        out(o) = ((v >> shift) & 0xff).toByte
        o += 1; shift -= 8
      }
      i += 5
    }
    out
  }

  // ---------------------------------------------------------------------
  // Bitmap data: magic + 64-bit portable roaring
  // ---------------------------------------------------------------------

  /** Serialize sorted-or-not row indexes to the spec's DV data bytes. */
  def serializeData(positions: Array[Long]): Array[Byte] = {
    // bucket by high 32 bits (ascending unsigned); low bits per bucket
    val buckets = positions.groupBy(p => (p >>> 32).toInt).toSeq
      .sortBy { case (k, _) => k.toLong & 0xffffffffL }
      .map { case (k, ps) =>
        val bm = new RoaringBitmap()
        ps.foreach(p => bm.add((p & 0xffffffffL).toInt))
        bm.runOptimize()
        (k, bm)
      }
    val size = 4 + 8 + buckets.map(4 + _._2.serializedSizeInBytes()).sum
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(Magic)
    buf.putLong(buckets.size.toLong)
    buckets.foreach { case (k, bm) =>
      buf.putInt(k)
      bm.serialize(buf)
    }
    buf.array()
  }

  /** Parse DV data bytes to a sorted array of deleted row indexes. */
  def deserializeData(data: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt()
    require(magic == Magic, s"bad DV magic $magic (want $Magic)")
    val nBuckets = buf.getLong()
    val out = Array.newBuilder[Long]
    var b = 0L
    while (b < nBuckets) {
      val key = buf.getInt().toLong & 0xffffffffL
      val bm = new RoaringBitmap()
      bm.deserialize(buf)
      // deserialize(ByteBuffer) does not advance the buffer — skip
      // exactly the bytes the bitmap occupies
      buf.position(buf.position() + bm.serializedSizeInBytes())
      val it = bm.getIntIterator
      while (it.hasNext) {
        out += (key << 32) | (it.next().toLong & 0xffffffffL)
      }
      b += 1L
    }
    out.result().sorted
  }

  // ---------------------------------------------------------------------
  // DV descriptors + file IO
  // ---------------------------------------------------------------------

  /** `add.deletionVector` descriptor (protocol field names). */
  case class Descriptor(storageType: String, pathOrInlineDv: String,
      offset: Option[Int], sizeInBytes: Int, cardinality: Long) {

    /** On-disk DV file for `u`/`p` storage; None for inline. */
    def filePath(tableRoot: Path): Option[Path] = storageType match {
      case "u" =>
        val prefix = pathOrInlineDv.dropRight(20)
        val uuidBytes = z85Decode(pathOrInlineDv.takeRight(20))
        val bb = ByteBuffer.wrap(uuidBytes)
        val uuid = new UUID(bb.getLong(), bb.getLong())
        val name = s"deletion_vector_$uuid.bin"
        Some(if (prefix.isEmpty) tableRoot.resolve(name)
          else tableRoot.resolve(prefix).resolve(name))
      case "p" => Some(Paths.get(pathOrInlineDv))
      case "i" => None
      case other =>
        throw new UnsupportedOperationException(s"DV storage type '$other'")
    }
  }

  /** Load the deleted-row-index set a descriptor points at, verifying
    * size and checksum (refuse-over-misread, like the rest of the log
    * handling). */
  def read(tableRoot: Path, d: Descriptor): Array[Long] = {
    val data = d.storageType match {
      case "i" =>
        // Writers zero-pad inline data to 4n bytes for Z85 and record
        // sizeInBytes as the UNPADDED length — decode, then truncate.
        val decoded = z85Decode(d.pathOrInlineDv)
        require(decoded.length >= d.sizeInBytes &&
          decoded.length - d.sizeInBytes < 4,
          s"inline DV: ${decoded.length} decoded bytes vs descriptor " +
            s"${d.sizeInBytes} (expected <4 bytes of Z85 padding)")
        java.util.Arrays.copyOfRange(decoded, 0, d.sizeInBytes)
      case _ =>
        val p = d.filePath(tableRoot).get
        val all = Files.readAllBytes(p)
        require(all.nonEmpty && all(0) == FormatVersion,
          s"$p: unsupported DV file version ${all.headOption.getOrElse(-1)}")
        val off = d.offset.getOrElse(
          throw new IllegalStateException(s"$p: file-stored DV needs offset"))
        val bb = ByteBuffer.wrap(all) // BE default for size/crc words
        val dataSize = bb.getInt(off)
        require(dataSize == d.sizeInBytes,
          s"$p: DV size $dataSize != descriptor ${d.sizeInBytes}")
        val bytes = java.util.Arrays.copyOfRange(all, off + 4, off + 4 + dataSize)
        val crc = new CRC32()
        crc.update(bytes)
        val stored = bb.getInt(off + 4 + dataSize)
        require(stored == crc.getValue.toInt,
          s"$p: DV checksum mismatch")
        bytes
    }
    deserializeData(data)
  }

  // ---------------------------------------------------------------------
  // Scan-side application: codegen'd row-liveness predicate
  // ---------------------------------------------------------------------

  /** Row-liveness kernel behind [[DvLive]]. Scans process one file's
    * rows consecutively, so the (path → bitmap) resolution memoizes the
    * last hit per thread — the per-row cost is two reference compares +
    * one binary search, no string conversion.
    *
    * The memo keys on the DV MAP'S IDENTITY as well as the path:
    * executor threads outlive queries, and the same file path carries a
    * DIFFERENT bitmap after every new delete commit — a path-only memo
    * would serve a stale generation's bitmap to a later snapshot's scan
    * and silently under-delete. */
  /** `_metadata.file_path` is a URI; DV-map keys are filesystem paths.
    * The ONE conversion both the map-building side ([[DeltaCompat]])
    * and the probing side ([[live]]) must share — a drift between
    * them makes every membership lookup miss and resurrects deleted
    * rows. */
  def uriToPath(fp: String): String =
    if (fp.startsWith("file:")) new java.net.URI(fp).getPath else fp

  // The dvMap is held WEAKLY: pooled executor threads outlive queries,
  // and a strong ThreadLocal reference would pin every scanned table's
  // bitmap state per thread for the life of the executor. The one
  // strongly-held `arr` is a single file's index array, bounded and
  // re-resolvable.
  private val last = new ThreadLocal[
    (java.lang.ref.WeakReference[AnyRef],
      org.apache.spark.unsafe.types.UTF8String, Array[Long])]

  /** Row-liveness probe. Lives DIRECTLY on the top-level object (not a
    * nested one): scalac emits a Java static forwarder
    * `DeletionVectors.live` only for top-level-object methods, and the
    * generated Java below can only resolve static members — a nested
    * `DvOps.live` compiled fine in Scala but made Janino reject every
    * generated stage, silently demoting all DV scans to interpreted
    * fallback. */
  def live(dvMap: Map[String, Array[Long]],
      fp: org.apache.spark.unsafe.types.UTF8String, pos: Long): Boolean = {
    val cached = last.get()
    val deleted =
      if (cached != null && (cached._1.get eq dvMap) && cached._2.equals(fp))
        cached._3
      else {
        val arr = dvMap.getOrElse(uriToPath(fp.toString), null)
        last.set((new java.lang.ref.WeakReference[AnyRef](dvMap),
          fp.clone(), arr))
        arr
      }
    deleted == null || java.util.Arrays.binarySearch(deleted, pos) < 0
  }

  /** `live(file_path, row_index)` as a native codegen'd predicate — the
    * DV bitmaps ride the expression into the stage's reference array
    * (shipped via Spark's task-binary broadcast), so the scan filter
    * stays inside whole-stage codegen instead of dropping to a UDF. */
  case class DvLive(left: org.apache.spark.sql.catalyst.expressions.Expression,
      right: org.apache.spark.sql.catalyst.expressions.Expression,
      dvMap: Map[String, Array[Long]])
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    import org.apache.spark.sql.catalyst.expressions.Expression
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    override def dataType: org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.BooleanType
    override protected def nullSafeEval(fp: Any, pos: Any): Any =
      DeletionVectors.live(dvMap,
        fp.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        pos.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val mapRef = ctx.addReferenceObj("dvMap", dvMap,
        "scala.collection.immutable.Map")
      defineCodeGen(ctx, ev, (fp, pos) =>
        s"graft.lake.DeletionVectors.live($mapRef, $fp, $pos)")
    }
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression) = copy(left = l, right = r)
  }

  /** Write one DV file holding a vector per entry (one commit's worth),
    * returning `u`-storage descriptors in input order. */
  def write(tableRoot: Path, vectors: Seq[Array[Long]]): Seq[Descriptor] = {
    val uuid = UUID.randomUUID()
    val bb = ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    val encodedUuid = z85Encode(bb.array())
    val out = new java.io.ByteArrayOutputStream()
    out.write(FormatVersion.toInt)
    val descriptors = vectors.map { raw =>
      // cardinality must be the BITMAP's cardinality — dedupe first so a
      // caller passing repeated positions can't overstate it (readers
      // that validate descriptors against the bitmap reject the table)
      val positions = raw.distinct
      val data = serializeData(positions)
      val offset = out.size()
      val word = ByteBuffer.allocate(4)
      out.write(word.putInt(0, data.length).array())
      out.write(data)
      val crc = new CRC32()
      crc.update(data)
      out.write(ByteBuffer.allocate(4).putInt(0, crc.getValue.toInt).array())
      Descriptor("u", encodedUuid, Some(offset), data.length, positions.length.toLong)
    }
    Files.write(tableRoot.resolve(s"deletion_vector_$uuid.bin"),
      out.toByteArray)
    descriptors
  }
}
