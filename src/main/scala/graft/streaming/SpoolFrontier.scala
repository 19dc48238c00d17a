package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession

/** The spool-directory scaffolding every poll-based CDC source shares
  * ([[RemoteCdcTailer]], [[DeltaFollower]], [[IcebergFollower]]): a
  * `batches/` parquet spool, a crash-safe frontier file (temp +
  * ATOMIC_MOVE — a torn frontier would silently re-poll from the wrong
  * point), and the quiet-poll drain loop. One implementation so a
  * hardening fix can never reach two of the three tails and miss the
  * third. */
private[streaming] trait SpoolFrontier {

  /** The spool root; implementors pass their constructor arg. */
  protected def spoolDir: String

  protected final val batchesDir: Path = {
    val p = Paths.get(spoolDir, "batches")
    Files.createDirectories(p)
    p
  }
  private final val frontierFile = Paths.get(spoolDir, "frontier")

  /** Highest source position already spooled (commit version, snapshot
    * id, or watermark — the implementor's monotone coordinate). */
  final def frontier: Option[Long] =
    if (!Files.exists(frontierFile)) None
    else Some(new String(Files.readAllBytes(frontierFile), "UTF-8")
      .trim.toLong)

  protected final def writeFrontier(v: Long): Unit = {
    val tmp = Files.createTempFile(frontierFile.getParent, ".tmp", ".txt")
    Files.write(tmp, v.toString.getBytes("UTF-8"))
    Files.move(tmp, frontierFile, StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  /** One poll: spool everything past the frontier, advance it, return
    * rows spooled (0 = source quiet; nothing written). */
  def pollOnce(spark: SparkSession): Long

  /** Poll until the source goes quiet for `quietPolls` consecutive
    * rounds (test/batch drain) or `maxPolls` is hit. Returns total rows
    * spooled. A production deployment calls [[pollOnce]] on its own
    * schedule instead. */
  final def drain(spark: SparkSession, maxPolls: Int = 100,
      quietPolls: Int = 1): Long = {
    var total = 0L
    var quiet = 0
    var polls = 0
    while (quiet < quietPolls && polls < maxPolls) {
      val n = pollOnce(spark)
      total += n
      quiet = if (n == 0) quiet + 1 else 0
      polls += 1
    }
    total
  }
}
