package graft

import java.nio.file.{Files, Path, Paths}

/** Ephemeral scratch space for temp warehouses and shuffle spill.
  *
  * Prefers a RAM-backed tmpfs (`/dev/shm`) when present and writable —
  * the root filesystem here is 9p, whose per-file metadata round-trips
  * dominate small-file work. In a real deployment this is the local-SSD
  * scratch volume every executor gets; durability still comes from the
  * warehouse/manifest commit, never from scratch. Override with
  * `GRAFT_SCRATCH`.
  */
object Scratch {
  lazy val base: Path = {
    val shm = Paths.get("/dev/shm")
    val root = sys.env.get("GRAFT_SCRATCH").map(Paths.get(_))
      .getOrElse(if (Files.isWritable(shm)) shm
      else Paths.get(sys.props("java.io.tmpdir")))
    Files.createDirectories(root.resolve("graft-scratch"))
  }

  // tmpfs is RAM: scratch this JVM created is deleted at exit (only our
  // own dirs — the shared graft-scratch root may host other processes).
  private val created = scala.collection.mutable.ArrayBuffer[Path]()
  private lazy val hook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      created.synchronized(created.toList).foreach { d =>
        try {
          val walk = Files.walk(d)
          try walk.sorted(java.util.Comparator.reverseOrder[Path]())
            .forEach(p => Files.deleteIfExists(p))
          finally walk.close()
        } catch { case _: Throwable => () }
      }))

  /** Fresh scratch directory with the given prefix; removed at JVM
    * exit. */
  def dir(prefix: String): String = {
    hook
    val d = Files.createTempDirectory(base, prefix)
    created.synchronized(created += d)
    d.toString
  }
}
