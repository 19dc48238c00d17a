package graft.streaming

import java.nio.file.{Files, Paths}

/** The per-checkpoint writer identity both CDC sinks pin beside the
  * stream state: a restarted query keeps its app id (so its recorded
  * watermarks keep applying), a fresh checkpoint gets a fresh one. One
  * shared implementation so the two sinks can never drift. */
private[streaming] object CheckpointAppId {

  def loadOrCreate(checkpointDir: String): String = {
    val idFile = Paths.get(checkpointDir, "graft-appid")
    if (Files.exists(idFile))
      new String(Files.readAllBytes(idFile), "UTF-8").trim
    else {
      val id = java.util.UUID.randomUUID().toString
      Files.createDirectories(idFile.getParent)
      try {
        // CREATE_NEW: two racing first attaches agree on ONE winner
        Files.write(idFile, id.getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        id
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          new String(Files.readAllBytes(idFile), "UTF-8").trim
      }
    }
  }
}
