package graft.util

import java.nio.file.{Files, Path}

/** Tiny filesystem helpers shared by the test/bench harness paths (the
  * engine itself never deletes — only harness staging dirs and orphaned
  * local-warehouse locations are ever removed). */
object Fs {

  /** Recursively delete a file tree; missing paths are a no-op. Does not
    * follow symlinks (Files.list returns the link itself; deleting a
    * link removes the link, not its target). */
  def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.iterator().forEachRemaining(deleteRecursively(_))
      finally s.close()
    }
    Files.deleteIfExists(p)
  }

  def deleteRecursively(f: java.io.File): Unit = deleteRecursively(f.toPath)
}
