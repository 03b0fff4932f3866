package graft.util

import java.nio.file.{Files, LinkOption, Path}

/** Tiny filesystem helpers shared by the test/bench harness paths (the
  * engine itself never deletes — only harness staging dirs and orphaned
  * local-warehouse locations are ever removed). */
object Fs {

  /** Recursively delete a file tree; missing paths are a no-op. Does not
    * follow symlinks: a directory SYMLINK is detected as a link
    * (NOFOLLOW), so only the link itself is removed, never the target's
    * contents. */
  def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p, LinkOption.NOFOLLOW_LINKS)) {
      val s = Files.list(p)
      try s.iterator().forEachRemaining(deleteRecursively(_))
      finally s.close()
    }
    Files.deleteIfExists(p)
  }

  def deleteRecursively(f: java.io.File): Unit = deleteRecursively(f.toPath)
}
