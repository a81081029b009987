package graft.core

import java.nio.file.{Files, Path}

/** Recursive temp-dir cleanup shared by every staging query (stream
  * staging, file-format round-trips): best-effort delete that never
  * masks the caller's own exception — a cleanup failure is logged, not
  * thrown, because the result being returned no longer lives there. */
object TempDirs {
  def deleteQuietly(p: Path, tag: String): Unit =
    try {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    } catch {
      case e: Exception =>
        System.err.println(s"[$tag] temp cleanup of $p failed: ${e.getMessage}")
    }
}
