package graft.core

import java.nio.file.{Files, Path}

/** Small filesystem helpers shared by the rewrite-and-publish paths
  * ([[VectorTable.purge]], [[graft.operators.IndexCompaction]]).
  */
object Fs {

  /** Hard-link `src` as `dst`, falling back to a byte copy when the
    * filesystem refuses the link. Links fail in more ways than
    * `UnsupportedOperationException` (round-16 ADVICE): `Files.createLink`
    * surfaces EMLINK / EPERM / cross-device / network-mount failures as
    * `FileSystemException` subtypes, and a takedown or purge must degrade
    * to copying, not abort. `FileAlreadyExistsException` is NOT caught —
    * an existing destination means the caller's fresh directory wasn't
    * fresh, a real bug the copy fallback would silently paper over.
    */
  def linkOrCopy(src: Path, dst: Path): Unit =
    try Files.createLink(dst, src)
    catch {
      case e: java.nio.file.FileAlreadyExistsException => throw e
      case _: UnsupportedOperationException | _: java.nio.file.FileSystemException |
          _: SecurityException =>
        Files.copy(src, dst)
    }
}
