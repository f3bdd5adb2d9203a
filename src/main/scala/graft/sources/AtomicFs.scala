package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Atomic put-if-absent file publication — the commit primitive behind
  * both lakehouse logs ([[DeltaLake]] `_delta_log/%020d.json`,
  * [[Iceberg]] `metadata/v%d.metadata.json`): optimistic concurrency
  * needs "publish this staged file at this name unless the name is
  * taken" to be ONE atomic step.
  *
  * A plain `exists() + FileSystem.rename` is TOCTOU — on the local FS
  * `File.renameTo` is POSIX rename(2), which silently REPLACES an
  * existing destination, so two racers could both pass the check and
  * the loser would clobber the winner. The local scheme therefore uses
  * hard-link creation (link(2) fails with EEXIST atomically — the
  * classic POSIX put-if-absent); other filesystems go through
  * `FileContext.rename(…, Options.Rename.NONE)`, which HDFS-class
  * stores implement as a server-side atomic no-overwrite rename. On
  * stores with neither primitive the guarantee degrades to the store's
  * own rename semantics — run a single writer per table there (the
  * same caveat Delta itself documents for S3 without a coordination
  * service). */
private[sources] object AtomicFs {

  /** Publish `tmp` at `dest` iff `dest` does not exist. Returns true
    * when this caller won (tmp consumed/removed); false when the name
    * was already taken (tmp deleted, dest untouched). Any
    * infrastructure failure (not a lost race) cleans up tmp and
    * rethrows. */
  def putIfAbsent(f: FileSystem, tmp: Path, dest: Path): Boolean = {
    if (f.exists(dest)) { // cheap fast-path; the primitive below is the guard
      f.delete(tmp, false)
      return false
    }
    try {
      val scheme = Option(f.getUri.getScheme).getOrElse("file")
      if (scheme == "file") {
        val tmpNio = java.nio.file.Paths.get(f.makeQualified(tmp).toUri.getPath)
        val destNio = java.nio.file.Paths.get(f.makeQualified(dest).toUri.getPath)
        try {
          java.nio.file.Files.createLink(destNio, tmpNio) // atomic EEXIST
          f.delete(tmp, false)
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            f.delete(tmp, false)
            false
          // a local mount without hard links (CIFS/FAT/some overlays):
          // fall back to rename(NONE) rather than making the table
          // un-writable — weaker atomicity, same as the pre-link code
          case _: UnsupportedOperationException => renameNone(f, tmp, dest)
          case e: java.nio.file.FileSystemException
            if !e.isInstanceOf[java.nio.file.FileAlreadyExistsException] =>
            renameNone(f, tmp, dest)
        }
      } else renameNone(f, tmp, dest)
    } catch {
      case e: Throwable => // infrastructure failure: no debris, rethrow
        try f.delete(tmp, false) catch { case _: Exception => () }
        throw e
    }
  }

  private def renameNone(f: FileSystem, tmp: Path, dest: Path): Boolean = {
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(f.getUri, f.getConf)
    try {
      fc.rename(tmp, dest, org.apache.hadoop.fs.Options.Rename.NONE)
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
        f.delete(tmp, false)
        false
    }
  }
}
