package graft

/** Pay-once scratch layout location for the b-family / q107 artifacts
  * (compacted zone-map layout, sketch table, IVF cells, materialized
  * view).
  *
  * The path is keyed on a CONTENT FINGERPRINT of the source dataset —
  * each table file's name, byte length, and mtime — not just the
  * dataset dir's basename. A basename-only key has a stale-reuse
  * hazard: regenerate the data at the same path (or share /tmp across
  * two checkouts) and the `_SUCCESS`-guarded artifact silently serves
  * yesterday's layout — wrong ANN cells, a view that fails its own
  * merge ≡ recompute audit. With the fingerprint in the path, changed
  * data simply misses the cache and pays the once-cost again.
  *
  * Pruning is defensive about /tmp being world-writable (ADVICE r10):
  * the tag carries a digest of the dataset's CANONICAL PATH (two
  * datasets sharing a basename can never prune each other), a sibling
  * `.graft_owned` marker written here is required before anything is
  * deleted (a name-shaped dir this code never created is left alone),
  * symlinked entries are skipped at the top level, and the recursive
  * delete never follows links (walkFileTree visits a symlink as a
  * file — the LINK is removed, never its target).
  */
object Scratch {

  private val Marker = ".graft_owned"

  /** /tmp/graft_<kind>_<tag>_<fp12> for dataset `sfDir`, where tag =
    * sanitized basename + 8-hex canonical-path digest. Obsolete
    * siblings — same kind+tag, DIFFERENT fingerprint, i.e. artifacts of
    * a dataset that no longer exists in that shape — are pruned here, so
    * repeated regenerations don't accumulate dead pay-once layouts in
    * /tmp (ADVICE r9). Only dirs matching the exact pattern AND carrying
    * this object's sibling marker are touched; the current fingerprint's
    * dir is never pruned. */
  def dir(kind: String, sfDir: String): String = {
    val root = new java.io.File(sfDir)
    val tag = root.getName.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      md5hex(root.getCanonicalPath).take(8)
    val fp = fingerprint(root)
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val prefix = s"graft_${kind}_${tag}_"
    Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter { f =>
        f.getName.startsWith(prefix) &&
          f.getName.stripPrefix(prefix).matches("[0-9a-f]{12}") &&
          f.getName != prefix + fp &&
          !java.nio.file.Files.isSymbolicLink(f.toPath) &&
          f.isDirectory &&
          new java.io.File(tmp, f.getName + Marker).isFile
      }
      .foreach { f =>
        delete(f)
        new java.io.File(tmp, f.getName + Marker).delete(): Unit
      }
    val target = new java.io.File(tmp, prefix + fp)
    // claim ownership via the sibling marker (Spark's mode("overwrite")
    // deletes the target dir itself, so the marker cannot live inside it)
    val marker = new java.io.File(tmp, target.getName + Marker)
    if (!marker.isFile)
      java.nio.file.Files.write(marker.toPath, Array.empty[Byte]): Unit
    target.getPath
  }

  /** Recursive delete that never follows symlinks: walkFileTree without
    * FOLLOW_LINKS visits a link as a terminal file, so only the link
    * entry itself is unlinked. */
  private def delete(f: java.io.File): Unit = {
    import java.nio.file._
    import java.nio.file.attribute.BasicFileAttributes
    Files.walkFileTree(f.toPath, new SimpleFileVisitor[Path] {
      override def visitFile(p: Path, a: BasicFileAttributes) = {
        Files.deleteIfExists(p); FileVisitResult.CONTINUE
      }
      override def postVisitDirectory(p: Path, e: java.io.IOException) = {
        Files.deleteIfExists(p); FileVisitResult.CONTINUE
      }
    }): Unit
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** md5(name:length:mtime of every *.parquet entry, one level of
    * children for directory-shaped tables), truncated to 12 hex chars.
    * Metadata-only — never reads data bytes, so the probe is O(|files|)
    * stat calls. */
  private def fingerprint(root: java.io.File): String = {
    def ls(f: java.io.File): Array[java.io.File] =
      Option(f.listFiles()).getOrElse(Array.empty).sortBy(_.getName)
    def sig(f: java.io.File): String =
      if (f.isDirectory)
        f.getName + ls(f).map(c =>
          s"${c.getName}:${c.length}:${c.lastModified}")
          .mkString("[", ",", "]")
      else s"${f.getName}:${f.length}:${f.lastModified}"
    val listing = ls(root).filter(_.getName.endsWith(".parquet"))
      .map(sig).mkString("|")
    md5hex(listing).take(12)
  }
}
