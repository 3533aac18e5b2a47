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
  */
object Scratch {

  /** /tmp/graft_<kind>_<sfTag>_<fp12> for dataset `sfDir`. Obsolete
    * siblings — same kind+tag, DIFFERENT fingerprint, i.e. artifacts of
    * a dataset that no longer exists in that shape — are pruned here, so
    * repeated regenerations don't accumulate dead pay-once layouts in
    * /tmp (ADVICE r9). Only the exact `graft_<kind>_<tag>_<hex12>`
    * pattern is touched; the current fingerprint's dir is never pruned. */
  def dir(kind: String, sfDir: String): String = {
    val root = new java.io.File(sfDir)
    val tag = root.getName.replaceAll("[^A-Za-z0-9]", "_")
    val fp = fingerprint(root)
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val prefix = s"graft_${kind}_${tag}_"
    Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter { f =>
        f.isDirectory && f.getName.startsWith(prefix) &&
          f.getName.stripPrefix(prefix).matches("[0-9a-f]{12}") &&
          f.getName != prefix + fp
      }
      .foreach(delete)
    new java.io.File(tmp, prefix + fp).getPath
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(delete)
    f.delete(): Unit
  }

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
    java.security.MessageDigest.getInstance("MD5")
      .digest(listing.getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString
  }
}
