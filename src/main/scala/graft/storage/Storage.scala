package graft.storage

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** File metadata row of the catalog relation (SURVEY.md S2; schema mirrors
  * /root/reference/etl_payroll_pipeline.py:41-49). `ingestOrd` is the
  * engine-added listing-order ordinal (H4) that makes first-match selection
  * deterministic. */
final case class FileMeta(
    file_name: String,
    file_path: String,
    extension: String,
    file_id: String,
    size_bytes: Long,
    modified_at: String,
    created_at: String,
    _ingest_ord: Long)

/** S1/S9 — storage boundary. The reference talks to Box cloud storage
  * (ref 11-24); network egress is out of scope here, so the trait isolates
  * auth/list/read/write behind an interface with a local-filesystem
  * implementation for tests and pipelines. A Box (or S3/HDFS) impl would
  * plug in without touching any operator. */
trait StorageClient {
  def listRecursive(root: String): Seq[FileMeta]
  def readBytes(path: String): Array[Byte]
  def writeBytes(folder: String, name: String, bytes: Array[Byte]): String
}

/** Local-filesystem storage. Listing is one recursive walk (the reference
  * issues one metadata HTTP GET per file — an N+1 pattern deliberately not
  * reproduced; SURVEY §3.1). Walk order is sorted for determinism. */
final class LocalFsStorage extends StorageClient {

  override def listRecursive(root: String): Seq[FileMeta] = {
    def walk(dir: Path): Seq[Path] = {
      val entries = Files.list(dir).iterator().asScala.toSeq.sortBy(_.toString)
      entries.flatMap { p =>
        if (Files.isDirectory(p)) walk(p) else Seq(p)
      }
    }
    val base = Paths.get(root)
    if (!Files.exists(base)) Seq.empty
    else walk(base).zipWithIndex.map { case (p, i) =>
      val name = p.getFileName.toString
      val ext = {
        val dot = name.lastIndexOf('.')
        if (dot >= 0) name.substring(dot).toLowerCase else ""
      }
      val attrs = Files.readAttributes(
        p, classOf[java.nio.file.attribute.BasicFileAttributes])
      FileMeta(
        file_name = name,
        file_path = p.toString,
        extension = ext,
        file_id = p.toString,
        size_bytes = attrs.size(),
        modified_at = attrs.lastModifiedTime().toString,
        created_at = attrs.creationTime().toString,
        _ingest_ord = i.toLong)
    }
  }

  override def readBytes(path: String): Array[Byte] =
    Files.readAllBytes(Paths.get(path))

  override def writeBytes(folder: String, name: String,
                          bytes: Array[Byte]): String = {
    val dir = Paths.get(folder)
    Files.createDirectories(dir)
    val out = dir.resolve(name)
    Files.write(out, bytes)
    out.toString
  }
}
