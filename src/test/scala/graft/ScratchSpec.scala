package graft

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The pay-once scratch path must miss its cache when the source data
  * changes — a basename-only key silently serves a stale layout after a
  * dataset regeneration (the `_SUCCESS` guard can't tell). */
class ScratchSpec extends AnyFunSuite {

  test("scratch dir is stable for unchanged data, new for changed data") {
    val d = Files.createTempDirectory("graft-scr").toFile
    val f = new File(d, "t.parquet")
    Files.write(f.toPath, "aa".getBytes)
    val p1 = Scratch.dir("x", d.getPath)
    assert(p1 == Scratch.dir("x", d.getPath), "same data, same path")
    assert(new File(p1).getName.startsWith("graft_x_"))
    Files.write(f.toPath, "aaa".getBytes) // content (length) changed
    val p2 = Scratch.dir("x", d.getPath)
    assert(p1 != p2, "changed data must miss the pay-once cache")
  }

  test("obsolete-fingerprint siblings are pruned; the live dir survives") {
    val d = Files.createTempDirectory("graft-scr3").toFile
    val f = new File(d, "t.parquet")
    Files.write(f.toPath, "aa".getBytes)
    val p1 = new File(Scratch.dir("prune", d.getPath))
    p1.mkdirs()
    Files.write(new File(p1, "_SUCCESS").toPath, Array.empty[Byte])
    // regenerate the dataset → new fingerprint; asking for the new dir
    // must remove the stale artifact
    Files.write(f.toPath, "aaab".getBytes)
    val p2 = new File(Scratch.dir("prune", d.getPath))
    assert(p1.getPath != p2.getPath)
    assert(!p1.exists(), "stale pay-once artifact must be pruned")
    // the live dir is never pruned by a repeat call
    p2.mkdirs()
    Files.write(new File(p2, "_SUCCESS").toPath, Array.empty[Byte])
    assert(new File(Scratch.dir("prune", d.getPath), "_SUCCESS").exists())
    // a different kind's artifact is untouched
    val other = new File(Scratch.dir("prune2", d.getPath)); other.mkdirs()
    Scratch.dir("prune", d.getPath)
    assert(other.exists())
  }

  test("directory-shaped tables fingerprint their children") {
    val d = Files.createTempDirectory("graft-scr2").toFile
    val t = new File(d, "t.parquet"); t.mkdir()
    Files.write(new File(t, "part-0").toPath, "aa".getBytes)
    val p1 = Scratch.dir("x", d.getPath)
    Files.write(new File(t, "part-1").toPath, "bb".getBytes)
    assert(p1 != Scratch.dir("x", d.getPath),
      "a new part file inside a table dir must change the fingerprint")
  }
}
