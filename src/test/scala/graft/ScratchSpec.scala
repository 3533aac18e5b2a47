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

  test("prune skips symlinks and dirs without the ownership marker") {
    val d = Files.createTempDirectory("graft-scr4").toFile
    val f = new File(d, "t.parquet")
    Files.write(f.toPath, "aa".getBytes)
    val live = new File(Scratch.dir("guard", d.getPath))
    val tmp = live.getParentFile
    val prefix = live.getName.dropRight(12)
    // an unowned name-shaped sibling (no marker — this code never made it)
    val foreign = new File(tmp, prefix + "feedfeedfeed")
    foreign.mkdirs()
    Files.write(new File(foreign, "data").toPath, "x".getBytes)
    // a symlinked name-shaped sibling pointing OUTSIDE the scratch area,
    // with a forged marker — the worst case /tmp allows
    val victim = Files.createTempDirectory("graft-victim").toFile
    Files.write(new File(victim, "precious").toPath, "keep".getBytes)
    val link = new File(tmp, prefix + "abcdefabcdef")
    try {
      Files.createSymbolicLink(link.toPath, victim.toPath)
      Files.write(new File(tmp, link.getName + ".graft_owned").toPath,
        Array.empty[Byte])
    } catch { case _: UnsupportedOperationException => }
    Scratch.dir("guard", d.getPath) // triggers a prune pass
    assert(foreign.exists(), "unowned sibling must not be pruned")
    assert(new File(victim, "precious").exists(),
      "a symlink must never let the prune escape the scratch area")
    foreign.delete(); link.delete()
  }

  test("same basename, different path: artifacts never collide") {
    val a = Files.createTempDirectory("graft-twina").toFile
    val b = Files.createTempDirectory("graft-twinb").toFile
    val da = new File(a, "sf"); da.mkdir()
    val db = new File(b, "sf"); db.mkdir()
    Files.write(new File(da, "t.parquet").toPath, "aa".getBytes)
    Files.write(new File(db, "t.parquet").toPath, "aa".getBytes)
    val pa = new File(Scratch.dir("twin", da.getPath)); pa.mkdirs()
    Files.write(new File(pa, "_SUCCESS").toPath, Array.empty[Byte])
    // the other dataset shares the basename "sf" — its dir() call must
    // neither return pa's path nor prune pa
    val pb = Scratch.dir("twin", db.getPath)
    assert(pb != pa.getPath, "distinct datasets must get distinct dirs")
    assert(pa.exists(), "sibling dataset must not prune the other's artifact")
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
