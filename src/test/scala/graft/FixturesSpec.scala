package graft

import org.scalatest.funsuite.AnyFunSuite

/** Fixture-root GC (r8 advice #8): stale sf tags are vacuumed,
  * active/kept/young ones never are. */
class FixturesSpec extends AnyFunSuite {

  test("vacuum drops only stale non-kept tags; age guard protects live runs") {
    val root = new java.io.File(Fixtures.Root)
    root.mkdirs()
    def mk(tag: String, ageMs: Long): java.io.File = {
      val d = new java.io.File(root, tag)
      d.mkdirs()
      val f = new java.io.File(d, "part-0.parquet")
      java.nio.file.Files.write(f.toPath, "x".getBytes)
      val t = System.currentTimeMillis() - ageMs
      f.setLastModified(t); d.setLastModified(t)
      d
    }
    val stale = mk("sfTEST_stale", 10L * 3600 * 1000)   // 10h old
    val young = mk("sfTEST_young", 0)                   // just written
    val kept = mk("sfTEST_kept", 10L * 3600 * 1000)     // old but kept
    try {
      val dropped = Fixtures.vacuum(keepTags = Set("sfTEST_kept"))
      assert(dropped.contains("sfTEST_stale"))
      assert(!stale.exists(), "stale tag must be deleted")
      assert(young.exists(), "age guard: a live run's tag is untouched")
      assert(kept.exists(), "kept tag is untouched at any age")
      // a stale DIR with one fresh file inside is treated as live
      // (newest-mtime recursion, not the dir's own mtime)
      val mixed = mk("sfTEST_mixed", 10L * 3600 * 1000)
      java.nio.file.Files.write(
        new java.io.File(mixed, "fresh.parquet").toPath, "y".getBytes)
      assert(!Fixtures.vacuum(Set.empty).contains("sfTEST_mixed"))
      assert(mixed.exists())
    } finally {
      Seq("sfTEST_stale", "sfTEST_young", "sfTEST_kept", "sfTEST_mixed")
        .foreach { t =>
          val d = new java.io.File(root, t)
          Option(d.listFiles()).toSeq.flatten.foreach(_.delete()); d.delete()
        }
    }
  }
}
