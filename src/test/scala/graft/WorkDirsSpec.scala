package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the [[WorkDirs]] lifecycle — the tmpdir-leak fix the round-17
  * advice asked for: PID-suffixed dirs from DEAD JVMs are swept on the
  * first acquisition of their family, live siblings are left alone, and
  * re-acquisition wipes content (the per-evaluation freshness bench
  * reruns rely on).
  */
class WorkDirsSpec extends AnyFunSuite {

  private val tmp = new java.io.File(sys.props("java.io.tmpdir"))

  private def mkDirWithFile(name: String): java.io.File = {
    val d = new java.io.File(tmp, name)
    d.mkdirs()
    java.nio.file.Files.write(new java.io.File(d, "x").toPath,
      "leftover".getBytes("UTF-8"))
    d
  }

  test("acquire sweeps dead-PID siblings, keeps live ones, wipes own content") {
    val family = s"wdspec${System.nanoTime()}" // unique per run: the sweep
    // is once-per-family-per-JVM, so a reused family would skip it
    // a sibling whose PID can never be alive (pid_max is < 2^22 on
    // Linux; 4194304+ is unallocatable)
    val dead = mkDirWithFile(s"graft_${family}_9999999")
    // a sibling owned by a LIVE process that is NOT us — PID 1 (init)
    // always exists; using our own PID would be skipped by the
    // name-equality check before the liveness probe ever ran, gating
    // nothing
    assert(ProcessHandle.of(1L).isPresent, "test needs PID 1 visible")
    val live = mkDirWithFile(s"graft_${family}_1")
    // non-numeric suffix: not ours to judge, must survive
    val weird = mkDirWithFile(s"graft_${family}_notapid")
    // non-positive suffix: ProcessHandle.of throws on it — must be left
    // alone, not crash the acquire
    val negative = mkDirWithFile(s"graft_${family}_-1")
    try {
      val mine = WorkDirs.acquire(family)
      assert(mine.getName === s"graft_${family}_" +
        ProcessHandle.current().pid())
      assert(Option(mine.listFiles).forall(_.isEmpty))
      assert(!dead.exists(), "dead-PID sibling not swept")
      assert(live.exists(), "live-PID sibling must not be touched")
      assert(new java.io.File(live, "x").exists(),
        "live-PID sibling content must survive")
      assert(weird.exists(), "non-PID-suffixed sibling must not be touched")
      assert(negative.exists(), "non-positive suffix must not be touched")
      // re-acquisition wipes content again (per-evaluation freshness)
      java.nio.file.Files.write(new java.io.File(mine, "y").toPath,
        "stale".getBytes("UTF-8"))
      val again = WorkDirs.acquire(family)
      assert(again.getAbsolutePath === mine.getAbsolutePath)
      assert(Option(again.listFiles).forall(_.isEmpty))
    } finally {
      Seq(dead, live, weird, negative).foreach { d =>
        Option(d.listFiles).foreach(_.foreach(_.delete()))
        d.delete()
      }
    }
  }

  test("unsafe family names are refused") {
    intercept[IllegalArgumentException] {
      WorkDirs.acquire("../../etc")
    }
    intercept[IllegalArgumentException] {
      WorkDirs.acquire("a b")
    }
  }
}
