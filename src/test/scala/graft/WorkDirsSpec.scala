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
    // a sibling owned by a LIVE process (this test JVM's parent — sshd/
    // sbt — or ourselves; use our own pid +  a suffix-free live pid)
    val livePid = ProcessHandle.current().pid()
    val live = mkDirWithFile(s"graft_${family}_$livePid")
    // non-numeric suffix: not ours to judge, must survive
    val weird = mkDirWithFile(s"graft_${family}_notapid")
    try {
      val mine = WorkDirs.acquire(family)
      // our own dir IS the live-pid dir — acquire wiped its content
      assert(mine.getAbsolutePath === live.getAbsolutePath)
      assert(Option(mine.listFiles).forall(_.isEmpty))
      assert(!dead.exists(), "dead-PID sibling not swept")
      assert(weird.exists(), "non-PID-suffixed sibling must not be touched")
      // re-acquisition wipes content again (per-evaluation freshness)
      java.nio.file.Files.write(new java.io.File(mine, "y").toPath,
        "stale".getBytes("UTF-8"))
      val again = WorkDirs.acquire(family)
      assert(again.getAbsolutePath === mine.getAbsolutePath)
      assert(Option(again.listFiles).forall(_.isEmpty))
    } finally {
      Seq(dead, live, weird).foreach { d =>
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
