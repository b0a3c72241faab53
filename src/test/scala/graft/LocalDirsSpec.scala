package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The tmpfs session-dir sweep: dead-JVM dirs are removed, live and
  * non-pid entries survive (tmpfs bytes are guest RAM — occupancy
  * must stay bounded across fresh-context bench sessions).
  */
class LocalDirsSpec extends AnyFunSuite {

  private def mkTree(): java.io.File = {
    val root = Files.createTempDirectory("graft-localdirs-spec").toFile
    def dirWithFile(name: String): Unit = {
      val d = new java.io.File(root, name)
      d.mkdirs()
      Files.writeString(new java.io.File(d, "shuffle.data").toPath, "x" * 64)
    }
    dirWithFile("pid-11")   // dead in the fake pid table below
    dirWithFile("pid-22")   // alive
    dirWithFile("pid-abc")  // malformed — never touched
    dirWithFile("blockmgr") // non-session entry — never touched
    root
  }

  test("sweepStale removes only dead pid-stamped dirs") {
    val root = mkTree()
    val removed = LocalDirs.sweepStale(root, pidAlive = _ == 22L)
    assert(removed === 1)
    val left = root.listFiles().map(_.getName).toSet
    assert(left === Set("pid-22", "pid-abc", "blockmgr"))
  }

  test("sweep deletes recursively (dir with content disappears)") {
    val root = mkTree()
    LocalDirs.sweepStale(root, pidAlive = _ => false)
    assert(!new java.io.File(root, "pid-11").exists())
    assert(!new java.io.File(root, "pid-22").exists())
    assert(new java.io.File(root, "pid-abc").exists())
  }

  test("occupancyBytes sums file sizes; zero for a missing root") {
    val root = mkTree()
    assert(LocalDirs.occupancyBytes(root) === 4 * 64L)
    assert(LocalDirs.occupancyBytes(new java.io.File(root, "nope")) === 0L)
  }

  test("sparkLocalDir is writable and honors the env override contract") {
    // can't fork a JVM per env combination here; assert the resolved
    // default is a usable directory (pid-stamped under /dev/shm when
    // available, java.io.tmpdir otherwise)
    val d = new java.io.File(LocalDirs.sparkLocalDir)
    assert(d.isDirectory && d.canWrite)
    if (sys.env.get("SPARK_GRAFT_LOCAL_DIR").isEmpty &&
        new java.io.File("/dev/shm").canWrite)
      assert(d.getName == s"pid-${ProcessHandle.current().pid()}")
  }
}
