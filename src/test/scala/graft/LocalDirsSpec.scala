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

  test("default pidAlive is portable process liveness, not a /proc path probe") {
    // ADVICE r7: on a platform without procfs a /proc/<pid> check
    // declares every sibling alive-JVM dead and deletes its live
    // shuffle dirs. The default must see THIS process as alive and a
    // never-allocated pid as dead, via ProcessHandle.
    val root = mkTree()
    val self = ProcessHandle.current().pid()
    val selfDir = new java.io.File(root, s"pid-$self")
    selfDir.mkdirs()
    LocalDirs.sweepStale(root) // default pidAlive
    assert(selfDir.exists(), "live JVM's own dir must survive the default sweep")
    // pid-11/pid-22 from the fixture are almost certainly dead pids on
    // a fresh container, but don't assert on host pid-table contents —
    // only the guaranteed-dead giant pid
    val dead = new java.io.File(root, "pid-4194304999")
    dead.mkdirs()
    LocalDirs.sweepStale(root)
    assert(!dead.exists(), "a never-allocated pid's dir must be swept")
  }

  test("fitsTmpfs: declared shuffle footprint gates tmpfs placement") {
    val gib = 1L << 30
    // no declaration -> today's behavior, tmpfs preferred
    assert(LocalDirs.fitsTmpfs(0L, None))
    // declared footprint within headroom -> stay on tmpfs
    assert(LocalDirs.fitsTmpfs(100L * gib, Some(64L)))
    // over-cap -> the run is redirected to disk, not OOM'd
    assert(!LocalDirs.fitsTmpfs(100L * gib, Some(128L)))
    assert(!LocalDirs.fitsTmpfs(0L, Some(1L)))
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
