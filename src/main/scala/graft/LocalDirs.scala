package graft

/** Where Spark's shuffle/spill/block files go for the library's own
  * mains and tests.
  *
  * Round-6 measurement (PERF_NOTES §5): this container's block device
  * writes at ~40 MB/s and burns ~24 ms/MB of kernel CPU in the virtio
  * path, while 126 GiB of tmpfs sits idle — shuffle-heavy queries ran
  * 10–20× slower than their round-5 draws on identical code purely
  * from spark.local.dir pointing at the slow device. On a RAM-rich
  * single node, pointing spark.local.dir at tmpfs is the standard fix
  * (a real cluster provisions fast local SSDs for exactly this;
  * shuffle-file placement is a deployment concern, not a plan
  * concern — no query plan changes).
  *
  * tmpfs bytes are RAM, so occupancy must be BOUNDED: each JVM gets
  * its own pid-stamped session dir (removed by a shutdown hook on
  * clean exit), and at first use every sibling session dir whose JVM
  * is gone is swept — a crashed run's shuffle files can't accumulate
  * across the 81 fresh-context bench sessions or across rounds.
  *
  * Override with SPARK_GRAFT_LOCAL_DIR; the tmpfs root is per-user
  * (graft-spark-<user.name>) so one user's ownership never blocks
  * another's sessions; falls back to the JVM tmpdir when /dev/shm
  * (or this user's root) is missing or unwritable.
  */
object LocalDirs {

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }

  /** Delete sibling `pid-<n>` session dirs whose process no longer
    * exists. Returns how many dirs were removed. Non-pid-stamped
    * entries are never touched.
    *
    * Default liveness is `ProcessHandle.of(pid)`, not a /proc lookup:
    * on a platform without procfs a path check would declare every
    * sibling pid dead and delete the live shuffle dirs of concurrently
    * running sessions. ProcessHandle is portable; the parameter stays
    * injectable for tests.
    */
  private[graft] def sweepStale(root: java.io.File,
      pidAlive: Long => Boolean =
        p => ProcessHandle.of(p).map[Boolean](_.isAlive).orElse(false)): Int = {
    val stale = Option(root.listFiles()).getOrElse(Array.empty).filter { f =>
      f.isDirectory && f.getName.startsWith("pid-") &&
        f.getName.stripPrefix("pid-").toLongOption.exists(p => !pidAlive(p))
    }
    stale.foreach(deleteRecursively)
    stale.length
  }

  /** bytes currently used under the graft-spark tmpfs root — the
    * occupancy number PERF_NOTES tracks around a bench run
    */
  private[graft] def occupancyBytes(root: java.io.File): Long = {
    def sz(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).map(sz).sum
      else f.length()
    if (root.exists()) sz(root) else 0L
  }

  /** Occupancy guard: tmpfs bytes are RAM, so a shuffle tier whose
    * spill exceeds the tmpfs headroom must NOT land there — at the
    * 100M-edge graph tier a 5× larger run would eat the 125 GB budget
    * and OOM the host mid-job (BASELINE_SELF round-7 note). A caller
    * that knows its expected peak shuffle footprint declares it via
    * `SPARK_GRAFT_SHUFFLE_GB`; when the declared footprint does not
    * fit the tmpfs usable space, placement falls back to the (slow
    * but disk-backed) JVM tmpdir and says so on stderr — the failure
    * mode becomes a visible placement decision, not an OOM. With no
    * declaration the behavior is unchanged (tmpfs preferred).
    */
  private[graft] def fitsTmpfs(usableBytes: Long, declaredGb: Option[Long]): Boolean =
    declaredGb.forall(gb => usableBytes >= gb * (1L << 30))

  lazy val sparkLocalDir: String =
    sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", {
      val fallback = System.getProperty("java.io.tmpdir")
      val shm = new java.io.File("/dev/shm")
      val declaredGb = sys.env.get("SPARK_GRAFT_SHUFFLE_GB").flatMap(_.toLongOption)
      if (!(shm.isDirectory && shm.canWrite)) fallback
      else if (!fitsTmpfs(shm.getUsableSpace, declaredGb)) {
        System.err.println(
          s"graft: declared shuffle footprint ${declaredGb.get} GiB exceeds tmpfs " +
            s"headroom ${shm.getUsableSpace >> 30} GiB - spark.local.dir falls " +
            s"back to disk ($fallback); expect slower shuffles instead of an OOM")
        fallback
      } else {
        // per-user root: on a multi-user host a foreign-owned shared
        // dir would force the fallback to the (slow) JVM tmpdir; a
        // user-suffixed root keeps each user on tmpfs independently
        val root = new java.io.File(shm,
          s"graft-spark-${sys.props.getOrElse("user.name", "anon")}")
        root.mkdirs()
        // mkdirs() returns false when the dir pre-exists OR when
        // creation failed — verify writability directly instead of
        // failing every session at startup
        if (!(root.isDirectory && root.canWrite)) fallback
        else {
          sweepStale(root)
          val mine = new java.io.File(root, s"pid-${ProcessHandle.current().pid()}")
          mine.mkdirs()
          if (!(mine.isDirectory && mine.canWrite)) fallback
          else {
            // clean exits leave nothing behind; hard kills are covered
            // by the next JVM's sweepStale
            Runtime.getRuntime.addShutdownHook(
              new Thread(() => deleteRecursively(mine), "graft-localdir-cleanup"))
            mine.getAbsolutePath
          }
        }
      }
    })
}
