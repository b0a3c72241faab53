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
  * Override with SPARK_GRAFT_LOCAL_DIR; falls back to the JVM tmpdir
  * when /dev/shm is missing or read-only.
  */
object LocalDirs {
  lazy val sparkLocalDir: String =
    sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) {
        val d = new java.io.File(shm, "graft-spark")
        d.mkdirs()
        d.getAbsolutePath
      } else System.getProperty("java.io.tmpdir")
    })
}
