package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Per-round benchmark: one JSON metric line on stdout (also written to
  * BENCH_SELF.json). Each query runs in a FRESH SparkContext — round-2
  * judging showed cross-query contamination (async cleanup + GC debt
  * from a heavy neighbor) inflating cheap queries' wall-times up to 13×
  * in a shared session; a fresh context per query makes in-suite times
  * match isolated reruns. JIT/codegen warm-up amortizes across sessions
  * (same JVM); the per-session parquet-footer read is untimed.
  */
object Bench {
  private def mkSession(cpus: String): SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.ui.enabled", "false")
    // C/numpy-style wrap-around + null semantics (GraphBLAS reference
    // behavior); ANSI mode would throw on narrowing-cast overflow
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    // deterministic alphabetical order: run-to-run comparability
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val spark = mkSession(cpus)
      spark.sparkContext.setLogLevel("WARN")
      // untimed warm-up: executor init + parquet reader setup would
      // otherwise all land inside the timed region
      try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
      catch { case _: Throwable => }
      val t0 = System.nanoTime()
      val err: Option[String] =
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable =>
          Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200)) }
      val sec = (System.nanoTime() - t0) / 1e9
      spark.stop()
      System.gc() // settle heap before the next query's context starts
      (name, if (err.isEmpty) sec else -1.0, err)
    }
    def jq(s: String): String =
      "\"" + s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString } + "\""
    val qs = results.map { case (k, v, _) => jq(k) + ":" + v }.mkString("{", ",", "}")
    // failures excluded from the headline total and marked -1 per query
    val failed = results.collect { case (k, _, Some(e)) => s"${jq(k)}:${jq(e)}" }
    val total = results.collect { case (_, v, None) => v }.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":${failed.mkString("{", ",", "}")},"sf":"$sfDir"}"""
    Files.writeString(Paths.get("/root/repo/BENCH_SELF.json"), line + "\n")
    println(line)
  }
}
