package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core._
import graft.algo.FastSV

/** Self-baselines per BASELINE.md: FastSV wall-clock/iteration rate on
  * synthetic symmetric graphs at fixed edge counts, and mxm/mxv
  * throughput (nnz/sec) — the two hot operators of every GraphBLAS
  * workload. Graphs are deterministic (Knuth-hash edge endpoints over
  * spark.range — no RNG).
  *
  * Run: sbt "runMain graft.SelfBaseline [edges ...]"; results recorded
  * in BASELINE_SELF.md.
  */
object SelfBaseline {

  def syntheticGraph(spark: SparkSession, nEdges: Long): GrbMatrix = {
    val n = nEdges / 8 // avg degree ~16 after symmetrization
    // murmur3 endpoints (deterministic, aperiodic — a modular-linear
    // generator collapses to ~2n distinct pairs)
    val e = spark.range(nEdges).select(
      pmod(hash(col("id") * 2), lit(n)).cast("long").as("a"),
      pmod(hash(col("id") * 2 + 1), lit(n)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    val sym = e.select(col("a").as("i"), col("b").as("j"))
      .unionByName(e.select(col("b").as("i"), col("a").as("j")))
      .distinct()
      .select(col("i"), col("j"), lit(1L).as("v"))
    new GrbMatrix(sym, n, n)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
      else Seq(1000000L, 10000000L)
    for (nEdges <- sizes) {
      val a = new GrbMatrix(syntheticGraph(spark, nEdges).df.cache(),
        nEdges / 8, nEdges / 8)
      val nnz = a.nvals // materializes the cache
      // mxv throughput: one min_second step (the FastSV kernel)
      val ident = spark.range(a.nrows).select(col("id").as("i"), col("id").as("v"))
      val gp = new GrbVector(ident, a.nrows)
      var t0 = System.nanoTime()
      a.mxv(gp, Ops.minSecond, broadcastVec = false).df.count()
      val mxvSec = (System.nanoTime() - t0) / 1e9
      // mxm throughput: A @ A over plus_times (count materializes)
      t0 = System.nanoTime()
      a.mxm(a, Ops.plusTimes).df.count()
      val mxmSec = (System.nanoTime() - t0) / 1e9
      // FastSV end-to-end
      t0 = System.nanoTime()
      val labels = FastSV.connectedComponents(a)
      val nComponents = labels.df.select(col("v")).distinct().count()
      val ccSec = (System.nanoTime() - t0) / 1e9
      println(f"""{"edges":$nEdges,"nnz":$nnz,"mxv_sec":$mxvSec%.2f,"mxv_nnz_per_sec":${(nnz / mxvSec).toLong},"mxm_sec":$mxmSec%.2f,"fastsv_sec":$ccSec%.2f,"components":$nComponents}""")
      a.df.unpersist()
    }
    spark.stop()
  }
}
