package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core._

/** Single-source shortest-path COUNTING — the σ (sigma) forward wave
  * of Brandes betweenness centrality, and the plus_times counterpart
  * of [[Bfs.levels]]'s min_plus traversal: where BFS asks "how far",
  * this asks "how far, and along HOW MANY distinct shortest paths".
  * In GraphBLAS terms each round is a plus_times mxv of the frontier's
  * path counts through the adjacency, masked to unvisited vertices —
  * σ(v) = Σ σ(u) over neighbours u at depth d(v)−1, which is exactly
  * what the product delivers because the frontier holds precisely the
  * depth-(k−1) vertices (levels are final on first assignment, so the
  * anti-join mask never needs to retract a count).
  *
  * Determinism: σ values are exact integer path counts — no floats
  * anywhere, so the result is oracle-replayable round-for-round.
  * Counts grow multiplicatively with branching (σ can reach b^depth);
  * int64 holds any realistic diameter×branching at bench scale, and a
  * corpus where counts overflow 2^63 needs the log-space variant —
  * documented rather than silently saturated.
  *
  * Scale shape (the Bfs/Mis discipline): adjacency repartitioned ONCE
  * on the contraction key and cached — every round's mxv reuses the
  * exchange shuffle-free; per round one equi-join + one hash agg +
  * one anti-join against the visited set, all O(nnz_frontier);
  * per-round state eagerly localCheckpoint'ed with superseded blocks
  * freed. Termination is data-driven (the frontier empties).
  */
object SpCount {

  /** @param a      symmetric adjacency; values ignored (structure only)
    * @param source start vertex; d(source)=0, σ(source)=1
    * @return (i, d, sigma): distance and shortest-path count per
    *         reached vertex; unreachable vertices are absent
    */
  def counts(a: GrbMatrix, source: Long, maxIter: Int = 100): DataFrame = {
    if (a.nrows != a.ncols) GraphblasException.dimensionMismatch(
      s"spcount adjacency must be square: ${a.nrows}x${a.ncols}")
    val spark = a.spark
    val hop = new GrbMatrix(
      a.df.select(col("i"), col("j"), lit(1L).as("v"))
        .repartition(col("j")).cache(), a.nrows, a.ncols)
    var res: DataFrame = spark.range(1)
      .select(lit(source).as("i"), lit(0L).as("d"), lit(1L).as("sigma"))
      .localCheckpoint(true)
    var frontier: DataFrame = res.select(col("i"), col("sigma").as("v"))
    var prevRes = Iterate.checkpointRdd(res)
    var prevNext: Option[org.apache.spark.rdd.RDD[_]] = None
    var k = 0L
    var n = 1L
    while (n > 0 && k < maxIter) {
      k += 1
      val f = new GrbVector(frontier, a.nrows)
      // plus_times wave: every neighbour of a frontier vertex receives
      // the sum of its frontier-neighbours' path counts
      val cand = hop.mxv(f, Ops.plusTimes).df
      // complement mask: only first-touch (= shortest-distance) counts
      // survive; eager checkpoint — both the count() and the union
      // below hang off it
      val next = cand.join(res.select(col("i")), Seq("i"), "left_anti")
        .localCheckpoint(true)
      val nextRdd = Iterate.checkpointRdd(next)
      n = next.count()
      if (n > 0) {
        val nextRes = res.unionByName(
          next.select(col("i"), lit(k).as("d"), col("v").as("sigma")))
          .localCheckpoint(true)
        prevRes.foreach(_.unpersist(false))
        prevNext.foreach(_.unpersist(false))
        prevRes = Iterate.checkpointRdd(nextRes)
        prevNext = nextRdd
        res = nextRes
        frontier = next.select(col("i"), col("v"))
      } else {
        nextRdd.foreach(_.unpersist(false))
      }
    }
    hop.df.unpersist(false)
    if (sys.env.contains("SPARK_GRAFT_DEBUG_ROUNDS"))
      System.err.println(s"graft.SpCount rounds=$k")
    res
  }
}
