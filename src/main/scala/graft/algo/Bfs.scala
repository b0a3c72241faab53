package graft.algo

import Iterate.FreshOps
import org.apache.spark.sql.functions._
import graft.core._

/** BFS levels — the GraphBLAS textbook traversal (alongside FastSV the
  * second canonical composition the reference's API exists to express:
  * frontier expansion IS a min_plus matrix-vector product; see e.g.
  * reference README's GraphBLAS positioning and dask_grblas/matrix.py
  * mxv:449-454).
  *
  * Each round: cand = A ⊗min_plus f (every neighbour of a labeled
  * vertex offered level+1), then f' = f ⊕min cand. Levels are FINAL
  * when first assigned (round k labels exactly the distance-k
  * frontier), so the key set grows monotonically and values never
  * change — value stability ≡ "nvals stopped growing", and the
  * prev-vs-next compare is folded into each round's checkpoint job
  * (Iterate.vectorLoopStable: one job + a limit-1 scan per round).
  *
  * Scale shape: the adjacency is repartitioned ONCE on the contraction
  * key and cached, so every round's mxv reuses the exchange (the
  * FastSV pattern); per-round state is eagerly localCheckpoint'ed by
  * Iterate.vectorLoop, keeping the plan O(one round). Work per round
  * is one equi-join frontier×adjacency + one hash agg — at 100 TB the
  * cost profile is rounds × (join on j + groupBy i), never n².
  */
object Bfs {

  /** @param a      symmetric (undirected) adjacency matrix; edge
    *               values are ignored — only structure is traversed
    * @param source start vertex; levels(source) = 0
    * @return sparse level vector: absent = unreachable
    *
    * Loop shape (round-10 refactor): levels are FINAL on first touch,
    * so each round needs only the depth-k FRONTIER — one min_plus mxv
    * of the frontier slice (every value in it is k, so the product
    * offers exactly k+1), an anti-join against the visited set, and a
    * union into the result. The previous full-vector round
    * (`f ⊕min A⊗f` under Iterate.vectorLoopStable) re-joined the
    * whole accumulated level vector every round; measured at the 20M-
    * nnz tier the frontier loop draws 13.9 s vs 46.7 s
    * (BASELINE_SELF round-10, via the identically-shaped SpCount).
    * SSSP must KEEP the full-vector value-stability round — its
    * distances improve after first assignment.
    */
  def levels(a: GrbMatrix, source: Long, maxIter: Int = 100): GrbVector = {
    if (a.nrows != a.ncols) GraphblasException.dimensionMismatch(
      s"bfs adjacency must be square: ${a.nrows}x${a.ncols}")
    val spark = a.spark
    // traverse structure: weight 1 per edge makes min_plus's mult a
    // pure hop count; co-partition by the contracted key once
    val hop = new GrbMatrix(
      a.df.select(col("i"), col("j"), lit(1L).as("v"))
        .repartition(col("j")).cache(),
      a.nrows, a.ncols)
    var res: org.apache.spark.sql.DataFrame = spark.range(1)
      .select(lit(source).as("i"), lit(0L).as("v")).freshCheckpoint(true)
    var frontier = res
    var prevRes = Iterate.checkpointRdd(res)
    var prevNext: Option[org.apache.spark.rdd.RDD[_]] = None
    var k = 0
    var n = 1L
    while (n > 0 && k < maxIter) {
      k += 1
      val cand = hop.mxv(new GrbVector(frontier, a.nrows), Ops.minPlus).df
      // frontier size rides the checkpoint job as an observed metric
      // (Iterate.checkpointWithProbe) — no per-round count job
      val (next, probeRow) = Iterate.checkpointWithProbe(
        cand.join(res.select(col("i")), Seq("i"), "left_anti"),
        count(lit(1)).as("n"))
      val nextRdd = Iterate.checkpointRdd(next)
      n = probeRow.getLong(0)
      if (n > 0) {
        val nextRes = res.unionByName(next).freshCheckpoint(true)
        prevRes.foreach(_.unpersist(false))
        prevNext.foreach(_.unpersist(false))
        prevRes = Iterate.checkpointRdd(nextRes)
        prevNext = nextRdd
        res = nextRes
        frontier = next
      } else {
        nextRdd.foreach(_.unpersist(false))
      }
    }
    hop.df.unpersist(false)
    new GrbVector(res, a.nrows)
  }

  /** Multi-source BFS — the MATRIX-frontier idiom (the GraphBLAS
    * answer to "run k BFS traversals at once"): the frontier is a
    * k×n Boolean MATRIX F (one row per source), each round ONE
    * F·A mxm expands every traversal simultaneously, and the
    * anti-join mask is keyed on (source, vertex). One k-fold-wider
    * join per round instead of k sequential BFS runs — k traversals
    * share every scan, shuffle, and scheduling barrier, which is the
    * entire point at 100 TB (per-round fixed cost is paid once, not
    * k times). The frontier loop discipline of [[levels]] applies
    * per source pair: levels are final on first touch.
    *
    * @param sources distinct source vertex ids (each becomes a row of
    *                the frontier matrix, keyed by its own id)
    * @return (s, i, d): level of vertex i from source s; unreachable
    *         pairs absent
    */
  def multiSourceLevels(a: GrbMatrix, sources: Seq[Long],
      maxIter: Int = 100): org.apache.spark.sql.DataFrame = {
    if (a.nrows != a.ncols) GraphblasException.dimensionMismatch(
      s"msbfs adjacency must be square: ${a.nrows}x${a.ncols}")
    val spark = a.spark
    val hop = new GrbMatrix(
      a.df.select(col("i"), col("j"), lit(1L).as("v"))
        .repartition(col("i")).cache(),
      a.nrows, a.ncols)
    val srcRows = sources.distinct.map(s => (s, s, 0L))
    var res: org.apache.spark.sql.DataFrame = spark
      .createDataFrame(srcRows).toDF("s", "i", "d").freshCheckpoint(true)
    var frontier = res.select(col("s"), col("i"))
    var prevRes = Iterate.checkpointRdd(res)
    var prevNext: Option[org.apache.spark.rdd.RDD[_]] = None
    var k = 0L
    var n = srcRows.size.toLong
    while (n > 0 && k < maxIter) {
      k += 1
      // F·A: contract the frontier's vertex column against the
      // adjacency's row key — every source's expansion in one product
      val f = new GrbMatrix(
        frontier.select(col("s").as("i"), col("i").as("j"), lit(1L).as("v")),
        a.nrows, a.nrows)
      val prod = f.mxm(hop, Ops.plusPair).df
      val (next, probeRow) = Iterate.checkpointWithProbe(
        prod.select(col("i").as("s"), col("j").as("i"))
          .join(res.select(col("s"), col("i")), Seq("s", "i"), "left_anti"),
        count(lit(1)).as("n"))
      val nextRdd = Iterate.checkpointRdd(next)
      n = probeRow.getLong(0)
      if (n > 0) {
        val nextRes = res.unionByName(
          next.select(col("s"), col("i"), lit(k).as("d"))).freshCheckpoint(true)
        prevRes.foreach(_.unpersist(false))
        prevNext.foreach(_.unpersist(false))
        prevRes = Iterate.checkpointRdd(nextRes)
        prevNext = nextRdd
        res = nextRes
        frontier = next
      } else {
        nextRdd.foreach(_.unpersist(false))
      }
    }
    hop.df.unpersist(false)
    res
  }

  /** Single-source shortest paths over positive edge weights — the
    * weighted sibling of [[levels]]: the identical min_plus round, but
    * the mult leg adds the EDGE WEIGHT instead of a unit hop
    * (Bellman-Ford as semiring iteration). Unlike BFS, a distance can
    * improve after first assignment (a longer-but-lighter path), so
    * convergence is VALUE stability, not nvals growth; the compare is
    * folded into each round's checkpoint as a change-flag column
    * (Iterate.vectorLoopStable — no extra isequal join+action per
    * round); rounds to fixpoint ≤ the max hop count of any shortest
    * path.
    *
    * @param a symmetric weighted adjacency; parallel edges should be
    *          pre-combined with min (fromDF dupAgg)
    */
  def sssp(a: GrbMatrix, source: Long, maxIter: Int = 100): GrbVector = {
    if (a.nrows != a.ncols) GraphblasException.dimensionMismatch(
      s"sssp adjacency must be square: ${a.nrows}x${a.ncols}")
    val spark = a.spark
    val A = new GrbMatrix(a.df.repartition(col("j")).cache(), a.nrows, a.ncols)
    val init = GrbVector.fromDF(
      spark.range(1).select(lit(source).as("i"), lit(0L).as("v")), a.nrows)
    val out = Iterate.vectorLoopStable(init, maxIter) { (f, _) =>
      f.ewiseAdd(A.mxv(f, Ops.minPlus), Ops.min)
    }
    A.df.unpersist(false)
    out
  }
}
