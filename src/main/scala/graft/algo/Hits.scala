package graft.algo

import Iterate.FreshOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core._

/** HITS (Kleinberg hubs-and-authorities) as alternating GraphBLAS
  * products: authority = Aᵀ·hub (a vxm), hub = A·authority (an mxv),
  * each round re-normalized so the maximum score is exactly the ppm
  * scale — the mutual-reinforcement ranking for directed/bipartite
  * graphs where PageRank's single score conflates "points at good
  * things" with "is pointed at" (reference surface: composes the
  * mxv/vxm/reduce/apply ops of dask_grblas matrix.py/vector.py).
  *
  * Determinism: classic HITS L2-normalizes — irrational, not oracle-
  * replayable. This engine normalizes by the MAX component instead
  * (same fixpoint direction: both converge on the principal
  * eigenvector of AᵀA/AAᵀ up to scale), in exact integer arithmetic:
  * score′ = (score · 10⁶) DIV max(score). Every round is integer,
  * the max attach is a lazy broadcast ≤1-row scalar (applyRightScalar
  * — no driver materialization in the loop body), and a fixed round
  * count makes the whole run bit-for-bit SQL-replayable.
  *
  * Scale shape: the adjacency is cached ONCE and reused by both
  * orientations (vxm contracts on i, mxv on j — each round's two
  * products shuffle only the current O(n) score vector, never the
  * adjacency); each round is two equi-joins + two hash aggs
  * (map-side partials) + two broadcast scalar attaches + one reduce
  * per normalize, O(nnz) per round. Per-round state eagerly
  * localCheckpoint'ed, superseded blocks freed (the Iterate
  * discipline). Overflow bound: a pre-normalize sum is ≤ deg_max·10⁶
  * and the scale multiply keeps every intermediate ≤ deg_max·10¹² —
  * int64-safe while deg_max < 9·10⁶; documented, not silently
  * saturated.
  */
object Hits {

  /** one normalize step: v′ = (v · scale) DIV max(v), the max bound
    * as a LAZY broadcast scalar so the loop body stays one plan
    */
  private def normalize(v: GrbVector, scale: Long): GrbVector =
    v.applyRight(Ops.times, lit(scale))
      .applyRightScalar(Ops.floordiv, v.reduce(Ops.maxMonoid))

  /** @param a      directed adjacency (i → j); values ignored
    * @param rounds fixed iteration count (oracle-replayable)
    * @return (i, hub_ppm, auth_ppm): hub score for vertices with
    *         out-edges, authority for vertices with in-edges, 0 for
    *         the side a vertex does not participate in; max of each
    *         column is exactly 10⁶ every round
    */
  def scores(a: GrbMatrix, rounds: Int = 10,
      scale: Long = 1000000L): DataFrame = {
    if (a.nrows != a.ncols) GraphblasException.dimensionMismatch(
      s"hits adjacency must be square: ${a.nrows}x${a.ncols}")
    val spark = a.df.sparkSession
    // one pass to learn nnz, then the whole 10-round loop runs at a
    // shuffle width sized for its per-round work instead of the
    // session's heaviest-single-aggregate width — 20 products × the
    // session's 128-wide block fan-out was pure fixed cost here
    // (Iterate.withLoopWidth scaladoc: the ITERTAIL decomposition)
    val raw = a.df.select(col("i"), col("j"), lit(1L).as("v")).cache()
    val nnz = raw.count()
    Iterate.withLoopWidth(spark, nnz) { width =>
    // two cached orientations — CSR/CSC, the standard trade: vxm
    // contracts on i, mxv on j, and each product must NOT re-shuffle
    // the O(nnz) adjacency per round. The score vectors broadcast
    // (≤ BroadcastGuard) so the products join adjacency in place; past
    // the guard the join falls back to shuffle and these cached
    // partitionings keep the exchange on the O(n) vector side only
    // (the PageRank pattern).
    val adjI = new GrbMatrix(
      raw.repartition(width, col("i")).cache(), a.nrows, a.ncols)
    val adjJ = new GrbMatrix(
      raw.repartition(width, col("j")).cache(), a.nrows, a.ncols)
    adjI.df.count(); adjJ.df.count() // materialize, then free the sizing cache
    raw.unpersist(false)
    // hub support = vertices with out-edges, starting mass 1 each
    var hub = new GrbVector(
      adjI.df.select(col("i")).distinct().select(col("i"), lit(1L).as("v"))
        .freshCheckpoint(true), a.nrows)
    var auth: GrbVector = null
    // checkpoint the RAW O(nnz) products; keep each normalize LAZY
    // over its checkpoint. The normalize's max bound is a broadcast
    // subquery, and under AQE a subquery's exchange is NOT reliably
    // reused across the value side — an un-checkpointed product would
    // re-run the full 2M-row join once per reference (measured 2-3×
    // per round). Normalizing a checkpointed scan costs one O(n)
    // agg instead.
    var prevA: Option[org.apache.spark.rdd.RDD[_]] = None
    var prevH = Iterate.checkpointRdd(hub.df)
    for (r <- 1 to rounds) {
      val aRaw = new GrbVector(
        hub.vxm(adjI, Ops.plusTimes, broadcastSelf = true)
          .df.freshCheckpoint(true), a.nrows)
      val a1 = normalize(aRaw, scale)
      val hRaw = new GrbVector(
        adjJ.mxv(a1, Ops.plusTimes).df.freshCheckpoint(true), a.nrows)
      // previous rounds' blocks can never be referenced again (this
      // round's raws are materialized); the LAST round's stay live —
      // the returned frame reads them
      if (r < rounds) {
        prevA.foreach(_.unpersist(false))
        prevH.foreach(_.unpersist(false))
        prevA = Iterate.checkpointRdd(aRaw.df)
        prevH = Iterate.checkpointRdd(hRaw.df)
      }
      hub = normalize(hRaw, scale)
      if (r == rounds) auth = a1
    }
    // the second-to-last round's blocks (skipped above so the final
    // round could still read them during its own materialization)
    prevA.foreach(_.unpersist(false))
    prevH.foreach(_.unpersist(false))
    adjI.df.unpersist(false)
    adjJ.df.unpersist(false)
    hub.df.select(col("i"), col("v").as("_h"))
      .join(auth.df.select(col("i"), col("v").as("_a")), Seq("i"), "full_outer")
      .select(col("i"), coalesce(col("_h"), lit(0L)).as("hub_ppm"),
        coalesce(col("_a"), lit(0L)).as("auth_ppm"))
    } // withLoopWidth
  }
}
