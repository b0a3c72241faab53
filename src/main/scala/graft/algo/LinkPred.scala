package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.core._

/** Link prediction over an undirected graph: for every wedge-closed
  * candidate pair (i, j) not-necessarily-an-edge, the three classic
  * neighbourhood scores — common-neighbour count, Resource-Allocation
  * index, and neighbour-set Jaccard — in one pass of matrix algebra
  * (reference surface: composes mxm / reduce_rowwise / ewise from
  * dask_grblas matrix.py's public API, the same ops its triangle
  * notebook chains).
  *
  * Determinism discipline: RA is Σ_z 1/deg(z) over shared neighbours
  * z — kept engine-exact as floor-ppm units (10⁶ DIV deg z, summed).
  * Adamic-Adar's 1/log deg has no integer form, RA is its standard
  * integer-friendly sibling (and outperforms it on most benchmarks —
  * Zhou/Lü/Zhang 2009). Jaccard = (10⁶·cn) DIV (deg i + deg j − cn).
  *
  * The wedge work is ONE plus_times mxm: the right operand's value
  * PACKS both accumulators — v = 2⁴⁰ + ppm(z) — so a single product
  * sum yields cn in the high bits and Σra in the low 40. Σra per pair
  * is ≤ cn·10⁶ < cn·2²⁰, so the low field can never carry into the cn
  * field below cn ~ 2²⁰ shared neighbours (10¹² wedges on one pair —
  * far past any real graph's hub cap); a second plus_pair mxm over
  * the same wedges would double the join+agg cost for nothing.
  *
  * Scale shape: cost is Σ_z deg(z)² wedges — the same budget as
  * triangle counting, shuffled once on the contraction key and
  * hash-aggregated with map-side partials. Output is bounded by the
  * min-cn threshold (and, at corpus scale, top-k per vertex via
  * TopKPairs downstream).
  */
object LinkPred {

  /** @param a     symmetric unweighted adjacency (values ignored,
    *              structure only)
    * @param minCn emit only pairs with at least this many common
    *              neighbours (the candidate-volume throttle at scale)
    * @return (i, j, cn, ra_ppm, jaccard_ppm) with i < j
    */
  def scores(a: GrbMatrix, minCn: Long = 2L): DataFrame = {
    if (a.nrows != a.ncols) GraphblasException.dimensionMismatch(
      s"linkpred adjacency must be square: ${a.nrows}x${a.ncols}")
    val n = a.nrows
    val sym = a.df.select(col("i"), col("j"), lit(1L).as("v"))
    val A = new GrbMatrix(sym, n, n)
    val deg = A.reduceRowwise(Ops.plusMonoid).df // (i, v) = degree
    // packed dual-accumulator operand: W[z, j] = 2^40 + ppm(z)
    val w = sym.select(col("i"), col("j"))
      .join(deg.select(col("i"), col("v").as("dz")), Seq("i"))
      .select(col("i"), col("j"),
        (lit(1L << 40) + expr("CAST(1000000 AS BIGINT) DIV dz")).as("v"))
    val packed = A.mxm(new GrbMatrix(w, n, n), Ops.plusTimes).df
    val scores = packed.filter(col("i") < col("j"))
      .select(col("i"), col("j"),
        shiftright(col("v"), 40).as("cn"),
        col("v").bitwiseAND(lit((1L << 40) - 1)).as("ra_ppm"))
      .filter(col("cn") >= minCn)
    scores
      .join(deg.select(col("i"), col("v").as("di")), Seq("i"))
      .join(deg.select(col("i").as("j"), col("v").as("dj")), Seq("j"))
      .select(col("i"), col("j"), col("cn"), col("ra_ppm"),
        expr("(1000000 * cn) DIV (di + dj - cn)").as("jaccard_ppm"))
  }
}
