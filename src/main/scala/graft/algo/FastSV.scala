package graft.algo

import graft.core._
import org.apache.spark.sql.functions._

/** FastSV connected components — the reference's flagship demo
  * (notebooks/Connected Components -- FastSV.ipynb). The loop body is a
  * direct expression of the notebook's GraphBLAS program:
  *
  *   mngp << semiring.min_second(A @ gp)     // mxv over min_second
  *   f(binary.min)[I] << mngp                // reduce_assign accum=min
  *   f << op.min(f | mngp)                   // ewise_add(min) hook
  *   f << op.min(f | gp)                     // shortcut
  *   gp << f[I]  where _, I = f.to_values()  // gather by distributed ix
  *   mod << op.ne(gp_dup & gp)               // ewise_mult(ne)
  *   change << mod.reduce(lor)               // to driver bool
  *
  * Iterative lineage is truncated per round with localCheckpoint
  * (the Spark analogue of the notebook's persist() calls,
  * dask_grblas/base.py:345-346).
  */
object FastSV {

  /** @param a symmetric adjacency matrix (any dtype; structure is what
    *          matters)
    * @return vector of component ids: f(i) = min vertex id reachable
    */
  def connectedComponents(a: GrbMatrix, maxIter: Int = 100): GrbVector = {
    require(a.nrows == a.ncols, "adjacency must be square")
    val spark = a.spark
    val n = a.nrows
    // f = gp = identity: every vertex its own parent
    val ident = spark.range(n).select(col("id").as("i"), col("id").as("v"))
    var f = new GrbVector(ident, n)
    var gp = new GrbVector(ident, n)
    val A = a.persist()
    var change = true
    var iter = 0
    while (change && iter < maxIter) {
      val gpDup = gp
      // mngp = min_second(A @ gp): per-vertex min of neighbours' parents
      val mngp = A.mxv(gp, Ops.minSecond, broadcastVec = false)
      // f(min)[I=f-as-index] << mngp — scatter mngp through f's values
      // (hooking), then two ewise min merges (hook + shortcut)
      val hooked = f.reduceAssign(f, mngp, c => min(c), Desc(accum = Some(Ops.min)))
      val f1 = hooked.ewiseAdd(mngp, Ops.min).ewiseAdd(gp, Ops.min)
      f = f1.persist()
      // gp = f[f]: gather parent-of-parent through a distributed index
      val idx = f.df.select(col("i").as("pos"), col("v").cast("long").as("idx"))
      // sizeHint avoids a count() action per iteration (round-1 verdict)
      gp = f.extract(Ix.Dist(idx), sizeHint = f.size).persist()
      val mod = gp.ewiseMult(gpDup, Ops.ne)
      change = mod.reduce(Ops.lorMonoid).boolValue
      iter += 1
    }
    f
  }
}
