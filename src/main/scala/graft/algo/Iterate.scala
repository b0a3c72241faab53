package graft.algo

import graft.core.GrbVector
import org.apache.spark.sql.DataFrame

/** Iteration harness for algorithm loops (SURVEY §7.1) — the Spark
  * analogue of the reference notebook's persist() checkpointing
  * (dask_grblas/base.py:345-346): every round's state is eagerly
  * localCheckpoint'ed so the logical plan (and with it Catalyst
  * analysis time) stays O(one round) instead of growing with the
  * iteration count, and failed stages replay from materialized blocks
  * instead of the whole loop history.
  */
object Iterate {

  /** Run `step` until `converged` or `maxIter` rounds. The state
    * DataFrame returned by each step is checkpointed eagerly;
    * `converged` is the round's single driver-side action.
    */
  def loop[S](init: S, maxIter: Int = 100)(
      step: (S, Int) => S)(converged: (S, S) => Boolean)(
      checkpoint: S => S): S = {
    var state = init
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val next = checkpoint(step(state, iter))
      done = converged(state, next)
      state = next
      iter += 1
    }
    state
  }

  /** convenience for vector-state loops */
  def vectorLoop(init: GrbVector, maxIter: Int = 100)(
      step: (GrbVector, Int) => GrbVector)(
      converged: (GrbVector, GrbVector) => Boolean): GrbVector =
    loop(init, maxIter)(step)(converged)(v =>
      new GrbVector(v.df.localCheckpoint(true), v.size))

  /** truncate a DataFrame's lineage eagerly */
  def truncate(df: DataFrame): DataFrame = df.localCheckpoint(true)
}
