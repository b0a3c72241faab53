package graft.algo

import graft.core.GrbVector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  /** the localCheckpoint block-RDD behind a checkpointed frame (lazy
    * and eager checkpoints both wrap a LogicalRDD). Used to free
    * superseded rounds' blocks — without this an iteration pins
    * O(rounds × n) storage; with it, O(n).
    */
  def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }

  /** Vector loop converging on VALUE STABILITY, with the prev-vs-next
    * comparison FOLDED into the per-round checkpoint (the FastSV
    * cmp-frame pattern): each round runs ONE Spark job — the eager
    * localCheckpoint of (i, v, _chg) — and convergence is a limit-1
    * scan over the just-materialized blocks, instead of a separate
    * full-outer-join isequal action on top of the checkpoint job.
    * Requires the step to be key-monotone (keys(next) ⊇ keys(prev) —
    * true of any ewise_add-accumulated iteration), so a left join
    * from next sees every prev key. Superseded rounds' checkpoint
    * blocks are freed, keeping loop storage O(n).
    */
  def vectorLoopStable(init: GrbVector, maxIter: Int = 100)(
      step: (GrbVector, Int) => GrbVector): GrbVector = {
    var f = init
    var change = true
    var iter = 0
    var prev: Option[org.apache.spark.rdd.RDD[_]] = None
    while (change && iter < maxIter) {
      val next = step(f, iter)
      val cmp = next.df
        .join(f.df.select(col("i"), col("v").as("_ov")), Seq("i"), "left")
        .select(col("i"), col("v"),
          (col("_ov").isNull || col("v") =!= col("_ov")).as("_chg"))
        .localCheckpoint(true)
      f = new GrbVector(cmp.select(col("i"), col("v")), next.size)
      change = !cmp.filter(col("_chg")).isEmpty
      // this round's state is materialized and lineage-free; the
      // previous round's blocks can never be referenced again
      prev.foreach(_.unpersist(false))
      prev = checkpointRdd(cmp)
      iter += 1
    }
    f
  }

  /** truncate a DataFrame's lineage eagerly */
  def truncate(df: DataFrame): DataFrame = df.localCheckpoint(true)
}
