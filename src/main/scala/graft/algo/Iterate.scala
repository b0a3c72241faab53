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

  /** Loop-internal checkpoint: `localCheckpoint` semantics with the
    * source plan's statistics CAPPED at the conf default. The non-CBO
    * size visitor estimates joins as the PRODUCT of child sizes, so a
    * loop that checkpoints a join/union of its own previous checkpoint
    * compounds sizeInBytes geometrically — after enough rounds the
    * driver's main thread spins whole minutes multiplying
    * million-digit BigIntegers inside Dataset.checkpoint while
    * executors idle (first hit by Borůvka's FastSV contraction; any
    * deep-enough loop gets there). The cap bounds the BigInt per
    * round while genuinely small frames (1-row seeds, early
    * frontiers) keep their honest stats and stay statically
    * auto-broadcastable. Terminal results keep the standard
    * localCheckpoint. See org.apache.spark.sql.graft.FreshCheckpoint.
    */
  implicit class FreshOps(private val df: DataFrame) extends AnyVal {
    def freshCheckpoint(eager: Boolean = true): DataFrame =
      org.apache.spark.sql.graft.FreshCheckpoint(df, eager)
  }

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
      new GrbVector(v.df.freshCheckpoint(true), v.size))

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
      step: (GrbVector, Int) => GrbVector): GrbVector =
    vectorLoopStableCounted(init, maxIter)(step)._1

  /** [[vectorLoopStable]] that also reports how many rounds ran — the
    * early-exit evidence a fixpoint loop's spec pins (rounds ≤ horizon)
    * and its A/B rows cite.
    */
  def vectorLoopStableCounted(init: GrbVector, maxIter: Int = 100)(
      step: (GrbVector, Int) => GrbVector): (GrbVector, Int) = {
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
        .freshCheckpoint(true)
      f = new GrbVector(cmp.select(col("i"), col("v")), next.size)
      change = !cmp.filter(col("_chg")).isEmpty
      // this round's state is materialized and lineage-free; the
      // previous round's blocks can never be referenced again
      prev.foreach(_.unpersist(false))
      prev = checkpointRdd(cmp)
      iter += 1
    }
    (f, iter)
  }

  /** truncate a DataFrame's lineage eagerly */
  def truncate(df: DataFrame): DataFrame = df.freshCheckpoint(true)

  /** Run `body` with `spark.sql.shuffle.partitions` sized for an
    * iterative loop over ~`workRows` rows per round, restoring the
    * session's setting afterwards.
    *
    * Why: the session-level width is sized for the suite's heaviest
    * single aggregation (per-task hash state — Bench uses 4× cores,
    * PERF_NOTES §5), but an iterative algorithm runs MANY small jobs:
    * per round every exchange fans out map×reduce shuffle blocks and
    * every eager checkpoint materializes one block per partition, so
    * fixed cost scales with width × rounds. Measured on the sf0.1
    * bipartite graph (1.2M nnz, warm JVM): kcore 30.1 s at width 128
    * vs 8.5 s at 32; MIS 24.3 vs 13.7; LPA 26.3 vs 16.1 — a 2-3.5×
    * tax AQE does not claw back (coalescing happens per-stage, but
    * map-side block count and checkpoint block count follow the
    * configured width).
    *
    * The rule a 100 TB cluster needs is the same one local[32] needs:
    * width = max(cluster parallelism, workRows / rowsPerTask) — wide
    * enough that every core works and per-task state stays bounded
    * (~500k edge rows ≈ tens of MB), narrow enough that a 20-round
    * loop is not 20 × (width × blocks) of scheduler and shuffle-fetch
    * overhead. State rows per round are ≤ nnz for every loop here
    * (frontier/survivor/label frames join against the adjacency), so
    * nnz is the sizing input.
    */
  def withLoopWidth[T](spark: org.apache.spark.sql.SparkSession,
      workRows: Long)(body: Int => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    val width = math.min(math.max(
      spark.sparkContext.defaultParallelism.toLong,
      workRows / 500000L), 1000000L).toInt
    spark.conf.set(key, width.toString)
    try body(width) finally spark.conf.set(key, prev)
  }
}
