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

  /** Eager [[FreshOps.freshCheckpoint]] whose materialization job ALSO
    * evaluates the given aggregate `probe` columns over the
    * checkpointed rows, via `Dataset.observe` (CollectMetrics): the
    * loop's convergence/count probe rides the checkpoint job instead
    * of paying its own driver round-trip per round. Before this, every
    * data-driven loop ran one extra action per round over the
    * just-materialized blocks — a `count()` (two stages: partial agg +
    * single-partition exchange) or an `isEmpty` (executeTake, which on
    * the stable FINAL round scans every partition in sequential
    * escalating waves). The observe aggregate is computed by the
    * materialization tasks themselves and read off the executed plan's
    * accumulators after the job — zero extra jobs, zero extra scans
    * (guide §2: per-round fixed cost scales with rounds; VERDICT r14
    * item 1 "hoist the convergence probe into the gather job").
    *
    * The CollectMetrics node passes rows through unchanged and
    * preserves the child's output partitioning, so the checkpointed
    * frame keeps its clustering (the broadcast-mode loops' zero-
    * exchange rounds depend on it — spec-pinned in PlanAuditSpec).
    *
    * @return (checkpointed frame, probe row — one column per probe
    *         aggregate, initial aggregate values when the frame is
    *         empty, e.g. count = 0)
    */
  def checkpointWithProbe(df: DataFrame,
      probe: org.apache.spark.sql.Column,
      more: org.apache.spark.sql.Column*): (DataFrame, org.apache.spark.sql.Row) =
    checkpointWithProbeOpt(df, keepPartitioning = true, probe, more: _*)

  /** [[checkpointWithProbe]] with the partitioning carry opt-out —
    * see FreshCheckpoint.withObserved */
  def checkpointWithProbeOpt(df: DataFrame, keepPartitioning: Boolean,
      probe: org.apache.spark.sql.Column,
      more: org.apache.spark.sql.Column*): (DataFrame, org.apache.spark.sql.Row) = {
    // fixed name is safe: checkpointed frames are LogicalRDD scans, so
    // a round's plan carries exactly one CollectMetrics node
    val name = "graft_probe"
    val (out, metrics) = org.apache.spark.sql.graft.FreshCheckpoint
      .withObserved(df.observe(name, probe, more: _*), keepPartitioning)
    (out, metrics(name))
  }

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
      // the change flag doubles as the convergence probe: its count is
      // observed during the checkpoint job itself (checkpointWithProbe
      // — no per-round isEmpty action over the materialized blocks)
      val (cmp, probeRow) = checkpointWithProbe(next.df
        .join(f.df.select(col("i"), col("v").as("_ov")), Seq("i"), "left")
        .select(col("i"), col("v"),
          (col("_ov").isNull || col("v") =!= col("_ov")).as("_chg")),
        count(when(col("_chg"), 1)).as("chg"))
      f = new GrbVector(cmp.select(col("i"), col("v")), next.size)
      change = probeRow.getLong(0) > 0
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
    * The round-10 rule floored width at cluster parallelism ("every
    * core works"). The round-11 ITERTAIL decomposition (SelfBaseline,
    * q_lpa loop on the sf0.1 graph, per-round listener split) showed
    * that floor is wrong when per-round work is small: at width 32
    * the rounds were ~80% fixed cost (Σ shuffle-file write/commit
    * time 2.2-2.6 s per round for ~20 MB of data — map×reduce block
    * fan-out — against a 0.15 s data wall), and narrowing to 16/8 cut
    * the loop total 7.6 → 4.1 s with identical results. Idle cores
    * cost nothing when a round's data wall is milliseconds; block
    * fan-out costs every round, and degraded-IO host windows multiply
    * exactly that fixed part (the 2-4× q_lpa/q_hits/q_kcore/q_mis
    * window tax this rule cuts).
    *
    * Shipped rule: width targets ~150k state rows per task with a
    * floor of 8, and never EXCEEDS the round-10 rule
    * (max(parallelism, workRows/500k)) — so big-graph loops keep the
    * per-task-state bound (~500k rows ≈ tens of MB), a 100 TB run
    * (workRows ≫ 500k × cluster cores) sizes by rows exactly as
    * before, and a session narrower than the floor (Verify at 4) is
    * never widened — the floor is clamped at the session's configured
    * shuffle width, so the guarantee is structural, not an artifact
    * of narrow sessions also having low defaultParallelism.
    *
    * Where NOT to apply it: frontier loops whose per-round aggregates
    * are small (Bfs.levels/sssp/multiSourceLevels, SpCount's waves and
    * dag accumulations) deliberately stay at the session width — their
    * frontier-side aggregates are tiny, AQE already coalesces them
    * per-stage, and the nnz-sizing pass this helper needs costs more
    * than the width change saves (measured r11: q_bfs 1.88 → 2.16 s,
    * q_betweenness 3.19 → 4.68 s WITH the wrapper; reverted). The rule
    * pays where per-round state is O(n) dense and rounds are many —
    * LPA/KCore/MIS/Coloring/HITS/PageRank/SCC/ANF/walks/Borůvka.
    */
  def withLoopWidth[T](spark: org.apache.spark.sql.SparkSession,
      workRows: Long)(body: Int => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    val width = loopWidth(spark, workRows)
    spark.conf.set(key, width.toString)
    try body(width) finally spark.conf.set(key, prev)
  }

  /** Run `body` with whole-stage codegen OFF, restoring the session's
    * setting afterwards — the JIT-surface lever for checkpointed loops
    * (round-14, PERF_NOTES §17).
    *
    * A checkpointed loop re-plans every round, and under AQE each
    * round's stages carry freshly generated whole-stage classes (the
    * runtime-reoptimized plans differ enough that the source-keyed
    * codegen cache misses): the per-rep JIT meter showed the FastSV
    * loop COMPILING 30 s of code per fresh-context rep — more wall
    * than the data work itself — and the not-yet-compiled generated
    * classes burn interpreted CPU until C2 lands (the §16f settle,
    * re-paid every rep). Whole-stage codegen exists to fuse operator
    * loops over millions of rows per task; a loop round here pushes a
    * few MB per exchange, so the fused-loop win is microseconds while
    * the compile+interpret tax is seconds. With wholeStage off the
    * stages run through volcano iterators built from SMALL per-
    * operator projections (stable sources → codegen-cache hits across
    * rounds and reps): measured on the q_cc_events FastSV loop
    * (1.2M nnz), fresh-context 31.9 → 16.0 s, warm 19.3 → 10.5 s,
    * per-rep JIT 30 → 12 s, identical results.
    *
    * Two alternatives measured and REJECTED on the same A/B
    * (PERF_NOTES §17): AQE off entirely (static plans would dedup the
    * codegen) lost 1.6× — the loop's joins fell back to sort-merge
    * where AQE had been choosing cheaper local strategies, executor
    * CPU rose 2× (178 s); and shuffle_hash join hints on the
    * co-partitioned joins lost ~15% — AQE's independent per-exchange
    * coalescing breaks the partition-count match the hint needs, so
    * the hinted join re-exchanges both sides.
    *
    * NOT for one-shot queries: a scan-heavy aggregation over many
    * rows per task is exactly what whole-stage codegen is for. The
    * tradeoff only inverts when a small plan runs many times.
    */
  def withLoopCodegenOff[T](spark: org.apache.spark.sql.SparkSession)(
      body: => T): T = {
    val key = "spark.sql.codegen.wholeStage"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try body finally spark.conf.set(key, prev)
  }

  /** the [[withLoopWidth]] sizing rule alone — for loops that size an
    * RDD partitioning instead of the SQL shuffle width (PregelCC's
    * GraphX rounds follow the edge RDD's partition count)
    */
  def loopWidth(spark: org.apache.spark.sql.SparkSession,
      workRows: Long): Int = {
    // operator override for controlled width A/Bs and deployments
    // whose executor/storage geometry contradicts the sizing rule —
    // the same escape hatch every sizing heuristic in the repo keeps
    scala.util.Try(spark.conf.get("spark.graft.loop.width").toInt)
      .toOption.filter(_ >= 1).foreach(w => return w)
    val hi = math.min(math.max(
      spark.sparkContext.defaultParallelism.toLong,
      workRows / 500000L), 1000000L)
    // The floor (8) never widens a session that deliberately runs
    // narrower (Verify at 4): clamp it at the configured session
    // width, so the scaladoc guarantee holds by construction rather
    // than by the coincidence that narrow sessions also have low
    // defaultParallelism. Rows-scaled widening (workRows/150k) is NOT
    // clamped — a big graph must still widen for the per-task-state
    // bound even in a narrow session.
    val sessionWidth = scala.util.Try(
      spark.conf.get("spark.sql.shuffle.partitions").toLong)
      .getOrElse(spark.sparkContext.defaultParallelism.toLong)
    val floor = math.min(8L, math.max(1L, sessionWidth))
    math.max(1L, math.min(hi, math.max(workRows / 150000L, floor))).toInt
  }
}
