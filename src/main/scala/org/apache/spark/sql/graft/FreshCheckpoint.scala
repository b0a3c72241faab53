// Hosted under the Spark namespace: classic.Dataset internals and the
// LogicalRDD constructor are private[sql].
package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, PartitioningCollection}
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.{CommandResultExec, LogicalRDD, SQLExecution}

/** `localCheckpoint` that does NOT inherit the source plan's
  * statistics uncapped — the fix for a quadratic-to-exponential DRIVER
  * cost in nested iterative algebra.
  *
  * Spark's `Dataset.localCheckpoint` wraps the materialized RDD in a
  * `LogicalRDD` and copies the ORIGINAL plan's `Statistics` into it
  * (`LogicalRDD.fromDataset` → `rewriteStatsAndConstraints`). The
  * non-CBO size visitor estimates a join as the PRODUCT of its
  * children's `sizeInBytes`, so an iterative loop that checkpoints a
  * join/union of its own previous checkpoint compounds the estimate
  * geometrically: after k rounds the BigInt carries O(cᵏ) digits, and
  * every subsequent stats walk pays BigInteger multiplication over
  * million-digit numbers — observed as the driver's main thread
  * spinning whole minutes in `BigInteger.multiply` under
  * `Dataset.checkpoint` while executors sit idle (Borůvka-over-FastSV
  * was the first composition deep enough to hit it; a long enough
  * FastSV run alone would too).
  *
  * This helper reproduces `Dataset.localCheckpoint` — same
  * materialized `InternalRow` RDD, same first-leaf output
  * partitioning and ordering carried through (so co-location survives
  * the checkpoint), the materialization job wrapped in
  * `SQLExecution.withNewExecutionId` like every `Dataset.withAction`
  * (so checkpoint jobs keep an SQL execution id: visible in the SQL
  * UI and to query-execution listeners), the `CommandResultExec`
  * unwrap mirrored from `Dataset.checkpoint` — but reports
  * `min(source sizeInBytes, spark.sql.defaultSizeInBytes)` instead of
  * the raw inherited stats. The cap bounds the BigInt at ≤ 63 bits no
  * matter how deep the loop (each round's walk sees capped leaves, so
  * within-round products stay a few hundred bits and the next
  * checkpoint re-caps), while genuinely SMALL frames — 1-row seeds,
  * early frontiers — keep their honest size and stay eligible for
  * static auto-broadcast (round-9 advice: the unconditional
  * `originStats = None` made every loop frame report Long.MaxValue
  * and left AQE runtime stats as the only broadcast path). Terminal
  * results can still use the standard `localCheckpoint`; inside loops
  * use this.
  */
object FreshCheckpoint {

  /** @param eager materialize now (one job), like localCheckpoint(true);
    *              false marks the RDD and lets the next job materialize
    */
  def apply(df: DataFrame, eager: Boolean = true): DataFrame =
    build(df, eager, keepPartitioning = true)._1

  /** Eager [[apply]] that ALSO returns the `Dataset.observe`
    * (CollectMetrics) rows gathered during the SAME materialization
    * job, keyed by observation name — the hook that lets an iterative
    * loop's convergence probe ride the checkpoint job instead of
    * paying its own per-round driver round-trip (an executeTake /
    * count over the just-written blocks; the stable final round's
    * isEmpty scans EVERY partition in sequential escalating waves).
    * The metrics are read straight off the executed plan's
    * accumulators after the materialization count returns
    * (CollectMetricsExec.collect descends into AQE / cached
    * subtrees), so there is no listener race and no extra job. The
    * caller attaches the probe with `df.observe(name, aggCols...)`
    * before checkpointing.
    */
  def withObserved(df: DataFrame,
      keepPartitioning: Boolean = true): (DataFrame, Map[String, Row]) =
    build(df, eager = true, keepPartitioning)

  private def build(df: DataFrame, eager: Boolean,
      keepPartitioning: Boolean): (DataFrame, Map[String, Row]) = {
    val ds = df.asInstanceOf[Dataset[Row]]
    val spark = ds.sparkSession
    val qe = ds.queryExecution
    // mirror Dataset.checkpoint: a command's result is replayed from
    // the inner physical plan, not the CommandResultExec wrapper
    val physical = qe.executedPlan match {
      case c: CommandResultExec => c.commandPhysicalPlan
      case p => p
    }
    val internalRdd = physical.execute().map(_.copy())
    internalRdd.localCheckpoint()
    if (eager)
      SQLExecution.withNewExecutionId(qe, Some("freshCheckpoint")) {
        internalRdd.count()
      }
    // observed metrics (only meaningful after an eager materialization:
    // the accumulators are filled by the job's own tasks)
    val observed =
      if (eager)
        org.apache.spark.sql.execution.CollectMetricsExec.collect(physical)
      else Map.empty[String, Row]
    // PartitioningCollection can nest exponentially through deep
    // joins; keep the first leaf (the fromDataset rule)
    @scala.annotation.tailrec
    def firstLeaf(p: Partitioning): Partitioning = p match {
      case c: PartitioningCollection => firstLeaf(c.partitionings.head)
      case other => other
    }
    // Round-15: read the partitioning from the FINAL physical plan.
    // AdaptiveSparkPlanExec is a leaf node whose outputPartitioning is
    // UnknownPartitioning, so any AQE-wrapped plan (= any plan with an
    // exchange, broadcast included) silently dropped its clustering at
    // the checkpoint — every loop round's cmp/state join then
    // re-exchanged the vertex-sized frame it had just written with a
    // known hash layout. After execute() the final plan exists and its
    // outputPartitioning describes the materialized RDD truthfully
    // (AQE-coalesced shuffles report CoalescedHashPartitioning, which
    // still satisfies the downstream ClusteredDistribution). The same
    // unwrap looks through CollectMetrics (the withObserved probe).
    @scala.annotation.tailrec
    def partitioningSource(p: org.apache.spark.sql.execution.SparkPlan)
        : org.apache.spark.sql.execution.SparkPlan = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        partitioningSource(a.finalPhysicalPlan)
      case c: org.apache.spark.sql.execution.CollectMetricsExec =>
        partitioningSource(c.child)
      case other => other
    }
    // capped stats: cheap to read — every loop leaf below is itself a
    // capped LogicalRDD, so the product walk tops out at a few hundred
    // bits. None (→ conf default) when the source estimate is at or
    // past the cap.
    val default = BigInt(spark.sessionState.conf.defaultSizeInBytes)
    val src = qe.optimizedPlan.stats.sizeInBytes
    val originStats =
      if (src < default) Some(Statistics(sizeInBytes = src)) else None
    // keepPartitioning=false restores the pre-round-15 behavior
    // (UnknownPartitioning through AQE tops) for the one caller whose
    // downstream plan measured WORSE with the carried clustering: the
    // KTruss masked-product loop, where the next round's Catalyst-
    // chosen mask plan beats the clustering-reusing one (see KTruss).
    val partSrc = partitioningSource(physical)
    val logical = LogicalRDD(
      ds.logicalPlan.output, internalRdd,
      if (keepPartitioning) firstLeaf(partSrc.outputPartitioning)
      else firstLeaf(physical.outputPartitioning),
      if (keepPartitioning) partSrc.outputOrdering
      else physical.outputOrdering, ds.isStreaming)(spark, originStats, None)
    (Dataset.ofRows(spark, logical), observed)
  }
}
