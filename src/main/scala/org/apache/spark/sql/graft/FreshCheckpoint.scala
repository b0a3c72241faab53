// Hosted under the Spark namespace: classic.Dataset internals and the
// LogicalRDD constructor are private[sql].
package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, PartitioningCollection}
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** `localCheckpoint` that does NOT inherit the source plan's
  * statistics — the fix for a quadratic-to-exponential DRIVER cost in
  * nested iterative algebra.
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
  * This helper reproduces `Dataset.localCheckpoint` exactly — same
  * materialized `InternalRow` RDD, same first-leaf output
  * partitioning and ordering carried through (so co-location survives
  * the checkpoint) — but passes `originStats = None`, so the wrapped
  * frame reports the conf default (`spark.sql.defaultSizeInBytes` =
  * Long.MaxValue). Inside an iterative loop that is a behavioral
  * no-op: the inherited products were astronomically past every
  * broadcast threshold anyway; the engines broadcast explicitly where
  * it matters. Use the standard `localCheckpoint` for terminal
  * results whose honest (small) stats downstream planning can use;
  * use this inside loops.
  */
object FreshCheckpoint {

  /** @param eager materialize now (one job), like localCheckpoint(true);
    *              false marks the RDD and lets the next job materialize
    */
  def apply(df: DataFrame, eager: Boolean = true): DataFrame = {
    val ds = df.asInstanceOf[Dataset[Row]]
    val spark = ds.sparkSession
    val qe = ds.queryExecution
    val internalRdd = qe.executedPlan.execute().map(_.copy())
    internalRdd.localCheckpoint()
    if (eager) internalRdd.count()
    // PartitioningCollection can nest exponentially through deep
    // joins; keep the first leaf (the fromDataset rule)
    @scala.annotation.tailrec
    def firstLeaf(p: Partitioning): Partitioning = p match {
      case c: PartitioningCollection => firstLeaf(c.partitionings.head)
      case other => other
    }
    val logical = LogicalRDD(
      ds.logicalPlan.output, internalRdd,
      firstLeaf(qe.executedPlan.outputPartitioning),
      qe.executedPlan.outputOrdering, ds.isStreaming)(spark, None, None)
    Dataset.ofRows(spark, logical)
  }
}
