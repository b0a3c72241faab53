package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic corpus sampling and composition statistics —
  * training-data curation needs reproducible subsets (the same 10%
  * regardless of cluster size, partitioning, or engine), which rules
  * out both rand() and engine-specific hashes.
  *
  * The sampling key is md5-derived (TextDedup.hash32), so any engine
  * with a standard md5 draws the identical sample, and re-running over
  * a grown corpus keeps previously-selected documents selected
  * (hash-stable incremental sampling). Pure narrow filters — no
  * shuffle, linear scan, trivially 100 TB-safe.
  */
object Sampling {

  /** keep rows whose content-hash bucket falls below `pct` percent */
  def deterministicSample(df: DataFrame, keyCol: Column, pct: Int): DataFrame =
    df.filter(TextDedup.hash32(keyCol) % 100 < pct)

  /** corpus composition: doc counts and volume by (source, lang) with
    * basis-point shares — the input to mixture-weight decisions.
    * ONE pass over the corpus: the total is re-aggregated from the
    * (tiny) grouped result and re-attached with a broadcast crossJoin,
    * instead of a separate full-corpus count() action.
    */
  def sourceMix(docs: DataFrame): DataFrame = {
    val grouped = docs.groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast(LongType).as("n_chars"))
    // grand total via a global window over the GROUPED result — a few
    // hundred (source, lang) rows on one partition, reusing the single
    // corpus aggregation (a second branch would rescan the corpus)
    val w = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    grouped
      .withColumn("share_bp",
        floor(lit(10000.0) * col("n_docs") /
          sum(col("n_docs")).over(w).cast("double")).cast(LongType))
  }
}
