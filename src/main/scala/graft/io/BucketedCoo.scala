package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed persistence for COO frames — the co-located-join lever.
  *
  * A contraction (mxm/mxv join on the contracted dimension) against a
  * frame freshly read from plain parquet must shuffle BOTH sides onto
  * the join key every time it runs. Writing the frame bucketed (and
  * sorted) by its contraction key pre-clusters the data ON DISK:
  * Spark's scan reports `HashPartitioning(key, buckets)`, the alias
  * chain through the product's projections preserves it, and the join
  * needs no exchange on that side — for a matrix contracted against
  * repeatedly (a static adjacency joined by every iteration round, a
  * dimension table re-joined by every pipeline run), the shuffle is
  * paid ONCE at write time instead of per query. With both sides
  * bucketed into the SAME bucket count on their join keys, the join
  * plans with no exchange at all.
  *
  * At 100 TB this is the difference between "every mxm re-shuffles
  * 100 TB" and "the big operand was bucketed at ingest": bucket count
  * is a deployment choice (aim for buckets ≈ data / healthy-partition
  * size; it must match across frames meant to co-join). Buckets ride
  * Spark's table catalog, so frames live as named tables with an
  * explicit data path (external tables — no warehouse-dir dependence;
  * the default in-memory catalog works, no Hive needed).
  *
  * Reference: the Dask engine rechunks operands to aligned chunk
  * grids before blockwise contraction (core.py chunk alignment) —
  * bucketing is the Spark-native equivalent, persisted across jobs.
  */
object BucketedCoo {

  /** default external-table root: per-user tmp dir (NOT the Spark
    * scratch/shuffle dir, which is swept on exit — bucketed tables
    * are meant to outlive a session)
    */
  def defaultRoot: String = {
    val user = Option(System.getProperty("user.name")).getOrElse("anon")
    s"${System.getProperty("java.io.tmpdir")}/graft-bucketed-$user"
  }

  /** Write `df` as a parquet table bucketed+sorted by `key` into
    * `buckets` buckets at `root/name`, replacing any previous table,
    * and return the bucket-aware read-back frame.
    */
  def saveLoad(spark: SparkSession, df: DataFrame, name: String, key: String,
      buckets: Int, root: String = defaultRoot): DataFrame =
    saveLoadKeys(spark, df, name, Seq(key), buckets, root)

  /** multi-key variant — for frames probed on a composite key (e.g.
    * the minhash signature ledger's (band, sig)): bucketing on the
    * full join key set lets the probe plan with no exchange on the
    * persisted side.
    */
  def saveLoadKeys(spark: SparkSession, df: DataFrame, name: String,
      keys: Seq[String], buckets: Int, root: String = defaultRoot): DataFrame = {
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", s"$root/$name")
      .saveAsTable(name)
    spark.table(name)
  }
}
