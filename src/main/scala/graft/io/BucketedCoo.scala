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
  * is a deployment choice and must match across frames meant to
  * co-join. Size it for the CONTRACTION, not the stored rows: a
  * bucketed product join runs one task per bucket END TO END —
  * product generation and the partial aggregate included — so the
  * bound that matters is product cells per bucket (≈ a few hundred k,
  * the same per-task-state rule as Iterate.loopWidth), which for a
  * semiring product is the stored rows × the contraction key's
  * average multiplicity on the other side. Buckets sized only for
  * storage under-parallelize the contraction (measured: the catalog's
  * 17M-cell product at 8 buckets = 2.2M agg entries/task drew
  * 5.5-16 s fresh-context bimodal; 32 buckets ≈ 540k/task). Buckets ride
  * Spark's table catalog, so frames live as named tables with an
  * explicit data path (external tables — no warehouse-dir dependence;
  * the default in-memory catalog works, no Hive needed).
  *
  * Reference: the Dask engine rechunks operands to aligned chunk
  * grids before blockwise contraction (core.py chunk alignment) —
  * bucketing is the Spark-native equivalent, persisted across jobs.
  */
object BucketedCoo {

  /** Default external-table root for LOCAL runs: the same
    * tmpfs-if-it-fits placement policy as every other local scratch
    * (graft.LocalDirs — tmpfs persists across sessions, so "paid once
    * at write" still holds), falling back to the JVM tmpdir when
    * tmpfs is absent or a declared footprint doesn't fit. NOT the
    * Spark shuffle dir, which is pid-scoped and swept on exit.
    * Deployments that want durable bucketed tables pass `root`
    * explicitly (object store / HDFS path) — the default is a
    * local-mode convenience, and leaving it on the block device made
    * the write-side of the round trip bimodal under host disk
    * pressure (q_mxm_bucketed 5.5 ↔ 16 s, same code, healthy memory
    * probes both ends).
    */
  def defaultRoot: String = {
    val user = Option(System.getProperty("user.name")).getOrElse("anon")
    val shm = new java.io.File("/dev/shm")
    val declaredGb = sys.env.get("SPARK_GRAFT_SHUFFLE_GB").flatMap(_.toLongOption)
    val base =
      if (shm.isDirectory && shm.canWrite &&
          graft.LocalDirs.fitsTmpfs(shm.getUsableSpace, declaredGb))
        shm.getPath
      else System.getProperty("java.io.tmpdir")
    s"$base/graft-bucketed-$user"
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
    // Repartition onto the bucket hash BEFORE the write: bucketBy
    // splits every write task's rows across all buckets it sees, so
    // an n-task upstream sprays up to n×buckets small files; after
    // repartition (same murmur HashPartitioning as the bucket
    // assignment) each task holds exactly one bucket — one file per
    // bucket, and single-file buckets are what lets the read-back
    // scan claim sortedness (multi-file buckets forfeit the sortBy
    // and the join re-sorts).
    import org.apache.spark.sql.functions.col
    df.repartition(buckets, keys.map(col): _*)
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", s"$root/$name")
      .saveAsTable(name)
    spark.table(name)
  }
}
