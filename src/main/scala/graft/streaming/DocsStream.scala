package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Streaming document-pipeline operators: the continuous-ingestion
  * side of pipeline/TextDedup, over the same documents schema
  * (doc_id, text, …). Batch/stream parity: Trigger.AvailableNow over a
  * static directory produces exactly the batch operator's result.
  */
object DocsStream {

  /** streaming exact dedup — the ledger a continuous corpus ingest
    * keeps: per content hash, the first (smallest) doc_id and the
    * running duplicate count. Complete-mode aggregation state is one
    * row per DISTINCT content — the minimum any exact-dedup ledger
    * needs — and matches `TextDedup.exact` on the same data.
    */
  def exactDedup(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).cast(LongType).as("keep_id"),
        count(lit(1)).cast(LongType).as("cnt"))

  /** file-source stream over a documents parquet directory */
  def readDocsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .parquet(dir)
}
