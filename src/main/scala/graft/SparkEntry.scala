package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The catalog lives in [[Queries]]: one entry per SURVEY §2 operator
  * family plus the LLM-data-pipeline operators, each with a DuckDB
  * oracle where SQL-expressible.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.all("q_mxm")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracle
  /** Untimed per-query preparation (persisted state a deployment pays
    * at ingest time — e.g. bucketed tables); the bench runs these
    * outside the rep timer. Queries stay self-contained without them.
    */
  def prepares: Map[String, (SparkSession, String) => Unit] = Queries.prepares
}
