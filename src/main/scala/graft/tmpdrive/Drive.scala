package graft.tmpdrive

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.local.dir", graft.LocalDirs.sparkLocalDir)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.count() // warm
    def t(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"MARKER $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    import graft.pipeline.TextDedup
    val sh = TextDedup.explodedShingles(docs).cache()
    t("explode")(sh.count())
    val capped = sh.withColumn("_df", count(lit(1)).over(Window.partitionBy("sh")))
      .filter(col("_df") <= 1000).drop("_df").cache()
    t("cap_window")(capped.count())
    val cands = capped.select(col("sh"), col("doc_id").as("a"))
      .join(capped.select(col("sh"), col("doc_id").as("b")), Seq("sh"))
      .filter(col("a") < col("b"))
      .select("a", "b")
    t("cand_join_prededup")(cands.count())
    val dd = cands.dropDuplicates("a", "b").cache()
    t("cand_dedup")(dd.count())
    // verify: two joins back to the shingle sets + agg
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = dd
      .join(sh.select(col("doc_id").as("a"), col("sh")), Seq("a"))
      .join(sh.select(col("doc_id").as("b"), col("sh")), Seq("b", "sh"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    t("verify")(inter.count())
    spark.stop()
  }
}
