package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text analysis for training-data curation: token statistics, quality
  * scoring, n-gram-heuristic language ID, BPE-ish token counting.
  * Pure Column algebra; single narrow pass over the corpus (no
  * shuffle at all for the per-document stats — embarrassing
  * parallelism that scales linearly with input splits).
  */
object TextStats {

  private def toks(c: Column): Column = split(c, " ")

  /** per-document statistics:
    * n_tokens, n_uniq (distinct tokens), max_tok_len, stop_pct
    * (percent of tokens that are English stopwords, floored).
    */
  val stopwordsEn: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  def stats(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    val nTok = size(t).cast(LongType)
    val stops = array(stopwordsEn.map(lit): _*)
    val nStop = size(filter(t, x => array_contains(stops, x))).cast(LongType)
    docs.select(
      col("doc_id"),
      nTok.as("n_tokens"),
      size(array_distinct(t)).cast(LongType).as("n_uniq"),
      array_max(transform(t, x => length(x))).cast(LongType).as("max_tok_len"),
      floor(lit(100.0) * nStop / nTok).cast(LongType).as("stop_pct"))
  }

  /** quality score in [0, 100]: penalize very short docs, low token
    * diversity and absurd token lengths. Deterministic integer output.
    */
  def quality(docs: DataFrame): DataFrame = {
    val s = stats(docs)
    val lenScore = least(col("n_tokens"), lit(50L)) * 2 // 0..100
    val divScore = floor(lit(100.0) * col("n_uniq") / col("n_tokens")).cast(LongType)
    val score = floor((lenScore + divScore) / 2).cast(LongType)
    s.select(col("doc_id"), score.as("quality"))
  }

  /** stopword-vote language ID. Votes are counted per language list;
    * the winner is the first language (alphabetical) achieving the
    * max — deterministic. The reference corpus is synthetic
    * English-ish prose so most docs vote 'en'; what matters is that
    * the heuristic is a single narrow pass reproducible by an oracle.
    */
  val stopwordLists: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有"))

  def langId(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    val votes = stopwordLists.map { case (lang, words) =>
      lang -> size(filter(t, x => array_contains(array(words.map(lit): _*), x))).cast(LongType)
    }
    val voteCols = votes.map { case (lang, v) => v.as(s"v_$lang") }
    val withVotes = docs.select((col("doc_id") +: voteCols): _*)
    val maxVote = greatest(votes.map { case (l, _) => col(s"v_$l") }: _*)
    // first (alphabetical) language reaching the max
    val pred = votes.foldRight(lit("und")) { case ((lang, _), rest) =>
      when(col(s"v_$lang") === maxVote && maxVote > 0, lit(lang)).otherwise(rest)
    }
    val outCols = Seq(col("doc_id"), pred.as("lang_pred")) ++
      votes.map { case (l, _) => col(s"v_$l") }
    withVotes.select(outCols: _*)
  }

  /** TF/DF term statistics — the exact-integer core of TF-IDF
    * (the float idf = ln(N/df) weighting is a trivial downstream map;
    * kept out of the operator so results stay engine-exact):
    * (doc_id, tk, tf, df) where tf = occurrences in the doc and
    * df = number of docs containing the token. One explode, two hash
    * aggregates, one broadcast-size join on the token.
    */
  def termFrequencies(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(toks(col("text"))).as("tk"))
    val tf = tok.groupBy("doc_id", "tk").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tk").agg(count(lit(1)).as("df"))
    tf.join(df, Seq("tk")).select(col("doc_id"), col("tk"), col("tf"), col("df"))
  }

  /** BPE-ish token count: alpha runs, digit runs, single punctuation —
    * the standard cheap proxy for subword token counts.
    */
  val bpePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

  def bpeTokenCount(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(bpePattern), lit(0))).cast(LongType)
        .as("n_bpe"))

  /** exact rank-based length quantiles per source: pXX = the element
    * at row_number ceil(p·n) in (n_chars ASC, doc_id ASC) order — an
    * actual corpus value, no interpolation, so the result is
    * bit-identical in any engine (`percentile_cont`-style interpolated
    * doubles and Spark's `percentile_approx` are both engine-shaped).
    *
    * Plan: one shuffle on source for the rank window, then a hash
    * aggregate of one-hot picks. At 100 TB the within-group sort is
    * the cost — the honest exact answer; when an approximate
    * distribution suffices, the register-style sketch route
    * (pipeline/Sketch) is the pattern to extend instead.
    */
  def lengthQuantiles(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("n_chars").asc, col("doc_id").asc)
    val wn = org.apache.spark.sql.expressions.Window.partitionBy("source")
    val ranked = docs.select(col("source"), col("n_chars"), col("doc_id"))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .withColumn("n", count(lit(1)).over(wn))
    def pick(p: Double): Column =
      max(when(col("rk") === ceil(col("n").cast("double") * lit(p)).cast(LongType),
        col("n_chars")))
    ranked.groupBy("source").agg(
      max(col("n")).as("n_docs"),
      pick(0.25).as("p25"), pick(0.5).as("p50"),
      pick(0.75).as("p75"), pick(0.95).as("p95"),
      max(col("n_chars")).as("max_chars"))
  }
}
