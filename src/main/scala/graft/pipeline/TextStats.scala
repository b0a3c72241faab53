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

  /** Rarity / perplexity-proxy score: per-document mean and minimum
    * corpus frequency (in ppm, floored) of its tokens — the
    * unigram-LM quality signal (docs of vanishingly rare tokens are
    * OCR noise/gibberish candidates; a min_tok_ppm of 0 flags a
    * sub-ppm token). True perplexity needs ln() — engine-shaped — so
    * the operator ships the exact integer statistic and leaves the
    * monotone log map downstream (the TF-IDF discipline).
    *
    * Determinism: ppm = floor(1e6·cf / total) computed as ONE IEEE
    * double division of exactly-representable operands (exact while
    * 1e6·cf < 2^53, i.e. corpus token occurrences < ~9e9 per token —
    * document the bound rather than silently switch representations);
    * the oracle mirrors the identical double expression, NOT integer
    * `//` (the two can disagree by 1 ulp-rounding near integer
    * quotients).
    *
    * Plan: one explode, a map-side-combining corpus-frequency hash
    * aggregate (vocab-sized), total re-aggregated from the vocab frame
    * and broadcast-attached (never a second corpus scan, never a
    * global window over the vocabulary), then a per-occurrence
    * equi-join on the token + doc hash aggregate — linear in token
    * occurrences, the p_tfidf/p_dup_ngrams cost shape.
    */
  def rarityScore(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(toks(col("text"))).as("tk"))
    val cf = tok.groupBy("tk").agg(count(lit(1)).as("cf"))
    val tot = cf.agg(sum(col("cf")).as("total"))
    val ppm = cf.crossJoin(broadcast(tot))
      .select(col("tk"),
        floor(lit(1000000.0d) * col("cf") / col("total").cast("double"))
          .cast(LongType).as("ppm"))
    tok.join(ppm, Seq("tk"))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_tokens"),
        floor(sum(col("ppm")).cast("double") / count(lit(1)).cast("double"))
          .cast(LongType).as("mean_tok_ppm"),
        min(col("ppm")).as("min_tok_ppm"))
  }

  /** Bigram-level rarity — the scrambled-text signal [[rarityScore]]
    * cannot see: token-shuffled or cut-up text keeps its unigram
    * frequencies but its word PAIRS stop co-occurring, so a document
    * whose tokens are all corpus-common yet whose bigrams are
    * corpus-rare is a strong gibberish/derangement candidate (the
    * bigram-LM analogue of the unigram perplexity proxy; the log map
    * again stays downstream so every statistic is engine-exact).
    *
    * Output per doc: n_bigrams, mean/min corpus bigram frequency in
    * floored ppm. Same linear plan family as rarityScore: one bigram
    * explode, one corpus bigram hash-aggregate, a broadcast 1-row
    * total, one per-occurrence equi-join — never a pairing. Docs with
    * fewer than 2 tokens have no bigrams and drop out (they are the
    * length filter's job).
    */
  def bigramRarity(docs: DataFrame): DataFrame = {
    // TextDedup.gramArray: one split per shifted operand, not per
    // output gram (the lambda re-evaluation pathology — see its doc)
    val bg = docs.select(col("doc_id"),
      explode(TextDedup.gramArray(col("text"), 2)).as("bg"))
    val cf = bg.groupBy("bg").agg(count(lit(1)).as("cf"))
    val tot = cf.agg(sum(col("cf")).as("total"))
    val ppm = cf.crossJoin(broadcast(tot))
      .select(col("bg"),
        floor(lit(1000000.0d) * col("cf") / col("total").cast("double"))
          .cast(LongType).as("ppm"))
    bg.join(ppm, Seq("bg"))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_bigrams"),
        floor(sum(col("ppm")).cast("double") / count(lit(1)).cast("double"))
          .cast(LongType).as("mean_bg_ppm"),
        min(col("ppm")).as("min_bg_ppm"))
  }

  /** Within-document repetition signals — the Gopher-style (Rae et
    * al. 2021 §A1.1) repetition filters that catch boilerplate,
    * keyword-stuffed, and template-generated pages exact dedup never
    * sees (the duplication is INSIDE one document):
    *
    *  - `top2_ppm`: share of bigram occurrences taken by the single
    *    most frequent bigram — floor(10⁶ · max(count) / Σcount).
    *    High = one phrase dominates ("click here click here …").
    *  - `dup3_ppm`: share of trigram occurrences whose trigram occurs
    *    at least twice — floor(10⁶ · Σ_{c≥2} c / Σc). High = the
    *    document repeats its own passages.
    *
    * Both exact floor-ppm integers (oracle hash-matches). Documents
    * with fewer than 3 tokens have no trigram and are absent — a
    * too-short doc is the length filter's job, not repetition's.
    *
    * Scale shape: one explode per n, hash-aggregated on the composite
    * (doc_id, gram) key — map-side partial aggregation absorbs the
    * within-partition repeats (the repeated grams are, by
    * construction of what this measures, co-located in their doc's
    * split), then one hash agg per doc_id. No corpus-wide state, no
    * window, no join except the final per-doc pairing — linear in
    * corpus size and embarrassingly partition-parallel.
    */
  def repetition(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    // gramArray needs no descending-sequence guard (empty for short
    // docs); the size filter stays to skip gram-less docs entirely
    def counts(n: Int) = docs.filter(size(t) >= n)
      .select(col("doc_id"),
        explode(TextDedup.gramArray(col("text"), n)).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
    val top2 = counts(2).groupBy("doc_id")
      .agg(expr("(1000000 * MAX(c)) DIV SUM(c)").as("top2_ppm"))
    val dup3 = counts(3).groupBy("doc_id")
      .agg(expr("(1000000 * SUM(IF(c >= 2, c, 0))) DIV SUM(c)").as("dup3_ppm"))
    top2.join(dup3, Seq("doc_id"))
  }

  /** Vocabulary construction — the tokenizer-prep operator: the top-k
    * corpus tokens by frequency (ties broken by token, so the cut is
    * total-order deterministic) with cumulative corpus coverage in
    * floored ppm — the "how many tokens cover 95% of the corpus"
    * curve that sizes a vocabulary.
    *
    * Scale design — NO corpus-wide window anywhere (the
    * lengthQuantiles discipline): rank = (#tokens in strictly-more-
    * frequent groups) + within-group position. The first term comes
    * from a cumulative window over the FREQUENCY HISTOGRAM (distinct
    * cf values — O(√corpus) under Zipf, a few thousand rows at any
    * size); the second from a window PARTITIONED by cf, run only on
    * the groups that can still reach top-k (`above < k` prunes the
    * long tail BEFORE the window, so the giant cf=1 group never
    * ranks). The coverage window then runs over ≤ k kept rows. A
    * naive ROW_NUMBER over the full vocabulary — what the oracle
    * does — would single-partition millions of rows at corpus scale.
    */
  def vocabulary(docs: DataFrame, k: Int = 10): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val cf = docs.select(explode(toks(col("text"))).as("tk"))
      .groupBy("tk").agg(count(lit(1)).as("cf"))
    val hist = cf.groupBy("cf").agg(count(lit(1)).as("nv"))
    val wCum = w.orderBy(col("cf").desc)
      .rowsBetween(w.unboundedPreceding, -1)
    val base = hist.withColumn("above",
      coalesce(sum(col("nv")).over(wCum), lit(0L)))
    val keptCf = base.filter(col("above") < k)
    val wIn = w.partitionBy("cf").orderBy(col("tk").asc)
    val ranked = cf.join(keptCf.select("cf", "above"), Seq("cf"))
      .withColumn("rank", col("above") + row_number().over(wIn))
      .filter(col("rank") <= k)
    val tot = cf.agg(sum(col("cf")).as("total"))
    val wCov = w.orderBy(col("rank").asc)
    ranked.crossJoin(broadcast(tot))
      .withColumn("cum_ppm",
        floor(lit(1000000.0d) * sum(col("cf")).over(wCov)
          / col("total").cast("double")).cast(LongType))
      .select(col("rank").cast(LongType).as("rank"), col("tk"),
        col("cf"), col("cum_ppm"))
  }

  /** Per-document out-of-vocabulary rate against the [[vocabulary]]
    * top-k — the signal that decides whether a vocabulary (or the
    * corpus slice) is usable: n_tokens, n_oov, oov_ppm per doc. The
    * vocabulary is top-k small by construction, so it broadcasts;
    * the probe is a per-occurrence broadcast left join + one doc
    * hash aggregate — linear, no shuffle beyond the doc rollup.
    */
  def oovRate(docs: DataFrame, k: Int = 10): DataFrame = {
    val vocab = vocabulary(docs, k).select(col("tk")).withColumn("_v", lit(1L))
    docs.select(col("doc_id"), explode(toks(col("text"))).as("tk"))
      .join(broadcast(vocab), Seq("tk"), "left")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("_v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        floor(lit(1000000.0d) * col("n_oov") / col("n_tokens").cast("double"))
          .cast(LongType).as("oov_ppm"))
  }

  /** Count-based bigram language model — the estimation half of the
    * rarity/perplexity family: per observed bigram (w1, w2) its count,
    * the w1 marginal, and the conditional P(w2|w1) in floored ppm.
    * The marginal comes from re-aggregating the bigram frame itself
    * (never a second corpus scan), so the whole operator is one
    * explode + two hash aggregates + one equi-join on w1 — linear in
    * token occurrences, output bounded by distinct bigrams.
    */
  def bigramModel(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    // struct-valued bigrams via the zip_with idiom (TextDedup.gramArray
    // rationale): zip the token array with its own 1-shift — each
    // split evaluates once per row; zip_with's null padding marks the
    // final position, filtered on the w2 field
    val pairs = filter(
      zip_with(t, slice(t, lit(2), size(t)),
        (a, b) => struct(a.as("w1"), b.as("w2"))),
      s => s.getField("w2").isNotNull)
    val bg = docs.select(explode(pairs).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy("w1").agg(sum(col("c12")).as("c1"))
    c12.join(c1, Seq("w1"))
      .select(col("w1"), col("w2"), col("c12"), col("c1"),
        floor(lit(1000000.0d) * col("c12") / col("c1").cast("double"))
          .cast(LongType).as("cond_ppm"))
  }

  /** BPE-ish token count: alpha runs, digit runs, single punctuation —
    * the standard cheap proxy for subword token counts.
    */
  val bpePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

  def bpeTokenCount(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(bpePattern), lit(0))).cast(LongType)
        .as("n_bpe"))

  /** Gopher-style rule-based quality filter (Rae et al. 2021 §A1.1
    * heuristics, re-expressed as exact integer signals so the verdict
    * is engine-portable):
    *
    *   - n_tokens          word count (reject < minTokens)
    *   - mean_len_x100     floor(100·Σlen(tok)/n) — rejects symbol soup
    *                       (< 3.00) and hash-like runs (> 10.00)
    *   - n_stop_distinct   distinct English stopwords present
    *                       (reject 0 — the "has ≥N stop words" rule)
    *   - top_tok_pct       floor(100·max token freq / n) — the
    *                       most-repeated-word ratio (reject > 20)
    *   - dup_2gram_pct     floor(100·duplicate bigram occurrences /
    *                       (n−1)) — within-doc repetition (reject > 10)
    *   - keep              1 iff every rule passes
    *
    * Plan: every signal except top_tok_pct is a single narrow pass
    * (pure column algebra — linear in input splits, no shuffle).
    * top_tok_pct is explode → two-level hash aggregate (map-side
    * combine) → co-partitioned join back on doc_id: the per-token
    * scan is O(doc length), never O(distinct·length), so a 100k-token
    * document costs the same per token as a tweet. That is the shape
    * that survives 100 TB; computing max-frequency inside a
    * higher-order expression (array_max over per-distinct filters)
    * would be quadratic per document and is deliberately avoided.
    */
  // rule thresholds — shared with the DuckDB oracle (Queries.scala)
  val qfMinTokens = 20L
  val qfMinMeanLenX100 = 300L
  val qfMaxMeanLenX100 = 1000L
  val qfMaxTopTokPct = 20L
  val qfMaxDup2gramPct = 10L

  def qualityFilter(docs: DataFrame,
                    minTokens: Long = qfMinTokens,
                    maxTopTokPct: Long = qfMaxTopTokPct,
                    maxDup2gramPct: Long = qfMaxDup2gramPct): DataFrame = {
    val t = toks(col("text"))
    val n = size(t).cast(LongType)
    val stops = array(stopwordsEn.map(lit): _*)
    val bigrams = TextDedup.gramArray(col("text"), 2)
    val narrow = docs.select(
      col("doc_id"),
      n.as("n_tokens"),
      floor(lit(100.0) * aggregate(t, lit(0L), (acc, x) => acc + length(x)) / n)
        .cast(LongType).as("mean_len_x100"),
      size(filter(array_distinct(t), x => array_contains(stops, x)))
        .cast(LongType).as("n_stop_distinct"),
      when(n > 1,
        floor(lit(100.0) * (n - 1 - size(array_distinct(bigrams))) / (n - 1)))
        .otherwise(lit(0)).cast(LongType).as("dup_2gram_pct"))
    val topf = docs.select(col("doc_id"), explode(t).as("tk"))
      .groupBy("doc_id", "tk").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("top_c"))
    narrow.join(topf, Seq("doc_id"))
      .withColumn("top_tok_pct",
        floor(lit(100.0) * col("top_c") / col("n_tokens")).cast(LongType))
      .withColumn("keep",
        (col("n_tokens") >= minTokens &&
          col("mean_len_x100") >= qfMinMeanLenX100 &&
          col("mean_len_x100") <= qfMaxMeanLenX100 &&
          col("n_stop_distinct") >= 1L &&
          col("top_tok_pct") <= maxTopTokPct &&
          col("dup_2gram_pct") <= maxDup2gramPct).cast(LongType))
      .select("doc_id", "n_tokens", "mean_len_x100", "n_stop_distinct",
        "dup_2gram_pct", "top_tok_pct", "keep")
  }

  /** exact rank-based length quantiles per source: pXX = the element
    * at row_number ceil(p·n) in (n_chars ASC, doc_id ASC) order — an
    * actual corpus value, no interpolation, so the result is
    * bit-identical in any engine (`percentile_cont`-style interpolated
    * doubles and Spark's `percentile_approx` are both engine-shaped).
    *
    * Plan: VALUE HISTOGRAM, not a per-row rank window. The element at
    * rank r in (n_chars, doc_id) order is fully determined by the
    * n_chars histogram — it is the smallest value whose cumulative
    * count reaches r (the doc_id tie-break only orders rows WITHIN one
    * value, never across values) — so the corpus pass is a map-side-
    * combining hash aggregate on (source, n_chars), and the shuffle +
    * cumulative window run over DISTINCT (source, length) pairs: a few
    * thousand rows at any corpus size, vs the previous formulation's
    * full within-source sort of every document row (the cost that
    * bound this operator at 100 TB). Same output bit-for-bit (the
    * rank-window oracle still gates it).
    */
  def lengthQuantiles(docs: DataFrame): DataFrame = {
    val hist = docs.groupBy(col("source"), col("n_chars"))
      .agg(count(lit(1)).as("cnt"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("n_chars").asc)
    val wn = org.apache.spark.sql.expressions.Window.partitionBy("source")
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(wc))
      .withColumn("n", sum(col("cnt")).over(wn))
    // rank target ceil(p·n) lands inside the first value whose
    // cumulative count reaches it
    def pick(p: Double): Column =
      min(when(col("cum") >=
        ceil(col("n").cast("double") * lit(p)).cast(LongType),
        col("n_chars")))
    cum.groupBy("source").agg(
      max(col("n")).as("n_docs"),
      pick(0.25).as("p25"), pick(0.5).as("p50"),
      pick(0.75).as("p75"), pick(0.95).as("p95"),
      max(col("n_chars")).as("max_chars"))
  }
}
