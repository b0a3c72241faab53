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

  /** per-stratum deterministic quota sample: the `quota` hash-least
    * documents of every stratum — reproducible mixture construction
    * (balance languages/sources regardless of corpus skew), the same
    * draw in any engine and stable under corpus growth within a
    * stratum's unchanged members.
    *
    * Scale path: selection reuses the map-side-truncating
    * [[org.apache.spark.sql.graft.TopKPairs]] aggregate — each
    * partition reduces a stratum to a ≤quota buffer before the
    * exchange, so the shuffle carries partitions·strata·quota entries.
    * The `ROW_NUMBER() OVER (PARTITION BY stratum ORDER BY hash)`
    * formulation this replaces shuffles the ENTIRE corpus to rank it.
    * Hash order ascending = TopKPairs best-first on the negated hash
    * (hash32 < 2^32, exact in double); doc_id ASC breaks duplicate-
    * content ties.
    */
  def stratifiedSample(docs: DataFrame, strataCol: String, keyCol: Column,
      quota: Int): DataFrame = {
    val base = docs.select(col(strataCol), col("doc_id"),
      (-TextDedup.hash32(keyCol)).cast("double").as("ord"))
    base.groupBy(strataCol)
      .agg(org.apache.spark.sql.graft.TopKPairs(col("ord"), col("doc_id"), quota).as("top"))
      .select(col(strataCol), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col(strataCol), col("t").getField("id").as("doc_id"),
        (col("pos") + 1).cast(LongType).as("rank"))
  }

  /** Sample-LEDGER rollup — the quota-sampling sibling of
    * Sketch.hllLedger, built from composition alone: TopKPairs'
    * output array IS its mergeable state, because "hash-least quota"
    * is monotone under union (the quota smallest keys of a corpus are
    * a subset of the union of each ingest window's quota smallest).
    * So per-window draws persist next to their partitions, and any
    * later rollup re-aggregates the stored (ord, id) entries through
    * the SAME TopKPairs comparator — landing bit-identical to a
    * one-pass draw over the whole corpus (shared oracle), while the
    * rollup touches ≤quota rows per (stratum, window) instead of
    * rescanning documents.
    *
    * `windowCol` is the ingest-cycle key (day, batch id, shard...).
    * Output matches [[stratifiedSample]] exactly.
    */
  def stratifiedSampleLedger(docs: DataFrame, strataCol: String,
      keyCol: Column, quota: Int, windowCol: Column): DataFrame = {
    val base = docs.select(col(strataCol), windowCol.as("w"), col("doc_id"),
      (-TextDedup.hash32(keyCol)).cast("double").as("ord"))
    val perWindow = base.groupBy(col(strataCol), col("w"))
      .agg(org.apache.spark.sql.graft.TopKPairs(col("ord"), col("doc_id"), quota).as("top"))
    perWindow.select(col(strataCol), explode(col("top")).as("t"))
      .select(col(strataCol), col("t").getField("ord").as("ord"),
        col("t").getField("id").as("doc_id"))
      .groupBy(strataCol)
      .agg(org.apache.spark.sql.graft.TopKPairs(col("ord"), col("doc_id"), quota).as("top"))
      .select(col(strataCol), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col(strataCol), col("t").getField("id").as("doc_id"),
        (col("pos") + 1).cast(LongType).as("rank"))
  }

  /** deterministic WEIGHTED sample without replacement: the `quota`
    * documents per stratum with the least hash/weight priority — an
    * integer-hash discretization of the Efraimidis–Spirakis A-ES
    * scheme (keys u^(1/w); taking h/w as the order statistic biases
    * selection toward large weights the same way while staying
    * engine-exact: h = md5-derived 32-bit hash and w are both exactly
    * representable doubles, and one IEEE division is correctly rounded
    * identically in any engine — no ln(), no rand()). Weighting by
    * n_chars (the shipped query) draws a length-biased corpus sample —
    * the curation pass that wants token-mass coverage, not doc-count
    * coverage. Weights are clamped to ≥ 1 (a zero-weight row must not
    * produce an engine-shaped 0/0).
    *
    * Same scale path as [[stratifiedSample]]: TopKPairs truncates to
    * ≤quota entries per (stratum, partition) map-side, so the shuffle
    * never carries the corpus; draw is stable under corpus growth.
    */
  def weightedSample(docs: DataFrame, strataCol: String, keyCol: Column,
      weightCol: Column, quota: Int): DataFrame = {
    val pri = -(TextDedup.hash32(keyCol).cast("double") /
      greatest(weightCol, lit(1L)).cast("double"))
    val base = docs.select(col(strataCol), col("doc_id"), pri.as("ord"))
    base.groupBy(strataCol)
      .agg(org.apache.spark.sql.graft.TopKPairs(col("ord"), col("doc_id"), quota).as("top"))
      .select(col(strataCol), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col(strataCol), col("t").getField("id").as("doc_id"),
        (col("pos") + 1).cast(LongType).as("rank"))
  }

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

  /** token-budget mixture plan: given a total training-token budget,
    * split it equally across sources and compute each source's
    * deterministic acceptance rate in parts-per-million —
    *
    *   tokens_avail(src) = Σ word counts over the source's docs
    *   share_target      = floor(budget / n_sources)
    *   accept_ppm        = min(10⁶, floor(10⁶·share_target/tokens_avail))
    *
    * accept_ppm plugs straight into [[deterministicSample]]-style
    * hash-threshold filters (hash % 10⁶ < accept_ppm), giving a
    * reproducible corpus mix that hits the budget in expectation:
    * under-represented sources are taken whole (ppm = 10⁶), abundant
    * sources are down-sampled. Integer end-to-end — no float share
    * drifts between engines.
    *
    * Plan: one narrow word-count map, one hash aggregate on source,
    * and the (n_sources)-row grand total re-attached as a broadcast
    * 1-row crossJoin — the corpus is scanned exactly once, nothing
    * here grows with anything but the number of sources.
    */
  def mixPlan(docs: DataFrame, budgetTokens: Long): DataFrame = {
    val perSource = docs
      .select(col("source"), size(split(col("text"), " ")).cast(LongType).as("n_tok"))
      .groupBy("source").agg(sum(col("n_tok")).as("tokens_avail"))
    val nSources = perSource.agg(count(lit(1)).as("n_sources"))
    perSource.crossJoin(broadcast(nSources))
      .withColumn("share_target",
        floor(lit(budgetTokens) / col("n_sources")).cast(LongType))
      .withColumn("accept_ppm",
        least(lit(1000000L),
          floor(lit(1000000.0) * col("share_target") / col("tokens_avail")))
          .cast(LongType))
      .select("source", "tokens_avail", "share_target", "accept_ppm")
  }

  /** GPT-style sequence-packing manifest: training corpora are
    * consumed as documents CONCATENATED in a deterministic order and
    * CHUNKED into fixed `seqLen`-token windows (concat-then-chunk —
    * the standard pretraining packing; documents straddle sequence
    * boundaries rather than leaving pad waste). This computes each
    * document's placement in that layout without materializing a
    * single token: token count, global start offset within its
    * source's stream (docs in doc_id order), and the first/last/count
    * of the training sequences it lands in. Downstream loaders use
    * the manifest to slice shards and to map a training sequence back
    * to its source documents (provenance/attribution).
    *
    * Output (doc_id, source, n_tokens, start_off, first_seq,
    * last_seq, n_seqs). The offset→sequence mapping is INTEGER
    * division (`div`) — exact at any offset, where a double `/` would
    * lose exactness past 2⁵³ accumulated tokens per source.
    *
    * Scale shape: one narrow token-count map + ONE running-sum window
    * per source — the packing domain. Sources are the natural unit
    * (mixture weights apply per source) and the window shuffles once
    * on the source key; a single source too large for one task is
    * pre-split by a deterministic shard key (hash(doc_id) mod k added
    * to the partition key — same plan, k-way parallel) with per-shard
    * offsets rebased by one k-row broadcast of shard totals.
    */
  def seqPack(docs: DataFrame, seqLen: Int = 512): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
      .withColumn("start_off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("first_seq", expr(s"start_off div $seqLen"))
      .withColumn("last_seq", expr(s"(start_off + n_tokens - 1) div $seqLen"))
      .withColumn("n_seqs", (col("last_seq") - col("first_seq") + 1L))
  }
}
