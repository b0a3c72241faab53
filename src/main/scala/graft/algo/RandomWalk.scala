package graft.algo

import Iterate.FreshOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core._

/** DETERMINISTIC random walks — the DeepWalk/node2vec corpus
  * generator: one fixed-length walk from every vertex, the sentence
  * stream a graph-embedding trainer consumes (reference surface:
  * composes the extract/mxv-style gather the dask_grblas adjacency
  * supports; the walk corpus itself is pipeline surface beyond the
  * reference, like the text dedup family).
  *
  * Determinism: the "random" neighbour choice at step t from vertex
  * cur on the walk started at s is hash-driven —
  * idx = md5(s ⊕ cur ⊕ t) mod deg(cur) — the corpus-reproducibility
  * property a training pipeline needs (re-running the pipeline
  * regenerates byte-identical training data; the md5-based hash32 is
  * the same one the dedup family shares with its oracles, so an
  * external engine replays every step bit-for-bit). Keying the hash
  * on (start, cur, t) keeps walks from collapsing onto shared
  * trajectories after a collision: two walks meeting at a vertex
  * diverge again.
  *
  * Scale shape: the adjacency is ranked ONCE per source vertex
  * (window partitioned by vertex — per-group, never corpus-wide),
  * degree-attached, and cached pre-partitioned on the gather key;
  * each step is then two equi-joins — position×degree to draw the
  * index, position×adjacency on (vertex, idx) to move — shuffling
  * only the O(V) position frame, never the O(E) adjacency. Steps are
  * checkpointed with superseded blocks freed (the Iterate
  * discipline). Symmetric input means no dead ends: every started
  * walk has full length.
  */
object RandomWalk {

  /** @param a     symmetric adjacency; values ignored
    * @param steps walk length in edges (output has steps+1 rows per
    *              start vertex)
    * @return (start, step, vertex): the walk corpus, step 0 = start
    */
  def walks(a: GrbMatrix, steps: Int = 4): DataFrame = {
    if (a.nrows != a.ncols) GraphblasException.dimensionMismatch(
      s"walk adjacency must be square: ${a.nrows}x${a.ncols}")
    val ranked = a.df.select(col("i").as("v"), col("j").as("nbr"))
      .withColumn("idx",
        (row_number().over(Window.partitionBy("v").orderBy("nbr")) - 1)
          .cast("long"))
    val deg = ranked.groupBy("v").agg(count(lit(1)).as("deg"))
      .repartition(col("v")).cache()
    val indexed = ranked.repartition(col("v")).cache() // (v, nbr, idx)
    var pos = deg.select(col("v").as("start"))
      .select(col("start"), lit(0L).as("step"), col("start").as("cur"))
      .freshCheckpoint(true)
    // every step's rows are OUTPUT — nothing is superseded, so the
    // per-step checkpoints all stay live until the caller drops the
    // result (unlike the fixpoint loops, which free old rounds)
    val parts = scala.collection.mutable.ListBuffer[DataFrame](pos)
    for (t <- 1 to steps) {
      val drawn = pos
        .join(deg.select(col("v").as("cur"), col("deg")), Seq("cur"))
        .withColumn("_ix", pmod(graft.pipeline.TextDedup.hash32(
          concat_ws("_", col("start"), col("cur"), lit(t))), col("deg")))
      val nxt = drawn
        .join(indexed.select(col("v").as("cur"), col("idx").as("_ix"),
          col("nbr")), Seq("cur", "_ix"))
        .select(col("start"), lit(t.toLong).as("step"), col("nbr").as("cur"))
        .freshCheckpoint(true)
      parts += nxt
      pos = nxt
    }
    deg.unpersist(false)
    indexed.unpersist(false)
    parts.reduce(_.unionByName(_))
      .select(col("start"), col("step"), col("cur").as("vertex"))
  }

  /** Skip-gram pair extraction over the walk corpus — the step that
    * turns walks into embedding TRAINING DATA (word2vec objective:
    * predict context from center): every ordered (center, context)
    * pair within ±window positions on the same walk, counted. One
    * self-equi-join on the walk key (each walk is L+1 rows — the join
    * emits ≤ (L+1)·2w rows per walk, a constant) + one hash
    * aggregate; linear in corpus size.
    *
    * @return (center, context, cnt) with center ≠ context positions
    *         (same VERTEX may co-occur — a walk can revisit)
    */
  def skipGrams(walks: DataFrame, window: Int = 2): DataFrame =
    walks.select(col("start"), col("step").as("s1"), col("vertex").as("center"))
      .join(walks.select(col("start"), col("step").as("s2"),
        col("vertex").as("context")), Seq("start"))
      .filter(col("s1") =!= col("s2") &&
        abs(col("s1") - col("s2")) <= window)
      .groupBy(col("center"), col("context"))
      .agg(count(lit(1)).as("cnt"))
}
