// Hosted under the Spark namespace: FunctionRegistry internals and the
// classic SparkSession's sessionState are private[sql].
package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.IntegerType

/** SQL-surface registration for the graft custom expressions, so the
  * engine's Catalyst extensions are first-class `spark.sql(...)`
  * citizens, not Scala-only Column helpers:
  *
  *  - `graft_quantized_dot(a, b)` — exact integer dot product of two
  *    `array<bigint>` quantized vectors (codegen [[QuantizedDot]]);
  *  - `graft_topk(ord, id, k)` — map-side-truncating top-k aggregate
  *    ([[TopKPairs]]); `k` must be an integer literal (it sizes the
  *    aggregation buffer at plan time);
  *  - `graft_hll(hash)` — deterministic HLL register aggregate
  *    ([[HllRegisters]]) over a 60-bit hash, returning `sum_scaled`;
  *  - `graft_hll_state(hash)` / `graft_hll_merge(state)` /
  *    `graft_hll_estimate(state)` — the persistable sketch-ledger
  *    trio ([[HllState]]/[[HllMergeState]]/[[HllEstimate]]);
  *  - `graft_cms_state(packed)` / `graft_cms_merge(state)` /
  *    `graft_cms_estimate(state, packed)` — the Count-Min frequency
  *    trio ([[CmsState]]/[[CmsMergeState]]/[[CmsEstimate]]) over the
  *    packed 4×16-bit position vector;
  *  - `graft_bloom_state(packed)` / `graft_bloom_merge(state)` /
  *    `graft_bloom_maybe(state, packed)` — the Bloom set-membership
  *    trio ([[BloomState]]/[[BloomMergeState]]/[[BloomMaybe]]), same
  *    packing with positions mod 65536.
  *
  * Two attachment routes, same descriptors:
  *  - config: `spark.sql.extensions = graft.GraftExtensions` applies
  *    [[inject]] when the session is BUILT (the production route — a
  *    cluster user gets the functions in every session, including
  *    `newSession()` forks, with zero code);
  *  - runtime: [[register]] adds them to an already-running session's
  *    function registry (notebooks attaching graft to a live session).
  */
object GraftFunctions {

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  private def arity(name: String, n: Int)(b: Seq[Expression] => Expression): FunctionBuilder =
    args => if (args.length == n) b(args)
      else fail(s"$name takes $n argument(s), got ${args.length}")

  /** (identifier, info, builder) descriptors, the shape both
    * `SparkSessionExtensions.injectFunction` and
    * `FunctionRegistry.registerFunction` consume.
    */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] = Seq(
    (FunctionIdentifier("graft_quantized_dot"),
      new ExpressionInfo(classOf[QuantizedDot].getName, "graft_quantized_dot"),
      arity("graft_quantized_dot(a, b)", 2)(args => QuantizedDot(args(0), args(1)))),
    (FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKPairs].getName, "graft_topk"),
      arity("graft_topk(ord, id, k)", 3) { args =>
        // k sizes the fixed aggregation buffer — it must be known at
        // plan time, so only foldable integer expressions are accepted
        val k = args(2) match {
          case e if e.foldable && e.dataType == IntegerType =>
            e.eval() match {
              case i: java.lang.Integer => i.intValue()
              case other => fail(s"graft_topk: k evaluated to $other, expected an integer literal")
            }
          case _ => fail("graft_topk: k must be an integer literal")
        }
        TopKPairs(args(0), args(1), k)
      }),
    (FunctionIdentifier("graft_hll"),
      new ExpressionInfo(classOf[HllRegisters].getName, "graft_hll"),
      arity("graft_hll(hash)", 1)(args => HllRegisters(args(0)))),
    (FunctionIdentifier("graft_hll_state"),
      new ExpressionInfo(classOf[HllState].getName, "graft_hll_state"),
      arity("graft_hll_state(hash)", 1)(args => HllState(args(0)))),
    (FunctionIdentifier("graft_hll_merge"),
      new ExpressionInfo(classOf[HllMergeState].getName, "graft_hll_merge"),
      arity("graft_hll_merge(state)", 1)(args => HllMergeState(args(0)))),
    (FunctionIdentifier("graft_hll_estimate"),
      new ExpressionInfo(classOf[HllEstimate].getName, "graft_hll_estimate"),
      arity("graft_hll_estimate(state)", 1)(args => HllEstimate(args(0)))),
    (FunctionIdentifier("graft_cms_state"),
      new ExpressionInfo(classOf[CmsState].getName, "graft_cms_state"),
      arity("graft_cms_state(packed)", 1)(args => CmsState(args(0)))),
    (FunctionIdentifier("graft_cms_merge"),
      new ExpressionInfo(classOf[CmsMergeState].getName, "graft_cms_merge"),
      arity("graft_cms_merge(state)", 1)(args => CmsMergeState(args(0)))),
    (FunctionIdentifier("graft_cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "graft_cms_estimate"),
      arity("graft_cms_estimate(state, packed)", 2)(args => CmsEstimate(args(0), args(1)))),
    (FunctionIdentifier("graft_bloom_state"),
      new ExpressionInfo(classOf[BloomState].getName, "graft_bloom_state"),
      arity("graft_bloom_state(packed)", 1)(args => BloomState(args(0)))),
    (FunctionIdentifier("graft_bloom_merge"),
      new ExpressionInfo(classOf[BloomMergeState].getName, "graft_bloom_merge"),
      arity("graft_bloom_merge(state)", 1)(args => BloomMergeState(args(0)))),
    (FunctionIdentifier("graft_bloom_maybe"),
      new ExpressionInfo(classOf[BloomMaybe].getName, "graft_bloom_maybe"),
      arity("graft_bloom_maybe(state, packed)", 2)(args => BloomMaybe(args(0), args(1)))))

  /** config-route hook: called by `graft.GraftExtensions` during
    * session build for every descriptor.
    */
  def inject(ext: SparkSessionExtensions): Unit = all.foreach(ext.injectFunction)

  /** runtime-route hook: register into a live session's function
    * registry (idempotent — re-registering replaces the entry).
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    all.foreach { case (id, fi, b) => reg.registerFunction(id, fi, b) }
  }
}
