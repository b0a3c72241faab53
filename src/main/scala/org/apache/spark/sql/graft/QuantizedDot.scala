// Hosted under the Spark namespace: AbstractDataType and the classic
// Column<->Expression converters are private[sql].
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Integer dot product of two `array<bigint>` columns as a native
  * Catalyst expression with code generation.
  *
  * This is the one hot-path spot where built-in operators genuinely
  * fall short: `aggregate(zip_with(a, b, _*_), 0L, _+_)` routes through
  * higher-order-function lambda evaluation (CodegenFallback — breaks
  * the surrounding whole-stage-codegen span and allocates a lambda
  * frame per element), while ANN candidate verification evaluates
  * millions of 64-element dots. The generated code is a tight
  * primitive loop.
  *
  * Null semantics match the HOF formulation it replaces: null input,
  * mismatched lengths, or any null element → null.
  */
case class QuantizedDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val buf = new Array[Long](1)
    if (GraftDot.macc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], buf))
      buf(0)
    else null
  }

  /** Generated code CALLS the precompiled [[GraftDot.macc]] helper
    * instead of inlining the multiply-accumulate loop (round-14
    * profiling, PERF_NOTES §17): the p_ann_lsh verify stage evaluates
    * ~10M dots and its whole-stage class runs INTERPRETED until C2
    * lands — with the loop inlined in generated Java that tax was
    * measured at 59.5 executor-CPU-s for work that costs 1.6 s warm
    * (a 37× JIT-state lottery the bench's fresh-context reps re-draw
    * every rep, and the one mechanism invisible to the gc/psi/bw
    * window meters). A static call keeps the O(dims) inner loop at
    * compiled-library speed always — only the thin per-row glue ever
    * interprets — and shrinks the generated method toward the JIT's
    * inlining/HugeMethodLimit comfort zone. The per-operator long[1]
    * scratch slot avoids boxing the nullable result.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val buf = ctx.addMutableState("long[]", "graftDotBuf", v => s"$v = new long[1];")
    nullSafeCodeGen(ctx, ev, (x, y) => {
      s"""
         |if (org.apache.spark.sql.graft.GraftDot.macc($x, $y, $buf)) {
         |  ${ev.value} = $buf[0];
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedDot =
    copy(left = newLeft, right = newRight)
}

object QuantizedDot {
  /** Column-level entry point */
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(
      QuantizedDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

/** Precompiled hot loops shared by QuantizedDot's generated code and
  * its interpreted eval. A top-level object so scalac emits a static
  * forwarder — generated Java calls `GraftDot.macc(...)` directly.
  */
object GraftDot {
  /** multiply-accumulate: out(0) = Σ x(i)·y(i); returns false (null
    * result) on length mismatch or any null element — the HOF
    * `aggregate(zip_with(...))` null contract QuantizedDot replaces.
    */
  def macc(x: ArrayData, y: ArrayData, out: Array[Long]): Boolean = {
    val n = x.numElements()
    if (n != y.numElements()) return false
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return false
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    out(0) = acc
    true
  }
}
