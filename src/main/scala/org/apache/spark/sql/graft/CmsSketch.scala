// Hosted under the Spark namespace: AbstractDataType and the classic
// Column<->Expression converters are private[sql].
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Deterministic Count-Min sketch (depth d = 4, width w = 1024).
  *
  * Point-frequency telemetry at corpus scale: the buffer is a d×w
  * grid of 64-bit counters (32 KiB serialized); `update` bumps one
  * counter per row at the key's md5-derived column, `merge` is
  * elementwise SUM — associative and order-free, so the map-side
  * partial reduces ANY number of token occurrences to one 32 KiB
  * state before the exchange. A frequency watchlist over 100 TB
  * shuffles one grid per (group, partition) instead of expanding
  * every distinct token the way an exact `GROUP BY token` does, and
  * persisted per-shard states roll up by pure counter addition
  * ([[CmsMergeState]]) without rescanning the raw keys.
  *
  * Determinism contract (why this approximate sketch hash-matches
  * across engines): the d column indices come from disjoint 8-hex-char
  * windows of md5(key) mod w — identical in any engine — and both
  * update and merge are integer sums, so the grid is a pure function
  * of the input MULTISET. The estimate for a key is the MIN over its
  * d counters (classic CMS upper bound: over-counts only via
  * collisions, error ≤ e·N/w with prob 1−e^−d). The DuckDB oracle
  * mirrors the grid as `GROUP BY (row, column)` counts and takes the
  * same MIN — bit-identical despite the approximation.
  *
  * Input is the PACKED position vector (see
  * graft.pipeline.Sketch.cmsPacked): pos_i in 16-bit lanes of one
  * long, `packed = Σ_i pos_i << 16i`, computed by codegen md5/conv
  * expressions outside the aggregate so the hot loop is two shifts
  * and an array bump per row.
  */
object Cms {
  val Depth = 4
  val Width = 1024
  val Cells: Int = Depth * Width // 4096 longs, 32 KiB serialized

  final class Buf {
    val counts = new Array[Long](Cells)
  }

  def serialize(buf: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(Cells * 8)
    var i = 0
    while (i < Cells) { bb.putLong(buf.counts(i)); i += 1 }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    require(bytes.length == Cells * 8,
      s"Cms: expected a ${Cells * 8}-byte state, got ${bytes.length}")
    val buf = new Buf
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var i = 0
    while (i < Cells) { buf.counts(i) = bb.getLong(); i += 1 }
    buf
  }

  def bump(buf: Buf, packed: Long): Unit = {
    var r = 0
    while (r < Depth) {
      val pos = ((packed >>> (16 * r)) & 0xffffL).toInt
      buf.counts(r * Width + (pos & (Width - 1))) += 1L
      r += 1
    }
  }

  def mergeInto(b1: Buf, b2: Buf): Buf = {
    var i = 0
    while (i < Cells) { b1.counts(i) += b2.counts(i); i += 1 }
    b1
  }
}

/** Count-Min register aggregate: eval returns the d×w counter grid as
  * a 32 KiB binary state — the PERSISTABLE form (write it next to the
  * shard/day partition; roll up later with [[CmsMergeState]]).
  */
case class CmsState(
    packedExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Cms.Buf] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(packedExpr)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Cms.Buf = new Cms.Buf

  override def update(buf: Cms.Buf, input: InternalRow): Cms.Buf = {
    val p = packedExpr.eval(input)
    if (p != null) Cms.bump(buf, p.asInstanceOf[Long])
    buf
  }

  override def merge(b1: Cms.Buf, b2: Cms.Buf): Cms.Buf = Cms.mergeInto(b1, b2)

  override def eval(buf: Cms.Buf): Any = Cms.serialize(buf)
  override def serialize(buf: Cms.Buf): Array[Byte] = Cms.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Cms.Buf = Cms.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsState =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsState =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsState =
    copy(packedExpr = newChildren(0))
}

object CmsState {
  def apply(packed: Column): Column =
    ExpressionUtils.column(
      CmsState(ExpressionUtils.expression(packed)).toAggregateExpression())
}

/** Union of persisted [[CmsState]] grids: elementwise counter sum.
  * Counter addition is associative and order-free, so
  * merge(states of parts) == state of the union, bit-for-bit — the
  * rollup touches 32 KiB per input row, never the raw keys.
  */
case class CmsMergeState(
    stateExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Cms.Buf] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(stateExpr)
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Cms.Buf = new Cms.Buf

  override def update(buf: Cms.Buf, input: InternalRow): Cms.Buf = {
    val s = stateExpr.eval(input)
    if (s != null) Cms.mergeInto(buf, Cms.deserialize(s.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(b1: Cms.Buf, b2: Cms.Buf): Cms.Buf = Cms.mergeInto(b1, b2)

  override def eval(buf: Cms.Buf): Any = Cms.serialize(buf)
  override def serialize(buf: Cms.Buf): Array[Byte] = Cms.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Cms.Buf = Cms.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeState =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeState =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsMergeState =
    copy(stateExpr = newChildren(0))
}

object CmsMergeState {
  def apply(state: Column): Column =
    ExpressionUtils.column(
      CmsMergeState(ExpressionUtils.expression(state)).toAggregateExpression())
}

/** Point estimate from a persisted grid: min over the key's d
  * counters — a scalar codegen expression, so a stored sketch answers
  * watchlist probes without re-aggregating anything. Null on a
  * malformed state (wrong length), like [[HllEstimate]].
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(state: Any, packed: Any): Any = {
    val bytes = state.asInstanceOf[Array[Byte]]
    if (bytes.length != Cms.Cells * 8) null
    else {
      val p = packed.asInstanceOf[Long]
      var best = Long.MaxValue
      var r = 0
      while (r < Cms.Depth) {
        val pos = ((p >>> (16 * r)) & 0xffffL).toInt & (Cms.Width - 1)
        val off = (r * Cms.Width + pos) * 8
        var v = 0L
        var i = 0
        while (i < 8) { v = (v << 8) | (bytes(off + i) & 0xffL); i += 1 }
        if (v < best) best = v
        r += 1
      }
      best
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (st, pk) => {
      val r = ctx.freshName("r")
      val i = ctx.freshName("i")
      val pos = ctx.freshName("pos")
      val off = ctx.freshName("off")
      val v = ctx.freshName("v")
      val best = ctx.freshName("best")
      s"""
         |if ($st.length != ${Cms.Cells * 8}) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $best = Long.MAX_VALUE;
         |  for (int $r = 0; $r < ${Cms.Depth}; $r++) {
         |    int $pos = (int) (($pk >>> (16 * $r)) & 0xffffL) & ${Cms.Width - 1};
         |    int $off = ($r * ${Cms.Width} + $pos) * 8;
         |    long $v = 0L;
         |    for (int $i = 0; $i < 8; $i++) {
         |      $v = ($v << 8) | ($st[$off + $i] & 0xffL);
         |    }
         |    if ($v < $best) $best = $v;
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  def apply(state: Column, packed: Column): Column =
    ExpressionUtils.column(CmsEstimate(
      ExpressionUtils.expression(state), ExpressionUtils.expression(packed)))
}
