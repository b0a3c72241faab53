// Hosted under the Spark namespace: AbstractDataType and the classic
// Column<->Expression converters are private[sql].
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Sorted best-first top-k buffer of (ord, id) pairs.
  *
  * Ordering matches `ORDER BY ord DESC, id ASC` in both Spark and
  * DuckDB, including the two non-finite corners:
  *  - NaN sorts greatest (hence `java.lang.Double.compare`, not
  *    primitive `>`);
  *  - NULL ord sorts LAST but the row is KEPT — Spark's `Divide`
  *    yields null (not NaN) on a zero denominator in non-ANSI mode,
  *    so a zero-norm vector's cosine is null, and the row_number()
  *    window this aggregate replaces still ranked those rows (desc →
  *    nulls last, ties by id ASC; DuckDB's default null order
  *    agrees). Dropping them would unassign zero vectors from ANN
  *    cells and silently shrink brute-force top-k lists.
  */
final class TopKBuf(val k: Int) {
  val ord = new Array[Double](k)
  val id = new Array[Long](k)
  val isNull = new Array[Boolean](k)
  var n = 0

  /** true when (n1, o1, i1) ranks strictly before (n2, o2, i2) */
  @inline private def before(nl1: Boolean, o1: Double, i1: Long,
      nl2: Boolean, o2: Double, i2: Long): Boolean = {
    if (nl1 != nl2) nl2 // non-null beats null
    else if (nl1) i1 < i2 // both null: id ASC
    else {
      val c = java.lang.Double.compare(o1, o2)
      c > 0 || (c == 0 && i1 < i2)
    }
  }

  def insert(o: Double, i: Long): Unit = insertEntry(nl = false, o, i)
  def insertNullOrd(i: Long): Unit = insertEntry(nl = true, 0.0, i)

  def insertEntry(nl: Boolean, o: Double, i: Long): Unit = {
    var pos = n
    while (pos > 0 && before(nl, o, i, isNull(pos - 1), ord(pos - 1), id(pos - 1))) pos -= 1
    if (pos >= k) return
    var j = math.min(n, k - 1)
    while (j > pos) {
      ord(j) = ord(j - 1); id(j) = id(j - 1); isNull(j) = isNull(j - 1); j -= 1
    }
    ord(pos) = o
    id(pos) = i
    isNull(pos) = nl
    if (n < k) n += 1
  }
}

/** Top-k (ord: double, id: bigint) pairs per group as a typed
  * imperative aggregate — `array<struct<ord, id>>` sorted best-first
  * (`ord` DESC, `id` ASC tie-break, NaN greatest).
  *
  * Why not `row_number() OVER (PARTITION BY g ORDER BY ord DESC)`:
  * the window SHUFFLES every scored row to rank them — for ANN cell
  * assignment that is n·k rows (n^1.5 at the auto rule k = √n, the
  * binding cost called out in round 8's scaladoc). This aggregate
  * truncates to k entries inside the map-side partial, so the shuffle
  * carries one ≤k-entry buffer per group per partition — O(n·probes)
  * bytes total, and when the scoring crossJoin preserves the base
  * partitioning (broadcast centroids), exactly one buffer per group.
  * Null-ord rows rank last-but-present (see [[TopKBuf]]); null-id
  * rows are skipped (no window analogue ever produced one).
  *
  * The blocked-out alternative `slice(array_sort(collect_list(...)))`
  * is NOT equivalent at scale: collect_list's partial state is the
  * whole group — nothing truncates before the shuffle.
  */
case class TopKPairs(
    ordExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuf] with ExpectsInputTypes {

  require(k > 0, s"TopKPairs: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(ordExpr, idExpr)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  // ord is nullable: a kept null-ord entry (zero-norm cosine) reports
  // its ord as null, matching what the scored frame held
  override def dataType: DataType = ArrayType(
    new StructType()
      .add("ord", DoubleType, nullable = true)
      .add("id", LongType, nullable = false),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val o = ordExpr.eval(input)
    val i = idExpr.eval(input)
    if (i != null) {
      if (o != null) buf.insert(o.asInstanceOf[Double], i.asInstanceOf[Long])
      else buf.insertNullOrd(i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = {
    var i = 0
    while (i < b2.n) { b1.insertEntry(b2.isNull(i), b2.ord(i), b2.id(i)); i += 1 }
    b1
  }

  override def eval(buf: TopKBuf): Any = {
    val rows = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      rows(i) = InternalRow(if (buf.isNull(i)) null else buf.ord(i), buf.id(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 17 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) {
      bb.put(if (buf.isNull(i)) 1.toByte else 0.toByte)
      bb.putDouble(buf.ord(i)); bb.putLong(buf.id(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuf(k)
    // entries arrive already sorted best-first; insert preserves order
    var i = 0
    while (i < n) { buf.insertEntry(bb.get() == 1, bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(ordExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKPairs {
  /** Column-level entry point: top-`k` (ord, id) pairs, best-first. */
  def apply(ord: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKPairs(ExpressionUtils.expression(ord), ExpressionUtils.expression(id), k)
        .toAggregateExpression())
}
