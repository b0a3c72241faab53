package graft

import org.apache.spark.sql.functions._
import graft.core._

/** the scalar-ops tail (reference scalar.py:138-146, expr.py:293-339,
  * 498-504, 1901-1915): neg/invert, accumulated scalar merge, lazy
  * scalar as extract index and as a bound operand.
  */
class ScalarOpsSpec extends SparkSpec {

  private def vec = GrbVector.fromValues(spark,
    Seq((0L, 10L: Any), (2L, 30L: Any), (5L, -7L: Any)), GrbType.INT64, 6L)

  test("scalar neg / invert; empty stays empty") {
    val s = GrbScalar.fromValue(spark, 42, GrbType.INT32)
    assert(s.neg.value.get == -42)
    assert(s.neg.dtype == GrbType.INT32)
    val b = GrbScalar.fromValue(spark, true, GrbType.BOOL)
    assert(b.invert.value.get == false)
    assert(GrbScalar.empty(spark, GrbType.INT32).neg.isEmpty)
  }

  test("reduceInto merges with accumulator; empty branches behave") {
    val t = GrbScalar.fromValue(spark, 100L, GrbType.INT64)
    assert(vec.reduceInto(t, Ops.plusMonoid, Some(Ops.plus)).value.get == 133L)
    // no accum -> result replaces target (cast to target dtype)
    assert(vec.reduceInto(t, Ops.plusMonoid, None).value.get == 33L)
    // empty reduction + accum -> target survives
    val empty = GrbVector.empty(spark, GrbType.INT64, 4L)
    assert(empty.reduceInto(t, Ops.plusMonoid, Some(Ops.plus)).value.get == 100L)
    // empty reduction, empty target -> empty
    val et = GrbScalar.empty(spark, GrbType.INT64)
    assert(empty.reduceInto(et, Ops.plusMonoid, Some(Ops.plus)).isEmpty)
  }

  test("lazy scalar as extract index (expr.py:498-504)") {
    val ix = GrbScalar.fromValue(spark, 2L, GrbType.INT64)
    assert(vec.extractAt(ix).value.get == 30L)
    // negative lazy index normalizes against the dimension
    val neg = GrbScalar.fromValue(spark, -1L, GrbType.INT64)
    assert(vec.extractAt(neg).value.get == -7L)
    // index at an empty slot -> empty scalar
    val hole = GrbScalar.fromValue(spark, 3L, GrbType.INT64)
    assert(vec.extractAt(hole).isEmpty)
  }

  test("lazy scalar bound as left/right operand (no driver materialization)") {
    val s = GrbScalar.fromValue(spark, 2L, GrbType.INT64)
    val r = vec.applyRightScalar(Ops.times, s)
    assert(r.toValues.toMap == Map(0L -> 20L, 2L -> 60L, 5L -> -14L))
    val l = vec.applyLeftScalar(Ops.minus, s)
    assert(l.toValues.toMap == Map(0L -> -8L, 2L -> -28L, 5L -> 9L))
  }

  test("matrix reduceScalarInto") {
    val m = GrbMatrix.fromValues(spark,
      Seq((0L, 0L, 5L: Any), (1L, 1L, 6L: Any)), GrbType.INT64, 2L, 2L)
    val t = GrbScalar.fromValue(spark, 1L, GrbType.INT64)
    assert(m.reduceScalarInto(t, Ops.plusMonoid, Some(Ops.plus)).value.get == 12L)
  }
}
