package graft

import graft.core._
import graft.core.Syntax._

/** the reference's infix surface (base.py:181-188 + updater protocol)
  * expressed in Scala: `|`/`&` pending expressions, `%*%` products,
  * `C(mask, accum, replace) << result`.
  */
class SyntaxSpec extends SparkSpec {

  private def vec(m: Map[Long, Long], n: Long = 6L) =
    GrbVector.fromValues(spark, m.toSeq.map { case (i, v) => (i, v: Any) },
      GrbType.INT64, n)

  private def values(v: GrbVector): Map[Long, Long] =
    v.toValues.map { case (i, x) => i -> x.asInstanceOf[Long] }.toMap

  test("union / intersection pending expressions") {
    val a = vec(Map(0L -> 5L, 1L -> 9L))
    val b = vec(Map(1L -> 3L, 2L -> 7L))
    assert(values((a | b)(Ops.min)) == Map(0L -> 5L, 1L -> 3L, 2L -> 7L))
    assert(values((a & b)(Ops.plus)) == Map(1L -> 12L))
  }

  test("%*% products: mxv and vxm like the notebook's A @ gp") {
    val a = GrbMatrix.fromValues(spark,
      Seq((0L, 1L, 1L: Any), (1L, 0L, 1L: Any), (2L, 1L, 1L: Any)),
      GrbType.INT64, 3L, 3L)
    val gp = vec(Map(0L -> 0L, 1L -> 1L, 2L -> 2L), 3L)
    val mngp = a %*% (gp, Ops.minSecond)
    assert(values(mngp) == Map(0L -> 1L, 1L -> 0L, 2L -> 1L))
    val back = gp %*% (a, Ops.minSecond)
    assert(values(back).nonEmpty)
  }

  test("updater protocol: C.upd(mask, accum, replace) << result") {
    val c = vec(Map(0L -> 10L, 1L -> 20L, 2L -> 30L))
    val r = vec(Map(1L -> 5L, 3L -> 7L))
    val mask = Mask.structural(vec(Map(1L -> 1L, 3L -> 1L, 0L -> 1L)).df)
    val out = c.upd(mask, Ops.plus, replace = true) << r
    // covered: 0 (t only -> kept), 1 (both -> 25), 3 (r only -> 7);
    // uncovered 2 deleted by replace
    assert(values(out) == Map(0L -> 10L, 1L -> 25L, 3L -> 7L))
  }
}
