package graft

import org.apache.spark.sql.functions._
import graft.core._
import graft.algo.FastSV

/** FastSV connected components — the acceptance demo (SURVEY §3.4,
  * reference notebooks/Connected Components -- FastSV.ipynb).
  */
class FastSVSpec extends SparkSpec {

  private def matFromEdges(undirected: Seq[(Long, Long)], n: Long): GrbMatrix = {
    val triples: Seq[(Long, Long, Any)] =
      undirected.flatMap { case (a, b) => Seq((a, b, 1L: Any), (b, a, 1L: Any)) }
    GrbMatrix.fromValues(spark, triples, GrbType.INT64, n, n)
  }

  private def labelsOf(v: GrbVector): Map[Long, Long] =
    v.toValues.map { case (i, x) => i -> x.asInstanceOf[Long] }.toMap

  test("two triangles + isolated vertex") {
    val a = matFromEdges(Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 5L), (3L, 5L)), 7L)
    val l = labelsOf(FastSV.connectedComponents(a))
    assert(Seq(0L, 1L, 2L).forall(l(_) == 0L))
    assert(Seq(3L, 4L, 5L).forall(l(_) == 3L))
    assert(l(6L) == 6L)
  }

  test("notebook 12x12 graph (reference flagship demo)") {
    // the FastSV notebook's example graph: two components
    val edges = Seq(
      (0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L), (3L, 4L),
      (5L, 6L), (6L, 7L), (7L, 8L), (8L, 5L),
      (4L, 9L), (9L, 10L), (10L, 11L))
    val a = matFromEdges(edges, 12L)
    val l = labelsOf(FastSV.connectedComponents(a))
    assert((0L to 4L).forall(l(_) == 0L) && (9L to 11L).forall(l(_) == 0L))
    assert((5L to 8L).forall(l(_) == 5L))
  }

  test("GraphX Pregel bridge agrees with FastSV") {
    val edges = Seq((0L, 1L), (1L, 2L), (3L, 4L))
    val a = matFromEdges(edges, 6L)
    val pregel = labelsOf(graft.algo.PregelCC.connectedComponents(a))
    val fastsv = labelsOf(FastSV.connectedComponents(a))
    // Pregel labels only vertices that appear in edges
    assert(pregel == fastsv.view.filterKeys(k => k != 5L).toMap)
  }

  test("path graph needs shortcutting (worst case for hooking)") {
    val n = 32L
    val a = matFromEdges((0L until n - 1).map(i => (i, i + 1)), n)
    val l = labelsOf(FastSV.connectedComponents(a))
    assert((0L until n).forall(l(_) == 0L))
  }
}
