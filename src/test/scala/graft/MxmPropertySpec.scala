package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.core._

/** Property tests for semiring products — the engine's heart — against
  * a driver-side map oracle: mxm/mxv over plus_times and min_plus,
  * with and without structural masks.
  */
class MxmPropertySpec extends SparkSpec {

  private val dim = 6L

  private def toMat(m: Map[(Long, Long), Long]): GrbMatrix =
    if (m.isEmpty) GrbMatrix.empty(spark, GrbType.INT64, dim, dim)
    else GrbMatrix.fromValues(spark,
      m.toSeq.map { case ((i, j), v) => (i, j, v: Any) }, GrbType.INT64, dim, dim)

  private def fromMat(m: GrbMatrix): Map[(Long, Long), Long] =
    m.toValues.map { case (i, j, v) => (i, j) -> v.asInstanceOf[Long] }.toMap

  private val genMat: Gen[Map[(Long, Long), Long]] =
    Gen.mapOf(Gen.zip(
      Gen.zip(Gen.choose(0L, dim - 1), Gen.choose(0L, dim - 1)),
      Gen.choose(-9L, 9L)))

  private def oracleMxm(a: Map[(Long, Long), Long], b: Map[(Long, Long), Long],
      mult: (Long, Long) => Long, add: (Long, Long) => Long): Map[(Long, Long), Long] = {
    val prods = for {
      ((i, k1), av) <- a.toSeq
      ((k2, j), bv) <- b.toSeq if k1 == k2
    } yield (i, j) -> mult(av, bv)
    prods.groupBy(_._1).view.mapValues(_.map(_._2).reduce(add)).toMap
  }

  private def run(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25).withInitialSeed(7L), prop)
    assert(res.passed, s"$name: $res")
  }

  test("mxm plus_times == oracle") {
    run("plus_times", Prop.forAll(genMat, genMat) { (a, b) =>
      fromMat(toMat(a).mxm(toMat(b), Ops.plusTimes)) ==
        oracleMxm(a, b, _ * _, _ + _)
    })
  }

  test("mxm min_plus == oracle (tropical semiring)") {
    run("min_plus", Prop.forAll(genMat, genMat) { (a, b) =>
      fromMat(toMat(a).mxm(toMat(b), Ops.minPlus)) ==
        oracleMxm(a, b, _ + _, math.min)
    })
  }

  test("masked mxm == oracle restricted to mask structure") {
    val genMask = Gen.mapOf(Gen.zip(
      Gen.zip(Gen.choose(0L, dim - 1), Gen.choose(0L, dim - 1)), Gen.const(1L)))
    run("masked", Prop.forAll(genMat, genMat, genMask) { (a, b, mk) =>
      val mask = Mask.structural(toMat(mk).df)
      val got = fromMat(toMat(a).mxm(toMat(b), Ops.plusTimes, Some(mask)))
      val want = oracleMxm(a, b, _ * _, _ + _).view
        .filterKeys(mk.contains).toMap
      got == want
    })
  }

  test("triangle count: masked plus_pair mxm on strictly-upper edges") {
    // K4 on {0,1,2,3} has C(4,3)=4 triangles; vertex 4 hangs off 3 and
    // closes nothing. L = strictly-upper edge matrix; count =
    // reduce(+, L·L ⟨L⟩ over plus_pair).
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L),
      (2L, 3L), (3L, 4L))
    val l = GrbMatrix.fromValues(spark,
      edges.map { case (i, j) => (i, j, 1L: Any) }, GrbType.INT64, dim, dim)
    val tri = l.mxm(l, Ops.plusPair, mask = Some(Mask.structural(l.df)))
      .reduceScalar(Ops.plusMonoid)
    assert(tri.value.contains(4L))
  }

  test("clustering coefficient: symmetric plus_pair row-reduce == 2x triangles per vertex") {
    // Same K4-plus-pendant graph as the triangle test. On the full
    // symmetric adjacency, row-reducing C⟨A⟩ = A·A (plus_pair) gives
    // 2·tri(v): vertices 0-2 sit in 3 triangles each (t2=6), vertex 3
    // in 3 (its pendant edge to 4 closes nothing), vertex 4 in none —
    // and the zero-triangle vertex must still surface with t2 absent
    // (empty C row), which the query layer backfills to 0.
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L),
      (2L, 3L), (3L, 4L))
    val sym = edges ++ edges.map { case (i, j) => (j, i) }
    val a = GrbMatrix.fromValues(spark,
      sym.map { case (i, j) => (i, j, 1L: Any) }, GrbType.INT64, dim, dim)
    val c = a.mxm(a, Ops.plusPair, mask = Some(Mask.structural(a.df)))
    val t2 = c.reduceRowwise(Ops.plusMonoid).toValues
      .map { case (i, v) => i -> v.asInstanceOf[Long] }.toMap
    assert(t2 === Map(0L -> 6L, 1L -> 6L, 2L -> 6L, 3L -> 6L))
    val deg = a.reduceRowwise(Ops.plusMonoid).toValues
      .map { case (i, v) => i -> v.asInstanceOf[Long] }.toMap
    assert(deg === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 4L, 4L -> 1L))
    // cc = 2tri/(d(d-1)): vertices 0-2 fully connected locally (1.0),
    // vertex 3 has 6/12 = 0.5
    assert(6L * 1000000L / (3L * 2L) === 1000000L)
    assert(6L * 1000000L / (4L * 3L) === 500000L)
  }

  test("mxv min_second == oracle (the FastSV kernel)") {
    val genVec = Gen.mapOf(Gen.zip(Gen.choose(0L, dim - 1), Gen.choose(0L, 99L)))
    run("mxv", Prop.forAll(genMat, genVec) { (a, v) =>
      val vec =
        if (v.isEmpty) GrbVector.empty(spark, GrbType.INT64, dim)
        else GrbVector.fromValues(spark,
          v.toSeq.map { case (i, x) => (i, x: Any) }, GrbType.INT64, dim)
      val res = toMat(a).mxv(vec, Ops.minSecond).toValues
        .map { case (i, x) => i -> x.asInstanceOf[Long] }.toMap
      val want = a.toSeq.flatMap { case ((i, j), _) => v.get(j).map(i -> _) }
        .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      res == want
    })
  }
}
