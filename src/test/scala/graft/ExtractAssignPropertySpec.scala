package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.core._

/** Property tests for extract and assign against a driver-side oracle
  * (SURVEY §7.4 hard parts 3 and 5: replace-outside-region and
  * duplicate-index rules). Same style as MergePropertySpec: plain
  * ScalaCheck, deterministic seed, modest case counts (each case runs
  * Spark jobs).
  */
class ExtractAssignPropertySpec extends SparkSpec {

  private val dim = 12L

  private def toVec(m: Map[Long, Long]): GrbVector =
    if (m.isEmpty) GrbVector.empty(spark, GrbType.INT64, dim)
    else GrbVector.fromValues(spark, m.toSeq.map { case (i, v) => (i, v: Any) },
      GrbType.INT64, dim)

  private def fromVec(v: GrbVector): Map[Long, Long] =
    v.toValues.map { case (i, x) => i -> x.asInstanceOf[Long] }.toMap

  private val genContent: Gen[Map[Long, Long]] =
    Gen.mapOf(Gen.zip(Gen.choose(0L, dim - 1), Gen.choose(-50L, 50L)))

  private val genIndexList: Gen[List[Long]] =
    Gen.listOfN(6, Gen.choose(0L, dim - 1))

  private def run(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30).withInitialSeed(42L), prop)
    assert(res.passed, s"$name: $res")
  }

  test("extract by index list: order- and duplicate-preserving gather") {
    run("extract", Prop.forAll(genContent, genIndexList) { (m, ixs) =>
      val got = fromVec(toVec(m).extract(Ix.Seqs(ixs)))
      val want = ixs.zipWithIndex.flatMap { case (ix, pos) =>
        m.get(ix).map(v => pos.toLong -> v)
      }.toMap
      got == want
    })
  }

  test("extract by slice: filter + reindex") {
    val genSlice = for {
      a <- Gen.choose(0L, dim - 1); len <- Gen.choose(1L, dim)
      s <- Gen.choose(1L, 4L)
    } yield (a, math.min(dim, a + len), s)
    run("slice", Prop.forAll(genContent, genSlice) { case (m, (a, b, s)) =>
      val got = fromVec(toVec(m).extract(Ix.Range(a, b, s)))
      val want = (a until b by s).zipWithIndex.flatMap { case (ix, pos) =>
        m.get(ix).map(v => pos.toLong -> v)
      }.toMap
      got == want
    })
  }

  test("assign vector to index list: last duplicate wins; region semantics") {
    run("assign", Prop.forAll(genContent, genContent, genIndexList) { (tm, sm, ixs) =>
      // source vector defined on positions 0..len-1 (present subset)
      val src = sm.view.filterKeys(_ < ixs.length).toMap
      val got = fromVec(toVec(tm).assign(Ix.Seqs(ixs),
        Right(toVec(src).resize(ixs.length.toLong))))
      // oracle: region keys = ixs; for each region key the LAST
      // position mapping wins; present source value -> assigned,
      // absent -> deleted (no accum); outside region untouched
      val lastPos = ixs.zipWithIndex.groupBy(_._1).view
        .mapValues(_.map(_._2).max).toMap
      val want = tm.filterNot { case (k, _) => lastPos.contains(k) } ++
        lastPos.flatMap { case (ix, pos) => src.get(pos.toLong).map(ix -> _) }
      got == want
    })
  }

  test("masked scalar assign with replace honors the §2.9 table over a region") {
    val genMaskKeys = Gen.listOfN(5, Gen.choose(0L, dim - 1)).map(_.toSet)
    run("maskedAssign", Prop.forAll(genContent, genIndexList, genMaskKeys,
      Gen.oneOf(true, false)) { (tm, ixs, mk, replace) =>
      val maskVec = toVec(mk.map(_ -> 1L).toMap)
      val desc = Desc(Some(Mask.structural(maskVec.df)), None, replace)
      val got = fromVec(toVec(tm).assign(Ix.Seqs(ixs), Left(lit(99L)), desc))
      val region = ixs.toSet
      val want = (0L until dim).flatMap { k =>
        val covered = mk.contains(k)
        val inRegion = region.contains(k)
        val t = tm.get(k)
        val out =
          if (covered && inRegion) Some(99L)            // result lands
          else if (covered) t                           // kept (result absent)
          else if (replace) None                        // uncovered + replace
          else t                                        // uncovered kept
        out.map(k -> _)
      }.toMap
      got == want
    })
  }
}
