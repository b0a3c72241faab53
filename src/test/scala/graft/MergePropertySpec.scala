package graft

import graft.core._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: the DataFrame merge recipe (Merge) vs an in-memory
  * oracle implementing the GraphBLAS (mask, accum, replace) truth table
  * directly over Map[Long, Long] (SURVEY §5 — replaces the reference's
  * grblas single-node oracle, tests/utils.py:8-59).
  *
  * Plain ScalaCheck generators sampled under deterministic seeds inside
  * funsuite bodies (the org.scalatestplus bridge is not resolvable in
  * this offline build).
  */
class MergePropertySpec extends SparkSpec {

  val SIZE = 8L

  /** oracle: direct semantic definition, obviously correct */
  def oracle(target: Map[Long, Long], result: Map[Long, Long],
      mask: Option[(Set[Long], Boolean)], accum: Option[(Long, Long) => Long],
      replace: Boolean): Map[Long, Long] = {
    val covered: Long => Boolean = mask match {
      case None                  => _ => true
      case Some((keys, false))   => keys.contains
      case Some((keys, true))    => k => !keys.contains(k)
    }
    (0L until SIZE).flatMap { k =>
      val t = target.get(k)
      val r = result.get(k)
      val out: Option[Long] =
        if (covered(k)) (t, r, accum) match {
          case (_, Some(rv), None)           => Some(rv)
          case (Some(tv), Some(rv), Some(f)) => Some(f(tv, rv))
          case (None, Some(rv), Some(_))     => Some(rv)
          case (Some(tv), None, Some(_))     => Some(tv)
          case (Some(_), None, None)         => None // overwritten away
          case (None, None, _)               => None
        }
        else if (replace) None
        else t
      out.map(k -> _)
    }.toMap
  }

  def toVec(m: Map[Long, Long]): GrbVector =
    GrbVector.fromValues(spark, m.toSeq.map { case (k, v) => k -> (v: Any) },
      GrbType.INT64, SIZE)

  val genMap: Gen[Map[Long, Long]] = Gen.mapOf(for {
    k <- Gen.choose(0L, SIZE - 1)
    v <- Gen.choose(-50L, 50L)
  } yield k -> v)

  val genMaskKeys: Gen[Set[Long]] = Gen.containerOf[Set, Long](Gen.choose(0L, SIZE - 1))

  /** deterministic sampler: N samples of `gen` from a fixed seed chain */
  def samples[A](gen: Gen[A], n: Int, seed0: Long): Seq[A] = {
    var seed = Seed(seed0)
    (1 to n).flatMap { _ =>
      val r = gen.doPureApply(Gen.Parameters.default, seed)
      seed = r.seed
      r.retrieve
    }
  }

  test("Merge == oracle for random target/result/mask/accum/replace") {
    val genCase = for {
      t <- genMap; r <- genMap
      maskOpt <- Gen.option(for {
        keys <- genMaskKeys; comp <- Gen.oneOf(true, false)
      } yield (keys, comp))
      useAccum <- Gen.oneOf(true, false)
      replace <- Gen.oneOf(true, false)
    } yield (t, r, maskOpt, useAccum, replace)

    samples(genCase, 40, 42L).foreach { case (t, r, maskOpt, useAccum, replace) =>
      val expected = oracle(t, r, maskOpt,
        if (useAccum) Some(_ + _) else None, replace)
      val maskVec = maskOpt.map { case (keys, comp) =>
        // structural mask whose present keys are exactly `keys`
        Mask(toVec(keys.map(_ -> 1L).toMap).df, structural = true, complement = comp)
      }
      val desc = Desc(maskVec, if (useAccum) Some(Ops.plus) else None, replace)
      val got = toVec(t).accept(toVec(r), desc)
        .toValues.map { case (i, v) => i -> v.asInstanceOf[Long] }.toMap
      assert(got == expected, s"\nt=$t\nr=$r\nmask=$maskOpt accum=$useAccum replace=$replace")
    }
  }

  test("ewise add/mult == oracle union/intersection semantics") {
    val genPair = for { a <- genMap; b <- genMap } yield (a, b)
    samples(genPair, 20, 7L).foreach { case (a, b) =>
      val expAdd = (a.keySet ++ b.keySet).map { k =>
        k -> ((a.get(k), b.get(k)) match {
          case (Some(x), Some(y)) => x + y
          case (Some(x), None)    => x
          case (None, Some(y))    => y
          case _                  => 0L
        })
      }.toMap
      val expMult = (a.keySet & b.keySet).map(k => k -> (a(k) * b(k))).toMap
      val va = toVec(a); val vb = toVec(b)
      val gotAdd = va.ewiseAdd(vb, Ops.plus).toValues
        .map { case (i, v) => i -> v.asInstanceOf[Long] }.toMap
      val gotMult = va.ewiseMult(vb, Ops.times).toValues
        .map { case (i, v) => i -> v.asInstanceOf[Long] }.toMap
      assert(gotAdd == expAdd)
      assert(gotMult == expMult)
    }
  }
}
