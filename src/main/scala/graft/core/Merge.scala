package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BooleanType

/** Mask over a COO collection (reference: dask_grblas/mask.py:4-67,
  * four kinds: Structural / Value / ComplementedStructural /
  * ComplementedValue).
  *
  * A mask is just another collection's DataFrame plus two flags;
  * application is a semi-join (kept keys) or anti-join (complement).
  * Absence-vs-zero discipline (SURVEY §1.4): a structural mask covers
  * every PRESENT row regardless of value; a value mask covers rows
  * whose value is truthy (non-zero / true).
  */
final case class Mask(data: DataFrame, structural: Boolean, complement: Boolean) {

  /** key set covered by this mask (before complement), as a DataFrame
    * of the key columns only.
    */
  def coveredKeys(keys: Seq[String]): DataFrame = {
    val truthy =
      if (structural) data
      else data.schema("v").dataType match {
        case BooleanType => data.filter(col("v"))
        case _           => data.filter(col("v") =!= lit(0))
      }
    truthy.select(keys.map(col): _*)
  }

  /** rows of `df` whose keys the (possibly complemented) mask covers. */
  def filter(df: DataFrame, keys: Seq[String]): DataFrame =
    df.join(coveredKeys(keys), keys, if (complement) "left_anti" else "left_semi")

  /** rows of `df` NOT covered by the (possibly complemented) mask. */
  def filterOut(df: DataFrame, keys: Seq[String]): DataFrame =
    df.join(coveredKeys(keys), keys, if (complement) "left_semi" else "left_anti")
}

object Mask {
  def structural(data: DataFrame): Mask = Mask(data, structural = true, complement = false)
  def value(data: DataFrame): Mask = Mask(data, structural = false, complement = false)
  def complementStructural(data: DataFrame): Mask = Mask(data, structural = true, complement = true)
  def complementValue(data: DataFrame): Mask = Mask(data, structural = false, complement = true)
}

/** Output descriptor `C(mask=…, accum=…, replace=…)` — reference
  * dask_grblas/base.py:141-177 (BaseType.__call__) and
  * dask_grblas/expr.py:566-649 (Updater).
  */
final case class Desc(
    mask: Option[Mask] = None,
    accum: Option[BinaryOp] = None,
    replace: Boolean = false)

object Desc {
  val plain: Desc = Desc()
}

/** THE merge recipe — the single implementation of the GraphBLAS
  * (mask, accum, replace) truth table (SURVEY §2.9; reference applies it
  * per chunk via SuiteSparse in dask_grblas/base.py:279-334 and
  * dask_grblas/expr.py:282-386):
  *
  * | target t | result r | mask       | accum | replace | out          |
  * |----------|----------|------------|-------|---------|--------------|
  * | any      | r        | covered    | no    | –       | r            |
  * | t        | r        | covered    | yes   | –       | accum(t, r)  |
  * | t        | ∅        | covered    | yes   | –       | t            |
  * | t        | ∅        | covered    | no    | –       | ∅            |
  * | t        | –        | uncovered  | –     | false   | t            |
  * | t        | –        | uncovered  | –     | true    | ∅            |
  *
  * Pure COO set algebra: semi/anti joins + one full-outer join.
  */
object Merge {

  /** full-outer combine of target and result values with an accumulator
    * applied where both are present. Values in our COO frames are never
    * SQL NULL (absence = missing row), so null-ness after the outer join
    * is a faithful presence test.
    */
  def outerAccum(target: DataFrame, result: DataFrame, keys: Seq[String],
      accum: BinaryOp): DataFrame = {
    implicit val m: Grb.U64Mode = Grb.u64Mode(target.sparkSession)
    // output domain = the target's dtype (GraphBLAS: accum results are
    // cast into C's domain) — also keeps the when/otherwise branches
    // type-compatible for boolean-returning accum ops.
    val outType = target.schema("v").dataType
    val t = target.select(keys.map(col) :+ col("v").as("_tv"): _*)
    val r = result.select(keys.map(col) :+ col("v").as("_rv"): _*)
    t.join(r, keys, "full_outer")
      .select(keys.map(col) :+
        when(col("_tv").isNotNull && col("_rv").isNotNull,
          Grb.castToType(Grb.accumOp(accum, col("_tv"), col("_rv"), outType), outType))
          .otherwise(Grb.castToType(coalesce(col("_rv"), col("_tv")), outType))
          .as("v"): _*)
  }

  /** merge `result` into `target` under the descriptor. `keys` is
    * Seq("i") for vectors, Seq("i","j") for matrices. Result values are
    * cast into the target's dtype (C's domain fixes the output domain).
    */
  def apply(target: DataFrame, result: DataFrame, keys: Seq[String],
      desc: Desc): DataFrame = {
    implicit val m: Grb.U64Mode = Grb.u64Mode(target.sparkSession)
    val outType = target.schema("v").dataType
    val resultC = result.select(
      keys.map(col) :+ Grb.castToType(col("v"), outType).as("v"): _*)
    desc.mask match {
      case None =>
        desc.accum match {
          case None      => resultC
          case Some(acc) => outerAccum(target, resultC, keys, acc)
        }
      case Some(m) =>
        val resCovered = m.filter(resultC, keys)
        val covered = desc.accum match {
          case None      => resCovered
          case Some(acc) => outerAccum(m.filter(target, keys), resCovered, keys, acc)
        }
        if (desc.replace) covered
        else covered.unionByName(m.filterOut(target, keys))
    }
  }
}
