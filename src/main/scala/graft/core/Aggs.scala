package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregators beyond monoids (reference `agg.*` namespace, driven
  * through grblas's Aggregator machinery — dask_grblas/expr.py:208-229
  * GbDelayed._aggregate; exercised tests/from_grblas2/test_op.py:56-64).
  *
  * Spark built-ins cover nearly all of them in a single two-phase hash
  * aggregate; argmin/argmax fold over (value, index) structs. The
  * multi-pass composition SuiteSparse needs (e.g. mean = sum ÷ count)
  * is a single `agg` call here.
  */
object Aggs {
  val count: Column => Column = c => org.apache.spark.sql.functions.count(c)
  val sum: Column => Column = org.apache.spark.sql.functions.sum
  val mean: Column => Column = avg
  val min: Column => Column = org.apache.spark.sql.functions.min
  val max: Column => Column = org.apache.spark.sql.functions.max
  val stdp: Column => Column = stddev_pop
  val stds: Column => Column = stddev_samp
  val varp: Column => Column = var_pop
  val vars: Column => Column = var_samp
  val sumOfSquares: Column => Column = c => org.apache.spark.sql.functions.sum(c * c)
  /** peak-to-peak: max - min */
  val ptp: Column => Column =
    c => org.apache.spark.sql.functions.max(c) - org.apache.spark.sql.functions.min(c)
  val logaddexp: Column => Column =
    c => log(org.apache.spark.sql.functions.sum(exp(c)))
  val logaddexp2: Column => Column =
    c => log2(org.apache.spark.sql.functions.sum(pow(lit(2.0), c)))
  val sumOfInverses: Column => Column =
    c => org.apache.spark.sql.functions.sum(lit(1.0) / c)
  val prod: Column => Column = product
  /** logical all/any over the stored values (agg.all / agg.any) */
  val all: Column => Column = c => bool_and(c.cast("boolean"))
  val any: Column => Column = c => bool_or(c.cast("boolean"))
  /** an arbitrary stored value (agg.any_value) */
  val anyValue: Column => Column = first_value
  /** stored entries that are (non)zero — sparse semantics: absent
    * entries are not stored, so count_zero counts EXPLICIT zeros
    */
  val countNonzero: Column => Column =
    c => org.apache.spark.sql.functions.count(when(c =!= 0, 1))
  val countZero: Column => Column =
    c => org.apache.spark.sql.functions.count(when(c === 0, 1))
  val exists: Column => Column =
    c => (org.apache.spark.sql.functions.count(c) > 0).cast("boolean")
  /** bitwise folds (agg.bitwise_all / bitwise_any) */
  val bitwiseAll: Column => Column = bit_and
  val bitwiseAny: Column => Column = bit_or
  /** hypot = sqrt(Σx²) = the L2 norm (agg.hypot / agg.L2norm) */
  val hypot: Column => Column =
    c => sqrt(org.apache.spark.sql.functions.sum(c * c))
  val rootMeanSquare: Column => Column = c => sqrt(avg(c * c))
  // norms (agg.L0norm/L1norm/L2norm/Linfnorm)
  val l0norm: Column => Column = countNonzero
  val l1norm: Column => Column =
    c => org.apache.spark.sql.functions.sum(abs(c))
  val l2norm: Column => Column = hypot
  val linfnorm: Column => Column =
    c => org.apache.spark.sql.functions.max(abs(c))

  /** name → aggregator registry (grblas agg.* namespace names); the
    * index-aware aggregators (argmin/argmax/first/last/…) live below
    * with a (value, index) signature.
    */
  val byName: Map[String, Column => Column] = Map(
    "count" -> count, "sum" -> sum, "mean" -> mean, "min" -> min,
    "max" -> max, "stdp" -> stdp, "stds" -> stds, "varp" -> varp,
    "vars" -> vars, "sum_of_squares" -> sumOfSquares,
    "peak_to_peak" -> ptp, "logaddexp" -> logaddexp,
    "logaddexp2" -> logaddexp2, "sum_of_inverses" -> sumOfInverses,
    "prod" -> prod, "all" -> all, "any" -> any, "any_value" -> anyValue,
    "count_nonzero" -> countNonzero, "count_zero" -> countZero,
    "exists" -> exists, "bitwise_all" -> bitwiseAll,
    "bitwise_any" -> bitwiseAny, "hypot" -> hypot,
    "root_mean_square" -> rootMeanSquare, "L0norm" -> l0norm,
    "L1norm" -> l1norm, "L2norm" -> l2norm, "Linfnorm" -> linfnorm)

  /** argmin/argmax over a keyed frame: index of the extreme value.
    * min(struct(v, i)) orders by value then index — deterministic
    * tie-break on the smaller index.
    */
  def argmin(v: Column, i: Column): Column =
    org.apache.spark.sql.functions.min(struct(v.as("_v"), i.as("_i"))).getField("_i")
  def argmax(v: Column, i: Column): Column =
    org.apache.spark.sql.functions.max(struct(v.as("_v"), i.as("_i"))).getField("_i")

  /** first/last by position (agg.first/last, first_index/last_index) */
  def firstByPos(v: Column, pos: Column): Column =
    org.apache.spark.sql.functions.min(struct(pos.as("_p"), v.as("_v"))).getField("_v")
  def lastByPos(v: Column, pos: Column): Column =
    org.apache.spark.sql.functions.max(struct(pos.as("_p"), v.as("_v"))).getField("_v")
  def firstIndex(v: Column, pos: Column): Column =
    org.apache.spark.sql.functions.min(pos)
  def lastIndex(v: Column, pos: Column): Column =
    org.apache.spark.sql.functions.max(pos)

  /** vector-level aggregator application: reduce the whole vector with
    * a (possibly index-aware) aggregator → possibly-empty scalar
    */
  def reduceVector(vec: GrbVector, agg: (Column, Column) => Column): GrbScalar =
    new GrbScalar(vec.df.agg(agg(col("v"), col("i")).as("v")).filter(col("v").isNotNull))

  /** row-wise aggregator on a matrix */
  def reduceRowwise(m: GrbMatrix, agg: (Column, Column) => Column): GrbVector =
    new GrbVector(m.df.groupBy("i").agg(agg(col("v"), col("j")).as("v")), m.nrows)
}
