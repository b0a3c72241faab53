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
  val sumOfInverses: Column => Column =
    c => org.apache.spark.sql.functions.sum(lit(1.0) / c)

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

  /** vector-level aggregator application: reduce the whole vector with
    * a (possibly index-aware) aggregator → possibly-empty scalar
    */
  def reduceVector(vec: GrbVector, agg: (Column, Column) => Column): GrbScalar =
    new GrbScalar(vec.df.agg(agg(col("v"), col("i")).as("v")).filter(col("v").isNotNull))

  /** row-wise aggregator on a matrix */
  def reduceRowwise(m: GrbMatrix, agg: (Column, Column) => Column): GrbVector =
    new GrbVector(m.df.groupBy("i").agg(agg(col("v"), col("j")).as("v")), m.nrows)
}
