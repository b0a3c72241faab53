package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Operator algebra: UnaryOp / BinaryOp / Monoid / Semiring.
  *
  * Mirrors the reference's operator namespaces (grblas `unary.*`,
  * `binary.*`, `monoid.*`, `semiring.*`; used throughout
  * dask_grblas/base.py, dask_grblas/expr.py). Ops here are pure
  * `Column => Column` builders so every application stays inside
  * Catalyst whole-stage codegen — no UDFs on the hot path.
  */
/** `preserve = true` marks ops whose GraphBLAS result dtype is the
  * operand dtype even though the naive Spark expression would change it
  * (e.g. `one` emits an int literal); application sites cast back.
  */
final case class UnaryOp(name: String, preserve: Boolean = false)(val f: Column => Column) {
  def apply(c: Column): Column = f(c)
}

final case class BinaryOp(name: String, preserve: Boolean = false)(
    val f: (Column, Column) => Column) {
  def apply(a: Column, b: Column): Column = f(a, b)
}

/** A commutative associative reduction with identity.
  *
  * `agg` is the Spark aggregate expression used for distributed folds —
  * partial (map-side) + final aggregation is Spark's native two-phase
  * hash aggregate, matching the reference's per-chunk reduce + combine
  * tree (dask_grblas/expr.py:1974-2008 sum_by_monoid).
  */
final case class Monoid(name: String, op: BinaryOp, preserve: Boolean = false)(
    val agg: Column => Column) {
  def apply(a: Column, b: Column): Column = op(a, b)
}

/** `positional`: GraphBLAS positional multiply (firsti/secondj, …) —
  * the product value is an index, not a function of the stored values.
  * Arguments are (i, k, j): output row, contracted index, output col
  * (exercised in reference tests/from_grblas2/test_op.py:31-55).
  */
final case class Semiring(name: String, add: Monoid, mult: BinaryOp,
    positional: Option[(Column, Column, Column) => Column] = None)

object Ops {
  import GrbType._

  // ---- unary ops (grblas unary.* namespace) ----
  // preserve: identity's output domain IS the operand domain (the
  // same-type cast is a codegen no-op; keeps declared-UINT labels)
  val identity: UnaryOp = UnaryOp("identity", preserve = true)(c => c)
  val ainv: UnaryOp = UnaryOp("ainv")(c => -c)
  val minv: UnaryOp = UnaryOp("minv")(c => lit(1.0) / c)
  val lnot: UnaryOp = UnaryOp("lnot")(c => !c.cast("boolean"))
  val one: UnaryOp = UnaryOp("one", preserve = true)(c => lit(1))
  val abs: UnaryOp = UnaryOp("abs")(c => org.apache.spark.sql.functions.abs(c))
  val sqrt: UnaryOp = UnaryOp("sqrt")(c => org.apache.spark.sql.functions.sqrt(c))
  val exp: UnaryOp = UnaryOp("exp")(c => org.apache.spark.sql.functions.exp(c))
  val log: UnaryOp = UnaryOp("log")(c => org.apache.spark.sql.functions.log(c))
  val log2: UnaryOp = UnaryOp("log2")(c => org.apache.spark.sql.functions.log2(c))
  val log10: UnaryOp = UnaryOp("log10")(c => org.apache.spark.sql.functions.log10(c))
  val sin: UnaryOp = UnaryOp("sin")(c => org.apache.spark.sql.functions.sin(c))
  val cos: UnaryOp = UnaryOp("cos")(c => org.apache.spark.sql.functions.cos(c))
  val tan: UnaryOp = UnaryOp("tan")(c => org.apache.spark.sql.functions.tan(c))
  val floor: UnaryOp = UnaryOp("floor")(c => org.apache.spark.sql.functions.floor(c))
  val ceil: UnaryOp = UnaryOp("ceil")(c => org.apache.spark.sql.functions.ceil(c))
  val sign: UnaryOp = UnaryOp("sign", preserve = true)(signum)
  val trunc: UnaryOp = UnaryOp("trunc", preserve = true)(
    c => c.cast("bigint")) // toward zero, like numpy trunc on finite values
  val round: UnaryOp = UnaryOp("round")(c => org.apache.spark.sql.functions.round(c))
  val expm1: UnaryOp = UnaryOp("expm1")(c => org.apache.spark.sql.functions.expm1(c))
  val log1p: UnaryOp = UnaryOp("log1p")(c => org.apache.spark.sql.functions.log1p(c))
  val sinh: UnaryOp = UnaryOp("sinh")(c => org.apache.spark.sql.functions.sinh(c))
  val cosh: UnaryOp = UnaryOp("cosh")(c => org.apache.spark.sql.functions.cosh(c))
  val tanh: UnaryOp = UnaryOp("tanh")(c => org.apache.spark.sql.functions.tanh(c))
  val asin: UnaryOp = UnaryOp("asin")(c => org.apache.spark.sql.functions.asin(c))
  val acos: UnaryOp = UnaryOp("acos")(c => org.apache.spark.sql.functions.acos(c))
  val atan: UnaryOp = UnaryOp("atan")(c => org.apache.spark.sql.functions.atan(c))
  val cbrt: UnaryOp = UnaryOp("cbrt")(c => org.apache.spark.sql.functions.cbrt(c))
  val bnot: UnaryOp = UnaryOp("bnot", preserve = true)(bitwise_not)

  // ---- binary ops (grblas binary.*) ----
  val plus: BinaryOp = BinaryOp("plus")(_ + _)
  val minus: BinaryOp = BinaryOp("minus")(_ - _)
  val times: BinaryOp = BinaryOp("times")(_ * _)
  val div: BinaryOp = BinaryOp("div")(_ / _)
  val min: BinaryOp = BinaryOp("min")(least(_, _))
  val max: BinaryOp = BinaryOp("max")(greatest(_, _))
  val first: BinaryOp = BinaryOp("first")((a, _) => a)
  val second: BinaryOp = BinaryOp("second")((_, b) => b)
  val pair: BinaryOp = BinaryOp("pair", preserve = true)((_, _) => lit(1))
  val any: BinaryOp = BinaryOp("any")((a, _) => a) // "any" picks an arbitrary present value
  val land: BinaryOp = BinaryOp("land")((a, b) => a.cast("boolean") && b.cast("boolean"))
  val lor: BinaryOp = BinaryOp("lor")((a, b) => a.cast("boolean") || b.cast("boolean"))
  val lxor: BinaryOp = BinaryOp("lxor")((a, b) => a.cast("boolean") =!= b.cast("boolean"))
  val eq: BinaryOp = BinaryOp("eq")(_ === _)
  val ne: BinaryOp = BinaryOp("ne")(_ =!= _)
  val gt: BinaryOp = BinaryOp("gt")(_ > _)
  val lt: BinaryOp = BinaryOp("lt")(_ < _)
  val ge: BinaryOp = BinaryOp("ge")(_ >= _)
  val le: BinaryOp = BinaryOp("le")(_ <= _)
  val pow: BinaryOp = BinaryOp("pow")(org.apache.spark.sql.functions.pow(_, _))
  val rminus: BinaryOp = BinaryOp("rminus")((a, b) => b - a)
  val rdiv: BinaryOp = BinaryOp("rdiv")((a, b) => b / a)
  val truediv: BinaryOp = BinaryOp("truediv")((a, b) => a.cast("double") / b)
  /** floor division (python //, numpy floor_divide): floor(a/b) —
    * double-based, exact for integers below 2^53
    */
  val floordiv: BinaryOp = BinaryOp("floordiv")(
    (a, b) => org.apache.spark.sql.functions.floor(a.cast("double") / b))
  /** C-style truncated integer division (grblas cdiv; integral only) */
  val cdiv: BinaryOp = BinaryOp("cdiv", preserve = true)(
    (a, b) => call_function("div", a, b))
  val fmod: BinaryOp = BinaryOp("fmod")(_ % _) // sign of the dividend (C fmod)
  /** numpy/python mod: sign follows the divisor */
  val remainder: BinaryOp = BinaryOp("remainder")((a, b) => ((a % b) + b) % b)
  val atan2: BinaryOp = BinaryOp("atan2")(org.apache.spark.sql.functions.atan2(_, _))
  val hypot: BinaryOp = BinaryOp("hypot")(org.apache.spark.sql.functions.hypot(_, _))
  val band: BinaryOp = BinaryOp("band", preserve = true)(_ bitwiseAND _)
  val bor: BinaryOp = BinaryOp("bor", preserve = true)(_ bitwiseOR _)
  val bxor: BinaryOp = BinaryOp("bxor", preserve = true)(_ bitwiseXOR _)

  // ---- monoids (grblas monoid.*) ----
  // preserve: Spark's sum/product widen (INT8 -> LONG) and bool_and/or
  // return BOOL; GraphBLAS monoids stay in the operand domain (with C
  // wrap-around on overflow, which the narrowing cast reproduces)
  val plusMonoid: Monoid = Monoid("plus", plus, preserve = true)(sum)
  val timesMonoid: Monoid = Monoid("times", times, preserve = true)(product)
  val minMonoid: Monoid = Monoid("min", min)(org.apache.spark.sql.functions.min)
  val maxMonoid: Monoid = Monoid("max", max)(org.apache.spark.sql.functions.max)
  val landMonoid: Monoid = Monoid("land", land, preserve = true)(c => bool_and(c.cast("boolean")))
  val lorMonoid: Monoid = Monoid("lor", lor, preserve = true)(c => bool_or(c.cast("boolean")))
  val lxorMonoid: Monoid =
    Monoid("lxor", lxor, preserve = true)(c => (sum(c.cast("boolean").cast("long")) % 2) === 1)
  val anyMonoid: Monoid = Monoid("any", any)(first_value)
  // bitwise monoids over integral domains (grblas monoid.band/bor/bxor)
  val bandMonoid: Monoid = Monoid("band", band, preserve = true)(bit_and)
  val borMonoid: Monoid = Monoid("bor", bor, preserve = true)(bit_or)
  val bxorMonoid: Monoid = Monoid("bxor", bxor, preserve = true)(bit_xor)

  // ---- semirings (grblas semiring.*) ----
  val plusTimes: Semiring = Semiring("plus_times", plusMonoid, times)
  val minPlus: Semiring = Semiring("min_plus", minMonoid, plus)
  val maxPlus: Semiring = Semiring("max_plus", maxMonoid, plus)
  val minTimes: Semiring = Semiring("min_times", minMonoid, times)
  val minSecond: Semiring = Semiring("min_second", minMonoid, second)
  val minFirst: Semiring = Semiring("min_first", minMonoid, first)
  val maxSecond: Semiring = Semiring("max_second", maxMonoid, second)
  val plusFirst: Semiring = Semiring("plus_first", plusMonoid, first)
  val plusSecond: Semiring = Semiring("plus_second", plusMonoid, second)
  val plusPair: Semiring = Semiring("plus_pair", plusMonoid, pair)
  val lorLand: Semiring = Semiring("lor_land", lorMonoid, land)
  val anyPair: Semiring = Semiring("any_pair", anyMonoid, pair)
  val anySecond: Semiring = Semiring("any_second", anyMonoid, second)
  val anyFirst: Semiring = Semiring("any_first", anyMonoid, first)
  val plusPlus: Semiring = Semiring("plus_plus", plusMonoid, plus)
  val plusPow: Semiring = Semiring("plus_pow", plusMonoid, pow)
  val minMax: Semiring = Semiring("min_max", minMonoid, max)
  val maxMin: Semiring = Semiring("max_min", maxMonoid, min)
  val landLor: Semiring = Semiring("land_lor", landMonoid, lor)
  val borBand: Semiring = Semiring("bor_band", borMonoid, band)

  // ---- positional semirings (INT64 results; product value = an index:
  // firsti = A's row, firstj = contracted index, secondi = contracted
  // index, secondj = B's col) ----
  private def posSr(nm: String, m: Monoid)(
      f: (Column, Column, Column) => Column): Semiring =
    Semiring(nm, m, second, Some(f))
  val minFirsti: Semiring = posSr("min_firsti", minMonoid)((i, _, _) => i)
  val minFirstj: Semiring = posSr("min_firstj", minMonoid)((_, k, _) => k)
  val minSecondi: Semiring = posSr("min_secondi", minMonoid)((_, k, _) => k)
  val minSecondj: Semiring = posSr("min_secondj", minMonoid)((_, _, j) => j)
  val maxFirsti: Semiring = posSr("max_firsti", maxMonoid)((i, _, _) => i)
  val maxSecondj: Semiring = posSr("max_secondj", maxMonoid)((_, _, j) => j)
  val plusFirsti: Semiring = posSr("plus_firsti", plusMonoid)((i, _, _) => i)
  val plusSecondj: Semiring = posSr("plus_secondj", plusMonoid)((_, _, j) => j)
  val anyFirsti: Semiring = posSr("any_firsti", anyMonoid)((i, _, _) => i)
  val anySecondj: Semiring = posSr("any_secondj", anyMonoid)((_, _, j) => j)

  /** registry by name — mirrors grblas's attribute namespaces; also the
    * extension point for user-defined ops (SURVEY §2.8: user ops are
    * plain Scala lambdas registered here).
    */
  val unaryOps: Map[String, UnaryOp] = Seq(
    identity, ainv, minv, lnot, one, abs, sqrt, exp, log, log2, log10,
    sin, cos, tan, floor, ceil, sign, trunc, round, expm1, log1p,
    sinh, cosh, tanh, asin, acos, atan, cbrt, bnot).map(o => o.name -> o).toMap
  val binaryOps: Map[String, BinaryOp] = Seq(
    plus, minus, times, div, min, max, first, second, pair, any, land,
    lor, lxor, eq, ne, gt, lt, ge, le, pow, rminus, rdiv, truediv,
    floordiv, cdiv, fmod, remainder, atan2, hypot, band, bor, bxor)
    .map(o => o.name -> o).toMap
  val monoids: Map[String, Monoid] = Seq(
    plusMonoid, timesMonoid, minMonoid, maxMonoid, landMonoid, lorMonoid,
    lxorMonoid, anyMonoid, bandMonoid, borMonoid, bxorMonoid)
    .map(o => o.name -> o).toMap
  val semirings: Map[String, Semiring] = Seq(
    plusTimes, minPlus, maxPlus, minTimes, minSecond, minFirst, maxSecond,
    plusFirst, plusSecond, plusPair, lorLand, anyPair, anySecond,
    anyFirst, plusPlus, plusPow, minMax, maxMin, landLor, borBand,
    minFirsti, minFirstj, minSecondi, minSecondj, maxFirsti, maxSecondj,
    plusFirsti, plusSecondj, anyFirsti, anySecondj)
    .map(o => o.name -> o).toMap

  // ---- user-defined operators (grblas UnaryOp.register_new /
  // BinaryOp.register_new; reference usage in
  // tests/from_grblas2/test_op.py). User ops are plain Column lambdas;
  // registration makes them resolvable by name alongside built-ins.
  private val userUnary = scala.collection.concurrent.TrieMap.empty[String, UnaryOp]
  private val userBinary = scala.collection.concurrent.TrieMap.empty[String, BinaryOp]
  def registerUnary(op: UnaryOp): UnaryOp = { userUnary(op.name) = op; op }
  def registerBinary(op: BinaryOp): BinaryOp = { userBinary(op.name) = op; op }
  /** resolve by name: user registrations shadow built-ins */
  def unary(name: String): UnaryOp =
    userUnary.get(name).orElse(unaryOps.get(name))
      .getOrElse(throw new NoSuchElementException(s"unknown unary op $name"))
  def binary(name: String): BinaryOp =
    userBinary.get(name).orElse(binaryOps.get(name))
      .getOrElse(throw new NoSuchElementException(s"unknown binary op $name"))

  /** ops that extend to a known monoid — the `require_monoid` check in
    * ewise_add (reference vector.py:360-363 rejects e.g. binary.minus)
    */
  def isMonoidal(op: BinaryOp): Boolean =
    monoids.values.exists(_.op eq op) ||
      Set("plus", "times", "min", "max", "land", "lor", "lxor", "any", "eq")(op.name)
}
