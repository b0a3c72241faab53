package graft.core

import org.apache.spark.sql.types._

/** GraphBLAS dtype ↔ Spark SQL type mapping.
  *
  * Reference semantics: fixed numeric+bool type system, see
  * dask_grblas/utils.py:10-11 (np_dtype) and the dtype usage survey in
  * SURVEY.md §1.2. Spark has no unsigned integral types; unsigned dtypes
  * are widened to the next signed type (documented deviation).
  */
sealed abstract class GrbType(val name: String, sparkRepr: DataType, val rank: Int) {
  /** default physical Spark type. UINT64's store additionally depends
    * on the session's UINT64 mode (Decimal(20,0) under `wide`) —
    * schema-building sites resolve it through [[Grb.store]].
    */
  def spark: DataType = sparkRepr
  override def toString: String = name
}

object GrbType {
  case object BOOL extends GrbType("BOOL", BooleanType, 0)
  case object INT8 extends GrbType("INT8", ByteType, 1)
  case object INT16 extends GrbType("INT16", ShortType, 2)
  case object INT32 extends GrbType("INT32", IntegerType, 3)
  case object INT64 extends GrbType("INT64", LongType, 4)
  // unsigned: widened signed representation (Spark has no unsigned types)
  case object UINT8 extends GrbType("UINT8", ShortType, 2)
  case object UINT16 extends GrbType("UINT16", IntegerType, 3)
  case object UINT32 extends GrbType("UINT32", LongType, 4)
  /** default: signed-long store with C-wrap past 2⁶³−1 (documented
    * deviation; opt-in raise via the session conf
    * `spark.graft.uint64Mode=checked`). Under `wide` the store widens
    * to Decimal(20,0) so the FULL unsigned range [0, 2⁶⁴) is
    * representable, and arithmetic wraps mod 2⁶⁴ exactly like the
    * reference's C semantics (Grb.castTo applies the wrap at every
    * preserve-cast site; Grb.store resolves the schema type).
    */
  case object UINT64 extends GrbType("UINT64", LongType, 4)
  case object FP32 extends GrbType("FP32", FloatType, 5)
  case object FP64 extends GrbType("FP64", DoubleType, 6)
  // --- engine extensions beyond the GraphBLAS numeric core ---
  // Multimodal/vector columns as first-class opaque values: embeddings
  // (array<float>) and binary assets (image/audio bytes). They carry no
  // algebra (rank -1, excluded from promotion); structural operators
  // (ewise structure ops with first/second/pair, extract, assign, masks,
  // dedup/similarity pipelines) work on them unchanged.
  case object VEC_FP32 extends GrbType("VEC_FP32", ArrayType(FloatType), -1)
  case object VEC_FP64 extends GrbType("VEC_FP64", ArrayType(DoubleType), -1)
  case object BINARY extends GrbType("BINARY", BinaryType, -1)
  case object STRING extends GrbType("STRING", StringType, -1)
  /** complex128 (grblas GxB FC64; numpy complex via scipy in the
    * reference's MM reader, io.py:662-676). Opaque here: structural
    * ops and MatrixMarket IO work; no numeric promotion into the real
    * algebra.
    */
  case object FC64 extends GrbType("FC64",
    StructType(Seq(StructField("re", DoubleType), StructField("im", DoubleType))), -1)

  val all: Seq[GrbType] =
    Seq(BOOL, INT8, INT16, INT32, INT64, UINT8, UINT16, UINT32, UINT64, FP32, FP64)

  def fromSpark(dt: DataType): GrbType = dt match {
    case BooleanType => BOOL
    case ByteType    => INT8
    case ShortType   => INT16
    case IntegerType => INT32
    case LongType    => INT64
    case FloatType   => FP32
    case DoubleType  => FP64
    case ArrayType(FloatType, _)  => VEC_FP32
    case ArrayType(DoubleType, _) => VEC_FP64
    case BinaryType  => BINARY
    case StringType  => STRING
    case StructType(Array(StructField("re", DoubleType, _, _),
      StructField("im", DoubleType, _, _))) => FC64
    // wide-UINT64 store (only ever produced under uint64Mode=wide)
    case d: DecimalType if d.precision == 20 && d.scale == 0 => UINT64
    case other => throw new IllegalArgumentException(s"unsupported value type: $other")
  }

  /** value bits an integral dtype needs (sign bit excluded) — drives
    * the int×float promotion rule below.
    */
  private def intBits(t: GrbType): Int = t match {
    case BOOL => 1
    case INT8 => 7;  case UINT8 => 8
    case INT16 => 15; case UINT16 => 16
    case INT32 => 31; case UINT32 => 32
    case INT64 => 63; case UINT64 => 64
    case _ => 0
  }

  private def isFloat(t: GrbType): Boolean = t == FP32 || t == FP64

  /** numpy promote_types semantics for mixed-dtype binary ops
    * (reference: get_typed_op via grblas, dask_grblas/base.py:174).
    * int × FP32 widens to FP64 when the int's values don't fit in
    * FP32's 24-bit mantissa (so int64+float32 → float64, matching
    * numpy), else FP32.
    */
  def promote(a: GrbType, b: GrbType): GrbType = if (a.rank < 0 || b.rank < 0) {
    require(a == b, s"no promotion between opaque types $a and $b")
    a
  } else (isFloat(a), isFloat(b)) match {
    case (true, true)  => if (a.rank >= b.rank) a else b
    case (true, false) => promoteIntFloat(b, a)
    case (false, true) => promoteIntFloat(a, b)
    case (false, false) => if (a.rank >= b.rank) a else b
  }

  private def promoteIntFloat(i: GrbType, f: GrbType): GrbType =
    if (f == FP64) FP64
    else if (intBits(i) <= 24) FP32
    else FP64
}
