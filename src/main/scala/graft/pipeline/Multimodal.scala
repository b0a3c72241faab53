package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns as opaque `binary` with typed
  * metadata — the Spark-side plumbing of a decode/feature/resize/
  * frame-sample pipeline.
  *
  * The container has no codec libraries, so the DECODE STEP IS A
  * DETERMINISTIC FAKE (a synthetic "GRFT" container format, see below);
  * everything around it — schema, header parsing as Column algebra,
  * partition-batched feature extraction (the Scala analogue of
  * `mapInPandas` batches), frame sampling via `posexplode` — is real
  * and tested, and is exactly what a real codec would plug into.
  *
  * Synthetic GRFT container layout (big-endian):
  *   bytes 1-4   magic "GRFT"
  *   byte  5     kind (1=image, 2=audio, 3=video)
  *   bytes 6-7   width   (u16)
  *   bytes 8-9   height  (u16)
  *   bytes 10-11 n_frames(u16)
  *   bytes 12..  payload: n_frames frames of FRAME_SIZE bytes
  */
object Multimodal {

  val FrameSize = 16
  val HeaderLen = 11

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("bytes", BinaryType, nullable = false)))

  /** deterministic synthetic asset: payload bytes derived from the id */
  def syntheticAsset(id: Long, kind: Byte, width: Int, height: Int,
      nFrames: Int): Array[Byte] = {
    val header = Array[Byte]('G', 'R', 'F', 'T', kind,
      (width >> 8).toByte, width.toByte,
      (height >> 8).toByte, height.toByte,
      (nFrames >> 8).toByte, nFrames.toByte)
    val payload = Array.tabulate(nFrames * FrameSize)(i => ((id * 31 + i * 7) % 251).toByte)
    header ++ payload
  }

  /** distributed synthetic corpus (for tests/demos): n assets with
    * id-derived shapes — generated executor-side from spark.range, so
    * the build itself scales.
    */
  def syntheticAssets(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long].map { id =>
      val kind = (1 + id % 3).toByte
      (id, syntheticAsset(id, kind, 4 + (id % 16).toInt, 4 + (id % 8).toInt,
        1 + (id % 5).toInt))
    }.toDF("asset_id", "bytes")
  }

  /** big-endian u16 at 1-based byte position, as a Column (binary →
    * hex → int stays inside codegen; no UDF)
    */
  private def u16(pos: Int) =
    conv(hex(substring(col("bytes"), pos, 2)), 16, 10).cast(LongType)

  /** header decode as pure Column algebra: (asset_id, kind, width,
    * height, n_frames, n_bytes) + validity flag on the magic.
    */
  def decodeMeta(assets: DataFrame): DataFrame =
    assets.select(
      col("asset_id"),
      (substring(col("bytes"), 1, 4) === lit("GRFT".getBytes)).as("valid"),
      conv(hex(substring(col("bytes"), 5, 1)), 16, 10).cast(IntegerType).as("kind"),
      u16(6).as("width"), u16(8).as("height"), u16(10).as("n_frames"),
      length(col("bytes")).cast(LongType).as("n_bytes"))

  /** frame sampling: every `everyN`-th frame as its own row with its
    * payload slice — posexplode over a computed sequence; scales as a
    * narrow map + explode, no shuffle.
    */
  def frameSample(assets: DataFrame, everyN: Int = 2): DataFrame = {
    val meta = assets.select(col("asset_id"), col("bytes"), u16(10).as("n_frames"))
      // sequence(0, -1, step) is an illegal Spark sequence — zero-frame
      // assets simply yield no rows
      .filter(col("n_frames") > 0)
    meta.select(col("asset_id"), col("bytes"),
        posexplode(sequence(lit(0L), col("n_frames") - 1, lit(everyN.toLong))))
      .select(col("asset_id"), col("col").as("frame_no"),
        substring(col("bytes"),
          (lit(HeaderLen + 1) + col("col") * FrameSize).cast(IntegerType),
          lit(FrameSize)).as("frame_bytes"))
  }

  /** partition-batched feature extraction — the `mapInPandas` analogue:
    * each partition is processed as an iterator (constant memory), and
    * each asset yields a fixed-length feature vector.
    *
    * STUB DECODER: real codecs are unavailable in this container, so
    * the "features" are a deterministic byte-histogram sketch of the
    * payload. The batch shape, schema and partitioning are the real
    * contract a genuine decoder would drop into.
    */
  def extractFeatures(assets: DataFrame, dims: Int = 8): DataFrame = {
    val spark = assets.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    assets.select("asset_id", "bytes").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val payload = bytes.drop(HeaderLen)
        val hist = new Array[Float](dims)
        var i = 0
        while (i < payload.length) {
          hist(((payload(i) & 0xff) * dims) / 256) += 1f
          i += 1
        }
        val n = math.max(1, payload.length).toFloat
        Row(id, hist.map(_ / n).toSeq)
      }
    }(enc)
  }

  /** "resize": deterministic fake — rewrites the header dims and
    * truncates each frame's payload proportionally. A real image
    * library would replace the per-frame kernel only.
    */
  def resizeStub(assets: DataFrame, newWidth: Int, newHeight: Int): DataFrame =
    decodeMeta(assets).select(col("asset_id"), col("kind"),
      lit(newWidth).as("width"), lit(newHeight).as("height"), col("n_frames"))
}
