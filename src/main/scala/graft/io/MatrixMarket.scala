package graft.io

import graft.core._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MatrixMarket reader/writer.
  *
  * Reference: the parallel byte-range reader at
  * dask_grblas/io.py:133-683 (~550 LoC of header seeking, byte-split
  * line re-homing, symmetry expansion, triangular index math) plus
  * matrix.py:67-112 from_MMfile/to_MMfile. Spark's distributed
  * line-splitting text source replaces all of the manual machinery;
  * what remains is header parsing, 1-based→0-based shift, and
  * symmetric/skew-symmetric expansion (io.py:662-676) via a union of
  * the mirrored projection.
  *
  * Line addressing is deterministic: the driver-side header parse
  * counts the header lines, and the distributed body is indexed with
  * zipWithIndex (stable file order) — no global Window, no
  * non-deterministic monotonically_increasing_id.
  */
object MatrixMarket {

  final case class Header(format: String, field: String, symmetry: String,
      nrows: Long, ncols: Long, nnz: Long, bodyStart: Long)

  /** read the header lines (comment block + size line) driver-side —
    * tiny — then scan the body distributed. Opened through the Hadoop
    * FileSystem so non-local paths (hdfs://, s3a://…) work.
    * `bodyStart` = number of lines before the first data line
    * (informational — the distributed body scan locates data lines by
    * filtering comments, not by this offset).
    */
  def readHeader(spark: SparkSession, path: String): Header = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val src = scala.io.Source.fromInputStream(fs.open(p), "UTF-8")
    try {
      val lines = src.getLines()
      var consumed = 0L
      def next(): String = { consumed += 1; lines.next() }
      val banner = next().trim.split("\\s+")
      require(banner(0) == "%%MatrixMarket" && banner(1) == "matrix",
        s"not a MatrixMarket matrix file: $path")
      val format = banner(2).toLowerCase // coordinate | array
      val field = banner(3).toLowerCase // real | integer | pattern | complex
      val symmetry = banner(4).toLowerCase // general | symmetric | skew-symmetric | hermitian
      var line = next()
      while (line.startsWith("%")) line = next()
      val size = line.trim.split("\\s+")
      format match {
        case "coordinate" =>
          Header(format, field, symmetry, size(0).toLong, size(1).toLong,
            size(2).toLong, consumed)
        case "array" =>
          Header(format, field, symmetry, size(0).toLong, size(1).toLong,
            size(0).toLong * size(1).toLong, consumed)
        case other => throw new IllegalArgumentException(s"unknown MM format $other")
      }
    } finally src.close()
  }

  /** body lines with their 0-based position among DATA lines, in file
    * order (zipWithIndex is deterministic for a text source).
    * Comment and blank lines are dropped BEFORE indexing — the banner
    * and header comments all start with '%', so after the filter the
    * first remaining line is exactly the size line (index 0), and
    * mid-body comments (tolerated by scipy) neither parse as data nor
    * shift array-format positions.
    */
  private def indexedBody(spark: SparkSession, path: String): DataFrame = {
    val rdd = spark.read.text(path).select(col("value")).rdd
      .map(_.getString(0))
      .filter { l => val t = l.trim; t.nonEmpty && !t.startsWith("%") }
      .zipWithIndex()
      .filter { case (_, idx) => idx >= 1 } // index 0 = the size line
      .map { case (l, idx) => org.apache.spark.sql.Row(l, idx - 1) }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("value", StringType), StructField("_pos", LongType))))
  }

  /** complex entries carry TWO value tokens (re im); values land in a
    * struct<re double, im double> column with dtype FC64, hermitian
    * mirrors conjugated, skew mirrors fully negated (the reference
    * reads complex via scipy, io.py:662-676; numpy complex128 → FC64).
    * For complex files the `dtype` parameter is ignored.
    */
  def read(spark: SparkSession, path: String, dtype: GrbType = GrbType.FP64): GrbMatrix = {
    val h = readHeader(spark, path)
    val body = indexedBody(spark, path)
    h.format match {
      case "coordinate" => readCoordinate(body, h, dtype)
      case "array"      => readArray(body, h, dtype)
    }
  }

  /** windowed read (reference mmread row_begin/row_end/col_begin/
    * col_end, io.py:102-127,269-300): keep entries inside
    * [rowBegin, rowEnd) × [colBegin, colEnd), rebase indices to the
    * window origin; the result's shape is the window's. A filter over
    * the distributed scan — no extra pass.
    */
  def readWindowed(spark: SparkSession, path: String,
      rowBegin: Long = 0L, rowEnd: Long = -1L,
      colBegin: Long = 0L, colEnd: Long = -1L,
      dtype: GrbType = GrbType.FP64): GrbMatrix = {
    val m = read(spark, path, dtype)
    val re = if (rowEnd < 0) m.nrows else rowEnd
    val ce = if (colEnd < 0) m.ncols else colEnd
    new GrbMatrix(
      m.df.filter(col("i") >= rowBegin && col("i") < re &&
          col("j") >= colBegin && col("j") < ce)
        .select((col("i") - rowBegin).as("i"), (col("j") - colBegin).as("j"), col("v")),
      re - rowBegin, ce - colBegin)
  }

  /** complex value struct from two token positions */
  private def cplx(toks: org.apache.spark.sql.Column, at: Int) = struct(
    element_at(toks, at).cast(DoubleType).as("re"),
    element_at(toks, at + 1).cast(DoubleType).as("im"))

  private def readCoordinate(body: DataFrame, h: Header, dtype: GrbType): GrbMatrix = {
    val toks = split(trim(col("value")), "\\s+")
    val complexField = h.field == "complex"
    val vCol =
      if (complexField) cplx(toks, 3)
      else (if (h.field == "pattern") lit(1.0)
        else element_at(toks, 3).cast(DoubleType)).cast(dtype.spark)
    val base = body.select(
        (element_at(toks, 1).cast(LongType) - 1).as("i"),
        (element_at(toks, 2).cast(LongType) - 1).as("j"),
        vCol.as("v"))
    // mirror-value transforms: conj is the identity over real fields,
    // so hermitian-over-real ≡ symmetric (io.py:662-676)
    def conj(c: org.apache.spark.sql.Column) =
      if (complexField) struct(c.getField("re").as("re"), (-c.getField("im")).as("im"))
      else c
    def neg(c: org.apache.spark.sql.Column) =
      if (complexField) struct((-c.getField("re")).as("re"), (-c.getField("im")).as("im"))
      else (-c).cast(dtype.spark)
    def mirror(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      base.filter(col("i") =!= col("j"))
        .select(col("j").as("i"), col("i").as("j"), f(col("v")).as("v"))
    val expanded = h.symmetry match {
      case "general"        => base
      case "symmetric"      => base.unionByName(mirror(identity))
      case "hermitian"      => base.unionByName(mirror(conj))
      case "skew-symmetric" => base.unionByName(mirror(neg))
      case other => throw new IllegalArgumentException(s"unknown symmetry $other")
    }
    new GrbMatrix(expanded, h.nrows, h.ncols,
      if (complexField) Some(GrbType.FC64) else None)
  }

  /** dense `array` format: column-major values, one per line; for
    * symmetric/skew only the lower triangle is stored
    * (io.py:8-71 triangular index math → closed-form here).
    */
  private def readArray(body: DataFrame, h: Header, dtype: GrbType): GrbMatrix = {
    val toks = split(trim(col("value")), "\\s+")
    val complexField = h.field == "complex"
    val vRaw = if (complexField) cplx(toks, 1)
      else element_at(toks, 1).cast(DoubleType)
    val vals = body.select(vRaw.as("dv"), col("_pos"))
    val vTyped = if (complexField) col("dv") else col("dv").cast(dtype.spark)
    def conj(c: org.apache.spark.sql.Column) =
      if (complexField) struct(c.getField("re").as("re"), (-c.getField("im")).as("im"))
      else c
    def neg(c: org.apache.spark.sql.Column) =
      if (complexField) struct((-c.getField("re")).as("re"), (-c.getField("im")).as("im"))
      else (-c).cast(dtype.spark)
    val n = h.nrows
    val declared = if (complexField) Some(GrbType.FC64) else None
    val coords = h.symmetry match {
      case "general" =>
        vals.select(
          (col("_pos") % n).as("i"), expr(s"_pos DIV $n").as("j"),
          vTyped.as("v"))
      case "symmetric" | "hermitian" =>
        // lower triangle incl. diagonal, column-major: column j holds
        // (n - j) entries starting at row j; linear index k → column j
        // is the largest j with T(j) <= k where T(j) = j*n - j(j-1)/2.
        // Invert with the quadratic formula (io.py:8-41 symm_*).
        // Hermitian differs only in the mirror transform (conjugate —
        // identity over real fields).
        val k = col("_pos")
        val jc = floor((lit(2 * n + 1) - sqrt(lit((2 * n + 1).toDouble * (2 * n + 1)) -
          lit(8.0) * k.cast(DoubleType))) / 2.0).cast(LongType)
        val tri = vals
          .withColumn("_j", jc)
          .withColumn("_i",
            ((k - (col("_j") * n - col("_j") * (col("_j") - 1) / 2)) + col("_j"))
              .cast(LongType))
          .select(col("_i").as("i"), col("_j").as("j"), vTyped.as("v"))
        val mirrorFn = if (h.symmetry == "hermitian") conj _ else (c: org.apache.spark.sql.Column) => c
        val mirror = tri.filter(col("i") =!= col("j")).select(col("j").as("i"),
          col("i").as("j"), mirrorFn(col("v")).as("v"))
        tri.unionByName(mirror)
      case "skew-symmetric" =>
        // STRICTLY lower triangle (no diagonal — skew diagonals are
        // identically zero), column-major: column j holds (n - j - 1)
        // entries starting at row j+1, so T(j) = j*(2n - j - 1)/2 and
        // the inversion constant is (2n - 1), not (2n + 1)
        // (io.py:41-70 skew_* differ from symm_* exactly this way).
        val k = col("_pos")
        val jc = floor((lit(2 * n - 1) - sqrt(lit((2 * n - 1).toDouble * (2 * n - 1)) -
          lit(8.0) * k.cast(DoubleType))) / 2.0).cast(LongType)
        val tri = vals
          .withColumn("_j", jc)
          .withColumn("_i",
            ((k - col("_j") * (lit(2 * n) - col("_j") - 1) / 2) + col("_j") + 1)
              .cast(LongType))
          .select(col("_i").as("i"), col("_j").as("j"), vTyped.as("v"))
        val mirror = tri.select(col("j").as("i"), col("i").as("j"),
          neg(col("v")).as("v"))
        tri.unionByName(mirror)
      case other => throw new IllegalArgumentException(s"unknown symmetry $other")
    }
    new GrbMatrix(coords, h.nrows, h.ncols, declared)
  }

  /** write coordinate-format MM: header + 1-based triples, sorted by
    * (i, j). The sort is distributed either way; what varies is the
    * text-write fan-in:
    *   - small outputs (nnz ≤ singlePartMax): coalesce(1) — one part
    *     file, header stitched in front (one task, no concat loop);
    *   - large outputs: every sort partition writes its own part file
    *     IN PARALLEL (orderBy range-partitions, so part-file name
    *     order IS global row order), then the driver streams header +
    *     parts into the final file — the reference's own
    *     parallel-write-then-concatenate strategy
    *     (matrix.py:75-112,1005-1064). The concat is sequential
    *     byte-copy I/O, not a sort — the scale-sensitive work stays
    *     distributed.
    * Matrices at data scale should still prefer the Parquet sink
    * (ParquetIO) — MM is an exchange format, not a scale format.
    */
  def write(m: GrbMatrix, path: String,
      singlePartMax: Long = 8L * 1000 * 1000): Unit = {
    val field = m.dtype match {
      case GrbType.FP32 | GrbType.FP64 => "real"
      case GrbType.FC64                => "complex"
      case GrbType.BOOL                => "integer"
      case _                           => "integer"
    }
    val nnz = m.nvals
    val header = s"%%MatrixMarket matrix coordinate $field general\n%\n${m.nrows} ${m.ncols} $nnz"
    val vOut: Seq[org.apache.spark.sql.Column] = m.dtype match {
      case GrbType.FC64 => Seq(col("v.re"), col("v.im")) // two tokens per entry
      case GrbType.BOOL => Seq(col("v").cast(IntegerType))
      case _            => Seq(col("v"))
    }
    val lines = m.df
      .orderBy("i", "j")
      .select(concat_ws(" ", (Seq(col("i") + 1, col("j") + 1) ++ vOut): _*).as("value"))
    val tmp = path + ".tmp"
    val sink = if (nnz <= singlePartMax) lines.coalesce(1) else lines
    sink.write.mode(SaveMode.Overwrite).text(tmp)
    // stitch header + part files (sorted by NUMERIC part index =
    // global row order, since orderBy range-partitions; a lexical name
    // sort would misplace part-100000 before part-99999 once the task
    // count outgrows the %05d zero-padding)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      m.spark.sparkContext.hadoopConfiguration)
    val partIdx = "part-(\\d+)".r
    val parts = fs.globStatus(new org.apache.hadoop.fs.Path(tmp + "/part-*"))
      .map(_.getPath).sortBy(p => partIdx.findFirstMatchIn(p.getName)
        .map(_.group(1).toLong).getOrElse(Long.MaxValue))
    val out = fs.create(new org.apache.hadoop.fs.Path(path), true)
    out.write((header + "\n").getBytes("UTF-8"))
    parts.foreach { part =>
      val in = fs.open(part)
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
      in.close()
    }
    out.close()
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
  }
}

/** native COO Parquet source/sink — the idiomatic scale format */
object ParquetIO {
  def writeVector(v: GrbVector, path: String): Unit =
    v.df.write.mode(SaveMode.Overwrite).parquet(path)
  def readVector(spark: SparkSession, path: String, size: Long = -1L): GrbVector =
    GrbVector.fromDF(spark.read.parquet(path), size)
  def writeMatrix(m: GrbMatrix, path: String): Unit =
    m.df.write.mode(SaveMode.Overwrite).parquet(path)
  def readMatrix(spark: SparkSession, path: String,
      nrows: Long = -1L, ncols: Long = -1L): GrbMatrix =
    GrbMatrix.fromDF(spark.read.parquet(path), nrows, ncols)
}
