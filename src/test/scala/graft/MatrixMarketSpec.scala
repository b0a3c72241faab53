package graft

import java.nio.file.{Files, Paths}
import graft.core._
import graft.io.MatrixMarket

/** MatrixMarket IO: coordinate/array formats, symmetry expansion,
  * windowed reads, write round-trip.
  */
class MatrixMarketSpec extends SparkSpec {

  private def writeTmp(name: String, content: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), s"graft-mm-$name.mtx")
    Files.writeString(p, content)
    p.toString
  }

  private def coo(m: GrbMatrix): Set[(Long, Long, Double)] =
    m.toValues.map { case (i, j, v) => (i, j, v.asInstanceOf[Double]) }.toSet

  test("coordinate general, with comments") {
    val path = writeTmp("gen",
      """%%MatrixMarket matrix coordinate real general
        |% a comment
        |% another
        |3 4 3
        |1 1 1.5
        |2 3 -2.0
        |3 4 7.25
        |""".stripMargin)
    val m = MatrixMarket.read(spark, path)
    assert(m.nrows == 3 && m.ncols == 4 && m.nvals == 3)
    assert(coo(m) == Set((0L, 0L, 1.5), (1L, 2L, -2.0), (2L, 3L, 7.25)))
  }

  test("coordinate symmetric expands mirrors; skew negates") {
    val sym = writeTmp("sym",
      """%%MatrixMarket matrix coordinate real symmetric
        |3 3 3
        |1 1 1.0
        |2 1 2.0
        |3 2 3.0
        |""".stripMargin)
    val ms = MatrixMarket.read(spark, sym)
    assert(coo(ms) == Set((0L, 0L, 1.0), (1L, 0L, 2.0), (0L, 1L, 2.0),
      (2L, 1L, 3.0), (1L, 2L, 3.0)))
    val skew = writeTmp("skew",
      """%%MatrixMarket matrix coordinate real skew-symmetric
        |3 3 2
        |2 1 2.0
        |3 2 3.0
        |""".stripMargin)
    val mk = MatrixMarket.read(spark, skew)
    assert(coo(mk) == Set((1L, 0L, 2.0), (0L, 1L, -2.0), (2L, 1L, 3.0), (1L, 2L, -3.0)))
  }

  test("mid-body comment and blank lines are ignored, positions unshifted") {
    val path = writeTmp("midc",
      """%%MatrixMarket matrix coordinate real general
        |3 3 2
        |1 1 1.5
        |% stray comment scipy tolerates
        |
        |2 2 2.5
        |""".stripMargin)
    val m = MatrixMarket.read(spark, path)
    assert(coo(m) == Set((0L, 0L, 1.5), (1L, 1L, 2.5)))
    val arr = writeTmp("midarr",
      """%%MatrixMarket matrix array real general
        |2 1
        |1.0
        |% comment between values
        |2.0
        |""".stripMargin)
    val a = MatrixMarket.read(spark, arr)
    assert(coo(a) == Set((0L, 0L, 1.0), (1L, 0L, 2.0)))
  }

  test("coordinate pattern field gets value 1") {
    val path = writeTmp("pat",
      """%%MatrixMarket matrix coordinate pattern general
        |2 2 2
        |1 2
        |2 1
        |""".stripMargin)
    val m = MatrixMarket.read(spark, path)
    assert(coo(m) == Set((0L, 1L, 1.0), (1L, 0L, 1.0)))
  }

  test("array format column-major; symmetric lower triangle") {
    val gen = writeTmp("arr",
      """%%MatrixMarket matrix array real general
        |2 2
        |1.0
        |2.0
        |3.0
        |4.0
        |""".stripMargin)
    val m = MatrixMarket.read(spark, gen)
    assert(coo(m) == Set((0L, 0L, 1.0), (1L, 0L, 2.0), (0L, 1L, 3.0), (1L, 1L, 4.0)))
    val sym = writeTmp("arrsym",
      """%%MatrixMarket matrix array real symmetric
        |2 2
        |1.0
        |2.0
        |3.0
        |""".stripMargin)
    val s = MatrixMarket.read(spark, sym)
    assert(coo(s) == Set((0L, 0L, 1.0), (1L, 0L, 2.0), (0L, 1L, 2.0), (1L, 1L, 3.0)))
  }

  test("windowed read filters and rebases (reference io.py:102-127)") {
    val path = writeTmp("win",
      """%%MatrixMarket matrix coordinate real general
        |4 4 5
        |1 1 1.0
        |2 2 2.0
        |3 3 3.0
        |4 4 4.0
        |3 1 5.0
        |""".stripMargin)
    val w = MatrixMarket.readWindowed(spark, path, rowBegin = 1L, rowEnd = 3L,
      colBegin = 1L, colEnd = 4L)
    assert(w.nrows == 2 && w.ncols == 3)
    assert(coo(w) == Set((0L, 0L, 2.0), (1L, 1L, 3.0)))
  }

  test("write round-trip") {
    val m0 = GrbMatrix.fromValues(spark,
      Seq((0L, 0L, 1.5: Any), (1L, 2L, -2.0: Any), (2L, 1L, 0.5: Any)),
      GrbType.FP64, 3L, 3L)
    val out = Paths.get(sys.props("java.io.tmpdir"), "graft-mm-roundtrip.mtx").toString
    MatrixMarket.write(m0, out)
    val m1 = MatrixMarket.read(spark, out)
    assert(m0.isequal(m1))
  }

  test("parallel multi-part write round-trips and preserves global (i, j) order") {
    // 200 entries, singlePartMax = 10 → the parallel path: each sort
    // partition writes its own part file, driver concatenates
    import org.apache.spark.sql.functions._
    val df = spark.range(200).select(
      (col("id") % 20).as("i"), floor(col("id") / 20).cast("long").as("j"),
      (col("id") * 3 % 17).cast("long").as("v"))
    val m0 = GrbMatrix.fromDF(df, 20L, 10L)
    val out = Paths.get(sys.props("java.io.tmpdir"), "graft-mm-multipart.mtx").toString
    MatrixMarket.write(m0, out, singlePartMax = 10L)
    val m1 = MatrixMarket.read(spark, out, GrbType.INT64)
    assert(m1.nvals == 200L && m0.isequal(m1))
    // body must be globally sorted by (i, j) — the MM convention the
    // single-part writer guaranteed
    import scala.jdk.CollectionConverters._
    val body = Files.readAllLines(Paths.get(out)).asScala.toSeq.drop(3)
      .map { l => val t = l.split(" "); (t(0).toLong, t(1).toLong) }
    assert(body == body.sorted)
  }
}
