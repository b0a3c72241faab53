import org.apache.spark.sql.SparkSession

object CompareOracle {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tables = Seq("region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings")
    tables.foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t))
    val txt = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$outDir/oracle_sql.json")), "UTF-8")
    // parse the flat {"k": "v", ...} json
    val entries = scala.collection.mutable.LinkedHashMap[String,String]()
    val p = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = p.readTree(txt)
    val it = node.fields()
    while (it.hasNext) { val e = it.next(); entries(e.getKey) = e.getValue.asText() }
    var ok = 0; var bad = 0; var errs = 0
    def norm(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val cols = df.columns.sorted
      df.select(cols.map(org.apache.spark.sql.functions.col): _*).collect().toSeq
        .map(r => (0 until r.length).map { i =>
          r.get(i) match {
            case d: Double => BigDecimal(d).setScale(9, BigDecimal.RoundingMode.HALF_UP).toString
            case f: Float => BigDecimal(f.toDouble).setScale(9, BigDecimal.RoundingMode.HALF_UP).toString
            case null => "NULL"
            case x => x.toString
          }
        }.mkString("|")).sorted
    }
    entries.foreach { case (name, sql) =>
      val r = new java.util.concurrent.atomic.AtomicReferenceArray[Throwable](1)
      val t = new Thread(null, () => { try {
        val want = norm(spark.sql(sql))
        val got = norm(spark.read.parquet(s"$outDir/$name"))
        if (want == got) { ok += 1; println(s"OK   $name") }
        else {
          bad += 1
          println(s"FAIL $name: got ${got.length} rows vs oracle ${want.length}" +
            (if (got.length == want.length) " (values differ): " + got.zip(want).filter(x => x._1 != x._2).take(2).mkString(" ; ") else ""))
        }
      } catch { case e: Throwable => r.set(0, e) } }, s"cmp-$name", 1L << 30)
      t.start(); t.join()
      Option(r.get(0)).foreach { e => errs += 1; println(s"ERR  $name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}") }
    }
    println(s"RESULT: $ok ok, $bad fail, $errs err / ${entries.size}")
    spark.stop()
  }
}
