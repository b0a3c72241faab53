package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{DocsStream, EventsStream}

/** Structured Streaming operators driven through MemoryStream — the
  * same transforms the batch Events operators use, with watermarked
  * bounded state.
  */
class StreamingSpec extends SparkSpec {

  import EventsStream.SessionUpdate

  final case class Ev(event_id: Long, ts: Long, user_id: Long,
      event_type: String, value: Double)

  private def ns(sec: Long): Long = sec * 1000000000L

  test("streaming hourly windowed aggregation with watermark") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sc = spark2.sqlContext
    val input = MemoryStream[Ev]
    val agg = EventsStream.hourlyByType(input.toDF())
    val q = agg.writeStream.format("memory").queryName("hourly")
      .outputMode("update").start()
    try {
      input.addData(
        Ev(1, ns(3600), 7, "click", 1.25),
        Ev(2, ns(3660), 7, "click", 2.50),
        Ev(3, ns(7200), 8, "view", 0.75))
      q.processAllAvailable()
      val rows = spark.table("hourly").collect()
        .map(r => (r.getAs[java.sql.Timestamp]("h").getTime / 1000,
          r.getAs[String]("event_type"), r.getAs[Long]("n"), r.getAs[Long]("sum_cents")))
        .toSet
      assert(rows.contains((3600L, "click", 2L, 375L)))
      assert(rows.contains((7200L, "view", 1L, 75L)))
    } finally q.stop()
  }

  test("stream-stream interval join: strictly-after within horizon, cross-batch pairs match") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sc = spark2.sqlContext
    val views = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val joined = EventsStream.attributedPairs(views.toDF(), clicks.toDF(),
      horizonSeconds = 100L)
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      views.addData(
        Ev(1, ns(1000), 7, "view", 0.0),
        Ev(2, ns(5000), 7, "view", 0.0),
        Ev(3, ns(1000), 8, "view", 0.0))
      clicks.addData(
        Ev(10, ns(1000), 7, "click", 0.0),  // NOT after → no match
        Ev(11, ns(1050), 7, "click", 0.0),  // within horizon → matches view 1
        Ev(12, ns(1101), 7, "click", 0.0),  // 101 s later → outside horizon
        Ev(13, ns(1050), 9, "click", 0.0))  // other user → no match
      q.processAllAvailable()
      // a second batch can still match an EARLIER view held in state
      clicks.addData(Ev(14, ns(5080), 7, "click", 0.0))
      q.processAllAvailable()
      val rows = spark.table("attrib").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("view_id"),
          r.getAs[Long]("click_id"))).toSet
      assert(rows == Set((7L, 1L, 11L), (7L, 2L, 14L)))
    } finally q.stop()
  }

  test("streaming HLL registers merge across microbatches == batch sketch") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sc = spark2.sqlContext
    val input = MemoryStream[Ev]
    val q = EventsStream.hourlyDistinctUsers(input.toDF())
      .writeStream.format("memory").queryName("shll")
      .outputMode("complete").start()
    try {
      // same window fed across TWO microbatches with overlapping users
      // — the register state must merge, not reset
      input.addData((1L to 40L).map(u => Ev(u, ns(3600 + u), u % 25, "click", 1.0)): _*)
      q.processAllAvailable()
      input.addData((41L to 80L).map(u => Ev(u, ns(3600 + u), u % 35, "click", 1.0)): _*)
      q.processAllAvailable()
      val got = spark.table("shll").collect()
        .map(r => (r.getAs[java.sql.Timestamp]("h").getTime / 1000,
          r.getAs[String]("event_type"), r.getAs[Long]("hll_milli"))).toSet
      // batch control over the union of both batches (tuples — the
      // inner case class has no stable encoder for local Datasets)
      val batch = ((1L to 40L).map(u => (u % 25, "click")) ++
        (41L to 80L).map(u => (u % 35, "click"))).toDF("user_id", "event_type")
      val want = graft.pipeline.Sketch.hllDistinct(
          batch, "event_type", "user_id")
        .collect().map(r => (3600L, r.getString(0), r.getLong(1))).toSet
      assert(got === want)
    } finally q.stop()
  }

  test("streaming minhash signatures min-merge across microbatches == batch signature") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sc = spark2.sqlContext
    val input = MemoryStream[Doc]
    val q = graft.streaming.DocsStream.minhashSignatureStates(input.toDF())
      .writeStream.format("memory").queryName("ssig")
      .outputMode("complete").start()
    try {
      // ONE doc_id whose shingles arrive split across two microbatches
      // — the per-column MIN state must merge to the union signature
      input.addData(Doc(7L, "alpha beta gamma delta epsilon"))
      q.processAllAvailable()
      input.addData(Doc(7L, "zeta eta theta iota kappa lambda"))
      q.processAllAvailable()
      val got = spark.table("ssig").collect()
      assert(got.length === 1)
      val batch = graft.pipeline.TextDedup.minhashSignatures(Seq(
        (7L, "alpha beta gamma delta epsilon"),
        (7L, "zeta eta theta iota kappa lambda")).toDF("doc_id", "text")).collect()
      assert(got.head.toSeq === batch.head.toSeq)
    } finally q.stop()
  }

  test("streaming funnel: the state machine advances across microbatches, ordering stays strict") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sc = spark2.sqlContext
    val input = MemoryStream[Ev]
    val q = EventsStream.funnelStages(input.toDF()).toDF()
      .writeStream.format("memory").queryName("sfunnel")
      .outputMode("update").start()
    try {
      // batch 1: u1 views; u2 purchases FIRST (must never convert
      // stage 3 later), then views
      input.addData(Ev(1, ns(10), 1, "view", 0.0),
        Ev(2, ns(5), 2, "purchase", 0.0), Ev(3, ns(10), 2, "view", 0.0))
      q.processAllAvailable()
      // batch 2: u1 clicks then purchases (state carries the view);
      // u2 clicks — stage 2, but its old purchase is gone for good
      input.addData(Ev(4, ns(20), 1, "click", 0.0),
        Ev(5, ns(30), 1, "purchase", 0.0), Ev(6, ns(20), 2, "click", 0.0))
      q.processAllAvailable()
      val counts = EventsStream.funnelCounts(spark.table("sfunnel")).collect()
        .map(r => r.getAs[Long]("stage") -> r.getAs[Long]("n_users")).toMap
      assert(counts === Map(1L -> 2L, 2L -> 2L, 3L -> 1L))
    } finally q.stop()
  }

  test("stream-static enrichment join merges tier totals across microbatches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sc = spark2.sqlContext
    // batch dimension: users 1,2 heavy (>= 3 lifetime events), 3 light
    val hist = Seq(1L -> 3, 2L -> 4, 3L -> 1)
      .flatMap { case (u, n) => (1 to n).map(i => (u * 100 + i, u)) }
      .toDF("event_id", "user_id")
    val tiers = EventsStream.activityTiers(hist, threshold = 3L)
    val input = MemoryStream[Ev]
    val q = EventsStream.enrichedTierTotals(input.toDF(), tiers)
      .writeStream.format("memory").queryName("senrich")
      .outputMode("complete").start()
    try {
      // the same (tier, type) cell fed across TWO microbatches — the
      // aggregation state must merge, not reset
      input.addData(Ev(1, ns(10), 1, "click", 1.25), Ev(2, ns(20), 3, "click", 2.00))
      q.processAllAvailable()
      input.addData(Ev(3, ns(30), 2, "click", 0.50), Ev(4, ns(40), 1, "view", 3.00))
      q.processAllAvailable()
      val got = spark.table("senrich").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(got === Set(
        ("heavy", "click", 2L, 175L), // users 1 + 2, one per batch
        ("heavy", "view", 1L, 300L),
        ("light", "click", 1L, 200L)))
    } finally q.stop()
  }

  final case class Doc(doc_id: Long, text: String)

  test("streaming contamination: ledger matches accumulate across batches == batch screen") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sc = spark2.sqlContext
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val ledger = DocsStream.benchShingleLedger(bench)
    val input = MemoryStream[Doc]
    val q = DocsStream.contaminationStates(input.toDF(), ledger).writeStream
      .format("memory").queryName("contam")
      .outputMode("complete").start()
    try {
      // batch 1: a verbatim copy (full containment) and an unrelated doc
      input.addData(Doc(1L, "alpha beta gamma delta epsilon zeta"),
        Doc(2L, "one two three four five six"))
      q.processAllAvailable()
      // batch 2: a partial quote — 2 of the bench's 4 shingles
      input.addData(Doc(3L, "alpha beta gamma delta seven eight"))
      q.processAllAvailable()
      val rows = spark.table("contam").collect()
        .map(r => (r.getAs[Long]("bench_id"), r.getAs[Long]("train_id"),
          r.getAs[Long]("inter"))).toSet
      assert(rows == Set((100L, 1L, 4L), (100L, 3L, 2L)))
      // parity with the uncapped batch screen at threshold 1/2
      val train = Seq((1L, "alpha beta gamma delta epsilon zeta"),
        (2L, "one two three four five six"),
        (3L, "alpha beta gamma delta seven eight")).toDF("doc_id", "text")
      val batch = graft.pipeline.TextDedup.contamination(
        train, bench, num = 1, den = 2, maxShingleDf = 0).collect()
        .map(r => (r.getAs[Long]("bench_id"), r.getAs[Long]("train_id"),
          r.getAs[Long]("inter"))).toSet
      assert(batch == rows)
    } finally q.stop()
  }

  test("streaming exact dedup keeps first doc_id per content across batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sc = spark2.sqlContext
    val input = MemoryStream[Doc]
    val q = DocsStream.exactDedup(input.toDF()).writeStream
      .format("memory").queryName("dedup")
      .outputMode("complete").start()
    try {
      input.addData(Doc(5L, "alpha beta"), Doc(3L, "gamma delta"))
      q.processAllAvailable()
      // a later batch re-delivers known content with a larger id and
      // adds fresh content: the ledger keeps the first id, bumps counts
      input.addData(Doc(9L, "alpha beta"), Doc(1L, "epsilon zeta"))
      q.processAllAvailable()
      val rows = spark.table("dedup").collect()
        .map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("cnt"))).toSet
      assert(rows == Set((5L, 2L), (3L, 1L), (1L, 1L)))
      // batch/stream parity: identical result through TextDedup.exact
      val batch = graft.pipeline.TextDedup.exact(
        Seq((5L, "alpha beta"), (3L, "gamma delta"),
          (9L, "alpha beta"), (1L, "epsilon zeta")).toDF("doc_id", "text"))
        .collect().map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("cnt"))).toSet
      assert(batch == rows)
    } finally q.stop()
  }

  final case class LangDoc(doc_id: Long, lang: String, text: String)

  test("streaming quota sample: bounded top-k state merges across batches == batch sample") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sc = spark2.sqlContext
    val input = MemoryStream[LangDoc]
    val q = DocsStream.stratifiedQuotaSample(input.toDF(), "lang", 5)
      .writeStream.format("memory").queryName("stopk")
      .outputMode("complete").start()
    try {
      // 12 docs per stratum across TWO batches: the <=5-entry buffer
      // must keep the hash-least of the UNION, not of the last batch
      val b1 = (1L to 12L).map(i => LangDoc(i, if (i % 2 == 0) "en" else "de", s"text body $i"))
      val b2 = (13L to 24L).map(i => LangDoc(i, if (i % 2 == 0) "en" else "de", s"text body $i"))
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val got = DocsStream.explodeQuota(spark.table("stopk"), "lang").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      // tuples — the inner case class has no stable encoder for local
      // Datasets (same caveat as the HLL control above)
      val batch = (b1 ++ b2).map(d => (d.doc_id, d.lang, d.text))
        .toDF("doc_id", "lang", "text")
      val want = graft.pipeline.Sampling.stratifiedSample(batch, "lang", col("text"), 5)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === want)
      assert(got.size === 10) // 5 per stratum
    } finally q.stop()
  }

  final case class SrcDoc(doc_id: Long, source: String, text: String)

  test("streaming CMS grid merges across microbatches == batch sketch") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sc = spark2.sqlContext
    val input = MemoryStream[SrcDoc]
    val q = DocsStream.cmsTokenStates(input.toDF())
      .writeStream.format("memory").queryName("scms")
      .outputMode("complete").start()
    try {
      val b1 = (1L to 20L).map(i =>
        SrcDoc(i, if (i % 2 == 0) "web" else "books", s"the table scan $i"))
      val b2 = (21L to 40L).map(i =>
        SrcDoc(i, if (i % 2 == 0) "web" else "books", s"merge the query $i"))
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val got = graft.pipeline.Sketch.probeWatchlist(spark.table("scms"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val batch = (b1 ++ b2).map(d => (d.doc_id, d.source, d.text))
        .toDF("doc_id", "source", "text")
      val want = graft.pipeline.Sketch.cmsTokenEstimates(batch)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got === want)
      // the drained grid counted both batches: 10 web docs per batch,
      // "the" once per doc
      assert(got(("web", "the")) === 20L)
    } finally q.stop()
  }

  test("streaming stateful sessionization across batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sc = spark2.sqlContext
    val input = MemoryStream[Ev]
    val sess = EventsStream.sessionize(input.toDF(), expireIdleState = false)
    val q = sess.writeStream.format("memory").queryName("sessions")
      .outputMode("update").start()
    try {
      input.addData(Ev(1, ns(100), 7, "click", 0.0), Ev(2, ns(200), 7, "click", 0.0))
      q.processAllAvailable()
      // second batch: same user after a >30min gap -> new session
      input.addData(Ev(3, ns(5000), 7, "click", 0.0), Ev(4, ns(5100), 9, "view", 0.0))
      q.processAllAvailable()
      val last = spark.table("sessions").as[SessionUpdate].collect()
        .groupBy(_.userId).map { case (u, xs) => u -> xs.maxBy(_.nEvents) }
      assert(last(7L).nEvents == 3 && last(7L).nSessions == 2)
      assert(last(9L).nEvents == 1 && last(9L).nSessions == 1)
    } finally q.stop()
  }

  test("drain harness caps state partitions for the drain and restores the session width") {
    // the p_stream_* drain helper must never leak its width cap into
    // the session (the batch suite's shuffle width is load-bearing for
    // the heavy aggregations) and must return the batch-equivalent
    // result regardless of the cap
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "64")
    try {
      val got = graft.SparkEntry.queries("p_stream_window")(
        spark, "/root/testdata/sf0.001")
      assert(got.count() > 0)
      assert(spark.conf.get(key) == "64",
        "drain helper must restore the session shuffle width")
    } finally spark.conf.set(key, prev)
  }
}
