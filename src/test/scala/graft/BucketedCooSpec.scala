package graft

import org.apache.spark.sql.functions._
import graft.core.{GrbMatrix, Ops}
import graft.io.BucketedCoo

/** Bucketed COO persistence: the co-located-join lever. The value
  * claim is physical — with both mxm operands bucketed on their
  * contraction key into the same bucket count, the product join plans
  * with NO exchange on either side (only the final (i, j) aggregate
  * shuffles) — so it is pinned at the plan level with broadcast joins
  * disabled (at test scale everything broadcasts otherwise, hiding
  * the shuffle the bucketing removes).
  */
class BucketedCooSpec extends SparkSpec {

  private def coo(rows: Seq[(Long, Long, Long)]) =
    spark.createDataFrame(rows).toDF("i", "j", "v")

  test("bucketed operands contract without a join-side exchange; results unchanged") {
    val a = coo(Seq((0L, 0L, 1L), (0L, 1L, 2L), (1L, 0L, 3L), (2L, 3L, 4L)))
    val b = coo(Seq((0L, 1L, 10L), (1L, 0L, 20L), (3L, 2L, 30L)))
    val ba = BucketedCoo.saveLoad(spark, a, "graft_spec_a", "j", 4)
    val bb = BucketedCoo.saveLoad(spark, b, "graft_spec_b", "i", 4)

    val plain = GrbMatrix.fromDF(a, 3L, 4L).mxm(GrbMatrix.fromDF(b, 4L, 3L), Ops.plusTimes)
    val bucketed = GrbMatrix.fromDF(ba, 3L, 4L).mxm(GrbMatrix.fromDF(bb, 4L, 3L), Ops.plusTimes)
    assert(bucketed.toValues.toSet == plain.toValues.toSet)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        "Exchange hashpartitioning".r
          .findAllIn(df.queryExecution.executedPlan.toString).length
      val plainPlan = GrbMatrix.fromDF(a, 3L, 4L)
        .mxm(GrbMatrix.fromDF(b, 4L, 3L), Ops.plusTimes).df
      val bucketedPlan = GrbMatrix.fromDF(ba, 3L, 4L)
        .mxm(GrbMatrix.fromDF(bb, 4L, 3L), Ops.plusTimes).df
      // plain: both join sides shuffle onto the contraction key, plus
      // the final (i, j) aggregate — 3 exchanges. Bucketed: the scans
      // already hash-cluster on the key (alias-tracked through the
      // product's projections), leaving only the aggregate exchange.
      assert(exchanges(plainPlan) == 3)
      assert(exchanges(bucketedPlan) == 1)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("bucketed dedup ledger probes without a ledger-side exchange") {
    import graft.pipeline.TextDedup
    val corpus = spark.createDataFrame(Seq(
      (0L, "alpha beta gamma"), (1L, "delta epsilon"), (2L, "zeta eta")))
      .toDF("doc_id", "text")
    val batch = spark.createDataFrame(Seq(
      (10L, "gamma beta alpha"), (11L, "fresh words here")))
      .toDF("doc_id", "text")
    val ledger = BucketedCoo.saveLoad(spark, TextDedup.dedupLedger(corpus),
      "graft_spec_ledger", "h", 4)

    val plainR = TextDedup.incrementalDedup(corpus, batch).collect()
      .map(_.toString).sorted.toSeq
    val bucketedR = TextDedup.incrementalDedupAgainstLedger(ledger, batch)
      .collect().map(_.toString).sorted.toSeq
    assert(bucketedR == plainR)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        "Exchange hashpartitioning".r
          .findAllIn(df.queryExecution.executedPlan.toString).length
      // plain: ledger distinct-aggregate shuffles (2 exchanges for the
      // two-phase distinct is planned as 1 here: partial+final on one
      // exchange) + batch first-id agg + the two probe joins reuse the
      // batch partitioning. Bucketed: the ledger side plans from the
      // bucketed scan with NO exchange — strictly fewer shuffles, and
      // none of them touch the (at scale, 100 TB) ledger.
      val plain = TextDedup.incrementalDedup(corpus, batch)
      val bucketed = TextDedup.incrementalDedupAgainstLedger(ledger, batch)
      assert(exchanges(bucketed) < exchanges(plain))
      // no exchange sits between the ledger's bucketed scan and its
      // join: the ledger subtree (identified by the table name) is
      // exchange-free in the executed plan
      val planStr = bucketed.queryExecution.executedPlan.toString
      val ledgerScan = planStr.linesIterator.find(_.contains("graft_spec_ledger"))
      assert(ledgerScan.isDefined, s"ledger scan missing in:\n$planStr")
      assert(planStr.contains("SelectedBucketsCount") || planStr.contains("Bucketed: true"),
        s"ledger scan not bucket-aware:\n$planStr")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("bucketed minhash ledger probes without a ledger-side exchange (composite key)") {
    import graft.pipeline.TextDedup
    val corpus = spark.createDataFrame(Seq(
      (0L, "the quick brown fox jumps over the lazy dog again today"),
      (1L, "completely different corpus content about distributed engines")))
      .toDF("doc_id", "text")
    val batch = spark.createDataFrame(Seq(
      (10L, "the quick brown fox jumps over the lazy dog again today"),
      (11L, "unrelated fresh arrival text mentioning nothing familiar")))
      .toDF("doc_id", "text")
    val plainLedger = TextDedup.minhashLedger(corpus)
    val ledger = BucketedCoo.saveLoadKeys(spark, plainLedger,
      "graft_spec_mh_ledger", Seq("band", "sig"), 4)

    val plainR = TextDedup.nearDupAgainstLedger(plainLedger, batch)
      .collect().map(_.toString).sorted.toSeq
    val bucketedR = TextDedup.nearDupAgainstLedger(ledger, batch)
      .collect().map(_.toString).sorted.toSeq
    assert(bucketedR == plainR)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        "Exchange hashpartitioning".r
          .findAllIn(df.queryExecution.executedPlan.toString).length
      val plain = TextDedup.nearDupAgainstLedger(plainLedger, batch)
      val bucketed = TextDedup.nearDupAgainstLedger(ledger, batch)
      assert(exchanges(bucketed) < exchanges(plain))
      val planStr = bucketed.queryExecution.executedPlan.toString
      assert(planStr.contains("graft_spec_mh_ledger"), s"ledger scan missing:\n$planStr")
      assert(planStr.contains("SelectedBucketsCount") || planStr.contains("Bucketed: true"),
        s"ledger scan not bucket-aware:\n$planStr")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("tmpfs placement falls back to the JVM tmpdir when headroom is short") {
    // the round-13 advice item: the reroute decision is now a pure
    // function — exercise both branches and the floor (no declaration
    // still demands MinTmpfsHeadroomGb)
    def root(declared: Option[Long], usableGb: Long): String =
      BucketedCoo.rootFor(declared, shmWritable = true,
        shmUsableBytes = usableGb << 30, shmPath = "/dev/shm",
        tmpdir = "/tmp-disk", user = "spec")
    assert(root(Some(4L), usableGb = 100L).startsWith("/dev/shm/"))
    assert(root(Some(200L), usableGb = 100L).startsWith("/tmp-disk/"))
    // floor: even undeclared writes need MinTmpfsHeadroomGb
    assert(root(None, usableGb = BucketedCoo.MinTmpfsHeadroomGb - 1)
      .startsWith("/tmp-disk/"))
    assert(root(None, usableGb = BucketedCoo.MinTmpfsHeadroomGb + 1)
      .startsWith("/dev/shm/"))
    // unwritable tmpfs routes to disk regardless of headroom
    assert(BucketedCoo.rootFor(None, shmWritable = false,
      shmUsableBytes = 1L << 40, shmPath = "/dev/shm",
      tmpdir = "/tmp-disk", user = "spec").startsWith("/tmp-disk/"))
  }

  test("saveLoad with an unchanged input reuses the on-disk table instead of rewriting") {
    val df = coo(Seq((0L, 1L, 2L), (3L, 4L, 5L), (6L, 1L, 7L)))
    val name = "graft_spec_reuse"
    val r1 = BucketedCoo.saveLoad(spark, df, name, "j", 2)
    val expect = r1.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val dir = new java.io.File(s"${BucketedCoo.defaultRoot}/$name")
    def parquetMtimes: Map[String, Long] =
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    val m1 = parquetMtimes
    assert(m1.nonEmpty, s"no parquet files under $dir")
    // catalog forgets across sessions; simulate by dropping the table —
    // the second call must re-REGISTER from the spec marker, not rewrite
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val r2 = BucketedCoo.saveLoad(spark, coo(Seq((0L, 1L, 2L), (3L, 4L, 5L), (6L, 1L, 7L))),
      name, "j", 2)
    assert(r2.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet == expect)
    assert(parquetMtimes == m1,
      "unchanged input must not rewrite the table files")
    // a CHANGED derivation misses the marker and rewrites
    val r3 = BucketedCoo.saveLoad(spark, coo(Seq((9L, 9L, 9L))), name, "j", 2)
    assert(r3.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet ==
      Set((9L, 9L, 9L)))
    assert(parquetMtimes != m1, "changed input must rewrite")
    // a changed BUCKET SPEC (same data) also rewrites
    val m3 = parquetMtimes
    BucketedCoo.saveLoad(spark, coo(Seq((9L, 9L, 9L))), name, "j", 3)
    assert(parquetMtimes != m3, "changed bucket count must rewrite")
  }

  test("append lands batches in the bucketed layout; joins stay exchange-free; reuse is poisoned") {
    val name = "graft_spec_append"
    val base = coo(Seq((0L, 1L, 10L), (1L, 2L, 20L), (2L, 3L, 30L)))
    BucketedCoo.saveLoad(spark, base, name, "j", 2)
    val t1 = BucketedCoo.append(spark, coo(Seq((3L, 1L, 40L), (4L, 2L, 50L))), name)
    assert(t1.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet ==
      Set((0L, 1L, 10L), (1L, 2L, 20L), (2L, 3L, 30L), (3L, 1L, 40L), (4L, 2L, 50L)))
    // a second batch through a FRESH catalog registration path
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val t2 = BucketedCoo.append(spark, coo(Seq((5L, 3L, 60L))), name)
    assert(t2.count() == 6)
    // the contraction join against the appended table still plans no
    // table-side exchange: its scan must stay bucket-partitioned
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val other = coo(Seq((1L, 9L, 1L), (2L, 9L, 1L), (3L, 9L, 1L)))
        .withColumnRenamed("i", "jj")
      val joined = spark.table(name)
        .join(other, spark.table(name)("j") === other("jj"))
      val plan = joined.queryExecution.executedPlan.toString
      // exactly one hashpartitioning exchange: the non-bucketed side
      assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
        s"bucketed side re-exchanged after append:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prevThreshold)
    }
    // reuse poisoned: saveLoad with the ORIGINAL derivation must
    // REWRITE (contents have diverged), leaving exactly the base rows
    val again = BucketedCoo.saveLoad(spark, coo(Seq((0L, 1L, 10L), (1L, 2L, 20L), (2L, 3L, 30L))), name, "j", 2)
    assert(again.count() == 3, "post-append saveLoad must rewrite, not reuse")
    // schema mismatch refuses rather than poisoning the layout
    import org.apache.spark.sql.functions.col
    val bad = coo(Seq((9L, 9L, 9L))).withColumn("extra", col("v"))
    intercept[IllegalArgumentException] {
      BucketedCoo.append(spark, bad, name)
    }
  }

  test("minhash ledger ingest cycle: probe, append novel signatures, re-probe hits") {
    import graft.pipeline.TextDedup
    import spark.implicits._
    val corpus = Seq((1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "entirely different content about distributed query engines at scale"))
      .toDF("doc_id", "text")
    val name = "graft_spec_ledger_cycle"
    var ledger = BucketedCoo.saveLoadKeys(spark,
      TextDedup.minhashLedger(corpus), name, Seq("band", "sig"), 4)
    val batch = Seq((10L, "the quick brown fox jumps over the lazy dog again and again"),
      (11L, "completely novel text that matches nothing currently ingested"))
      .toDF("doc_id", "text")
    def probe(l: org.apache.spark.sql.DataFrame) =
      TextDedup.nearDupAgainstLedger(l, batch).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val before = probe(ledger)
    assert(before == Map(10L -> 1L, 11L -> 0L))
    ledger = TextDedup.appendBatchToMinhashLedger(ledger, batch, name)
    // distinctness preserved (the probe's 1:1 fan-out invariant)
    assert(ledger.count() == ledger.select("band", "sig").distinct().count())
    // the previously-novel doc's signatures are now in the ledger
    assert(probe(ledger) == Map(10L -> 1L, 11L -> 1L))
    // idempotent at the signature level: a re-append adds nothing
    val n = ledger.count()
    ledger = TextDedup.appendBatchToMinhashLedger(ledger, batch, name)
    assert(ledger.count() == n)
  }

  test("compact restores the one-file-per-bucket layout after appends") {
    val name = "graft_spec_compact"
    BucketedCoo.saveLoad(spark, coo(Seq((0L, 1L, 1L), (1L, 2L, 2L))), name, "j", 2)
    BucketedCoo.append(spark, coo(Seq((2L, 1L, 3L), (3L, 2L, 4L))), name)
    BucketedCoo.append(spark, coo(Seq((4L, 3L, 5L))), name)
    val dir = new java.io.File(s"${BucketedCoo.defaultRoot}/$name")
    def parquetFiles = Option(dir.listFiles()).getOrElse(Array.empty)
      .count(_.getName.endsWith(".parquet"))
    assert(parquetFiles > 2, s"appends should have produced multi-file buckets (got $parquetFiles)")
    val compacted = BucketedCoo.compact(spark, name)
    assert(compacted.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet ==
      Set((0L, 1L, 1L), (1L, 2L, 2L), (2L, 1L, 3L), (3L, 2L, 4L), (4L, 3L, 5L)))
    assert(parquetFiles <= 2, s"compaction must leave one file per non-empty bucket (got $parquetFiles)")
    // still bucket-aware after compaction: an aggregate on the bucket
    // key must plan with NO exchange (a bare scan shows "Bucketed:
    // false (disabled by query planner)" because nothing needs it)
    val plan = spark.table(name).groupBy("j").count()
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucket-key aggregate re-exchanged after compaction:\n$plan")
  }

  test("saveLoad replaces a previous table of the same name") {
    val first = coo(Seq((0L, 0L, 1L)))
    val second = coo(Seq((5L, 6L, 7L), (8L, 9L, 10L)))
    BucketedCoo.saveLoad(spark, first, "graft_spec_replace", "j", 2)
    val r = BucketedCoo.saveLoad(spark, second, "graft_spec_replace", "j", 2)
    assert(r.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet ==
      Set((5L, 6L, 7L), (8L, 9L, 10L)))
  }
}
