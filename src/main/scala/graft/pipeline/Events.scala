package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.expressions.Window

/** Event-stream operators over the `events` table
  * (event_id, ts, user_id, event_type, value, props).
  *
  * Timestamps are normalized to epoch seconds (ns-precision parquet
  * timestamps truncate differently across engines below the second).
  * All outputs are integers for oracle-exact comparison.
  */
object Events {

  /** epoch seconds of the `ts` column — second truncation first so
    * sub-second precision differences can't leak through engines.
    *
    * The events parquet carries NANOSECOND timestamps, which Spark 4
    * only reads with `spark.sql.legacy.parquet.nanosAsLong=true`
    * (ts arrives as raw epoch-ns LongType); `DIV` keeps the division
    * exact (ns values exceed 2^53, double math would corrupt them).
    * A true timestamp column is handled via the UTC-session cast.
    */
  private[pipeline] def epochS(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType => expr("ts DIV 1000000000")
    case _ => unix_timestamp(date_trunc("second", col("ts")).cast("timestamp"))
  }

  /** gap-based sessionization: a new session starts when the gap to
    * the previous event of the same user exceeds `gapSeconds`.
    * Output (user_id, n_events, n_sessions). One shuffle on user_id.
    */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("es").asc, col("event_id").asc)
    events.select(col("user_id"), col("event_id"), epochS(events).as("es"))
      .withColumn("prev", lag(col("es"), 1).over(w))
      .withColumn("newSession",
        when(col("prev").isNull || col("es") - col("prev") > gapSeconds, 1L).otherwise(0L))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum(col("newSession")).as("n_sessions"))
  }

  /** tumbling-window aggregation: events per (hour-bucket, type) with
    * the value total in integer cents. Partial aggregation map-side;
    * single shuffle on the composite key.
    */
  def hourlyByType(events: DataFrame): DataFrame =
    events.select(epochS(events).as("es"), col("event_type"),
        floor(col("value") * 100).cast(LongType).as("cents"))
      .select(floor(col("es") / 3600).cast(LongType).as("h"),
        col("event_type"), col("cents"))
      .groupBy("h", "event_type")
      .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))

  /** per-user behavioural profile: event counts by type (pivot-free —
    * conditional aggregation keeps the plan a single hash aggregate).
    */
  def userProfile(events: DataFrame, types: Seq[String] =
      Seq("click", "view", "purchase", "signup", "error")): DataFrame = {
    val typeCounts = types.map(t =>
      sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t"))
    val aggs = typeCounts :+ count(lit(1)).as("n_total")
    events.groupBy("user_id").agg(aggs.head, aggs.tail: _*)
  }

  /** Cohort retention — the standard growth-analytics matrix: users
    * cohorted by first-seen day; for each (cohort_day, offset_days)
    * the count of cohort members active that many days later.
    * Plan: one (user, day) distinct, one per-user min (the cohort),
    * one equi-join back on user, one hash aggregate — all linear,
    * shuffles keyed on user then (cohort, offset). Day = floor
    * epoch-seconds / 86400: pure integer, engine-exact.
    */
  def retention(events: DataFrame): DataFrame = {
    val days = events.select(col("user_id"),
      (epochS(events).cast(LongType) / 86400L).cast(LongType).as("day")).distinct()
    val cohort = days.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    days.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("offset_days"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Ordered funnel — strict stage progression per user: t1 = first
    * stage-1 event, t2 = first stage-2 event STRICTLY AFTER t1, t3 =
    * first stage-3 event strictly after t2 (a user who purchases
    * before ever viewing does not convert — the ordering is the
    * point, and what a naive per-type min gets wrong). Output one row
    * per stage with the converting-user count.
    *
    * Plan: one conditional aggregate per stage with an equi-join on
    * user between stages — stages × O(events) linear passes, no
    * windows, no per-user event sorting (at 100 TB a sort-within-user
    * window would shuffle the full log per stage; the conditional
    * min + join shape ships only per-user scalars between stages).
    */
  def funnel(events: DataFrame,
      stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    val spark = events.sparkSession
    val base = events.select(col("user_id"), col("event_type"),
      epochS(events).cast(LongType).as("es"))
    var converted = base.select(col("user_id")).distinct()
      .withColumn("t", lit(Long.MinValue))
    val counts = stages.map { st =>
      val next = base.filter(col("event_type") === st)
        .join(converted, Seq("user_id"))
        .filter(col("es") > col("t"))
        .groupBy("user_id").agg(min(col("es")).as("t"))
      converted = next
      st -> next
    }
    counts.zipWithIndex.map { case ((st, df), ix) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(ix + 1L).as("stage"), lit(st).as("event_type"), col("n_users"))
    }.reduce(_.unionByName(_))
  }

  /** Directed user-handoff graph: for each `props.k` value (the
    * shared-resource key of the event payload), order that resource's
    * events by (epoch-second, event_id) and draw an edge from each
    * event's user to the NEXT user touching the same resource within
    * `gapSeconds` — who hands work to whom. Self-loops dropped,
    * edges deduplicated. This is the directed input of [[graft.algo.Scc]]
    * (q_scc): handoff cycles = working groups, the directed-graph
    * analogue of the CC communities.
    *
    * Plan: one window over the (k)-partitioned event log (the shuffle
    * key IS the resource key — at 100 TB each resource's timeline
    * sorts independently) + one distinct on the edge pair. Ordering
    * uses second-truncated epochs with the event_id tie-break, so the
    * lag is engine-exact.
    */
  def handoffEdges(events: DataFrame, gapSeconds: Long = 3600L): DataFrame = {
    val w = Window.partitionBy("k").orderBy(col("es").asc, col("event_id").asc)
    events.select(col("event_id"), col("user_id"),
        epochS(events).cast(LongType).as("es"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
          .getField("k").as("k"))
      .filter(col("k").isNotNull)
      .withColumn("pu", lag(col("user_id"), 1).over(w))
      .withColumn("pes", lag(col("es"), 1).over(w))
      .filter(col("pu").isNotNull && col("pu") =!= col("user_id") &&
        col("es") - col("pes") <= gapSeconds)
      .select(col("pu").as("u"), col("user_id").as("v")).distinct()
  }

  /** Semi-structured property extraction + stats: `props` is a JSON
    * string (the universal event-payload shape); `from_json` with an
    * EXPLICIT schema parses it inside codegen (one pass, no schema
    * inference job — `schema_of_json` at 100 TB would scan the corpus
    * twice), then per-type integer stats over the extracted field.
    * Missing/corrupt payloads parse to null and fall out of the
    * aggregates via count(k) — no row is dropped.
    *
    * Output (event_type, n, n_k, distinct_k, sum_k, min_k, max_k):
    * one hash aggregate, map-side partials; distinct_k expands only
    * the (type, k) pairs — bounded by the k domain, not the corpus.
    */
  def propStats(events: DataFrame): DataFrame =
    events.select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
          .getField("k").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), count(col("k")).as("n_k"),
        countDistinct(col("k")).as("distinct_k"),
        sum(col("k")).as("sum_k"), min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
}
