package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Temporal joins over the `events` table — the two join shapes Spark
  * has no native operator for, each re-expressed so Catalyst plans a
  * plain shuffle instead of a range/cross join.
  *
  * '''As-of join''' (`asofClickAttribution`): for each left row, the
  * latest right row with `right.ts <= left.ts` on the same key. The
  * naive formulation is a range join (O(n·m) BroadcastNestedLoop in
  * Spark); instead both sides are unioned into one stream tagged by
  * side and the match is a `last(..., ignoreNulls)` running window
  * over (key) ordered by (ts, side, id) — ONE shuffle on the key,
  * each partition scanned once in timestamp order. This is the
  * standard scale-out as-of technique (point-in-time correctness for
  * feature lookups / attribution at any corpus size); a 1000-executor
  * cluster shuffles each side once on the join key, identical to the
  * cost of a plain equi-join.
  *
  * '''Range join''' (`rangeActivity`): left row ↔ right rows with
  * `ts ∈ [left.ts − W, left.ts]` on the same key. Re-expressed as an
  * equi-join on (key, timeBucket) with bucket width = W: every left
  * row covers exactly two adjacent buckets (the exact W shift means
  * `floor((ts−W)/W) = floor(ts/W) − 1`), so the left side explodes
  * 2×, the join is a hash equi-join, and the true range predicate
  * filters candidates after the match. Candidate volume is
  * Σ_(key,bucket) |L|·|R| — proportional to co-activity density,
  * never |L|·|R| global. A hot (key, bucket) cell is the residual
  * skew risk at 100 TB; the cure is the same salting/AQE toolkit as
  * any hash join, not a different operator.
  *
  * Everything is integer epoch-seconds (see [[Events.epochS]]) and
  * sentinel `-1` instead of NULL for unmatched as-of rows, so results
  * are bit-exact oracle-checkable in any engine.
  *
  * Reference scope: dask-grblas has no event/temporal API — these are
  * the training-pipeline extensions the task brief calls for (as-of /
  * range joins over interaction logs feed feature extraction and
  * session labelling ahead of dedup).
  */
object Temporal {

  /** Click-attribution as-of join: each `purchase` event matched to
    * the same user's latest `click` at-or-before it (ties on the
    * second included — a click in the same second attributes).
    *
    * Output: (purchase_id, user_id, es, click_id, click_lag_s) with
    * click_id = click_lag_s = −1 when the user has no prior click.
    *
    * Determinism: events are ordered by (es, side, event_id) inside
    * each user partition — right rows sort before left rows at the
    * same second (side 0 < 1, giving `<=` semantics) and the
    * greatest event_id wins among same-second clicks.
    */
  def asofClickAttribution(events: DataFrame,
      leftType: String = "purchase", rightType: String = "click"): DataFrame = {
    val e = events.select(col("event_id"), col("user_id"),
      Events.epochS(events).as("es"), col("event_type"))
    val l = e.filter(col("event_type") === leftType)
      .select(col("user_id"), col("es"), lit(1L).as("is_l"),
        col("event_id").as("oid"),
        lit(null).cast(LongType).as("r_id"), lit(null).cast(LongType).as("r_es"))
    val r = e.filter(col("event_type") === rightType)
      .select(col("user_id"), col("es"), lit(0L).as("is_l"),
        col("event_id").as("oid"),
        col("event_id").as("r_id"), col("es").as("r_es"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("es").asc, col("is_l").asc, col("oid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("click_id", last(col("r_id"), ignoreNulls = true).over(w))
      .withColumn("click_es", last(col("r_es"), ignoreNulls = true).over(w))
      .filter(col("is_l") === 1L)
      .select(col("oid").as("purchase_id"), col("user_id"), col("es"),
        coalesce(col("click_id"), lit(-1L)).as("click_id"),
        coalesce(col("es") - col("click_es"), lit(-1L)).as("click_lag_s"))
  }

  /** Range join: for each `error` event, the same user's activity in
    * the preceding `windowSeconds` (inclusive both ends, the error row
    * itself excluded). Bucketized equi-join — see object scaladoc.
    *
    * Output: (error_id, user_id, n_win, cents_win); errors with no
    * surrounding activity are kept with zeros (left join + non-null
    * count, so the bucket explosion's unmatched duplicates collapse).
    */
  def rangeActivity(events: DataFrame, leftType: String = "error",
      windowSeconds: Long = 300L): DataFrame = {
    val W = windowSeconds
    val e = events.select(col("event_id"), col("user_id"),
      Events.epochS(events).as("es"), col("event_type"),
      floor(col("value") * 100).cast(LongType).as("cents"))
    val l = e.filter(col("event_type") === leftType)
      .select(col("user_id"), col("event_id").as("error_id"), col("es").as("l_es"),
        explode(sequence(floor((col("es") - W) / W).cast(LongType),
          floor(col("es") / W).cast(LongType))).as("bucket"))
    // right-side keys renamed so the self-join condition never leans
    // on Spark's same-lineage column disambiguation
    val r = e.select(col("user_id").as("r_uid"), col("event_id").as("r_id"),
      col("es").as("r_es"), col("cents"),
      floor(col("es") / W).cast(LongType).as("r_bucket"))
    l.join(r,
        col("user_id") === col("r_uid") && col("bucket") === col("r_bucket") &&
          col("r_es") >= col("l_es") - W && col("r_es") <= col("l_es") &&
          col("r_id") =!= col("error_id"),
        "left_outer")
      .groupBy(col("error_id"), col("user_id"))
      .agg(count(col("r_id")).as("n_win"),
        coalesce(sum(col("cents")), lit(0L)).as("cents_win"))
      .select(col("error_id"), col("user_id"), col("n_win"), col("cents_win"))
  }
}
