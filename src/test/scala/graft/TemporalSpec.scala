package graft

import org.apache.spark.sql.DataFrame
import graft.pipeline.Temporal

/** As-of and range joins (pipeline/Temporal) — semantics pinned
  * against driver-side naive scans on crafted fixtures (ties,
  * same-second clicks, never-clicked users), plus the plan contracts:
  * as-of shuffles ONCE on the key, range join is a hash equi-join,
  * never a cartesian.
  */
object TemporalSpec {
  final case class Ev(event_id: Long, ts: Long, user_id: Long,
      event_type: String, value: Double)
}

class TemporalSpec extends SparkSpec {

  import TemporalSpec.Ev

  private def ns(sec: Long): Long = sec * 1000000000L

  // user 1: click(10) click(20) purchase(25) click(25,two ids) purchase(25)
  //   -> purchase@25 must attribute the SAME-second click with the
  //      greatest event_id
  // user 2: purchase(40) with no click ever -> -1 sentinels
  // user 3: click(100) purchase(90) -> click is AFTER, must NOT match
  private val fixture = Seq(
    Ev(1, ns(10), 1, "click", 1.0),
    Ev(2, ns(20), 1, "click", 2.0),
    Ev(3, ns(25), 1, "purchase", 9.0),
    Ev(4, ns(25), 1, "click", 3.0),
    Ev(5, ns(25), 1, "click", 4.0),
    Ev(6, ns(27), 1, "purchase", 9.5),
    Ev(7, ns(40), 2, "purchase", 5.0),
    Ev(8, ns(100), 3, "click", 1.0),
    Ev(9, ns(90), 3, "purchase", 2.0),
    Ev(10, ns(350), 2, "error", 0.0),
    Ev(11, ns(60), 2, "view", 1.5),
    Ev(12, ns(55), 4, "error", 0.25),
    Ev(13, ns(355), 2, "view", 2.25))

  private def events: DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    fixture.toDF()
  }

  private def naiveAsof(): Set[(Long, Long, Long, Long, Long)] = {
    val ls = fixture.filter(_.event_type == "purchase")
    val rs = fixture.filter(_.event_type == "click")
    ls.map { l =>
      val es = l.ts / 1000000000L
      val cand = rs.filter(r => r.user_id == l.user_id && r.ts / 1000000000L <= es)
      if (cand.isEmpty) (l.event_id, l.user_id, es, -1L, -1L)
      else {
        val best = cand.maxBy(r => (r.ts / 1000000000L, r.event_id))
        (l.event_id, l.user_id, es, best.event_id, es - best.ts / 1000000000L)
      }
    }.toSet
  }

  test("as-of join matches a naive scan: ties, same-second ids, never-clicked") {
    val got = Temporal.asofClickAttribution(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got === naiveAsof())
    // the crafted cases explicitly:
    //   purchase 3 @25: same-second clicks 4,5 exist but sort AFTER it?
    //   No — right rows (is_l=0) sort BEFORE left at the same second,
    //   so click 5 (greatest id at sec 25) attributes.
    assert(got.contains((3L, 1L, 25L, 5L, 0L)))
    assert(got.contains((6L, 1L, 27L, 5L, 2L)))
    assert(got.contains((7L, 2L, 40L, -1L, -1L)))  // never clicked
    assert(got.contains((9L, 3L, 90L, -1L, -1L)))  // click only after
  }

  private def naiveRange(w: Long = 300L): Set[(Long, Long, Long, Long)] = {
    val ls = fixture.filter(_.event_type == "error")
    ls.map { l =>
      val es = l.ts / 1000000000L
      val cand = fixture.filter { r =>
        val res = r.ts / 1000000000L
        r.user_id == l.user_id && res >= es - w && res <= es &&
          r.event_id != l.event_id
      }
      (l.event_id, l.user_id, cand.size.toLong,
        cand.map(r => math.floor(r.value * 100).toLong).sum)
    }.toSet
  }

  test("range join matches a naive scan incl. zero-activity errors kept") {
    val got = Temporal.rangeActivity(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === naiveRange())
    // error 10 @350, user 2: window [50,350] catches view 11 @60 only
    // (purchase 7 @40 is before the window, view 13 @355 after)
    assert(got.contains((10L, 2L, 1L, 150L)))
    // error 12, user 4: no other user-4 events -> zero row KEPT
    assert(got.contains((12L, 4L, 0L, 0L)))
  }

  test("plan contracts: as-of is one shuffle, range join never cartesian") {
    val asofPlan = Temporal.asofClickAttribution(events)
      .queryExecution.executedPlan.toString
    assert(!asofPlan.contains("CartesianProduct"))
    assert(!asofPlan.contains("BroadcastNestedLoopJoin"))
    // union + window: exactly one exchange (hashpartitioning user_id)
    assert("ShuffleExchange|Exchange hashpartitioning".r
      .findAllIn(asofPlan).size <= 2, asofPlan) // AQE may show reused
    assert(asofPlan.contains("hashpartitioning(user_id"))
    val rangePlan = Temporal.rangeActivity(events)
      .queryExecution.executedPlan.toString
    assert(!rangePlan.contains("CartesianProduct"))
    assert(!rangePlan.contains("BroadcastNestedLoopJoin"))
  }
}
