package graft

import org.apache.spark.sql.functions._
import graft.ops.Temporal

/** AS-OF join boundary/null semantics + salted-aggregation equivalence. */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  test("asof join: inclusive at equal ts, latest-before otherwise, null when no prior row") {
    val left = Seq(
      (1L, 10L, "2024-01-01 10:00:00"),
      (2L, 10L, "2024-01-01 11:00:00"),
      (3L, 10L, "2024-01-01 09:00:00"),  // before any right row -> null
      (4L, 20L, "2024-01-01 10:30:00"))  // other key
      .toDF("event_id", "user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val right = Seq(
      (10L, "2024-01-01 10:00:00", 100L),  // equal ts as event 1 -> inclusive match
      (10L, "2024-01-01 10:45:00", 101L),
      (20L, "2024-01-01 10:00:00", 200L))
      .toDF("user_id", "ts_s", "p_id")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Temporal.asofJoin(left, right, "user_id", "user_id", "ts", "ts",
      Seq("p_id" -> "matched_id"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out == Map(
      1L -> Some(100L),  // equal timestamp matches (inclusive)
      2L -> Some(101L),  // latest at-or-before 11:00
      3L -> None,        // nothing before 09:00
      4L -> Some(200L)))
  }

  test("sessionize: gap splits sessions, boundary gap does NOT, numbering restarts per user") {
    // user 10: events at 10:00, 10:29, 11:00 with a 30-min gap ->
    //   10:29-10:00 = 29min (same session); 11:00-10:29 = 31min (new session).
    // user 20: events at 10:00 and exactly 10:30 — gap == 30min is NOT
    //   a split (strictly-greater contract).
    val ev = Seq(
      (1L, 10L, "2024-01-01 10:00:00", 1.0),
      (2L, 10L, "2024-01-01 10:29:00", 2.0),
      (3L, 10L, "2024-01-01 11:00:00", 4.0),
      (4L, 20L, "2024-01-01 10:00:00", 8.0),
      (5L, 20L, "2024-01-01 10:30:00", 16.0))
      .toDF("event_id", "user_id", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Temporal.sessionize(ev, gapMinutes = 30)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(5)))
      .toMap
    assert(out == Map(
      (10L, 1L) -> (2L, 3.0),   // events 1+2 in session 1
      (10L, 2L) -> (1L, 4.0),   // event 3 alone in session 2
      (20L, 1L) -> (2L, 24.0))) // boundary gap stays one session
  }

  test("transition matrix: per-user bigram counts, probs sum to 1 per prev_type") {
    // user 10: a->b->a; user 20: a->b. Transitions: a->b (x2), b->a (x1).
    val ev = Seq(
      (1L, 10L, "2024-01-01 10:00:00", "a"),
      (2L, 10L, "2024-01-01 10:01:00", "b"),
      (3L, 10L, "2024-01-01 10:02:00", "a"),
      (4L, 20L, "2024-01-01 10:00:00", "a"),
      (5L, 20L, "2024-01-01 10:01:00", "b"))
      .toDF("event_id", "user_id", "ts_s", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("value", lit(0.0))
    val out = Temporal.transitionMatrix(ev)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out == Map(("a", "b") -> (2L, 1.0), ("b", "a") -> (1L, 1.0)))
    // no cross-user transition (user 20's 'a' never pairs with user 10's rows)
    assert(out.size == 2)
  }

  test("salted aggregation equals direct groupBy exactly") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val direct = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Temporal.saltedAgg(ev)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == direct)
  }

  test("week-over-week: NULL change on first week, exact ratio after, per-type isolation") {
    // type a: 2 events week of Jan 1, 3 events week of Jan 8 -> +50%.
    // type b: single week -> its only row has NULL prev/change.
    val ev = Seq(
      (1L, "2024-01-02 10:00:00", 10L, "a", 1.0),
      (2L, "2024-01-03 10:00:00", 11L, "a", 2.0),
      (3L, "2024-01-09 10:00:00", 10L, "a", 3.0),
      (4L, "2024-01-10 10:00:00", 11L, "a", 4.0),
      (5L, "2024-01-11 10:00:00", 12L, "a", 5.0),
      (6L, "2024-01-09 10:00:00", 10L, "b", 9.0))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Temporal.weekOverWeek(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          if (r.isNullAt(5)) None else Some(r.getDouble(5))))).toMap
    assert(out(("a", "2024-01-01")) == ((2L, 3.0, None, None)))
    assert(out(("a", "2024-01-08")) == ((3L, 12.0, Some(2L), Some(0.5))))
    assert(out(("b", "2024-01-08")) == ((1L, 9.0, None, None)))
  }

  test("funnel: stage order + conversion deadlines enforced; n_reached cumulative") {
    // u1: full funnel inside both deadlines                     -> stage 3
    // u2: click only after the 24h deadline                     -> stage 1
    // u3: click BEFORE signup, purchase without qualifying click-> stage 1
    // u4: click+purchase but never signed up                    -> stage 0
    // u5: click in window, purchase after the 48h deadline      -> stage 2
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "signup", 0.0),
      (2L, "2024-01-01 10:05:00", 1L, "click", 0.0),
      (3L, "2024-01-01 11:00:00", 1L, "purchase", 5.0),
      (4L, "2024-01-01 10:00:00", 2L, "signup", 0.0),
      (5L, "2024-01-02 10:00:01", 2L, "click", 0.0),   // 24h+1s after signup
      (6L, "2024-01-01 09:00:00", 3L, "click", 0.0),   // pre-signup click
      (7L, "2024-01-01 10:00:00", 3L, "signup", 0.0),
      (8L, "2024-01-01 10:30:00", 3L, "purchase", 5.0), // no qualifying click first
      (9L, "2024-01-01 10:00:00", 4L, "click", 0.0),
      (10L, "2024-01-01 10:05:00", 4L, "purchase", 5.0),
      (11L, "2024-01-01 10:00:00", 5L, "signup", 0.0),
      (12L, "2024-01-01 10:05:00", 5L, "click", 0.0),
      (13L, "2024-01-03 10:05:01", 5L, "purchase", 5.0)) // 48h+1s after click
      .map { case (id, ts, u, et, v) => (id, ts, u, et, v, "{}") }
    val out = Temporal.funnelSteps(eventsDf(ev)).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(
      0 -> ((1L, 5L)),  // u4; everyone "reaches" stage >= 0
      1 -> ((2L, 4L)),  // u2, u3
      2 -> ((1L, 2L)),  // u5
      3 -> ((1L, 1L)))) // u1
  }

  test("trailing window is RANGE-framed: membership by time, inclusive at exactly -7d") {
    // u1: events at day 0, 3, 7, 10.5 — at day 7 the frame holds days
    // 0..7 (the -7d bound is INCLUSIVE); at day 10.5 it holds only days
    // 3.5..10.5 -> {7, 10.5}. A ROWS frame would get this wrong (it
    // would count rows, not time).
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", 1L, 1.0),
      (2L, "2024-01-04 00:00:00", 1L, 2.0),
      (3L, "2024-01-08 00:00:00", 1L, 4.0),
      (4L, "2024-01-11 12:00:00", 1L, 8.0))
      .map { case (id, ts, u, v) => (id, ts, u, "view", v, "{}") }
    val out = Temporal.trailingWindow(eventsDf(ev)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getDouble(4)))).toMap
    assert(out == Map(
      1L -> ((1L, 1.0)),
      2L -> ((2L, 3.0)),
      3L -> ((3L, 7.0)),   // day 0 is exactly 7d before day 7: IN frame
      4L -> ((2L, 12.0)))) // days 0 and 3 have aged out
  }

  test("retention cohorts: offsets measured from first-activity week, retention vs week 0") {
    // Cohort of Mon Jan 1: u1 active weeks 0,1,2; u2 active weeks 0,2.
    // Cohort of Mon Jan 8: u3 active weeks 0,1.
    val ev = Seq(
      (1L, "2024-01-02 10:00:00", 1L), (2L, "2024-01-09 10:00:00", 1L),
      (3L, "2024-01-16 10:00:00", 1L),
      (4L, "2024-01-03 10:00:00", 2L), (5L, "2024-01-17 10:00:00", 2L),
      (6L, "2024-01-10 10:00:00", 3L), (7L, "2024-01-18 10:00:00", 3L))
      .map { case (id, ts, u) => (id, ts, u, "view", 0.0, "{}") }
    val out = Temporal.retentionCohorts(eventsDf(ev)).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out == Map(
      ("2024-01-01", 0) -> ((2L, 1.0)),
      ("2024-01-01", 1) -> ((1L, 0.5)),
      ("2024-01-01", 2) -> ((2L, 1.0)),
      ("2024-01-08", 0) -> ((1L, 1.0)),
      ("2024-01-08", 1) -> ((1L, 1.0))))
  }
}
