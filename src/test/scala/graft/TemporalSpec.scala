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
}
