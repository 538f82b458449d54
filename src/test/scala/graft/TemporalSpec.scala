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

  test("salted aggregation equals direct groupBy exactly") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val direct = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Temporal.saltedAgg(ev)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == direct)
  }
}
