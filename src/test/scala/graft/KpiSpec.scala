package graft

import org.apache.spark.sql.functions._
import graft.ops.Kpi

/** Flagship quarter-hour KPI — bucket edges, metrics, degenerate inputs
  * (SURVEY.md §5 item 2: minutes 0/14/15/29/30/44/45/59, null ts, empty).
  */
class KpiSpec extends SparkSpec {

  private def ev(id: Long, ts: String, value: Double, typ: String = "view") =
    (id, ts, id % 7, typ, value, "{}")

  test("quarter-hour bucket edges: minutes 0/14/15/29/30/44/45/59 land in 4 windows of 2") {
    val rows = Seq(
      ev(1, "2024-01-01 10:00:00", 50), ev(2, "2024-01-01 10:14:59", 50),
      ev(3, "2024-01-01 10:15:00", 50), ev(4, "2024-01-01 10:29:59", 50),
      ev(5, "2024-01-01 10:30:00", 50), ev(6, "2024-01-01 10:44:59", 50),
      ev(7, "2024-01-01 10:45:00", 50), ev(8, "2024-01-01 10:59:59", 50))
    val out = Kpi.quarterHour(eventsDf(rows)).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(
      ("2024-01-01 10:00:00", 2L), ("2024-01-01 10:15:00", 2L),
      ("2024-01-01 10:30:00", 2L), ("2024-01-01 10:45:00", 2L)))
  }

  test("n_high counts value>100 strictly; pct_high rounds to 2 decimals") {
    val rows = Seq(
      ev(1, "2024-01-01 09:01:00", 100.0),   // not > 100
      ev(2, "2024-01-01 09:02:00", 100.01),  // > 100
      ev(3, "2024-01-01 09:03:00", 250.0))   // > 100
    val Array(r) = Kpi.quarterHour(eventsDf(rows)).collect()
    assert(r.getString(0) == "2024-01-01 09:00:00")
    assert(r.getLong(1) == 3L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 66.67) // 2/3 * 100 rounded
  }

  test("event_type filter excludes unknown types (reference lang en|fr filter)") {
    val rows = Seq(ev(1, "2024-01-01 09:01:00", 50), ev(2, "2024-01-01 09:02:00", 50, typ = "bot_noise"))
    val Array(r) = Kpi.quarterHour(eventsDf(rows)).collect()
    assert(r.getLong(1) == 1L)
  }

  test("null ts rows are dropped by window() — the reason the reference needs its t11 fallback") {
    // Spark's TimeWindow expansion filters null timestamps out entirely;
    // callers must coalesce nulls upstream (reference: when(isNull,
    // current_timestamp()), IndicateursStreaming.scala:174 ≙ t11).
    val df = eventsDf(Seq(ev(1, "2024-01-01 09:01:00", 50)))
      .unionByName(eventsDf(Seq(ev(2, "2024-01-01 09:02:00", 50)))
        .withColumn("ts", lit(null).cast("timestamp")))
    val out = Kpi.quarterHour(df).collect()
    assert(out.length == 1 && out.head.getLong(1) == 1L)
    // With the t11-style fallback applied first, both rows are counted.
    val coalesced = df.withColumn("ts",
      coalesce(col("ts"), lit("2024-01-01 09:03:00").cast("timestamp")))
    assert(Kpi.quarterHour(coalesced).head().getLong(1) == 2L)
  }

  test("empty input yields empty output (reference empty-batch path)") {
    assert(Kpi.quarterHour(eventsDf(Seq.empty)).isEmpty)
  }

  test("analytic-window form (a2a3) agrees with groupBy flagship per window") {
    // Property the reference's quirk implies: distinct (window, n_in_qh) pairs
    // of the analytic form == (window, n_events) of the grouped form.
    val rnd = new scala.util.Random(42)
    val rows = (1L to 500L).map { i =>
      ev(i, f"2024-01-01 ${rnd.nextInt(4) + 8}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d",
        rnd.nextDouble() * 200)
    }
    val df = eventsDf(rows)
    val grouped = Kpi.quarterHour(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val qh = window(col("ts"), "15 minutes").getField("start")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(qh)
    val analytic = df
      .select(
        date_format(qh, "yyyy-MM-dd HH:mm:ss").as("ws"),
        count(col("event_id")).over(w).as("n"),
        sum(when(col("value") > 100, 1L).otherwise(0L)).over(w).as("nh"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(grouped == analytic)
  }
}
