package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quarter-hour KPI pipeline — the reference's flagship analytic query
  * (reference: src/main/scala/IndicateursStreaming.scala:139-184) rebuilt
  * Spark-first.
  *
  * The reference bucketed events into quarter-hours with string CASE math
  * over `minute()`/`hour()` (IndicateursStreaming.scala:160-165) and then
  * aggregated with an analytic `COUNT ... OVER (PARTITION BY ...)` that
  * duplicates each KPI row once per input row (IndicateursStreaming.scala:155
  * — see SURVEY.md §7.4). Here the *intended* semantics are expressed as a
  * native event-time tumbling window + groupBy, which is what survives at
  * scale: a single hash-aggregate with map-side partial aggregation, no
  * window-function sort, no row duplication.
  *
  * Written batch-first as a pure DataFrame→DataFrame function so it is
  * DuckDB-comparable; the streaming lift (withWatermark + the same
  * [[aggregate]] stage) lives in graft.streaming.Jobs.
  */
object Kpi {

  /** The shared aggregation stage: 15-minute tumbling window over `ts`,
    * event count, high-value count, pct. Works on both a batch DataFrame
    * and a watermarked streaming DataFrame (groupBy(window(...)) is the
    * streaming-compatible shape; an analytic window function would not be).
    */
  def aggregate(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "15 minutes").as("w"))
      .agg(
        count(col("event_id")).as("n_events"),                          // A2
        sum(when(col("value") > 100, 1L).otherwise(0L)).as("n_high"))   // A3+T14
      // T10: derived metric rounded to 2 decimals — floor(x·100 + 0.5)/100,
      // not round(): Spark and DuckDB disagree on half-way doubles
      // (shortest-decimal-repr vs binary-value rounding); floor arithmetic
      // on the identical double is engine-independent.
      .withColumn("pct_high",
        floor(lit(100.0) * col("n_high") / col("n_events") * 100 + 0.5) / 100)

  /** Formats the window struct for output/oracle comparison. */
  def formatted(agg: DataFrame): DataFrame =
    agg.select(
      date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
      col("n_events"), col("n_high"), col("pct_high"))

  /** Per quarter-hour: event count, high-value count, pct high-value.
    *
    * Mirrors reference KPIs tweetCount / retweetCount / Niveau_RT
    * (IndicateursStreaming.scala:152-173): count per bucket, count matching
    * a binarised predicate (retweetCount>0 → value>100 here), and the
    * rounded percentage ratio.
    *
    * Output timestamps are formatted as strings so the DuckDB oracle hash
    * compares bit-identically (UTC pinned in the session).
    */
  def quarterHour(events: DataFrame): DataFrame =
    formatted(aggregate(
      // T5: disjunctive equality filter (reference filtered lang en|fr,
      // IndicateursStreaming.scala:117); pushed down to the parquet scan.
      events.filter(col("event_type").isin("purchase", "view", "click", "signup", "error"))))
      .orderBy("window_start")

  /** DuckDB-equivalent SQL for [[quarterHour]]. */
  val quarterHourSql: String =
    """SELECT strftime(time_bucket(INTERVAL 15 MINUTE, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
      |       count(event_id) AS n_events,
      |       CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
      |       floor(100.0 * sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) / count(event_id) * 100 + 0.5) / 100 AS pct_high
      |FROM events
      |WHERE event_type IN ('purchase','view','click','signup','error')
      |GROUP BY 1
      |ORDER BY 1""".stripMargin
}
