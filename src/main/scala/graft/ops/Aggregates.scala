package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Aggregations & window functions — SURVEY.md §2.4 (A1-A6). */
object Aggregates {

  /** A1 — count action (reference emptiness gate `events_df.count() == 0`,
    * IndicateursStreaming.scala:64). As a query: global count. At scale this
    * is a partial-count per partition + single-row merge, no full shuffle.
    */
  val a1Count = QueryDef(
    "a1_count_rows",
    """SELECT count(*) AS n FROM events""")(
    (s, d) => Tables.events(s, d).agg(count(lit(1)).as("n")))

  /** A2/A3 — the reference's LITERAL analytic-window semantics: `count(id)
    * OVER (PARTITION BY quarter-hour)` keeps one output row per input row
    * (IndicateursStreaming.scala:155-156 — no dedup; see SURVEY.md §7.4).
    * Preserved verbatim here (the *intended* groupBy form is the flagship
    * q1). PARTITION BY without ORDER BY → frame is the whole partition, and
    * Spark plans a hash-partitioned sort once for both window functions.
    */
  val a2a3AnalyticWindow = QueryDef(
    "a2a3_analytic_window",
    """SELECT event_id,
      |       strftime(time_bucket(INTERVAL 15 MINUTE, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
      |       count(event_id) OVER (PARTITION BY time_bucket(INTERVAL 15 MINUTE, ts)) AS n_in_qh,
      |       CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) OVER (PARTITION BY time_bucket(INTERVAL 15 MINUTE, ts)) AS BIGINT) AS n_high_in_qh
      |FROM events ORDER BY event_id""".stripMargin)(
    (s, d) => {
      val qh = window(col("ts"), "15 minutes").getField("start")
      val w = Window.partitionBy(qh)
      Tables.events(s, d)
        .select(
          col("event_id"),
          date_format(qh, "yyyy-MM-dd HH:mm:ss").as("window_start"),
          count(col("event_id")).over(w).as("n_in_qh"),
          sum(when(col("value") > 100, 1L).otherwise(0L)).over(w).as("n_high_in_qh"))
        .orderBy("event_id")
    })

  /** A6 — sliding time window (reference: DStream `window(Minutes(3))`,
    * TwitterKafkaStreaming.scala:186), as an event-time sliding window:
    * 3-minute length, 1-minute slide. Each event lands in 3 buckets; the
    * oracle reproduces that with an explicit 0/1/2-minute shift fan-out.
    */
  val a6SlidingWindow = QueryDef(
    "a6_sliding_window",
    """SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, count(*) AS n
      |FROM (SELECT time_bucket(INTERVAL 1 MINUTE, ts) - (k * INTERVAL 1 MINUTE) AS ws
      |      FROM events CROSS JOIN (SELECT unnest([0, 1, 2]) AS k))
      |GROUP BY 1 ORDER BY 1""".stripMargin)(
    (s, d) => Tables.events(s, d)
      .groupBy(window(col("ts"), "3 minutes", "1 minute").getField("start").as("ws"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("ws"), "yyyy-MM-dd HH:mm:ss").as("window_start"), col("n"))
      .orderBy("window_start"))

  /** A5-adjacent — per-day event counts + exact distinct users (covers
    * to_date + countDistinct; the approximate variant is in `hllDistinct`).
    * countDistinct plans as a two-phase partial-distinct aggregate — the
    * shape that survives high-cardinality keys at scale.
    */
  val dailyDistinct = QueryDef(
    "agg_daily_distinct_users",
    """SELECT strftime(ts, '%Y-%m-%d') AS d, count(*) AS n_events,
      |       count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)(
    (s, d) => Tables.events(s, d)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("d"))
      .agg(count(lit(1)).as("n_events"), countDistinct(col("user_id")).as("n_users"))
      .orderBy("d"))

  /** approx_count_distinct (HLL++) — the 100 TB answer to distinct counts.
    * No oracle: DuckDB's approx_distinct uses a different sketch; the driver
    * records a rows-only check. Correct plumbing is asserted in ScalaTest
    * (approx within 5% of exact at sf0.001).
    */
  val hllDistinct = QueryDef.unverified("agg_approx_distinct_users")(
    (s, d) => Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("approx_users"))
      .orderBy("event_type"))

  /** Per-day HLL sketches (DataSketches binary) — the PERSISTED half of
    * the incremental distinct-count pattern: at 100 TB each ingest day
    * writes its sketch once (a few KB), and any later window query
    * merges sketches instead of rescanning raw events. Mirrors the
    * persisted-store shape of [[Dedup.contentHashes]] / the IVF index.
    */
  def dailyUserSketches(events: DataFrame): DataFrame =
    events.groupBy(to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sketch"))

  /** Weekly distinct-user estimates computed ONLY by unioning the daily
    * sketches — no second pass over events, the whole point of a
    * mergeable sketch. No oracle (DataSketches binary is
    * implementation-specific); AggregatesSpec pins each weekly estimate
    * within 5% of the exact weekly distinct count and the plumbing
    * (union of unions == union of the raw stream).
    */
  val sketchRollup = QueryDef.unverified("agg_sketch_weekly_rollup")(
    (s, d) => dailyUserSketches(Tables.events(s, d))
      // date_trunc keeps the year — weekofyear alone would collapse
      // week N of every year into one bucket on a multi-year corpus
      .groupBy(date_trunc("week", col("day")).as("week"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("approx_users"))
      .orderBy("week"))

  /** The EXACT twin of [[sketchRollup]] at the same weekly grain — the
    * hash-verified anchor for the rollup family (the daily anchor is
    * [[dailyDistinct]]; AggregatesSpec additionally pins each sketch
    * estimate within 5% of this exact count). Both engines truncate to
    * Monday-based ISO weeks.
    */
  val weeklyDistinct = QueryDef(
    "agg_weekly_distinct_users",
    """SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
      |       count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)(
    (s, d) => Tables.events(s, d)
      .groupBy(date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("week"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("week"))

  /** Exact percentiles per group (linear interpolation — Spark
    * `percentile` and DuckDB `quantile_cont` implement the same method;
    * round(4) absorbs the last-ulp interpolation arithmetic). The
    * approx-at-scale variant is `approx_percentile` (KLL-style sketch),
    * mergeable map-side like HLL.
    */
  val percentiles = QueryDef(
    "agg_percentiles",
    """SELECT event_type,
      |       round(quantile_cont(value, 0.5), 4) AS p50,
      |       round(quantile_cont(value, 0.95), 4) AS p95
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)(
    (s, d) => Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.95)"), 4).as("p95"))
      .orderBy("event_type"))

  /** approx_percentile (KLL-style mergeable sketch) — the 100 TB answer
    * to [[percentiles]]: map-side partial sketches merge in one reduce,
    * no full sort of the value column. No oracle (DuckDB's approx
    * quantile is a different sketch); AggregatesSpec pins the estimate
    * against the exact percentile within the accuracy bound.
    */
  val approxPercentiles = QueryDef.unverified("agg_approx_percentiles")(
    (s, d) => Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        round(expr("approx_percentile(value, 0.5, 10000)"), 4).as("p50"),
        round(expr("approx_percentile(value, 0.95, 10000)"), 4).as("p95"))
      .orderBy("event_type"))

  /** Dataset.stat.freqItems (the count-min-style streaming heavy-hitter
    * sketch) — the extreme-cardinality companion to [[heavyHitters]]:
    * single pass, fixed memory (≤ 1/support candidates), guaranteed
    * SUPERSET of the items above the support threshold (false positives
    * possible, false negatives not). Result depends on scan order → no
    * oracle; AggregatesSpec pins the superset guarantee on planted skew.
    */
  val freqItemsQuery = QueryDef.unverified("agg_freq_items")(
    (s, d) => Tables.events(s, d)
      .stat.freqItems(Seq("user_id"), support = 0.05)
      .select(explode(col("user_id_freqItems")).as("user_id"))
      .orderBy("user_id"))

  /** Frequency heavy-hitters: top users by event count with deterministic
    * tiebreak. Partial counts map-side, TakeOrderedAndProject for the
    * limit — the exact form; at extreme cardinality [[freqItemsQuery]]
    * backs this the same way HLL backs countDistinct.
    */
  val heavyHitters = QueryDef(
    "agg_heavy_hitters",
    """SELECT user_id, count(*) AS n FROM events
      |GROUP BY user_id ORDER BY n DESC, user_id LIMIT 15""".stripMargin)(
    (s, d) => Tables.events(s, d)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_id"))
      .limit(15))

  /** Analytic-function family beyond counts: lag (delta to previous
    * event), ntile (quartile by value within type), percent_rank — one
    * hash-partition + in-partition sort serves all three.
    */
  val analyticFunctions = QueryDef(
    "agg_analytic_functions",
    """SELECT event_id,
      |       CAST((epoch_us(ts) - epoch_us(lag(ts) OVER w)) // 1000000 AS BIGINT) AS sec_since_prev,
      |       CAST(ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id) AS INTEGER) AS value_quartile,
      |       floor(percent_rank() OVER (PARTITION BY event_type ORDER BY value, event_id) * 10000 + 0.5) / 10000 AS pr
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts)
      |ORDER BY event_id""".stripMargin)(
    (s, d) => {
      val wUser = Window.partitionBy("user_id").orderBy("ts")
      val wVal = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
      // delta in MICROS then integer-divide on both engines: flooring each
      // timestamp to seconds before subtracting (unix_timestamp) disagrees
      // with subtract-then-truncate (epoch) on sub-second components.
      // cast(ts as timestamp): no-op on TIMESTAMP, maps the parquet's
      // TIMESTAMP_NTZ to the UTC instant (unix_micros rejects NTZ).
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(wUser))
        .select(
        col("event_id"),
        expr("(unix_micros(cast(ts as timestamp)) - unix_micros(cast(prev_ts as timestamp))) div 1000000")
          .cast("long").as("sec_since_prev"),
        ntile(4).over(wVal).as("value_quartile"),
        (floor(percent_rank().over(wVal) * 10000 + 0.5) / 10000).as("pr"))
        .orderBy("event_id")
    })

  val all: Seq[QueryDef] = Seq(
    a1Count, a2a3AnalyticWindow, a6SlidingWindow, dailyDistinct, hllDistinct, sketchRollup,
    weeklyDistinct, percentiles, approxPercentiles, freqItemsQuery, heavyHitters,
    analyticFunctions)
}
