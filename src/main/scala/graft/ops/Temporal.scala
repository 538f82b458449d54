package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Temporal operators Spark lacks as builtins, composed from existing
  * ops per the preference order (SURVEY.md §7.5 / builder brief (a):
  * compose before custom plans).
  */
object Temporal {

  /** AS-OF JOIN (point-in-time lookup): for each left row, the most
    * recent right row with the same key and time ≤ the left time.
    *
    * Composition: tag right rows 0 and left rows 1, union, then one
    * window pass per key ordered by (time, tag) carrying the right
    * payload forward with last_value(ignoreNulls). The tag tiebreak makes
    * the match INCLUSIVE at equal timestamps (right row sorts first) —
    * the same semantics as DuckDB/kdb ASOF.
    *
    * Scale shape: ONE shuffle on the key + an in-partition sort — same
    * cost as a window aggregate. No range-explosion, no per-row probes,
    * and AQE's skew splitting applies to the sort partitions. This beats
    * the naive "join then filter then argmax" which shuffles the
    * cross-product of key matches.
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[(String, String)]): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("_k", col(leftKey)).withColumn("_t", col(leftTime))
      .withColumn("_tag", lit(1))
    val lAligned = payload.foldLeft(l) { case (df, (rc, out)) =>
      df.withColumn(out, lit(null).cast(right.schema(rc).dataType))
    }
    val r = right
      .withColumn("_k", col(rightKey)).withColumn("_t", col(rightTime))
      .withColumn("_tag", lit(0))
    val rAligned = leftCols.foldLeft(r) { case (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val rPayload = payload.foldLeft(rAligned) { case (df, (rc, out)) =>
      df.withColumn(out, col(rc))
    }
    val unionCols = (leftCols.map(col) ++ Seq(col("_k"), col("_t"), col("_tag")) ++
        payload.map(p => col(p._2))).toIndexedSeq
    val unioned = lAligned.select(unionCols: _*)
      .unionByName(rPayload.select(unionCols: _*))
    val w = Window.partitionBy("_k").orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned) { case (df, (_, out)) =>
      df.withColumn(out, last(col(out), ignoreNulls = true).over(w))
    }
    carried.filter(col("_tag") === 1).drop("_k", "_t", "_tag")
  }

  /** As-of query: each event matched to the same user's most recent
    * PURCHASE event at-or-before it (point-in-time feature lookup — the
    * shape every training-data pipeline needs for "state as of event
    * time"). Oracle: DuckDB's native ASOF LEFT JOIN.
    */
  val asofQuery = QueryDef(
    "q_asof_last_purchase",
    """SELECT e.event_id, e.user_id,
      |       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
      |       p.event_id AS last_purchase_id,
      |       p.value AS last_purchase_value
      |FROM events e
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON e.user_id = p.user_id AND e.ts >= p.ts
      |ORDER BY e.event_id""".stripMargin)(
    (s, d) => {
      val events = Tables.events(s, d)
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").as("p_id"), col("value").as("p_value"))
      asofJoin(
        events.select("event_id", "user_id", "ts"), purchases,
        leftKey = "user_id", rightKey = "user_id",
        leftTime = "ts", rightTime = "ts",
        payload = Seq("p_id" -> "last_purchase_id", "p_value" -> "last_purchase_value"))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
          col("last_purchase_id"), col("last_purchase_value"))
        .orderBy("event_id")
    })

  /** Salted two-stage aggregation — the skew-survival pattern: stage 1
    * aggregates on (key, salt) spreading a hot key over `salts`
    * partitions; stage 2 merges the partials per key. Results are
    * identical to a direct groupBy (the oracle is the plain GROUP BY),
    * only the shuffle distribution changes. AQE's skew handling covers
    * joins; explicit salting is the aggregation-side tool.
    */
  def saltedAgg(events: DataFrame, salts: Int = 16): DataFrame =
    events
      .withColumn("_salt", pmod(col("event_id"), lit(salts.toLong)))
      .groupBy(col("event_type"), col("_salt"))
      // DECIMAL partials: the two-stage merge must be order-independent
      // for the salted result to be bit-identical to the plain GROUP BY.
      .agg(count(lit(1)).as("pn"),
        sum(col("value").cast("decimal(18,6)")).as("pv"))
      .groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n"),
        (floor(sum(col("pv")).cast("double") * 10000 + 0.5) / 10000)
          .as("total_value"))

  val saltedQuery = QueryDef(
    "q_salted_skew_agg",
    """SELECT event_type, count(*) AS n,
      |       floor(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) * 10000 + 0.5) / 10000 AS total_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)(
    (s, d) => saltedAgg(Tables.events(s, d)).orderBy("event_type"))

  /** RANGE (interval) JOIN: pairs within a time window on the same key —
    * here each event paired with the same user's purchases in the
    * PRECEDING 10 minutes. The equi-key (user_id) drives the shuffle;
    * the range predicate evaluates inside the matched key partition, so
    * cost is (pairs per user within the window), never a cross product.
    * This is the batch form of the stream-stream interval join
    * (graft.streaming.Jobs.purchaseContextJoin).
    */
  def rangeJoin(events: DataFrame, windowMinutes: Int = 10): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"))
    events.select(col("event_id"), col("user_id"), col("ts"))
      .join(purchases, Seq("user_id"))
      .filter(col("p_ts") <= col("ts") &&
        col("p_ts") > col("ts") - expr(s"INTERVAL $windowMinutes MINUTES") &&
        col("p_id") =!= col("event_id"))
      .select(col("event_id"), col("user_id"), col("p_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
        date_format(col("p_ts"), "yyyy-MM-dd HH:mm:ss").as("p_ts"))
  }

  val rangeJoinQuery = QueryDef(
    "q_range_join_interval",
    """SELECT e.event_id, e.user_id, p.event_id AS p_id,
      |       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
      |       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS p_ts
      |FROM events e
      |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON e.user_id = p.user_id
      | AND p.ts <= e.ts AND p.ts > e.ts - INTERVAL 10 MINUTE
      | AND p.event_id != e.event_id
      |ORDER BY e.event_id, p_id""".stripMargin)(
    (s, d) => rangeJoin(Tables.events(s, d)).orderBy("event_id", "p_id"))

  /** GAP-BASED SESSIONIZATION: group each user's events into sessions
    * separated by > `gapMinutes` of inactivity — the canonical
    * user-journey operator (and the batch twin of Structured Streaming's
    * `session_window`). Two window passes over ONE shuffle on user_id
    * (lag to flag session starts, running sum to number them), then a
    * groupBy (user_id, session_idx) whose map-side partial aggregation
    * collapses events to session grain BEFORE its exchange — the second
    * shuffle moves session rows, not event rows, so at 100 TB the cost
    * is one event-grain shuffle + one session-grain shuffle.
    *
    * Gap compare runs on integer microseconds (`unix_micros` here,
    * `epoch_us` in the oracle) — no float boundary ambiguity. Ordering
    * ties break on event_id so numbering is deterministic across
    * partitionings and engines.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    // cast("timestamp") first: a no-op on TIMESTAMP, and under the UTC
    // session it maps TIMESTAMP_NTZ (how the driver's parquet stores ts)
    // to the same instant DuckDB's epoch_us assigns a naive timestamp —
    // unix_micros itself rejects NTZ input.
    val tsUs = unix_micros(col("ts").cast("timestamp"))
    events
      .withColumn("prev_us", lag(tsUs, 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          tsUs - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        // DECIMAL sum + floor-round: double summation is partition-order
        // dependent and round() half-way semantics differ across engines
        // (weekOverWeek convention below).
        (floor(sum(col("value").cast("decimal(18,6)")).cast("double") * 10000 + 0.5) / 10000)
          .as("total_value"))
  }

  val sessionizeQuery = QueryDef(
    "t_sessionize",
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts, value,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |              THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sess AS (
      |  SELECT user_id, ts, value,
      |         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
      |  FROM flagged
      |)
      |SELECT user_id, session_idx, count(*) AS n_events,
      |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
      |       floor(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) * 10000 + 0.5) / 10000 AS total_value
      |FROM sess GROUP BY user_id, session_idx
      |ORDER BY user_id, session_idx""".stripMargin)(
    (s, d) => sessionize(Tables.events(s, d)).orderBy("user_id", "session_idx"))

  /** EVENT-TYPE TRANSITION MATRIX: per-user next-event bigram counts and
    * row-normalized transition probabilities — the order-1 Markov
    * summary of behavioral sequences (the event-stream analogue of the
    * token-bigram LM in TextAnalysis). One event-grain shuffle on
    * user_id for the lag, then a groupBy on (prev_type, event_type)
    * whose map-side combine reduces to |types|² rows before its
    * exchange; the probability normalization is a window over the tiny
    * aggregated frame. Probabilities are floor-rounded the same way both
    * engines can replay ([[Coverage.corpusProfile]] convention).
    */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val prevW = Window.partitionBy("prev_type")
    events
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("prob",
        floor(col("n").cast("double") / sum(col("n")).over(prevW) * 10000 + 0.5) / 10000)
  }

  val transitionQuery = QueryDef(
    "t_transition_matrix",
    """WITH pairs AS (
      |  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
      |         event_type
      |  FROM events
      |), counted AS (
      |  SELECT prev_type, event_type, count(*) AS n
      |  FROM pairs WHERE prev_type IS NOT NULL
      |  GROUP BY prev_type, event_type
      |)
      |SELECT prev_type, event_type, n,
      |       floor(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev_type) * 10000 + 0.5)
      |         / 10000 AS prob
      |FROM counted ORDER BY prev_type, event_type""".stripMargin)(
    (s, d) => transitionMatrix(Tables.events(s, d)).orderBy("prev_type", "event_type"))

  /** WEEK-OVER-WEEK DRIFT: weekly volume + value per event type with the
    * previous week's count and the relative change — the trend/drift
    * monitor run over every ingest stream ("did a source double or die
    * this week"). One shuffle to the (type, week) grain with map-side
    * combine; the lag window then runs over the tiny aggregated frame
    * (|types| × |weeks| rows), so the drift math is free at any scale.
    * Value sums go through DECIMAL (order-independent); the change ratio
    * is floor-rounded; week boundaries are ISO Mondays in both engines.
    */
  def weekOverWeek(events: DataFrame): DataFrame = {
    val weekly = events
      .groupBy(col("event_type"),
        date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("week"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
    val w = Window.partitionBy("event_type").orderBy("week")
    weekly
      .withColumn("prev_n", lag(col("n_events"), 1).over(w))
      .withColumn("pct_change",
        floor((col("n_events") - col("prev_n")).cast("double") /
          col("prev_n").cast("double") * 10000 + 0.5) / 10000)
  }

  val weekOverWeekQuery = QueryDef(
    "t_week_over_week",
    """WITH weekly AS (
      |  SELECT event_type, strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
      |         count(*) AS n_events,
      |         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      |  FROM events GROUP BY 1, 2
      |), lagged AS (
      |  SELECT *, lag(n_events) OVER (PARTITION BY event_type ORDER BY week) AS prev_n
      |  FROM weekly
      |)
      |SELECT event_type, week, n_events, total_value, prev_n,
      |       floor(CAST(n_events - prev_n AS DOUBLE) / CAST(prev_n AS DOUBLE) * 10000 + 0.5)
      |         / 10000 AS pct_change
      |FROM lagged ORDER BY event_type, week""".stripMargin)(
    (s, d) => weekOverWeek(Tables.events(s, d)).orderBy("event_type", "week"))

  /** SEQUENTIAL FUNNEL: how far each user progresses through the ordered
    * stages signup → click → purchase, where each stage must occur
    * STRICTLY AFTER the previous stage's first completion and WITHIN its
    * conversion deadline (click ≤ 24 h after the first signup, purchase
    * ≤ 48 h after that click — a purchase before the qualifying click,
    * or one outside the window, does not count). These are the semantics
    * every product-analytics funnel uses, not mere set membership.
    *
    * Shape: three whole-partition window minima over the SAME user_id
    * partitioning — the first finds the earliest signup, the second the
    * earliest click after it, the third the earliest purchase after
    * that. One shuffle on user_id total: the three Window nodes share
    * partitioning and ordering, so Catalyst plans one exchange + one
    * sort and the later Sort nodes collapse as already-satisfied. The
    * per-user reduction then rides the same partitioning (row_number
    * over the identical window spec — still no new exchange) and only
    * the final 4-row stage rollup shuffles again, at stage grain. At
    * 100 TB this is exactly one event-grain exchange, same as any
    * per-user window aggregate.
    */
  def funnelSteps(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id")
    val ordered = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val staged = events
      .withColumn("s1", min(when(col("event_type") === "signup", col("ts"))).over(byUser))
      .withColumn("s2", min(when(col("event_type") === "click" &&
        col("ts") > col("s1") &&
        col("ts") <= col("s1") + expr("INTERVAL 24 HOURS"), col("ts"))).over(byUser))
      .withColumn("s3", min(when(col("event_type") === "purchase" &&
        col("ts") > col("s2") &&
        col("ts") <= col("s2") + expr("INTERVAL 48 HOURS"), col("ts"))).over(byUser))
      .withColumn("stage",
        when(col("s3").isNotNull, 3)
          .when(col("s2").isNotNull, 2)
          .when(col("s1").isNotNull, 1)
          .otherwise(0))
      // one row per user without another exchange: row_number over the
      // partitioning the data already has
      .withColumn("rn", row_number().over(ordered))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("stage"))
    val perStage = staged.groupBy(col("stage")).agg(count(lit(1)).as("n_users"))
    // cumulative "reached stage ≥ k" over the ≤4-row rollup — free
    val reach = Window.orderBy(col("stage").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perStage.withColumn("n_reached", sum(col("n_users")).over(reach))
  }

  val funnelQuery = QueryDef(
    "t_funnel_steps",
    """WITH f1 AS (
      |  SELECT user_id, min(CASE WHEN event_type = 'signup' THEN ts END) AS s1
      |  FROM events GROUP BY user_id
      |), f2 AS (
      |  SELECT e.user_id, f1.s1,
      |         min(CASE WHEN e.event_type = 'click' AND e.ts > f1.s1
      |                   AND e.ts <= f1.s1 + INTERVAL 24 HOURS THEN e.ts END) AS s2
      |  FROM events e JOIN f1 USING (user_id) GROUP BY e.user_id, f1.s1
      |), f3 AS (
      |  SELECT e.user_id, f2.s1, f2.s2,
      |         min(CASE WHEN e.event_type = 'purchase' AND e.ts > f2.s2
      |                   AND e.ts <= f2.s2 + INTERVAL 48 HOURS THEN e.ts END) AS s3
      |  FROM events e JOIN f2 USING (user_id) GROUP BY e.user_id, f2.s1, f2.s2
      |), per_user AS (
      |  SELECT user_id,
      |         CASE WHEN s3 IS NOT NULL THEN 3
      |              WHEN s2 IS NOT NULL THEN 2
      |              WHEN s1 IS NOT NULL THEN 1
      |              ELSE 0 END AS stage
      |  FROM f3
      |), per_stage AS (
      |  SELECT stage, count(*) AS n_users FROM per_user GROUP BY stage
      |)
      |SELECT stage, n_users,
      |       CAST(sum(n_users) OVER (ORDER BY stage DESC ROWS UNBOUNDED PRECEDING) AS BIGINT)
      |         AS n_reached
      |FROM per_stage ORDER BY stage""".stripMargin)(
    (s, d) => funnelSteps(Tables.events(s, d)).orderBy("stage"))

  /** RETENTION COHORTS: users grouped by first-activity week, counted as
    * retained in each subsequent week they were active — the cohort
    * triangle every growth dashboard draws. The first-week lookup is a
    * whole-partition window min (one event-grain shuffle on user_id);
    * cohort/offset labels are then per-row arithmetic; the distinct
    * collapses (cohort, offset, user) BEFORE the count's exchange, so
    * the second shuffle moves user-week rows (bounded by users ×
    * active-weeks), not raw events. Retention is floor-rounded against
    * the cohort's week-0 size via a window over the tiny rollup.
    */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id")
    val cohorts = events
      .withColumn("cohort_week", date_trunc("week", min(col("ts")).over(byUser)))
      .select(
        date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort"),
        (datediff(date_trunc("week", col("ts")), col("cohort_week")) / 7)
          .cast("int").as("week_offset"),
        col("user_id"))
      .distinct()
      .groupBy(col("cohort"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
    val base = Window.partitionBy("cohort").orderBy("week_offset")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cohorts.withColumn("retention",
      floor(col("n_users").cast("double") /
        first(col("n_users")).over(base).cast("double") * 10000 + 0.5) / 10000)
  }

  val retentionQuery = QueryDef(
    "agg_retention_cohorts",
    """WITH firsts AS (
      |  SELECT user_id, ts,
      |         date_trunc('week', min(ts) OVER (PARTITION BY user_id)) AS cohort_week
      |  FROM events
      |), user_weeks AS (
      |  SELECT DISTINCT strftime(cohort_week, '%Y-%m-%d') AS cohort,
      |         CAST(date_diff('day', cohort_week, date_trunc('week', ts)) // 7 AS INTEGER)
      |           AS week_offset,
      |         user_id
      |  FROM firsts
      |), rolled AS (
      |  SELECT cohort, week_offset, count(*) AS n_users
      |  FROM user_weeks GROUP BY cohort, week_offset
      |)
      |SELECT cohort, week_offset, n_users,
      |       floor(CAST(n_users AS DOUBLE) /
      |             first(n_users) OVER (PARTITION BY cohort ORDER BY week_offset
      |                                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |             * 10000 + 0.5) / 10000 AS retention
      |FROM rolled ORDER BY cohort, week_offset""".stripMargin)(
    (s, d) => retentionCohorts(Tables.events(s, d)).orderBy("cohort", "week_offset"))

  /** TRAILING RANGE-FRAME WINDOW: per-user trailing 7-day event count
    * and value sum at every event — the feature every fraud/abuse model
    * reads at decision time ("how much did this user do in the last
    * week, as of NOW"). This is the RANGE frame (value-based bounds over
    * event-time), not the ROWS frame the analytic windows elsewhere use:
    * a user with 3 events in the window gets those 3 regardless of how
    * many rows sit between them. Bounds are integer epoch seconds on
    * both engines, so frame membership has no float/timezone ambiguity
    * ([[sessionize]]'s discipline). Same scale shape as every per-user
    * window here: one event-grain shuffle, in-partition sort, streaming
    * frame evaluation (Spark keeps a sliding aggregate, not a per-row
    * rescan).
    */
  def trailingWindow(events: DataFrame, days: Int = 7): DataFrame = {
    // `div`, not `/`: Spark's / is double division, and float epoch
    // seconds would give frame membership the last-ulp ambiguity the
    // integer contract exists to avoid (DuckDB's // is integral too)
    val w = Window.partitionBy("user_id")
      .orderBy(expr("unix_micros(cast(ts as timestamp)) div 1000000"))
      .rangeBetween(-days * 86400L, 0L)
    events.select(
      col("event_id"), col("user_id"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
      count(lit(1)).over(w).as("n_7d"),
      (floor(sum(col("value").cast("decimal(18,6)")).over(w).cast("double") * 10000 + 0.5)
        / 10000).as("value_7d"))
  }

  val trailingQuery = QueryDef(
    "t_trailing_window",
    s"""SELECT event_id, user_id,
       |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       |       count(*) OVER w AS n_7d,
       |       floor(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) * 10000 + 0.5)
       |         / 10000 AS value_7d
       |FROM events
       |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
       |             RANGE BETWEEN ${7 * 86400L} PRECEDING AND CURRENT ROW)
       |ORDER BY event_id""".stripMargin)(
    (s, d) => trailingWindow(Tables.events(s, d)).orderBy("event_id"))

  val all: Seq[QueryDef] =
    Seq(asofQuery, saltedQuery, rangeJoinQuery, sessionizeQuery, transitionQuery,
      weekOverWeekQuery, funnelQuery, retentionQuery, trailingQuery)
}
