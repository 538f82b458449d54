package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{QueryDef, Tables}

/** Row-level transforms — SURVEY.md §2.3 (T1-T18), re-expressed on the
  * driver testdata. Every op is a narrow (shuffle-free) map over the scan,
  * stays inside whole-stage codegen, and pushes its filters/projections
  * into the parquet reader — at 100 TB these run at scan speed.
  */
object Transforms {

  /** T1 — payload extraction (reference: `rdd.map(_.value())`,
    * ConsommationStreaming.scala:77). Kafka value ≙ events.props.
    */
  val t1PayloadExtract = QueryDef(
    "t1_payload_extract",
    """SELECT event_id, props AS payload FROM events ORDER BY event_id""")(
    (s, d) => Tables.events(s, d)
      .select(col("event_id"), col("props").as("payload"))
      .orderBy("event_id"))

  /** T2/T3 — flatMap + split + prefix filter (reference hashtag extraction:
    * `flatMap(_.getText().split(" ").filter(_.startsWith("#")))`,
    * TwitterKafkaStreaming.scala:184-185). '#'→'sp' on documents.text.
    * explode() keeps duplicates — same bag semantics as flatMap.
    */
  val t3TokenExplode = QueryDef(
    "t3_token_explode_filter",
    """SELECT doc_id, token
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      |WHERE token LIKE 'sp%'
      |ORDER BY doc_id, token""".stripMargin)(
    (s, d) => Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token").startsWith("sp"))
      .orderBy("doc_id", "token"))

  /** T4/T5 — disjunctive equality filter (reference:
    * `col("kafka_jsons.lang") === "en" || === "fr"`,
    * IndicateursStreaming.scala:117). Pushed to the parquet scan
    * (PushedFilters: In(event_type, ...)).
    */
  val t5FilterIsin = QueryDef(
    "t5_filter_isin",
    """SELECT event_id, event_type, value FROM events
      |WHERE event_type IN ('purchase', 'signup')
      |ORDER BY event_id""".stripMargin)(
    (s, d) => Tables.events(s, d)
      .filter(col("event_type").isin("purchase", "signup"))
      .select("event_id", "event_type", "value")
      .orderBy("event_id"))

  /** T6/T7 — JSON parse to struct + star expansion (reference:
    * `from_json(col, schema)` ConsommationStreaming.scala:96 and
    * `select(col("tweet_message.*"))` :97). Schema declared explicitly,
    * never inferred — mirrors the reference's StructType style (§1.2).
    */
  val t6JsonParse = QueryDef(
    "t6_json_parse_expand",
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      |FROM events ORDER BY event_id""".stripMargin)(
    (s, d) => {
      val schema = StructType(Array(StructField("k", IntegerType, nullable = true)))
      // rebalance before the per-row Jackson parse — a single-split
      // input would run the whole parse on one core (see
      // [[Rebalance.scanWide]]; identity on many-split inputs)
      Rebalance.scanWide(Tables.events(s, d), col("event_id"))
        .select(col("event_id"), from_json(col("props"), schema).as("parsed"))
        .select(col("event_id"), col("parsed.*"))
        .orderBy("event_id")
    })

  /** T9 — SQL over a temp view (reference:
    * `createOrReplaceTempView` + `ss.sql("select * from kafka_events")`,
    * ConsommationStreaming.scala:87-90).
    */
  val t9SqlSelectStar = QueryDef(
    "t9_sql_select_star",
    """SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey""")(
    (s, d) => {
      Tables.nation(s, d).createOrReplaceTempView("nation_view")
      s.sql("SELECT n_nationkey, n_name, n_regionkey FROM nation_view ORDER BY n_nationkey")
    })

  /** T11 — null-handling conditional (reference:
    * `when(col.isNull, current_timestamp()).otherwise(col)`,
    * IndicateursStreaming.scala:174). Fixed sentinel instead of now() so the
    * oracle hash is deterministic (SURVEY.md §7.4).
    */
  val t11NullHandling = QueryDef(
    "t11_null_handling",
    """SELECT event_id,
      |       COALESCE(CASE WHEN value > 100 THEN value END, -1.0) AS value_or_default
      |FROM events ORDER BY event_id""".stripMargin)(
    (s, d) => Tables.events(s, d)
      .select(
        col("event_id"),
        coalesce(when(col("value") > 100, col("value")), lit(-1.0)).as("value_or_default"))
      .orderBy("event_id"))

  /** T13 — the reference's literal quarter-hour CASE bucketing with string
    * labels "HH:00 - HH:15" (IndicateursStreaming.scala:160-165), minus its
    * fragile `unix_timestamp(cast(hour as string),'HH')` round-trip. Kept
    * alongside the native-window flagship to preserve the reference's exact
    * label surface (including its "HH:45 - HH:60" quirk, SURVEY.md §7.4).
    */
  val t13QuarterLabel = QueryDef(
    "t13_case_quarter_label",
    """SELECT event_id,
      |       CASE WHEN minute(ts) < 15 THEN lpad(CAST(hour(ts) AS VARCHAR), 2, '0') || ':00 - ' || lpad(CAST(hour(ts) AS VARCHAR), 2, '0') || ':15'
      |            WHEN minute(ts) < 30 THEN lpad(CAST(hour(ts) AS VARCHAR), 2, '0') || ':15 - ' || lpad(CAST(hour(ts) AS VARCHAR), 2, '0') || ':30'
      |            WHEN minute(ts) < 45 THEN lpad(CAST(hour(ts) AS VARCHAR), 2, '0') || ':30 - ' || lpad(CAST(hour(ts) AS VARCHAR), 2, '0') || ':45'
      |            ELSE lpad(CAST(hour(ts) AS VARCHAR), 2, '0') || ':45 - ' || lpad(CAST(hour(ts) AS VARCHAR), 2, '0') || ':60'
      |       END AS quart_heure
      |FROM events ORDER BY event_id""".stripMargin)(
    (s, d) => {
      val hh = lpad(hour(col("ts")).cast("string"), 2, "0")
      def label(a: String, b: String) = concat(hh, lit(s":$a - "), hh, lit(s":$b"))
      Tables.events(s, d)
        .select(
          col("event_id"),
          when(minute(col("ts")) < 15, label("00", "15"))
            .when(minute(col("ts")) < 30, label("15", "30"))
            .when(minute(col("ts")) < 45, label("30", "45"))
            .otherwise(label("45", "60")).as("quart_heure"))
        .orderBy("event_id")
    })

  /** T14 — binarisation (reference: `CASE WHEN retweetCount > 0 THEN 1 ELSE 0`,
    * IndicateursStreaming.scala:166-169).
    */
  val t14Binarize = QueryDef(
    "t14_binarize",
    """SELECT event_id, CAST(CASE WHEN value > 100 THEN 1 ELSE 0 END AS BIGINT) AS bin_high
      |FROM events ORDER BY event_id""".stripMargin)(
    (s, d) => Tables.events(s, d)
      .select(
        col("event_id"),
        when(col("value") > 100, 1L).otherwise(0L).as("bin_high"))
      .orderBy("event_id"))

  /** T15 — date/time functions (reference: from_unixtime/unix_timestamp/
    * minute/hour, IndicateursStreaming.scala:143,159-165).
    */
  val t15DateFunctions = QueryDef(
    "t15_date_functions",
    """SELECT event_id,
      |       strftime(ts, '%Y-%m-%d') AS event_date,
      |       CAST(hour(ts) AS BIGINT) AS h,
      |       CAST(minute(ts) AS BIGINT) AS m,
      |       CAST(floor(epoch(ts)) AS BIGINT) AS unix_sec
      |FROM events ORDER BY event_id""".stripMargin)(
    (s, d) => Tables.events(s, d)
      .select(
        col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd").as("event_date"),
        hour(col("ts")).cast("long").as("h"),
        minute(col("ts")).cast("long").as("m"),
        // cast is a no-op on the normalized TimestampType ts but keeps
        // this site NTZ-proof if the input ever arrives as TIMESTAMP_NTZ
        unix_timestamp(col("ts").cast("timestamp")).as("unix_sec"))
      .orderBy("event_id"))

  /** T16/T12 — string functions + display aliasing (reference: concat/cast/
    * split/length/trim, SURVEY.md T16; aliases with spaces
    * IndicateursStreaming.scala:175-181). n_tokens splits on '\s+' — the
    * one tokenization every token-counting query in the library uses
    * (TextAnalysis.tokenStats, Coverage.tokenBudgetSample), so the same
    * document reports the same n_tokens everywhere.
    */
  val t16StringFunctions = QueryDef(
    "t16_string_functions",
    """SELECT doc_id,
      |       upper(substr(text, 1, 10)) AS head10,
      |       CAST(length(trim(text)) AS BIGINT) AS len_trimmed,
      |       lang || '-' || source AS lang_source,
      |       CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
      |FROM documents ORDER BY doc_id""".stripMargin)(
    (s, d) => Tables.documents(s, d)
      .select(
        col("doc_id"),
        upper(substring(col("text"), 1, 10)).as("head10"),
        length(trim(col("text"))).cast("long").as("len_trimmed"),
        concat(col("lang"), lit("-"), col("source")).as("lang_source"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
      .orderBy("doc_id"))

  val all: Seq[QueryDef] = Seq(
    t1PayloadExtract, t3TokenExplode, t5FilterIsin, t6JsonParse,
    t9SqlSelectStar, t11NullHandling, t13QuarterLabel, t14Binarize,
    t15DateFunctions, t16StringFunctions)
}
