package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming sources — SURVEY.md §2.1 (S1-S9), lifted from the reference's
  * DStream-era ingestion to Structured Streaming.
  *
  * Design: every source yields the SAME event schema ([[Sources.eventSchema]],
  * declared explicitly — the reference never infers schemas, SURVEY.md §1.2),
  * so the downstream jobs (graft.streaming.Jobs) are source-agnostic. That is
  * the Structured-Streaming analog of how the reference funnels every DStream
  * into a single-string-column DataFrame before SQL
  * (reference: IndicateursStreaming.scala:54-62).
  */
object Sources {

  /** Explicit event schema (mirrors /root/testdata events.parquet, with `ts`
    * as a proper TimestampType). Declared as StructType, never inferred —
    * same style as the reference's schema_indicateurs
    * (reference: IndicateursStreaming.scala:14-30).
    */
  val eventSchema: StructType = StructType(Array(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = true),
    StructField("user_id", LongType, nullable = true),
    StructField("event_type", StringType, nullable = true),
    StructField("value", DoubleType, nullable = true),
    StructField("props", StringType, nullable = true)))

  /** S1/S2 — Kafka direct source (reference:
    * KafkaUtils.createDirectStream, KafkaStreaming.scala:80-84). Structured
    * Streaming's kafka source is receiver-less and tracks offsets in the
    * checkpoint WAL, which subsumes the reference's manual
    * HasOffsetRanges/commitAsync choreography (F2/F3,
    * ConsommationStreaming.scala:69-106).
    *
    * NOTE: the spark-sql-kafka connector jar is not present in this build
    * environment (zero egress), so this path is compile-complete and
    * structurally tested (option maps) but only runnable on a cluster with
    * the connector on the classpath. `startingOffsets=earliest` mirrors the
    * reference's `auto.offset.reset=earliest`
    * (ConsumerKafkaSpark_Prod.scala:43).
    */
  def kafka(
      spark: SparkSession,
      bootstrapServers: String,
      topics: Seq[String],
      startingOffsets: String = "earliest",
      groupIdPrefix: String = "graft",
      extraOptions: Map[String, String] = Map.empty): DataFrame =
    spark.readStream
      .format("kafka")
      .options(kafkaSourceOptions(bootstrapServers, topics, startingOffsets, groupIdPrefix) ++ extraOptions)
      .load()

  /** The kafka source option map, exposed for structural tests (no broker
    * in this environment). Keys are the Structured-Streaming equivalents of
    * the reference's consumer params (KafkaStreaming.scala:38-49):
    * bootstrap.servers → kafka.bootstrap.servers, subscribe list, offset
    * reset → startingOffsets; enable.auto.commit=false and manual commits
    * are subsumed by checkpointing.
    */
  def kafkaSourceOptions(
      bootstrapServers: String,
      topics: Seq[String],
      startingOffsets: String,
      groupIdPrefix: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "subscribe" -> topics.mkString(","),
    "startingOffsets" -> startingOffsets,
    "groupIdPrefix" -> groupIdPrefix,
    // Bound per-batch fetch so one huge backlog cannot OOM a micro-batch
    // at scale (the DStream analog was spark.streaming.kafka.maxRatePerPartition).
    "maxOffsetsPerTrigger" -> "1000000")

  /** T1+T6 — decode a Kafka-shaped stream (key/value binary) into typed
    * event rows: CAST(value AS STRING) then from_json with the declared
    * schema (reference: rdd.map(_.value()) ConsommationStreaming.scala:77
    * then from_json :96). Works identically on batch and streaming frames.
    */
  def decodeEventJson(kafkaShaped: DataFrame): DataFrame =
    kafkaShaped
      .selectExpr("CAST(value AS STRING) AS json")
      .select(from_json(col("json"), eventSchema).as("e"))
      .select(col("e.*"))

  /** S7 — spool-dir CSV source (reference: Kafka Connect spooldir config,
    * src/main/resources/spooldir-kafka-connect-source.properties:1-18):
    * watch a directory, read files as they land, explicit schema + header.
    * `maxFilesPerTrigger` bounds micro-batch size (F1 analog).
    */
  def csvSpoolDir(
      spark: SparkSession,
      dir: String,
      schema: StructType = eventSchema,
      header: Boolean = true,
      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .format("csv")
      .schema(schema)
      .option("header", header.toString)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .load(dir)

  /** Spool-dir parquet source — same watched-directory pattern over the
    * native columnar format (the 100 TB default: splittable, pushdown).
    */
  def parquetSpoolDir(
      spark: SparkSession,
      dir: String,
      schema: StructType = eventSchema,
      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .format("parquet")
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .load(dir)

  /** S8 — JDBC batch source (reference: mysql Kafka Connect config,
    * src/main/resources/mysql-kafka-connect-source.properties:1-10, mode=bulk
    * full-table snapshot). Spark reads JDBC in parallel when partitioning
    * bounds are given — the scale path vs the connector's tasks.max=3.
    * Executable end-to-end in-env against embedded Derby (the Spark
    * distribution ships it): JdbcSourceSpec pins whole-table reads,
    * filter pushdown into the JDBC scan, and the partitioned range-scan
    * split. Swapping in MySQL changes only the URL + driver jar.
    */
  def jdbcTable(
      spark: SparkSession,
      url: String,
      table: String,
      partitionColumn: Option[String] = None,
      numPartitions: Int = 8,
      lowerBound: Long = 0L,
      upperBound: Long = 1L << 20,
      props: Map[String, String] = Map.empty): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(props)
    partitionColumn match {
      case Some(c) => base
        .option("partitionColumn", c)
        .option("numPartitions", numPartitions.toString)
        .option("lowerBound", lowerBound.toString)
        .option("upperBound", upperBound.toString)
        .load()
      case None => base.load()
    }
  }

  /** S9 — local collection source (reference: `Seq(...).toDF("libellé")`
    * empty-batch marker, IndicateursStreaming.scala:66-68).
    */
  def localRows(spark: SparkSession, rows: Seq[String], colName: String): DataFrame = {
    import spark.implicits._
    rows.toDF(colName)
  }

  /** Rate source — substitute for the dead Twitter firehose (S4-S6): a
    * self-generating stream shaped into the event schema, for demos and
    * load tests without external systems.
    */
  def syntheticEvents(spark: SparkSession, rowsPerSecond: Int = 1000): DataFrame =
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString)
      .load()
      .select(
        col("value").as("event_id"),
        col("timestamp").as("ts"),
        (col("value") % 1000L).as("user_id"),
        element_at(
          array(lit("purchase"), lit("view"), lit("click"), lit("signup"), lit("error")),
          (col("value") % 5 + 1).cast("int")).as("event_type"),
        (pmod(col("value") * 37L, lit(200L))).cast("double").as("value"),
        to_json(struct((col("value") % 100L).as("k"))).as("props"))
}
