package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All queries take an `sfDir` (e.g. /root/testdata/sf0.01) and read one
  * parquet file per table. Filters/projections applied downstream are pushed
  * into the parquet scan by Catalyst (verify via .explain: PushedFilters /
  * ReadSchema), which is the scan-side behavior we rely on at 100 TB.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, d: String): DataFrame   = table(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame   = table(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame     = table(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame   = table(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = table(spark, d, "lineitem")
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")

  /** `events` with `ts` normalized to TimestampType.
    *
    * The testdata writes `ts` as parquet TIMESTAMP(NANOS); depending on the
    * Spark version/config that surfaces as TimestampType or as LongType
    * (nanos). Normalize here so every downstream operator sees a timestamp.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    // Spark rejects parquet TIMESTAMP(NANOS) unless this legacy flag is on;
    // with it, `ts` reads as LongType nanos which we convert to micros below.
    // All graft session builders (Sessions/Verify/Bench/tests) set this at
    // build time; the runtime set here is DELIBERATELY kept as well because
    // the driver's smoke gate calls SparkEntry.entry with a session we do
    // not construct — without this line that session cannot read events at
    // all (PARQUET_TYPE_ILLEGAL). Runtime-settable per SQLConf, so the
    // mutation is safe (no session restart needed).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // Integer division (`div`), NOT `/`: long / long is DOUBLE division in
        // Spark and epoch-nanos (~1.7e18) exceed double's 2^53 exact range
        // (ULP ~256 ns), which could land the truncated micros 1 off.
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
}
