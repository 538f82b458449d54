package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scratch profiling harness (dev-only, not part of the driver contract). */
object Profile {
  def time(name: String)(df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[profile] $name%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import org.apache.spark.sql.types._
    val schema = StructType(Array(
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderpriority", StringType)))

    def shaped = graft.ops.Sinks.kafkaShaped(
      Tables.orders(spark, sfDir),
      col("o_orderkey"),
      col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice").cast("double").as("o_totalprice"), col("o_orderpriority"))

    def full = shaped
      .select(col("key").cast("long").as("o_orderkey"),
        from_json(col("value"), schema).as("v"))
      .select(col("o_orderkey"), col("v.*"))
      .orderBy("o_orderkey")

    // warmup
    time("warmup(count orders)")(Tables.orders(spark, sfDir).select(col("o_orderkey")))

    time("full")(full)
    time("full-again")(full)
    time("no-orderby")(shaped
      .select(col("key").cast("long").as("o_orderkey"),
        from_json(col("value"), schema).as("v"))
      .select(col("o_orderkey"), col("v.*")))
    time("tojson-only")(shaped)
    time("fromjson-only-static")({
      val cached = shaped.cache()
      cached.count()
      val r = cached.select(from_json(col("value"), schema).as("v")).select(col("v.*"))
      r
    })
    println("---- explain full ----")
    full.explain("formatted")
    spark.stop()
  }
}
