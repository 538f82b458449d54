package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.metrics.source.CodegenMetrics
import graft.Tables
import graft.ops.Dedup

/** Fresh-JVM stage attribution for the banded query (dev-only). */
object ProfileSimhash3 {
  def time(name: String)(df: => DataFrame): Unit = {
    val n0 = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[profile] $name%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s  janinoN=+${CodegenMetrics.METRIC_COMPILATION_TIME.getCount - n0}%3d")
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
    val docs = Tables.documents(spark, sfDir)
    time("warmup-ids")(docs.select("doc_id"))
    time("text-scan")(docs.select(length(col("text")).as("n")))
    val toks = docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("tok"))
      .dropDuplicates("doc_id", "tok")
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    time("toks-dedup")(toks)
    time("simhash")(Dedup.simhash(docs))
    time("simhash-again")(Dedup.simhash(docs))
    time("full")(Dedup.simhashBandedNearDups(docs, maxHamming = 3))
    time("full-again")(Dedup.simhashBandedNearDups(docs, maxHamming = 3))
    spark.stop()
  }
}
