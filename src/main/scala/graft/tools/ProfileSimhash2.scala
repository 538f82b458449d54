package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.metrics.source.CodegenMetrics
import graft.Tables
import graft.ops.Dedup

/** Fresh-JVM double-run of the banded query (dev-only): splits codegen
  * compile + JIT warmup from steady-state execution, with Janino compile
  * time read from CodegenMetrics between steps.
  */
object ProfileSimhash2 {
  // Compilation COUNT is a sound delta; the time histogram is a decaying
  // sampling reservoir (and already in ms), so summing its snapshot
  // values between two points is not — don't report time from it.
  private def compN: Long = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
  def time(name: String)(df: => DataFrame): Unit = {
    val c0 = compN
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[profile] $name%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s  janinoN=+${compN - c0}%3d")
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
    time("warmup")(docs.select("doc_id"))
    time("full-1st")(Dedup.simhashBandedNearDups(docs, maxHamming = 3))
    spark.catalog.clearCache()
    time("full-2nd")(Dedup.simhashBandedNearDups(docs, maxHamming = 3))
    spark.stop()
  }
}
