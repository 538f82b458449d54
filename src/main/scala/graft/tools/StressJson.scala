package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** 10× events stress (dev-only) for the rebalanced JSON-envelope paths
  * (t6/t8): events unioned N times with shifted event_ids, run through
  * the REGISTERED query bodies (same code — the t8/t6 entries from
  * SparkEntry, fed a pre-built frame via a temp-view swap would drift;
  * instead the union is written to a scratch parquet dir and the
  * registered queries read it like any other data dir). Prints 1× and
  * N× wall-clocks; the SCALING.md claim is near-linear growth — the
  * rebalance keeps the Jackson stage parallel at any input size, where
  * the pre-round-10 single-split shape was linear in ROWS ON ONE CORE.
  */
object StressJson {
  private def time(name: String)(df: => DataFrame): Double = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[stress-json] $name%-28s $dt%7.2f s")
    dt
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_STRESS_COPIES", "10").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = Tables.events(spark, sfDir)
    val n = base.count()
    val shift = n + 1
    // scratch data dir shaped like a testdata dir: the registered
    // queries read <dir>/events.parquet through Tables.events, so the
    // stress exercises the exact registered plan, single-file scan
    // included (the adversarial shape the rebalance exists for).
    // Tables.events converts the NANOS column to a timestamp on read —
    // write the RAW parquet bytes through, untouched, so the scratch
    // file keeps the fixture's physical schema.
    val scratch = java.nio.file.Files.createTempDirectory("graft-stress-json").toString
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    (0 until copies).map(k =>
      raw.withColumn("event_id", col("event_id") + lit(k * shift)))
      .reduce(_ unionByName _)
      .coalesce(1) // deliberately ONE file: worst-case split shape
      .write.mode("overwrite").parquet(s"$scratch/events.parquet")
    println(s"[stress-json] corpus: ${copies}x$n events, one parquet file")
    // warm JIT/codegen on the 1× run of each, then measure both scales
    val queries = Seq("t6_json_parse_expand", "t8_wide_nested_projection")
    for (q <- queries) {
      val fn = graft.SparkEntry.queries(q)
      time(s"$q warmup(1x)")(fn(spark, sfDir))
      val t1 = time(s"$q 1x")(fn(spark, sfDir))
      val tN = time(s"$q ${copies}x")(fn(spark, scratch))
      println(f"[stress-json] $q%-28s ${copies}x data cost ${tN / t1}%.1fx")
    }
    spark.stop()
  }
}
