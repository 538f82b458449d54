package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Temporal

/** k× event stress (dev-only): events unioned k times with shifted
  * user_ids AND event_ids — k× rows and k× users, so the per-user
  * window operators (funnel, retention, sessionize) face k× partitions
  * of the SAME per-user depth (the production direction: more users,
  * not longer histories). Prints wall-clocks; SCALING.md cites them.
  */
object StressEvents {
  def time(name: String)(df: => DataFrame): Double = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[stress] $name%-32s $dt%7.2f s")
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
    // Shifts derive from MAX ids, not distinct counts: sparse id spaces
    // (max ≫ count) would make count-based shifts collide shifted
    // copies with base ids, silently shrinking the k× user fan-out the
    // SCALING.md numbers are cited from.
    val (nEvents, nUsers, maxEventId, maxUserId) = {
      val r = base.agg(count(lit(1)), countDistinct(col("user_id")),
        max(col("event_id")), max(col("user_id"))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    val userShift = maxUserId + 1
    val eventShift = maxEventId + 1
    val ev = (0 until copies).map(k =>
      base.select(
        (col("event_id") + lit(k.toLong * eventShift)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(k.toLong * userShift)).as("user_id"),
        col("event_type"), col("value"), col("props")))
      .reduce(_ unionByName _)
      .repartition(32).cache()
    println(s"[stress] events: ${ev.count()} rows ($copies x $nEvents, ${copies}x users)")
    def settle(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      System.gc()
      ev.cache().count()
    }
    time("funnel_steps")(Temporal.funnelSteps(ev))
    settle()
    time("retention_cohorts")(Temporal.retentionCohorts(ev))
    settle()
    time("sessionize")(Temporal.sessionize(ev))
    spark.stop()
  }
}
