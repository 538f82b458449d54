package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for every suite (one JVM-wide session — Spark
  * startup is ~5 s; per-suite sessions would dominate test time).
  * UTC is pinned at both the JVM and session level so timestamp literals
  * in tests are deterministic regardless of container timezone.
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session

  /** Events-shaped frame from (event_id, ts "yyyy-MM-dd HH:mm:ss",
    * user_id, event_type, value, props) tuples.
    */
  def eventsDf(rows: Seq[(Long, String, Long, String, Double, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.col("ts_s")))
      .drop("ts_s")
  }

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}

object SparkSpec {
  java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // match the production sessions (Sessions.scala): AQE on cached
      // plans, so the suite exercises the same plan shapes
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
