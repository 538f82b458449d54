package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev main: write `explain("formatted")` of the NAMED queries to
  * one file each — the per-query plan evidence the optimization rounds
  * commit under plans/rNN/ (DumpPlans stays the committed PLANS.md
  * generator for the headline set).
  *
  *   SPARK_GRAFT_PLAN_DIR=plans/r21 SPARK_GRAFT_PLAN_SUFFIX=_before \
  *     sbt "runMain graft.tools.PlanSnap sim_knn_graph_topk ..."
  *
  * Same discipline as DumpPlans: each query is EXECUTED first so the
  * dump shows the AQE-finalized plan that actually ran, and long hex
  * literals are elided.
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass query names: runMain graft.tools.PlanSnap <q> ...")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      // finalize AQE on the SAME QueryExecution being printed (the
      // DumpPlans rationale)
      df.queryExecution.toRdd.foreach(_ => ())
      val raw = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val elided = "0x[0-9A-Fa-f]{129,}".r.replaceAllIn(raw,
        m => s"0x<${(m.matched.length - 2) / 2} bytes elided>")
      val path = Paths.get(outDir, s"$name$suffix.txt")
      Files.writeString(path, elided)
      System.err.println(s"[plansnap] wrote $path (${elided.length} chars)")
    }
    spark.stop()
  }
}
