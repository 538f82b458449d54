package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Curation, Dedup}

/** Dev profiling main for pipeline_curate_canonical: times each stage of
  * the canonical pipeline in isolation so a regression is attributable
  * (front-end scan vs pair formation vs label propagation vs final join).
  */
object ProfileCurate {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[curate] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    // first full run doubles as the JIT/codegen warm-up; timing it too
    // makes the cold-vs-warm split visible (the bench measures cold)
    time("full query COLD first run")(
      Curation.curateCanonical(Tables.documents(spark, sfDir))
        .write.format("noop").mode("overwrite").save())
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    System.gc()
    // the SAME frame + threshold the registered query builds (shared
    // code, not a re-spelling — so the profiler can never silently
    // profile a different pipeline than pipeline_curate_canonical)
    val curated = Curation.curatedFrame(Tables.documents(spark, sfDir))
    time("front (score+gate+dedup)")(curated.count())
    val asDocs = curated.select(col("keep_doc_id").as("doc_id"), col("t").as("text"))
    val pairs = Dedup.prefixBlockedJaccard(asDocs)
      .filter(col("jaccard") >= Curation.defaultJaccardThreshold)
    time("pairs (blocked jaccard)")(pairs.write.format("noop").mode("overwrite").save())
    val clusters = time("clusters (propagation)")(Dedup.nearDupClusters(pairs))
    time("clusters materialize")(clusters.write.format("noop").mode("overwrite").save())
    val full = Dedup.canonicalSurvivors(asDocs, pairs)
      .join(curated.drop("t").withColumnRenamed("keep_doc_id", "kid"),
        col("keep_doc_id") === col("kid"))
    time("full canonical tail")(full.write.format("noop").mode("overwrite").save())
    // Free every cache BEFORE the warm re-run: CacheManager matches
    // persist() calls by canonicalized plan, so with the stage section's
    // curated frame still cached, the re-run's own curatedFrame persist
    // silently reuses those populated blocks and the "re-run" skips the
    // entire front — it read 3.0 s where the honest warm-JIT cold-data
    // number (what a bench window pays) is ~6 s.
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    spark.catalog.clearCache()
    System.gc()
    time("full query re-run (cold data, warm JIT)")(
      Curation.curateCanonical(Tables.documents(spark, sfDir))
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
