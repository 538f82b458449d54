package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch profiler for dedup_incremental_neardups (dev-only): stage-level
  * timings + candidate-volume counts for the cross-corpus LSH path, to
  * localize the bench's 23 s reading.
  */
object ProfileIncremental {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.build(cpus = 32)
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[inc] $name%-36s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = graft.Tables.documents(spark, d)
    t("warmup scan")(noop(docs.select("doc_id")))
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val hist = docs.filter(col("doc_id") % 2 === 0)

    // Stage 1: shingles
    val bsh = graft.ops.Dedup.shingleHashes(batch).cache()
    val hsh = graft.ops.Dedup.shingleHashes(hist).cache()
    t("batch shingles (cache fill)")(println("  rows=" + bsh.count()))
    t("hist shingles (cache fill)")(println("  rows=" + hsh.count()))

    // Full query, end-to-end, with shingles pre-cached
    t("full incremental (pre-cached)")(noop(
      graft.ops.Dedup.incrementalNearDupsFromShingles(bsh, hsh)))

    // Candidate volume
    val full = t("full query incl orderBy")(
      graft.ops.Dedup.incrementalNearDups(batch, hist).orderBy("doc_new", "doc_hist"))
    t("full again")(noop(full))

    spark.stop()
  }
}
