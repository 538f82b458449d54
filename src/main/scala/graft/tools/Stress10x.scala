package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Curation, Dedup}

/** 10× corpus stress (dev-only): documents unioned 10 times with shifted
  * doc_ids — ~10× rows AND 10× denser near-dup structure (every doc gets
  * 9 planted exact copies), the adversarial direction for candidate
  * generation. Prints wall-clocks for the dedup/curation family; the
  * sub-quadratic claims in SCALING.md cite these numbers.
  */
object Stress10x {
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
    val base = Tables.documents(spark, sfDir)
    val n = base.count()
    // max-id shift (not count): sparse id spaces must not collide
    // shifted copies with base rows (same fix as StressEvents)
    val shift = base.agg(max("doc_id")).head().getLong(0) + 1
    val docs = (0 until copies).map(k =>
      base.select((col("doc_id") + lit(k * shift)).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars")))
      .reduce(_ unionByName _)
      .repartition(32).cache()
    println(s"[stress] corpus: ${docs.count()} docs ($copies x $n)")
    def settle(): Unit = {
      // blocking unpersist FIRST: clearCache() (blocking=false) empties
      // persistentRdds immediately, so a loop after it would be a no-op
      // and async block cleanup would bleed into the next timing window
      // (same ordering as Bench.settle)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      System.gc()
      docs.cache().count() // re-pin the corpus outside the next timing window
    }
    time("exact")(Dedup.exact(docs))
    settle()
    time("blocked_jaccard")(Dedup.prefixBlockedJaccard(docs))
    settle()
    time("minhash_lsh")(Dedup.minhashLsh(docs))
    settle()
    time("simhash_banded")(Dedup.simhashBandedNearDups(docs, maxHamming = 3))
    settle()
    time("incremental_split")(Dedup.incrementalNearDupsSplit(docs, col("doc_id") % 2 === 1))
    settle()
    time("curate")(Curation.curate(docs))
    settle()
    time("curate_canonical")(Curation.curateCanonical(docs))
    spark.stop()
  }
}
