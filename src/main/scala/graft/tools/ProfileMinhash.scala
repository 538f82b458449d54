package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Dedup

/** Scratch stage-by-stage profiling of the minhash-LSH pipeline
  * (dev-only, not part of the driver contract).
  */
object ProfileMinhash {
  def time(name: String)(df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[profile] $name%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def docs = Tables.documents(spark, sfDir)
    time("warmup(count docs)")(docs.select(col("doc_id")))

    val w = Window.partitionBy("doc_id").orderBy("pos")
    def toks = docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        posexplode(split(lower(col("text")), "\\s+")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos"), xxhash64(col("tok")).as("th"))
    def shingles = toks
      .select(col("doc_id"), col("th"),
        lead(col("th"), 1).over(w).as("t1"), lead(col("th"), 2).over(w).as("t2"))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"), xxhash64(col("th"), col("t1"), col("t2")).as("shh"))

    time("toks-only")(toks)
    time("shingles(window)")(shingles)
    val M = 1000000007L
    def hashed = shingles.select(col("doc_id"), col("shh"),
      pmod(col("shh"), lit(M)).as("h1"), pmod(xxhash64(col("shh")), lit(M)).as("h2"))
    time("hashed")(hashed)
    def minsOnly = hashed.groupBy("doc_id")
      .agg((0 until 32).map(j =>
        min(pmod(col("h1") + lit(j.toLong) * col("h2"), lit(M))).as(s"m$j")).head,
        (1 until 32).map(j =>
          min(pmod(col("h1") + lit(j.toLong) * col("h2"), lit(M))).as(s"m$j")): _*)
    time("groupBy-32mins-no-collectset")(minsOnly)
    time("signatures-full")(Dedup.minhashSignatures(docs))
    time("signatures-full-again")(Dedup.minhashSignatures(docs))
    time("full-lsh")(Dedup.minhashLsh(docs))
    spark.stop()
  }
}
