package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main — runs every registered query on SPARK_GRAFT_SF_DIR and
  * emits ONE JSON metric line.
  *
  * Timing uses a full materialization (`noop` write): a bare `.count()`
  * lets Catalyst elide global sorts and prune all columns, under-reporting
  * every `orderBy`-bearing query. `noop` executes the complete plan
  * (including sorts and projections) and discards rows at the sink.
  *
  * The metric JSON is (a) written to BENCH_OUT (or ./bench_out.json) and
  * (b) printed as the final stdout line, so the driver can parse either.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Warm the session (JIT, codegen caches, file listing) outside timing.
    Tables.events(spark, sfDir).limit(1).write.format("noop").mode("overwrite").save()
    // Dev convenience: `runMain graft.Bench q1 q2` times only the named
    // queries. The driver invokes with no args → full suite, unchanged.
    val only = args.toSet
    val selected =
      if (only.isEmpty) SparkEntry.queries else SparkEntry.queries.filter(q => only(q._1))
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
      val dt = (System.nanoTime() - t0) / 1e9
      // Queries that cache (LSH bucket tables, minhash signatures) must
      // not leak blocks into the next query's measurement window.
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    val outPath = sys.env.getOrElse("BENCH_OUT", "bench_out.json")
    try Files.writeString(Paths.get(outPath), json + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $outPath failed: $e") }
    spark.stop()
    // Final clean stdout line (after spark.stop so no log interleaving).
    println(json)
  }
}
