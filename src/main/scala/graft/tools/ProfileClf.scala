package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Kernel-vs-HOF timing for the quality classifier (dev-only): the
  * graduation evidence behind graft_quality_margin. Scores the same
  * margin over the sf0.1 documents replicated k× three ways —
  * the native codegen'd kernel, the catalyst-builtins HOF spelling
  * (transform + md5/conv bucket + element_at + aggregate fold — the
  * bit-equal twin TextAnalysisSpec pins), and the HOF spelling without
  * the weight lookup (isolating hash cost from lambda-interpretation
  * cost). Prints min-of-3 wall per spelling for SCALING.md.
  */
object ProfileClf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_STRESS_COPIES", "30").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.QualityClf

    val base = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    val corpus = (0 until copies).map(c =>
        base.withColumn("doc_id", col("doc_id") + lit(c * 10000000L)))
      .reduce(_ unionByName _)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val n = corpus.count()
    println(s"[profile] $n docs ($copies x $sfDir)")

    val toks = split(lower(col("text")), "\\s+")
    val kernel = call_function("graft_quality_margin", toks, lit(QualityClf.modelSpec))
    // THE pinned twin (QualityClf.hofMargin — same definition the
    // bit-equality spec asserts), so this measurement cannot drift
    // from the contract it claims to time
    val hof = QualityClf.hofMargin(toks)
    // hash only, no table lookup: isolates md5+conv from element_at
    def bucketOf(c: Column) =
      (conv(substring(md5(c), 1, 15), 16, 10).cast("long") % QualityClf.B).cast("int")
    val hashOnly = {
      val uw = transform(toks, t => bucketOf(t).cast("double"))
      val bw = transform(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
        (t, i) => bucketOf(concat(t, lit("_"), element_at(toks, i + 2))).cast("double"))
      val f = concat(uw, bw)
      lit(QualityClf.bias) + aggregate(f, lit(0.0), (acc, x) => acc + x) / size(f)
    }

    def time(name: String, c: Column): Unit = {
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        corpus.select(sum(c)).head()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $name%-12s min ${secs.min}%.2f s  passes ${secs.map(s => f"$s%.2f").mkString("/")}")
    }
    time("kernel", kernel)
    time("hof", hof)
    time("hash_only", hashOnly)
    spark.stop()
  }
}
