package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: print nearDupClusters round counts on a worst-case path
  * graph and on the sf0.1 semantic family graph — the observable the
  * pointer-jump knob is tuned against.
  */
object RoundCount {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val n = 256
    val pairs = (0L until (n - 1).toLong).map(i => (i, i + 1, 1.0))
      .toDF("doc_a", "doc_b", "jaccard")
    val t0 = System.nanoTime()
    val (labels, rounds) = graft.ops.Dedup.nearDupClustersCounted(pairs, maxIter = 40)
    val ok = labels.collect().forall(_.getLong(1) == 0L)
    println(f"[rounds] path-255: rounds=$rounds ok=$ok wall=${(System.nanoTime()-t0)/1e9}%.2f")

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dir = graft.ops.Similarity.ensureIvfIndex(spark, sfDir)
    val emb = graft.Tables.embeddings(spark, sfDir)
    val knn = graft.ops.Similarity.knnJoinIvf(spark, dir,
      emb.select(org.apache.spark.sql.functions.col("vec_id").as("query_id"),
        org.apache.spark.sql.functions.col("embedding")),
      k = 3, nprobe = 16, hintBroadcast = false)
      .filter(org.apache.spark.sql.functions.col("cos_sim") >= 0.3)
    val mutual = graft.ops.Similarity.mutualKnnEdges(
      knn.select(org.apache.spark.sql.functions.col("query_id").as("src_id"),
        org.apache.spark.sql.functions.col("vec_id").as("dst_id")))
    val t1 = System.nanoTime()
    val (_, r2) = graft.ops.Dedup.nearDupClustersCounted(
      mutual, maxIter = 200)
    println(f"[rounds] sf0.1-families: rounds=$r2 wall=${(System.nanoTime()-t1)/1e9}%.2f")
    spark.stop()
  }
}
