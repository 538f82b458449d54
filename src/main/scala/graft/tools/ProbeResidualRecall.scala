package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: print the ANN recall panel (sim_ann_recall) at an
  * arbitrary SF — the raw-code vs residual-code (IVFADC) comparison at
  * identical nprobe/rerank that sizes the residual encoding's lift.
  */
object ProbeResidualRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ops.Similarity.annRecallQuery.fn(spark, sfDir)
      .orderBy("method", "k")
      .collect()
      .foreach(r => println(s"RECALL ${r.getString(0)} @${r.getInt(1)} = ${r.getDouble(3)}"))

    // multi-query mean recall@20 for the raw-vs-residual rerank twins —
    // a single query vector's panel is ±0.05-grain noise
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.embeddings(spark, sfDir)
    val pqDir = graft.ops.Similarity.ensureIvfPqIndex(spark, sfDir)
    val resDir = graft.ops.Similarity.ensureIvfPqResidualIndex(spark, sfDir)
    val qids = (0L until 16L)
    def recall20(dir: String, qid: Long, rerank: Int): Double = {
      val qv = emb.filter(col("vec_id") === qid)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
      val exact = graft.ops.Similarity.bruteForceTopK(emb, qid, k = 20)
        .collect().map(_.getLong(0)).toSet
      val got = graft.ops.Similarity.queryIvfPq(spark, dir, qv, k = 20,
          nprobe = 4, excludeVecId = qid, rerank = rerank)
        .collect().map(_.getLong(0)).toSet
      (exact & got).size / 20.0
    }
    def mean(xs: Seq[Double]): Double = xs.sum / xs.size
    val raw = mean(qids.map(recall20(pqDir, _, 80)))
    val res = mean(qids.map(recall20(resDir, _, 80)))
    val rawAdc = mean(qids.map(recall20(pqDir, _, 0)))
    val resAdc = mean(qids.map(recall20(resDir, _, 0)))
    println(f"MEAN16 adc raw=$rawAdc%.4f residual=$resAdc%.4f")
    println(f"MEAN16 rerank80 raw=$raw%.4f residual=$res%.4f")
    spark.stop()
  }
}
