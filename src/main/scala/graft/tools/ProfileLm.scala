package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Stage-level profile of text_lm_bigram_score (dev-only): per-stage
  * task count / wall / executor-CPU / shuffle bytes, to attribute the
  * r11 contention sensitivity (official 4.63 s vs clean 1.84 s) to a
  * concrete stage shape before changing the plan.
  */
object ProfileLm {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // listener events post asynchronously on the bus thread: guard the
    // buffer and drain before reading/clearing, or a pass's tail stages
    // get lost or misattributed to the next pass (and an unsynchronized
    // ArrayBuffer append racing sortBy can corrupt outright)
    val stages = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, Int, Long, Long, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val m = i.taskMetrics
        stages.synchronized {
          stages += ((i.stageId, i.name.takeWhile(_ != '\n').take(60), i.numTasks,
            i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
            m.executorCpuTime / 1000000L,
            m.shuffleWriteMetrics.bytesWritten, m.shuffleReadMetrics.totalBytesRead))
        }
      }
    })
    def run(name: String)(df: => DataFrame): Unit = {
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftshim.ListenerDrain.drain(spark.sparkContext) // deterministic bus drain
      println(f"==== $name: $dt%.2f s ====")
      stages.synchronized(stages.sortBy(_._1).toVector).foreach { case (id, nm, n, wall, cpu, sw, sr) =>
        println(f"  stage $id%3d  tasks=$n%3d  wall=${wall}%6d ms  cpu=${cpu}%6d ms  " +
          f"shW=${sw / 1048576.0}%8.1f MB  shR=${sr / 1048576.0}%8.1f MB  $nm")
      }
      if (spark.sparkContext.getPersistentRDDs.nonEmpty) {
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        spark.catalog.clearCache()
      }
    }
    val docs = graft.ops.Rebalance.scanWide(Tables.documents(spark, sfDir), col("doc_id"))
    // tiny warmup for codegen/JIT
    run("warmup")(graft.ops.TextAnalysis.lmBigramScores(
      Tables.documents(spark, sfDir).limit(64)))
    run("lm_pass1")(graft.ops.TextAnalysis.lmBigramScores(docs).orderBy("doc_id"))
    run("lm_pass2")(graft.ops.TextAnalysis.lmBigramScores(docs).orderBy("doc_id"))
    spark.stop()
  }
}
