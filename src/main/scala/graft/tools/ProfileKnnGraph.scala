package graft.tools

import java.util.concurrent.atomic.{AtomicLong, LongAdder}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Similarity

/** Decompose the knn-graph rows' wall time (dev-only): the suite's top
  * three costs are latency-bound (families 10.8 s clean at ~2 cores
  * average), so this times each SUB-plan of the composite in isolation
  * — probe ranking alone, the pair join cut before the window, the
  * window top-k, the mutual aggregation, the propagation loop — with
  * per-stage cpu/tasks, to see which piece owns the wall.
  */
object ProfileKnnGraph {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cpuNs = new LongAdder; val nTasks = new AtomicLong; val nStages = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        cpuNs.add(sc.stageInfo.taskMetrics.executorCpuTime)
        nTasks.addAndGet(sc.stageInfo.numTasks)
        nStages.incrementAndGet()
        if (sys.env.contains("SPARK_GRAFT_KNN_STAGES")) {
          val si = sc.stageInfo
          val wall = for {
            s <- si.submissionTime; e <- si.completionTime
          } yield (e - s) / 1000.0
          System.err.println(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%3d " +
            f"wall=${wall.getOrElse(-1.0)}%6.2f cpu=${si.taskMetrics.executorCpuTime / 1e9}%6.2f " +
            f"shR=${si.taskMetrics.shuffleReadMetrics.totalBytesRead / 1048576.0}%7.1fMB " +
            f"shW=${si.taskMetrics.shuffleWriteMetrics.bytesWritten / 1048576.0}%7.1fMB " +
            f"${si.name.takeWhile(_ != '(').take(40)}")
        }
      }
    })
    def stage(name: String)(body: => Unit): Unit = {
      org.apache.spark.graftshim.ListenerDrain.drain(spark.sparkContext)
      cpuNs.reset(); nTasks.set(0); nStages.set(0)
      val t0 = System.nanoTime()
      body
      org.apache.spark.graftshim.ListenerDrain.drain(spark.sparkContext)
      println(f"[knngraph] $name%-34s wall=${(System.nanoTime() - t0) / 1e9}%6.2f s  " +
        f"cpu=${cpuNs.sum / 1e9}%6.1f s  stages=${nStages.get}%3d  tasks=${nTasks.get}%5d")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val dir = Similarity.ensureIvfIndex(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val qAll = emb.select(col("vec_id").as("query_id"), col("embedding"))
    // warm codegen/JIT like the bench does
    noop(Similarity.knnJoinIvf(spark, dir, qAll.limit(32), k = 3, nprobe = 16,
      hintBroadcast = false))
    Seq(1, 2).foreach { pass =>
      stage(s"fullprobe_row p$pass")(noop(
        graft.SparkEntry.queries("sim_knn_graph_fullprobe")(spark, sfDir)))
      stage(s"topk_row p$pass")(noop(
        graft.SparkEntry.queries("sim_knn_graph_topk")(spark, sfDir)))
      stage(s"families_row p$pass")(noop(
        graft.SparkEntry.queries("sim_knn_graph_families")(spark, sfDir)))
      stage(s"knn_join_only p$pass")(noop(
        Similarity.knnJoinIvf(spark, dir, qAll, k = 3, nprobe = 16,
          hintBroadcast = false)))
      stage(s"knn_join_no_orderby_topk4 p$pass")(noop(
        Similarity.knnJoinIvf(spark, dir, qAll, k = 3, nprobe = 4,
          hintBroadcast = false)))
      val knn = Similarity.knnJoinIvf(spark, dir, qAll, k = 3, nprobe = 16,
        hintBroadcast = false).filter(col("cos_sim") >= 0.3)
      stage(s"mutual_agg p$pass")(noop(Similarity.mutualKnnEdges(
        knn.select(col("query_id").as("src_id"), col("vec_id").as("dst_id")))))
      stage(s"families_full p$pass") {
        noop(Similarity.knnGraphFamilies(spark, dir, emb, k = 3, nprobe = 16,
          minCos = 0.3))
        // free the loop's returned checkpoint like the bench barrier does
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
