package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Similarity

/** Dev-only breakdown of the two-level fitted SemDeDup bill at k×:
  * fit / assign / pair+keep timed separately, so a regression names its
  * stage instead of hiding in the operator total.
  */
object ProfileTwoLevel {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_STRESS_COPIES", "10").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cpuNs = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        cpuNs.add(sc.stageInfo.taskMetrics.executorCpuTime)
    })
    def stage[T](name: String)(body: => T): T = {
      cpuNs.reset()
      val t0 = System.nanoTime()
      val r = body
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftshim.ListenerDrain.drain(spark.sparkContext)
      println(f"PROFILE $name wall=${wall}%.2f cpu=${cpuNs.sum / 1e9}%.1f")
      r
    }

    val base = Tables.embeddings(spark, sfDir)
    val shift = base.agg(max("vec_id")).head().getLong(0) + 1
    val corpus = (0 until copies).map(k =>
      base.select((col("vec_id") + lit(k * shift)).as("vec_id"), col("label"),
        col("embedding")))
      .reduce(_ unionByName _)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val nVec = corpus.count()
    val nlist = math.max(8, (nVec / 250).toInt)
    println(s"PROFILE corpus=$nVec nlist=$nlist")

    val q = stage("fit")(Similarity.fitQuantizerTwoLevel(corpus, nlist))
    stage("assign")(Similarity.assignTwoLevel(corpus, q).count())
    stage("full_withQuantizer")(
      Similarity.semDeDupWithQuantizer(corpus, q).count())
    stage("full_selfFit")(Similarity.semDeDupFitted(corpus, nlist = nlist).count())
    // cell balance: the pair bill is sum of per-cell squares
    val sizes = Similarity.assignTwoLevel(corpus, q)
      .groupBy("list_id").count().collect().map(_.getLong(1))
    val pairBill = sizes.map(n => n * (n - 1) / 2).sum
    println(f"PROFILE cells=${sizes.length} maxCell=${sizes.max} " +
      f"meanCell=${sizes.sum / sizes.length} pairBill=$pairBill%,d")
    spark.stop()
  }
}
