package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Dedup, Similarity}

/** Dev-only: per-piece cpu breakdown of the incremental family batch —
  * which stage of assignFamiliesBatch owns the bill at serving batch
  * sizes (the StressAnn family_assign rows measure only the total).
  */
object ProfileFamily {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_STRESS_COPIES", "30").toInt
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
    def stage(name: String)(body: => Long): Unit = {
      cpuNs.reset()
      val t0 = System.nanoTime()
      val n = body
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftshim.ListenerDrain.drain(spark.sparkContext)
      println(f"| $name | $n%,d | $wall%.2f | ${cpuNs.sum / 1e9}%.1f |")
      System.gc()
    }

    val base = Tables.embeddings(spark, sfDir)
    val shift = base.agg(max("vec_id")).head().getLong(0) + 1
    val corpus = (0 until copies).map(k =>
      base.select((col("vec_id") + lit(k * shift)).as("vec_id"), col("label"),
        col("embedding")))
      .reduce(_ unionByName _)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val nVec = corpus.count()
    val tmp = java.nio.file.Files.createTempDirectory("graft-prof-fam").toString
    val nlist = math.max(8, (nVec / 250).toInt)
    Similarity.buildIvfIndex(corpus, s"$tmp/idx", nlist = nlist)
    val batch = base.filter(col("vec_id") < 500)
      .select((col("vec_id") + lit(nVec * 2)).as("vec_id"),
        col("label"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    batch.count(): Unit
    val fams = corpus.select(col("vec_id"), col("vec_id").as("family"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    fams.count(): Unit

    println("| piece | rows | wall s | cpu s |")
    println("|---|---|---|---|")
    // whole thing
    stage("assignFamiliesBatch_total")(
      Similarity.assignFamiliesBatch(spark, s"$tmp/idx", fams, batch,
        k = 5, nprobe = 4, minCos = 0.3).count())
    // pieces re-derived with the same spellings
    val qSide = batch.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    val probed = Similarity.rankProbes(spark, s"$tmp/idx", qSide, 4)
    val store = spark.read.parquet(s"$tmp/idx/assigned")
      .select(col("vec_id"), col("embedding"), col("list_id"))
    val pairsA = store.join(broadcast(probed), Seq("list_id"))
      .select(col("query_id"), col("vec_id").as("nb_id"),
        round(Similarity.cosine("embedding", "q_emb"), 6).as("cos_sim"))
    stage("pairsA_forward")(pairsA.count())
    val bEmb = broadcast(batch.select(col("vec_id").as("nb_id"),
      col("embedding").as("nb_emb")))
    stage("pairsB_within")(qSide.crossJoin(bEmb)
      .filter(col("nb_id") =!= col("query_id"))
      .select(round(Similarity.cosine("nb_emb", "q_emb"), 6)).count())
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("nb_id"))
    val topB = pairsA.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5 && col("cos_sim") >= 0.3)
    stage("topB_window")(topB.count())
    val msIds = topB.select(col("nb_id")).distinct()
    val ms = store.join(broadcast(msIds.withColumnRenamed("nb_id", "vec_id")),
      Seq("vec_id"), "left_semi")
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    stage("ms_fetch")(ms.count())
    val probedM = Similarity.rankProbes(spark, s"$tmp/idx", ms, 4)
    val pairsMA = store.join(broadcast(probedM), Seq("list_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("nb_id"),
        round(Similarity.cosine("embedding", "q_emb"), 6).as("cos_sim"))
    stage("pairsMA_reverse")(pairsMA.count())
    val wm = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("nb_id"))
    stage("topM_window")(pairsMA.withColumn("rn", row_number().over(wm))
      .filter(col("rn") <= 5 && col("cos_sim") >= 0.3).count())
    // CC loop alone on a batch-sized synthetic edge set
    import spark.implicits._
    val edges = (0L until 2500L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    stage("cc_loop_2500_edges")(Dedup.nearDupClusters(edges, maxIter = 40).count())
    val edges2 = (0L until 2500L).map(i => (i, 10000L + i % 500)).toDF("doc_a", "doc_b")
    stage("cc_loop_star_2500")(Dedup.nearDupClusters(edges2, maxIter = 40).count())
    spark.stop()
  }
}
