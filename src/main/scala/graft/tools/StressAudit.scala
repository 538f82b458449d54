package graft.tools

import java.util.concurrent.atomic.{AtomicLong, LongAdder}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables
import graft.ops.Curation

/** Rejection-audit ledger at k× corpus scale (dev-only): the same
  * planted-dup-family corpus as [[StressPipeline]], pushed through
  * `Curation.auditLedger` + `auditFunnelFromLedger`, per-stage metrics
  * from the same deterministic-drain listener. Prints the markdown table
  * committed in SCALING.md's "rejection audit at corpus scale" section.
  *
  * What the k× fixture exercises that the registered sf-scale row
  * cannot: the per-doc scoring scan is the only corpus-sized stage the
  * audit adds over the curate pipeline, and the exact-dup window's
  * partitions are duplicate-FAMILY-sized (k rows per family) — the
  * audit must stay scan + one-exchange shaped as k grows.
  */
object StressAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_STRESS_COPIES", "30").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shW = new LongAdder; val shR = new LongAdder
    val cpuNs = new LongAdder; val nTasks = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        shW.add(m.shuffleWriteMetrics.bytesWritten)
        shR.add(m.shuffleReadMetrics.totalBytesRead)
        cpuNs.add(m.executorCpuTime)
        nTasks.addAndGet(sc.stageInfo.numTasks): Unit
      }
    })
    case class StageRow(name: String, rowsOut: Long, wall: Double,
        shWMB: Double, shRMB: Double, cpuS: Double, tasks: Long)
    val rows = scala.collection.mutable.ArrayBuffer.empty[StageRow]
    def stage(name: String)(df: => DataFrame): (DataFrame, Long) = {
      shW.reset(); shR.reset(); cpuNs.reset(); nTasks.set(0)
      val t0 = System.nanoTime()
      val out = df.persist(StorageLevel.MEMORY_AND_DISK_SER)
      val n = out.count()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftshim.ListenerDrain.drain(spark.sparkContext)
      rows += StageRow(name, n, wall,
        shW.sum / 1048576.0, shR.sum / 1048576.0, cpuNs.sum / 1e9, nTasks.get)
      System.gc()
      (out, n)
    }

    val base = Tables.documents(spark, sfDir)
    val shift = base.agg(max("doc_id")).head().getLong(0) + 1
    val (corpus, nCorpus) = stage("corpus") {
      (0 until copies).map(k =>
        base.select((col("doc_id") + lit(k * shift)).as("doc_id"), col("text")))
        .reduce(_ unionByName _)
    }
    val benchmark = base.filter(col("doc_id") % 37 === 0)
      .select(col("doc_id"), col("text"))

    val (ledger, nLedger) = stage("ledger") {
      Curation.auditLedger(corpus, benchmark)
    }
    val (_, _) = stage("funnel") {
      Curation.auditFunnelFromLedger(ledger,
        corpus.agg(count(lit(1)).cast("long").as("n_total")))
    }
    val byStage = ledger.groupBy("stage").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    println()
    println("BEGIN-AUDIT-SECTION")
    println(s"Corpus: ${nCorpus} docs ($copies x shifted copies of every base doc); " +
      s"benchmark: base doc_id % 37. Ledger: $nLedger drop rows " +
      s"(${byStage.toSeq.sortBy(_._1).map { case (s, n) => s"$s=$n" }.mkString(", ")}). " +
      s"sf dir: $sfDir, local[32].")
    println()
    println("| stage | rows out | wall s | shuffle write MB | shuffle read MB | executor-cpu s | tasks |")
    println("|---|---|---|---|---|---|---|")
    rows.foreach { r =>
      println(f"| ${r.name} | ${r.rowsOut}%,d | ${r.wall}%.2f | ${r.shWMB}%.1f " +
        f"| ${r.shRMB}%.1f | ${r.cpuS}%.1f | ${r.tasks} |")
    }
    println("END-AUDIT-SECTION")
    spark.stop()
  }
}
