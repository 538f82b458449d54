package graft.tools

import java.util.concurrent.atomic.{AtomicLong, LongAdder}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Similarity
import graft.streaming.Jobs

/** SemDeDup family at k× vector scale (dev-only): the sf0.1 embeddings
  * fixture unioned k× with shifted vec_ids (every vector gains k−1
  * exact twins — the worst-case redundancy profile for a deduper),
  * pushed through the batch operator and the streaming gate. Prints the
  * markdown table committed in SCALING.md's SemDeDup section.
  *
  * What k× exercises that the registered rows cannot:
  *  - BATCH PAIRING: within-domain pair count is Σ_d |d|²/2 — QUADRATIC
  *    in corpus size at fixed cluster count. The committed 8-domain
  *    table is a fixture fit; the measured super-linear wall here is
  *    the direct demonstration of the SemDeDup paper's sizing rule
  *    (clusters grow with the corpus — 50k at web scale — holding the
  *    per-cell population, and so the pair bill, constant).
  *  - GATE ADMIT (store empty): the scan-side assign + store write
  *    path. Must be linear in batch size.
  *  - GATE vs HISTORY: a fixture-sized batch against k× admitted
  *    history. Must be linear in the domain-filtered history read,
  *    never quadratic (the batch side is broadcast; history is scanned
  *    once).
  */
object StressSemDeDup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_STRESS_COPIES", "10").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shW = new LongAdder; val cpuNs = new LongAdder; val nTasks = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        shW.add(m.shuffleWriteMetrics.bytesWritten)
        cpuNs.add(m.executorCpuTime)
        nTasks.addAndGet(sc.stageInfo.numTasks): Unit
      }
    })
    case class Row(name: String, rowsOut: Long, wall: Double, shWMB: Double,
        cpuS: Double, tasks: Long)
    val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
    def stage(name: String)(body: => Long): Unit = {
      shW.reset(); cpuNs.reset(); nTasks.set(0)
      val t0 = System.nanoTime()
      val n = body
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftshim.ListenerDrain.drain(spark.sparkContext)
      rows += Row(name, n, wall, shW.sum / 1048576.0, cpuNs.sum / 1e9, nTasks.get)
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
    // the within-domain pair bill the batch stage is about to pay
    val pairBill = Similarity.assignDomains(corpus)
      .groupBy("domain").count().collect()
      .map(r => { val n = r.getLong(1); n * (n - 1) / 2 }).sum

    // SPARK_GRAFT_STRESS_SKIP_COMMITTED=1 skips the fixed-table batch
    // stage: at 100x its pair bill is 2.5 billion (~8 min wall
    // extrapolated) — the committed 8-cell table is the WRONG table for
    // that corpus by the sizing rule, and the fitted stage below is the
    // path a 100x deployment actually runs
    if (sys.env.get("SPARK_GRAFT_STRESS_SKIP_COMMITTED").isEmpty)
      stage("batch_semdedup")(Similarity.semDeDup(corpus).count())

    // the sizing rule applied: nlist grows with the corpus, holding the
    // per-cell population at the fixture's n/8 = 250 — the pair bill
    // (and so the cpu) should return to ~linear in k
    val fittedNlist = math.max(8, (nVec / 250).toInt)
    stage(s"batch_semdedup_fitted_nlist$fittedNlist")(
      Similarity.semDeDupFitted(corpus, nlist = fittedNlist).count())
    // the r18 split: quantizer fit / corpus assignment / pair+keep as
    // separate rows, so the coarse-quantizer bill (the r17 mapped wall)
    // is visible apart from the inherent (linear) pair bill. Runs the
    // same two-level path the combined row above routes through at
    // production nlist; fit and assign are the rows the sizing-rule
    // verdict reads.
    if (fittedNlist > Similarity.twoLevelThreshold) {
      var q: Similarity.TwoLevelQuantizer = null
      stage(s"fitted2l_fit_nlist$fittedNlist") {
        q = Similarity.fitQuantizerTwoLevel(corpus, fittedNlist)
        q.nlist.toLong
      }
      stage("fitted2l_assign")(
        Similarity.assignTwoLevel(corpus, q).count())
      stage("fitted2l_pair_keep")(
        Similarity.semDeDupWithQuantizer(corpus, q).count())
    }

    val tmp = java.nio.file.Files.createTempDirectory("graft-stress-sd").toString
    // Batch 0 admits the whole k× corpus (store empty, within-batch
    // passes by contract) — store becomes k×-sized history.
    stage("gate_admit_all")({
      Jobs.semDeDupGateBatch(s"$tmp/store", s"$tmp/out")(corpus, 0L)
      spark.read.parquet(s"$tmp/store").count()
    })
    // A fixture-sized batch of FRESH ids against that history: the
    // per-batch production shape. Everything is a twin of history, so
    // rows out (admissions) must be 0 — the gate did full work.
    val fresh = base.select((col("vec_id") + lit(copies * shift)).as("vec_id"),
      col("label"), col("embedding"))
    stage("gate_vs_history")({
      Jobs.semDeDupGateBatch(s"$tmp/store", s"$tmp/out")(fresh, 1L)
      spark.read.parquet(s"$tmp/out")
        .filter(col("ingest_batch") === 1L).count()
    })

    println()
    println("BEGIN-SEMDEDUP-SECTION")
    println(f"Corpus: $nVec%,d vectors ($copies x shifted copies of the sf fixture, " +
      f"every vector has ${copies - 1} exact twins), 64-dim, committed 8-domain table, " +
      f"within-domain pair bill ${pairBill}%,d. sf dir: $sfDir, local[32].")
    println()
    println("| stage | rows out | wall s | shuffle write MB | executor-cpu s | tasks |")
    println("|---|---|---|---|---|---|")
    rows.foreach { r =>
      println(f"| ${r.name} | ${r.rowsOut}%,d | ${r.wall}%.2f | ${r.shWMB}%.1f " +
        f"| ${r.cpuS}%.1f | ${r.tasks} |")
    }
    println("END-SEMDEDUP-SECTION")
    spark.stop()
  }
}
