package graft.tools

import java.util.concurrent.atomic.{AtomicLong, LongAdder}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables
import graft.ops.Curation
import graft.streaming.Jobs

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
  *
  * Second section (round 15): the STREAMING audit batch body
  * ([[graft.streaming.Jobs.auditLedgerBatch]]) at the same k×, run
  * three ways over the same batch — 7-stage (no optional gates),
  * 8-stage (+ broadcast bigram-LM gate), 9-stage (+ broadcast
  * benchmark-embedding semantic gate) — so the marginal cost of the
  * r14 stage-8/9 composition is MEASURED as run-to-run deltas, not
  * asserted: the LM gate adds a survivors-sized bigram explode + two
  * broadcast joins, the semantic gate adds the per-row
  * O(bench_size·dim) max-cosine kernel plus the cost of carrying the
  * embedding column through the batch scan. Static stores are built
  * from the BASE corpus outside the timed stages (they are per-stream
  * constants in production).
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

    // ---------------------------- streaming audit body at the same k×
    rows.clear()
    val tmpRoot = java.nio.file.Files.createTempDirectory("graft-stress-audit").toString
    // static stores, built from BASE (per-stream constants, untimed)
    val lmDir = s"$tmpRoot/lm"; val benchDir = s"$tmpRoot/bench"
    val embDir = s"$tmpRoot/emb"
    Jobs.buildLmStore(base, lmDir)
    Jobs.buildBenchmarkShingleStore(benchmark, benchDir)
    val embFixture = Tables.embeddings(spark, sfDir)
    val nEmb = embFixture.count()
    Jobs.buildBenchmarkEmbeddingStore(
      embFixture.filter(col("vec_id") % 37 === 0)
        .select(col("vec_id"), col("label"), col("embedding")), embDir)
    // gates loaded the way the stream loads them (store parquet reads)
    val benchFrame = spark.read.parquet(benchDir).select("bench_doc", "shh")
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    val cb = spark.read.parquet(s"$lmDir/bigrams").persist(StorageLevel.MEMORY_AND_DISK_SER)
    val cu = cb.groupBy("w1").agg(sum("cb").as("cu")).persist(StorageLevel.MEMORY_AND_DISK_SER)
    val v = spark.read.parquet(s"$lmDir/meta").head().getLong(0)
    val embStore = spark.read.parquet(embDir).persist(StorageLevel.MEMORY_AND_DISK_SER)
    val benchDim = embStore.select("emb_dim").head().getInt(0)
    // ~the fixture's median avg_logp (scores cluster near -3.4), so the
    // LM stage really drops rows here (the registered default -9.0 is a
    // floor guard that this fixture never crosses)
    val lmGate = Jobs.AuditLmGate(cb, cu, v, minAvgLogp = -3.4)
    val semGate = Jobs.AuditSemanticGate(embStore.select("be", "bn"), benchDim, 0.9)
    Seq(benchFrame, cb, cu, embStore).foreach(_.count())
    // batch frame: the k× corpus, with a deterministic embedding per doc
    // (vec_id = doc_id % |embeddings| via broadcast join) for the
    // 9-stage run — the semantic stage's batch contract
    val embKeyed = embFixture.select(col("vec_id"), col("embedding"))
    def batchDocs(withEmb: Boolean): DataFrame =
      if (!withEmb) corpus
      // +1 offset: the docs carrying benchmark-identical embeddings are
      // NOT the ones the stage-7 TEXT decontamination already removed
      // (doc_id ≡ vec_id there), so stage 9 has real work to drop
      else corpus.withColumn("vec_id", pmod(col("doc_id") + 1, lit(nEmb)))
        .join(org.apache.spark.sql.functions.broadcast(embKeyed), "vec_id")
        .drop("vec_id")
    def runBody(tag: String, lm: Option[Jobs.AuditLmGate],
        sem: Option[Jobs.AuditSemanticGate]): Unit = {
      val root = s"$tmpRoot/run-$tag"
      val (_, _) = stage(tag) {
        Jobs.auditLedgerBatch(root, Jobs.AuditGate.Exact(benchFrame),
          lmGate = lm, semanticGate = sem)(batchDocs(sem.isDefined), 0L)
        spark.read.parquet(s"$root/ledger")
      }
    }
    runBody("stream_7stage", None, None)
    runBody("stream_8stage_lm", Some(lmGate), None)
    runBody("stream_9stage_lm_sem", Some(lmGate), Some(semGate))
    val led9 = spark.read.parquet(s"$tmpRoot/run-stream_9stage_lm_sem/ledger")
      .groupBy("stage").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    println()
    println("BEGIN-STREAM-AUDIT-SECTION")
    println(s"Streaming audit batch body at $copies x (${nCorpus} docs, one batch), " +
      s"benchmark-embedding store ${embStore.count()} vectors of dim $benchDim, " +
      s"LM store ${cb.count()} bigrams. 9-stage ledger by stage: " +
      s"${led9.toSeq.sortBy(_._1).map { case (st, n) => s"$st=$n" }.mkString(", ")}.")
    println()
    println("| run | ledger rows | wall s | shuffle write MB | shuffle read MB | executor-cpu s | tasks |")
    println("|---|---|---|---|---|---|---|")
    rows.foreach { r =>
      println(f"| ${r.name} | ${r.rowsOut}%,d | ${r.wall}%.2f | ${r.shWMB}%.1f " +
        f"| ${r.shRMB}%.1f | ${r.cpuS}%.1f | ${r.tasks} |")
    }
    println("END-STREAM-AUDIT-SECTION")
    spark.stop()
  }
}
