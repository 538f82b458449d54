package graft.tools

import java.util.concurrent.atomic.{AtomicLong, LongAdder}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables
import graft.ops.{Coverage, Curation, Dedup}

/** End-to-end flagship pipeline at k× corpus scale (dev-only): clean →
  * score → gate → exact dedup → near-dup collapse → benchmark
  * decontamination (Bloom gate) → sequence packing, each stage timed
  * with its rows in/out, shuffle read/write bytes, executor CPU, and
  * task count. Prints the markdown table committed in SCALING.md's
  * "flagship pipeline end-to-end" section — the one artifact that walks
  * the whole 100 TB story instead of per-family fragments.
  *
  * The k× union plants k-way exact-duplicate families (every base doc
  * gets k−1 shifted copies) — the adversarial direction for the dedup
  * front: candidate generation sees k× rows AND k× denser duplicate
  * structure. Shifts derive from max(doc_id)+1 so sparse id spaces
  * cannot collide copies with base rows.
  */
object StressPipeline {
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

    // per-window task metric accumulation (deltas read at stage ends)
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
    case class StageRow(name: String, op: String, rowsIn: Long, rowsOut: Long,
        wall: Double, shWMB: Double, shRMB: Double, cpuS: Double, tasks: Long)
    val rows = scala.collection.mutable.ArrayBuffer.empty[StageRow]
    def stage(name: String, op: String, rowsIn: Long)(df: => DataFrame): (DataFrame, Long) = {
      shW.reset(); shR.reset(); cpuNs.reset(); nTasks.set(0)
      val t0 = System.nanoTime()
      val out = df.persist(StorageLevel.MEMORY_AND_DISK_SER)
      val n = out.count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are posted asynchronously; drain the bus
      // DETERMINISTICALLY before reading the deltas (the previous fixed
      // 300 ms sleep under-drained at 100x — a 584-task stage's events
      // landed in the NEXT stage's window, swapping their CPU columns)
      org.apache.spark.graftshim.ListenerDrain.drain(spark.sparkContext)
      rows += StageRow(name, op, rowsIn, n, wall,
        shW.sum / 1048576.0, shR.sum / 1048576.0, cpuNs.sum / 1e9, nTasks.get)
      System.gc()
      (out, n)
    }

    val base = Tables.documents(spark, sfDir)
    val shift = base.agg(max("doc_id")).head().getLong(0) + 1
    val nBase = base.count()
    val (corpus, nCorpus) = stage("corpus", s"$copies x union (planted dup families)", nBase) {
      (0 until copies).map(k =>
        base.select((col("doc_id") + lit(k * shift)).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars")))
        .reduce(_ unionByName _)
    }
    // benchmark fixture: ~3% of BASE texts — every shifted copy of them
    // in the corpus is planted contamination the gate must strip
    val benchmark = base.filter(col("doc_id") % 37 === 0)
      .select(col("doc_id"), col("text"))
    val nBench = benchmark.count()

    val (curated, nCurated) = stage("curate", "clean + score + gate + exact dedup " +
      "(Curation.curatedFrame)", nCorpus) {
      Curation.curatedFrame(corpus)
    }
    corpus.unpersist(blocking = true)

    val asDocs = curated.select(col("keep_doc_id").as("doc_id"), col("t").as("text"))
    val (canonical, nCanonical) = stage("collapse", "blocked-Jaccard pairs -> connected " +
      "components -> canonical survivors (Dedup.canonicalSurvivors)", nCurated) {
      asDocs.join(
        Dedup.canonicalSurvivors(asDocs,
          Dedup.prefixBlockedJaccard(asDocs)
            .filter(col("jaccard") >= Curation.defaultJaccardThreshold))
          .select(col("keep_doc_id").as("doc_id")),
        Seq("doc_id"))
    }
    curated.unpersist(blocking = true)

    // Pair-level gate carries the pipeline forward: it strips exactly
    // the planted leaks (docs sharing >= minShared shingles with a
    // SINGLE benchmark item). The Bloom union sweep is measured against
    // the same input as the zero-corpus-shuffle alternative — on this
    // template-heavy fixture its union semantics (>= minShared hits
    // against the suite's COMBINED shingle set) flag most docs, the
    // documented hygiene-sweep behavior, so its output is reported, not
    // forwarded.
    val (decon, nDecon) = stage("decontaminate", "pair-level benchmark shingle gate, " +
      "left_anti (Dedup.decontaminate)", nCanonical) {
      Dedup.decontaminate(canonical, benchmark)
    }
    val (bloomOut, _) = stage("decontaminate-alt", "union-semantics Bloom hygiene sweep, " +
      "zero corpus shuffle (Dedup.decontaminateBloom)", nCanonical) {
      Dedup.decontaminateBloom(canonical, benchmark)
    }
    bloomOut.unpersist(blocking = true)
    canonical.unpersist(blocking = true)

    val (_, nPacked) = stage("pack", "fixed-width sequence packing manifest " +
      "(Coverage.packSequences)", nDecon) {
      Coverage.packSequences(decon)
    }
    decon.unpersist(blocking = true)

    println()
    println("BEGIN-SCALING-SECTION")
    println(s"Corpus: ${nCorpus} docs ($copies x $nBase base docs, shifted ids; " +
      s"every base text has ${copies - 1} planted exact copies). Benchmark fixture: " +
      s"$nBench held-out texts (~3% of base), so every surviving copy of one is " +
      s"planted contamination. sf dir: $sfDir, local[32].")
    println()
    println("| stage | operator | rows in | rows out | wall s | shuffle write MB | shuffle read MB | executor-cpu s | tasks |")
    println("|---|---|---|---|---|---|---|---|---|")
    rows.foreach { r =>
      println(f"| ${r.name} | ${r.op} | ${r.rowsIn}%,d | ${r.rowsOut}%,d | ${r.wall}%.2f " +
        f"| ${r.shWMB}%.1f | ${r.shRMB}%.1f | ${r.cpuS}%.1f | ${r.tasks} |")
    }
    println()
    println(f"End to end: ${nCorpus}%,d raw docs -> ${nDecon}%,d clean canonical docs -> " +
      f"${nPacked}%,d packed-sequence manifest rows.")
    println("END-SCALING-SECTION")
    spark.stop()
  }
}
