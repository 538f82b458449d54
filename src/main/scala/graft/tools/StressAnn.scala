package graft.tools

import java.util.concurrent.atomic.{AtomicLong, LongAdder}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Similarity

/** ANN index family at k× vector scale (dev-only): the sf0.1 embeddings
  * fixture unioned k× with shifted vec_ids, pushed through the
  * persisted IVF and IVF-PQ paths. Prints the markdown table committed
  * in SCALING.md's ANN section.
  *
  * What k× exercises that the registered rows cannot: the three cost
  * classes of a production vector index, separately —
  *  - BUILD (ingest-time): quantizer fit on the seeded sample + one
  *    full assignment/encode pass + partitioned store write. Must be
  *    linear in vectors; the PQ build additionally runs the codegen'd
  *    encoder per row (M×K×Dsub distance loop) and writes ~64× fewer
  *    store bytes.
  *  - FULL PROBE (the oracle shape): scan every cell. Linear, the
  *    ceiling a pruned probe is measured against.
  *  - PRUNED PROBE (the production shape): nprobe/nlist of the store
  *    via partition pruning. Must track the pruning fraction, not the
  *    corpus.
  */
object StressAnn {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_STRESS_COPIES", "30").toInt
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
    val q = base.filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble).toArray

    val tmp = java.nio.file.Files.createTempDirectory("graft-stress-ann").toString
    stage("ivf_build")({
      Similarity.buildIvfIndex(corpus, s"$tmp/ivf")
      spark.read.parquet(s"$tmp/ivf/assigned").count()
    })
    stage("ivfpq_build")({
      // codes-only build: this stage's committed claim (SCALING.md) is
      // the PQ write-volume advantage vs the raw store, so the optional
      // re-rank sidecar (which is by definition raw-corpus-sized) is
      // excluded — its cost is the already-measured ivf_build shape
      Similarity.buildIvfPqIndex(corpus, s"$tmp/ivfpq", rawSidecar = false)
      spark.read.parquet(s"$tmp/ivfpq/assigned_pq").count()
    })
    def sized(dir: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles).map(_.map(walk).sum).getOrElse(0L)
      walk(new java.io.File(dir))
    }
    val rawBytes = sized(s"$tmp/ivf/assigned")
    val codeBytes = sized(s"$tmp/ivfpq/assigned_pq")
    val packedBytes = sized(s"$tmp/ivfpq/assigned_pq_packed")

    def count(df: DataFrame): Long = df.count()
    stage("ivf_fullprobe")(count(
      Similarity.queryIvfIndex(spark, s"$tmp/ivf", q, k = 20, nprobe = 16)))
    stage("ivf_probe4")(count(
      Similarity.queryIvfIndex(spark, s"$tmp/ivf", q, k = 20, nprobe = 4)))
    stage("ivfpq_fullprobe")(count(
      Similarity.queryIvfPq(spark, s"$tmp/ivfpq", q, k = 20, nprobe = 16)))
    stage("ivfpq_probe4")(count(
      Similarity.queryIvfPq(spark, s"$tmp/ivfpq", q, k = 20, nprobe = 4)))
    stage("ivfpq_probe4_packed")(count(
      Similarity.queryIvfPq(spark, s"$tmp/ivfpq", q, k = 20, nprobe = 4, packed = true)))

    // r16: the re-rank deployment shape — a SECOND index built WITH the
    // raw sidecar (its own stage, so the sidecar's build premium over
    // the codes-only build is the visible delta), then the two-stage
    // probes against it: ADC shortlist -> partition-pruned exact refine
    stage("ivfpq_build_with_sidecar")({
      Similarity.buildIvfPqIndex(corpus, s"$tmp/ivfpq_rr")
      spark.read.parquet(s"$tmp/ivfpq_rr/assigned_raw").count()
    })
    val sidecarBytes = sized(s"$tmp/ivfpq_rr/assigned_raw")
    stage("ivfpq_rerank_probe4")(count(
      Similarity.queryIvfPq(spark, s"$tmp/ivfpq_rr", q, k = 20, nprobe = 4, rerank = 80)))
    stage("ivfpq_rerank_fullprobe")(count(
      Similarity.queryIvfPq(spark, s"$tmp/ivfpq_rr", q, k = 20, nprobe = 16, rerank = 80)))

    // r18: the BATCHED shapes. A fixture-sized serving batch against
    // the 16-cell index (pairs = |Q| × nprobe/nlist × corpus), then the
    // knn-GRAPH build — corpus queries itself — against an index fitted
    // by the SemDeDup sizing rule (nlist ∝ n holds per-query candidates
    // at ~nprobe × 250, so graph pairs stay ~n × 1000 instead of
    // n²·nprobe/nlist; this stage also measures the two-level build at
    // scale, since the fitted nlist routes through it). The graph's
    // query side is corpus-sized → hintBroadcast=false (AQE sizes the
    // cell-keyed join).
    val batchQ = base.select(col("vec_id").as("query_id"), col("embedding"))
    stage("knn_join_batch_probe4")(count(
      Similarity.knnJoinIvf(spark, s"$tmp/ivf", batchQ, k = 10, nprobe = 4)))
    val fittedNlist = math.max(8, (nVec / 250).toInt)
    stage(s"ivf_build_fitted_nlist$fittedNlist")({
      Similarity.buildIvfIndex(corpus, s"$tmp/ivf_fitted", nlist = fittedNlist)
      spark.read.parquet(s"$tmp/ivf_fitted/assigned").count()
    })
    stage("knn_graph_fitted_probe4")(count(
      Similarity.knnJoinIvf(spark, s"$tmp/ivf_fitted",
        corpus.select(col("vec_id").as("query_id"), col("embedding")),
        k = 5, nprobe = 4, hintBroadcast = false)))

    // r19: the PROBE STAGE alone at corpus-sized Q — the stage the r18
    // relational spelling paid as a |Q|×nlist crossJoin + query-keyed
    // window (quadratic rows once nlist tracks the corpus). Now it is
    // the scan-side graft_nearest_cells kernel: zero exchanges (watch
    // the shuffle column), zero blowup (rows out = n·nprobe), cpu
    // O(n·√nlist) on the fitted index (two-probe through the persisted
    // quantizer) and O(n·nlist) on the flat 16-cell index — both flat
    // in memory at any |Q|.
    stage(s"probe_rank_fitted_corpusQ_nlist$fittedNlist")(count(
      Similarity.rankProbes(spark, s"$tmp/ivf_fitted",
        corpus.select(col("vec_id").as("query_id"),
          col("embedding").as("q_emb")), nprobe = 4)))
    stage("probe_rank_flat16_corpusQ")(count(
      Similarity.rankProbes(spark, s"$tmp/ivf",
        corpus.select(col("vec_id").as("query_id"),
          col("embedding").as("q_emb")), nprobe = 4)))

    // r18-late: the 100 TB graph recipe — same sizing-rule nlist, but
    // the joined side is the PACKED codes store (codes-only IO at
    // graph scale) and the per-node answers refine exactly against the
    // sidecar. Pair bill unchanged (~n × nprobe × 250); joined bytes
    // collapse ~48×.
    stage(s"ivfpq_build_fitted_nlist$fittedNlist")({
      Similarity.buildIvfPqIndex(corpus, s"$tmp/ivfpq_fitted", nlist = fittedNlist)
      spark.read.parquet(s"$tmp/ivfpq_fitted/assigned_pq").count()
    })
    stage("knn_graph_pq_fitted_rerank")(count(
      Similarity.knnJoinIvfPq(spark, s"$tmp/ivfpq_fitted",
        corpus.select(col("vec_id").as("query_id"), col("embedding")),
        k = 5, nprobe = 4, hintBroadcast = false, packed = true, rerank = 20)))

    // r18-late: the BATCHED-ADC join — same 2,000-query batch as the
    // raw row above, joined side the PACKED codes store through
    // graft_pq_adc_pair. The claim: same pair count, comparable CPU
    // (one raw dot's multiplies per pair), joined-side bytes the ~64×
    // smaller PQ store.
    stage("knn_join_pq_batch_probe4")(count(
      Similarity.knnJoinIvfPq(spark, s"$tmp/ivfpq", batchQ, k = 10,
        nprobe = 4, packed = true)))

    // r18-late: the batched two-stage refine — ADC shortlist to 80 per
    // query, exact re-rank against the sidecar-carrying index. The
    // claim: refine adds only |Q|*rerank exact pairs (cells-pruned raw
    // reads), not a corpus-scale stage.
    stage("knn_join_pq_rerank_batch")(count(
      Similarity.knnJoinIvfPq(spark, s"$tmp/ivfpq_rr", batchQ, k = 10,
        nprobe = 4, rerank = 80)))

    // r18-late: the SERVING STREAM — startKnnServe end-to-end over a
    // parquet spool source, one file per micro-batch (AvailableNow +
    // maxFilesPerTrigger=1 → 4 batches of ~500 queries). The committed
    // claim: the stream's bill is the batched join above plus only the
    // per-batch landing write — checkpointing and foreachBatch add no
    // corpus-scale work.
    stage("knn_serve_stream_4x500")({
      val spool = s"$tmp/serve_spool"; val outD = s"$tmp/serve_out"
      val qs = base.filter(col("vec_id") < 2000)
        .select(col("vec_id").as("query_id"), col("embedding"))
      (0 until 4).foreach { b =>
        qs.filter(pmod(col("query_id"), lit(4)) === b).coalesce(1)
          .write.mode("append").parquet(spool)
      }
      val stream = spark.readStream.schema(qs.schema)
        .option("maxFilesPerTrigger", "1").parquet(spool)
      graft.streaming.Jobs.startKnnServe(stream, s"$tmp/ivf", outD,
          s"$tmp/serve_ck", k = 10, nprobe = 4)
        .awaitTermination()
      spark.read.parquet(outD).count()
    })

    // r20: the INGEST ASSIGNMENT stage at a backlog-sized batch — the
    // path an AvailableNow cold-start hits as ONE unbounded batch
    // (startPqIngestStream via assignToPqIndex). The retired spelling
    // paid a |batch|×nlist crossJoin + per-vec_id row_number window
    // here (the probe-ranking wall's third appearance); assignment now
    // rides the same scan-side graft_nearest_cell kernel as probe
    // ranking — zero shuffle from the assignment itself (the residual
    // shuffle column is the partitioned store WRITE), cpu O(n·√nlist)
    // two-probe on the fitted index, O(n·nlist) on the flat one. These
    // run LAST: they append corpus-sized ingest partitions the earlier
    // probe stages must not see.
    stage(s"ingest_assign_fitted_corpus_nlist$fittedNlist")({
      Similarity.assignToIndex(spark, s"$tmp/ivf_fitted",
        corpus.select((col("vec_id") + lit(nVec)).as("vec_id"),
          col("label"), col("embedding")), ingestBatch = 1L)
      spark.read.parquet(s"$tmp/ivf_fitted/assigned")
        .filter(col("ingest_batch") === 1L).count()
    })
    stage("ingest_assign_flat16_corpus")({
      Similarity.assignToIndex(spark, s"$tmp/ivf",
        corpus.select((col("vec_id") + lit(nVec)).as("vec_id"),
          col("label"), col("embedding")), ingestBatch = 1L)
      spark.read.parquet(s"$tmp/ivf/assigned")
        .filter(col("ingest_batch") === 1L).count()
    })

    // r20: the INCREMENTAL FAMILY lift — seed = the full batch operator
    // (fitted build + knn graph + components, the one-time cost), then
    // a serving-sized batch assigned incrementally. The claim: the
    // incremental batch costs ~the 2,000-query serving join plus
    // |batch|-sized extras — NOT a 60k-node graph rebuild, which is
    // what completing the lifecycle without the streaming lift would
    // pay per micro-batch.
    stage(s"family_seed_corpus_nlist$fittedNlist")({
      graft.streaming.Jobs.seedFamilyStore(corpus,
        s"$tmp/fam_idx", s"$tmp/fam_store",
        nlist = fittedNlist, k = 5, nprobe = 4, minCos = 0.3)
      spark.read.parquet(s"$tmp/fam_store").count()
    })
    def familyBatch(n: Int, batchId: Long): Long = {
      val batch = base.filter(col("vec_id") < n)
        .select((col("vec_id") + lit(nVec * (batchId + 2))).as("vec_id"),
          col("label"), col("embedding"))
      graft.streaming.Jobs.familyAssignBatch(
        s"$tmp/fam_idx", s"$tmp/fam_store", 5, 4, 0.3,
        Similarity.indexDim(spark, s"$tmp/fam_idx"))(batch, batchId)
      spark.read.parquet(s"$tmp/fam_store")
        .filter(col("ingest_batch") === batchId).count()
    }
    stage("family_assign_batch_500")(familyBatch(500, 0L))
    stage("family_assign_batch_2000")(familyBatch(2000, 1L))

    println()
    println("BEGIN-ANN-SECTION")
    println(f"Corpus: $nVec%,d vectors ($copies x shifted copies of the sf fixture), 64-dim. " +
      f"Store bytes: raw-IVF ${rawBytes / 1048576.0}%.1f MB, PQ codes " +
      f"${codeBytes / 1048576.0}%.1f MB, PQ packed ${packedBytes / 1048576.0}%.1f MB " +
      f"(raw/packed = ${rawBytes.toDouble / packedBytes}%.0fx), re-rank raw sidecar " +
      f"${sidecarBytes / 1048576.0}%.1f MB (cold tier, touched nprobe/nlist per query). " +
      f"sf dir: $sfDir, local[32].")
    println()
    println("| stage | rows out | wall s | shuffle write MB | executor-cpu s | tasks |")
    println("|---|---|---|---|---|---|")
    rows.foreach { r =>
      println(f"| ${r.name} | ${r.rowsOut}%,d | ${r.wall}%.2f | ${r.shWMB}%.1f " +
        f"| ${r.cpuS}%.1f | ${r.tasks} |")
    }
    println("END-ANN-SECTION")
    spark.stop()
  }
}
