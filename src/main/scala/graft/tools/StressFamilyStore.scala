package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Family-store read-boundedness stress (dev-only): the r21 bucketing
  * claim, measured. `familyAssignBatch` used to read the ENTIRE
  * admitted family store every micro-batch (`read.parquet(familiesDir)
  * .filter(ingest_batch < batchId)`) — linear in admitted members,
  * growing without bound over the stream's life. With the id-hash
  * bucket layout (seedFamilyStore `buckets`, sized ~members/250 like
  * nlist) the anchor lookup prunes to the batch's touched buckets at
  * the file level via DPP.
  *
  * Protocol: ONE fixed corpus + index (so the index's probed-cell
  * reads are identical across every run), family stores at 1x and 16x
  * member count (the 16x rows are synthetic extra ids — the lookup
  * only needs (vec_id, family) rows, and non-matching history is
  * exactly what the flat layout wastefully reads), each in both the
  * bucketed and the flat (pre-bucketing) layout. The SAME small batch
  * runs against all four; stage input bytes differ only by the family
  * store's read. Claim: flat grows ~16x with the store, bucketed stays
  * ~flat (touched buckets ~ |batch|·k, each ~250 rows).
  */
object StressFamilyStore {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_STRESS_COPIES", "30").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
        sys.env.getOrElse("SPARK_GRAFT_DPP_REUSE_ONLY", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val bytesRead = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        bytesRead.add(sc.stageInfo.taskMetrics.inputMetrics.bytesRead)
    })
    // the family-store scans' OWN post-pruning driver metrics
    // (numFiles / filesSize are set from the DPP-selected partitions),
    // collected from every executed plan — total stage bytes at fixture
    // scale are dominated by parquet footers and the index's reads, so
    // the store's own selected-file metrics are the honest signal
    def famScans(p: org.apache.spark.sql.execution.SparkPlan, tag: String)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
      val direct = p.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.location.rootPaths.exists(_.toString.contains(tag)) => s
      }
      val aqe = p.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a
      }.flatMap(a => famScans(a.executedPlan, tag))
      // AQE final plans wrap materialized stages as QueryStageExec
      // LEAVES — collect() does not descend into them
      val stages = p.collect {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q
      }.flatMap(q => famScans(q.plan, tag))
      val subs = p.collect { case n => n }.flatMap(_.subqueries)
        .flatMap(famScans(_, tag))
      direct ++ aqe ++ stages ++ subs
    }
    val famFiles = new LongAdder; val famBytes = new LongAdder
    @volatile var famTag = ""
    val qel = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        famScans(qe.executedPlan, famTag).foreach { s =>
          famFiles.add(s.metrics.get("numFiles").map(_.value).getOrElse(0L))
          famBytes.add(s.metrics.get("filesSize").map(_.value).getOrElse(0L))
          if (sys.env.contains("SPARK_GRAFT_FAM_DEBUG"))
            System.err.println(s"[famdebug] partFilters=${s.partitionFilters} " +
              s"numFiles=${s.metrics.get("numFiles").map(_.value)} " +
              s"static=${s.metrics.get("staticFilesNum").map(_.value)}")
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ex: Exception): Unit = ()
    }
    spark.listenerManager.register(qel)
    case class Measured(stageMB: Double, famFilesRead: Long, famMB: Double)
    def measured(tag: String)(body: => Unit): Measured = {
      org.apache.spark.graftshim.ListenerDrain.drain(spark.sparkContext)
      bytesRead.reset(); famFiles.reset(); famBytes.reset(); famTag = tag
      body
      org.apache.spark.graftshim.ListenerDrain.drain(spark.sparkContext)
      Measured(bytesRead.sum / 1048576.0, famFiles.sum, famBytes.sum / 1048576.0)
    }

    val base = Tables.embeddings(spark, sfDir)
    val shift = base.agg(max("vec_id")).head().getLong(0) + 1
    val corpus = (0 until copies).map(k =>
      base.select((col("vec_id") + lit(k * shift)).as("vec_id"), col("label"),
        col("embedding"))).reduce(_ unionByName _)
    val nVec = corpus.count()
    val nlist = math.max(8, (nVec / 250).toInt)
    val tmp = java.nio.file.Files.createTempDirectory("graft-stress-fam").toString
    val idx = s"$tmp/idx"
    graft.ops.Similarity.buildIvfIndex(corpus, idx, nlist = nlist)
    val dim = graft.ops.Similarity.indexDim(spark, idx)
    // small batch: touched buckets ~ |batch|·k must sit well below the
    // store's bucket count for pruning to have room to show
    val batch = base.filter(col("vec_id") < 10)
      .select((col("vec_id") + lit(shift * 1000L)).as("vec_id"),
        col("label"), col("embedding"))

    case class Row(members: Long, buckets: Int, layout: String, m: Measured)
    val rows = scala.collection.mutable.ArrayBuffer.empty[Row]

    Seq(1, 16).foreach { mult =>
      val members = nVec * mult
      val buckets = math.max(8, (members / 250).toInt)
      // singleton family rows; ids beyond the corpus for the synthetic
      // extra history (never matched, exactly the dead weight a long
      // stream accumulates). Labels carry the embeddings table's
      // realistic string width so the store's bytes-per-row matches a
      // real deployment rather than a delta-encoded toy column.
      val fams = spark.range(members)
        .select(col("id").as("vec_id"),
          concat(lit("domain_"), pmod(xxhash64(col("id")), lit(1000L)),
            lit("_source_"), pmod(xxhash64(col("id") + 7), lit(10000L))).as("label"),
          col("id").as("family"))
      val famB = s"$tmp/famB_$mult"
      fams.withColumn("ingest_batch", lit(-1L))
        .withColumn("fam_bucket",
          graft.ops.Similarity.familyBucketOf(col("vec_id"), buckets))
        .repartition(col("fam_bucket"))
        .write.mode("overwrite").partitionBy("fam_bucket", "ingest_batch")
        .parquet(famB)
      graft.streaming.Jobs.writeFamilyBucketsMarker(spark, famB, buckets)
      val famF = s"$tmp/famF_$mult"
      fams.withColumn("ingest_batch", lit(-1L))
        .repartition(graft.ops.Similarity.familyBucketOf(col("vec_id"), 64))
        .write.mode("overwrite").partitionBy("ingest_batch").parquet(famF)
      def sized(dir: String): Double = {
        def walk(f: java.io.File): Long =
          if (f.isFile) f.length
          else Option(f.listFiles).map(_.map(walk).sum).getOrElse(0L)
        walk(new java.io.File(dir)) / 1048576.0
      }
      Seq(("bucketed", famB), ("flat", famF)).foreach { case (layout, fam) =>
        val storeMB = sized(fam)
        val m = measured(new java.io.File(fam).getName)(
          graft.streaming.Jobs.familyAssignBatch(idx, fam, 35, 4, 0.3, dim)(
            batch, 0L))
        rows += Row(members, buckets, s"$layout (store ${storeMB.round} MB)", m)
      }
    }

    println()
    println("BEGIN-FAMSTORE-SECTION")
    println(f"Corpus/index fixed at $nVec%,d vectors (nlist=$nlist); batch 10 rows, " +
      "k=35, nprobe=4 — only the family store varies across rows.")
    println("| admitted members | buckets | layout | store files read | store MB read | total stage input MB |")
    println("|---|---|---|---|---|---|")
    rows.foreach { r =>
      println(f"| ${r.members}%,d | ${r.buckets} | ${r.layout} | ${r.m.famFilesRead} " +
        f"| ${r.m.famMB}%.2f | ${r.m.stageMB}%.1f |")
    }
    println("END-FAMSTORE-SECTION")
    spark.stop()
  }
}
