package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.ops.Similarity

/** Streaming family assignment vs the batch knnGraphFamilies operator.
  *
  * Fixture geometry: 6 families, each a near-clique of 4 members no
  * wider than k+1 (k = 3), centers on orthogonal axes so cross-family
  * cosines sit far below minCos — the separated-near-clique regime in
  * which the incremental operator's documented contract is EQUALITY
  * with the batch operator on the union under ascending-id arrival.
  */
class FamilyAssignSpec extends SparkSpec {
  import spark.implicits._

  // member j of family c: unit mass on axis c plus tiny deterministic
  // noise on the high dims — within-family cos ~0.999, cross ~0.0005
  private def vec(c: Int, j: Int): Seq[Float] = {
    val a = Array.fill(16)(0.0f)
    a(c) = 1.0f
    a(8 + (j % 4)) = 0.02f + 0.001f * ((c * 7 + j * 3) % 5)
    a.toSeq
  }
  // vec_id i belongs to family (i % 6); ids ascend with arrival
  private def row(i: Int): (Long, Int, Seq[Float]) =
    (i.toLong, i % 6, vec(i % 6, i / 6))
  private def frame(ids: Range) =
    ids.map(row).toDF("vec_id", "label", "embedding")

  test("streamed family labels equal batch knnGraphFamilies on the union") {
    val indexDir = tmpDir("fam-idx")
    val famDir = tmpDir("fam-store")
    // seed: one member per family — all singletons (no edges yet)
    Jobs.seedFamilyStore(frame(0 until 6), indexDir, famDir,
      nlist = 4, k = 3, nprobe = 4, minCos = 0.5)
    val seedFams = spark.read.parquet(famDir)
      .select("vec_id", "family").as[(Long, Long)].collect().toMap
    assert(seedFams == (0L until 6L).map(i => i -> i).toMap,
      s"seed should be all singletons, got $seedFams")
    val ms = MemoryStream[(Long, Int, Seq[Float])](spark)(
      org.apache.spark.sql.Encoders.product[(Long, Int, Seq[Float])])
    val q = Jobs.startFamilyAssign(
      ms.toDF().toDF("vec_id", "label", "embedding"),
      indexDir, famDir, tmpDir("fam-ckpt"),
      k = 3, nprobe = 4, minCos = 0.5,
      queryTrigger = Trigger.ProcessingTime(0))
    try {
      ms.addData((6 until 14).map(row))
      q.processAllAvailable()
      ms.addData((14 until 24).map(row))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(famDir)
      .select("vec_id", "family").as[(Long, Long)].collect().toMap
    assert(streamed.size == 24)
    // batch operator over the union, fullprobe-equivalent settings
    val unionDir = tmpDir("fam-union-idx")
    val union = frame(0 until 24)
    Similarity.buildIvfIndex(union, unionDir, nlist = 4)
    val batchFams = Similarity
      .knnGraphFamilies(spark, unionDir, union, k = 3, nprobe = 4, minCos = 0.5)
      .select("vec_id", "family").as[(Long, Long)].collect().toMap
    assert(streamed == batchFams,
      s"stream diverged from batch: ${streamed.toSeq.sorted} vs ${batchFams.toSeq.sorted}")
    // and the geometry's ground truth: family = first-arrived member
    assert(streamed.forall { case (id, fam) => fam == id % 6 })
    // the index advanced in step: build 0 plus one partition per batch
    assert(spark.read.parquet(s"$indexDir/assigned")
      .select("ingest_batch").distinct().as[Long].collect().toSet
      == Set(0L, 1L, 2L))
  }

  test("replaying the last batch leaves the store unchanged (at-least-once)") {
    val indexDir = tmpDir("fam-replay-idx")
    val famDir = tmpDir("fam-replay-store")
    Jobs.seedFamilyStore(frame(0 until 6), indexDir, famDir,
      nlist = 4, k = 3, nprobe = 4, minCos = 0.5)
    val idxDim = 16
    val b1 = frame(6 until 14)
    val b2 = frame(14 until 24)
    Jobs.familyAssignBatch(indexDir, famDir, 3, 4, 0.5, idxDim)(b1, 0L)
    Jobs.familyAssignBatch(indexDir, famDir, 3, 4, 0.5, idxDim)(b2, 1L)
    def snapshot() = spark.read.parquet(famDir)
      .select("vec_id", "family", "ingest_batch")
      .as[(Long, Long, Long)].collect().toSet
    val before = snapshot()
    assert(before.size == 24)
    // the at-least-once case: same id, same batch — content-identical
    Jobs.familyAssignBatch(indexDir, famDir, 3, 4, 0.5, idxDim)(b2, 1L)
    assert(snapshot() == before)
    assert(spark.read.parquet(s"$indexDir/assigned").count() == 24)
    // a RESET below max is the fresh-checkpoint hazard — loud refusal
    val ex = intercept[IllegalArgumentException](
      Jobs.familyAssignBatch(indexDir, famDir, 3, 4, 0.5, idxDim)(b1, 0L))
    assert(ex.getMessage.contains("fresh-checkpoint"), ex.getMessage)
  }

  test("first-arrival-wins: a bridge vector joins the smaller family and never merges the larger") {
    val indexDir = tmpDir("fam-bridge-idx")
    val famDir = tmpDir("fam-bridge-store")
    def axis(c: Int): Seq[Float] = {
      val a = Array.fill(16)(0.0f); a(c) = 1.0f; a.toSeq
    }
    val seed = Seq((0L, 0, axis(0)), (1L, 1, axis(1)))
      .toDF("vec_id", "label", "embedding")
    Jobs.seedFamilyStore(seed, indexDir, famDir,
      nlist = 2, k = 3, nprobe = 2, minCos = 0.5)
    // the bridge: cos 0.707 to BOTH seed singletons, which are
    // mutually orthogonal — batch semantics would merge all three
    val bridge = Seq((5L, 9, Seq.tabulate(16)(i =>
        if (i <= 1) 0.7071f else 0.0f)))
      .toDF("vec_id", "label", "embedding")
    Jobs.familyAssignBatch(indexDir, famDir, 3, 2, 0.5, 16)(bridge, 0L)
    val fams = spark.read.parquet(famDir)
      .select("vec_id", "family").as[(Long, Long)].collect().toMap
    // bridge joins the SMALLER anchored family; family 1 is not
    // retracted — the documented divergence from the batch operator
    assert(fams == Map(0L -> 0L, 1L -> 1L, 5L -> 0L), fams.toString)
  }

  test("bucketed store: layout, marker, and file-level pruning of the anchor lookup") {
    val indexDir = tmpDir("fam-bucket-idx")
    val famDir = tmpDir("fam-bucket-store")
    Jobs.seedFamilyStore(frame(0 until 6), indexDir, famDir,
      nlist = 4, k = 3, nprobe = 4, minCos = 0.5, buckets = 8)
    // layout: fam_bucket is the FIRST partition level (the cell-store
    // convention every guard/compaction helper keys on) and the marker
    // records the bucket count for readers
    val firstLevel = new java.io.File(famDir).listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(firstLevel.nonEmpty && firstLevel.forall(_.startsWith("fam_bucket=")),
      firstLevel.mkString(","))
    assert(Jobs.familyBucketsOf(spark, famDir) == 8)
    // run a real batch and capture every executed plan: the anchor
    // lookup must plant a dynamic-partition-pruning subquery on the
    // families scan (file-level pruning — the r20 unbounded-history
    // read, bounded)
    val plans = scala.collection.mutable.ArrayBuffer.empty[String]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        plans.synchronized { plans += qe.executedPlan.toString: Unit }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ex: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      Jobs.familyAssignBatch(indexDir, famDir, 3, 4, 0.5, 16)(frame(6 until 14), 0L)
      org.apache.spark.graftshim.ListenerDrain.drain(spark.sparkContext)
    } finally spark.listenerManager.unregister(listener)
    val famScans = plans.synchronized {
      plans.filter(p => p.contains("fam_bucket") && p.contains(
        new java.io.File(famDir).getName))
    }
    assert(famScans.nonEmpty, "no executed plan scanned the family store")
    // a LITERAL In/INSET partition filter, not DPP: the adaptive
    // planner degrades this join's DPP subquery to
    // dynamicpruningexpression(true) (measured, tools/StressFamilyStore),
    // so the touched-bucket set is collected (batch-bounded) and
    // applied deterministically
    assert(famScans.exists(p => """fam_bucket#\d+ IN""".r.findFirstIn(p).isDefined),
      s"anchor lookup reads the family store without a bucket partition " +
        s"filter:\n${famScans.head}")
    // and the labels themselves are unchanged by the pruned layout
    val fams = spark.read.parquet(famDir)
      .select("vec_id", "family").as[(Long, Long)].collect().toMap
    assert((0 until 14).forall(i => fams(i.toLong) == (i % 6).toLong), fams.toString)
  }

  test("anchored remap: an out-of-order batch id below its anchor joins the family instead of splitting it") {
    val indexDir = tmpDir("fam-remap-idx")
    val famDir = tmpDir("fam-remap-store")
    def axis(c: Int): Seq[Float] = {
      val a = Array.fill(16)(0.0f); a(c) = 1.0f; a.toSeq
    }
    // seed member id 10 -> singleton family 10
    val seed = Seq((10L, 0, axis(0)), (11L, 1, axis(1)))
      .toDF("vec_id", "label", "embedding")
    Jobs.seedFamilyStore(seed, indexDir, famDir,
      nlist = 2, k = 3, nprobe = 2, minCos = 0.5)
    // batch id 5 UNDERCUTS the anchor id: label propagation's component
    // min would be 5, silently splitting the family (batch row filed
    // under 5 while member 10 keeps family 10). The anchored remap must
    // file it under the existing family id 10.
    val near = Seq((5L, 0, axis(0).updated(8, 0.02f)))
      .toDF("vec_id", "label", "embedding")
    Jobs.familyAssignBatch(indexDir, famDir, 3, 2, 0.5, 16)(near, 0L)
    val fams = spark.read.parquet(famDir)
      .select("vec_id", "family").as[(Long, Long)].collect().toMap
    assert(fams == Map(10L -> 10L, 11L -> 11L, 5L -> 10L), fams.toString)
  }

  test("bucket contract: declaring buckets without the column refuses loudly") {
    val indexDir = tmpDir("fam-nobucket-idx")
    Similarity.buildIvfIndex(frame(0 until 6), indexDir, nlist = 4)
    val famsPlain = Seq((0L, 0L)).toDF("vec_id", "family")
    val ex = intercept[IllegalArgumentException](
      Similarity.assignFamiliesBatch(spark, indexDir, famsPlain,
        frame(6 until 8), k = 3, nprobe = 4, minCos = 0.5, familyBuckets = 8))
    assert(ex.getMessage.contains("fam_bucket"), ex.getMessage)
  }

  test("guards: unseeded store refuses at start; NULL embeddings refuse per batch") {
    val indexDir = tmpDir("fam-guard-idx")
    val famDir = tmpDir("fam-guard-store")
    Similarity.buildIvfIndex(frame(0 until 6), indexDir, nlist = 4)
    val ms = MemoryStream[(Long, Int, Seq[Float])](spark)(
      org.apache.spark.sql.Encoders.product[(Long, Int, Seq[Float])])
    val exStart = intercept[IllegalArgumentException](
      Jobs.startFamilyAssign(ms.toDF().toDF("vec_id", "label", "embedding"),
        indexDir, famDir, tmpDir("fam-guard-ckpt"), k = 3, nprobe = 4))
    assert(exStart.getMessage.contains("seed"), exStart.getMessage)
    Jobs.seedFamilyStore(frame(0 until 6), indexDir, famDir, nlist = 4)
    val bad = Seq(
      (100L, 0, Option(vec(0, 9))),
      (101L, 1, Option.empty[Seq[Float]])
    ).toDF("vec_id", "label", "embedding")
    val exNull = intercept[IllegalArgumentException](
      Jobs.familyAssignBatch(indexDir, famDir, 3, 4, 0.5, 16)(bad, 0L))
    assert(exNull.getMessage.contains("NULL"), exNull.getMessage)
  }
}
