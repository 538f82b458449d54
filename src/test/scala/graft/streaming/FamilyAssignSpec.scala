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
