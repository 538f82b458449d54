package graft

import org.apache.spark.sql.functions._

import graft.functions.{CellMatrix, OffPlanKernels, QuantMatrix}
import graft.ops.Similarity

/** The broadcast-backed (off-plan) ANN kernels — r21's plan-payload
  * fix — must be BIT-EQUAL to the literal kernels they replace on every
  * input, including slice spill and tie-breaks, and their plans must
  * not carry the matrix. The literal kernels stay registered (committed
  * fixed-size tables still use them) and stay pinned by
  * GraftProperties; this suite pins the two transports against each
  * other so they can never drift.
  */
class OffPlanKernelSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  private def bc(cents: Array[Array[Double]]) =
    spark.sparkContext.broadcast(CellMatrix(cents))

  private def bq(q: Similarity.TwoLevelQuantizer) =
    spark.sparkContext.broadcast(QuantMatrix(
      CellMatrix(q.topCents), CellMatrix(q.subCents), q.offsets, q.counts))

  // a deliberately lopsided fitted hierarchy: top cell 0 owns a 1-cell
  // slice (forces the undersized-slice spill at any nprobe >= 2), top
  // cell 1 owns 3 cells; a distinctive magic value marks the matrix so
  // plan-payload assertions can grep for it
  private val magic = 987.654321d
  private def lopsided = Similarity.TwoLevelQuantizer(
    topCents = Array(Array.fill(4)(magic), Array.fill(4)(-5.0)),
    subCents = Array(
      Array.fill(4)(magic),
      Array.fill(4)(-5.0), Array.fill(4)(-4.0), Array.fill(4)(-6.0)),
    offsets = Array(0, 1),
    counts = Array(1, 3))

  // vectors steered so BOTH top cells win for some rows: ids 1-3 land
  // in top cell 0 (1-wide slice -> the spill arm at nprobe 2), ids 4-9
  // in top cell 1 (3-wide slice -> the pure two-probe arm)
  private def steered = {
    import spark.implicits._
    (1 to 9).map { i =>
      val base = if (i <= 3) magic + i * 0.25 else -5.0 - (i - 6) * 0.3
      (i.toLong, Array.fill(4)(base.toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("off-plan nearest cell/cells equal the literal kernels on the fixture") {
    val cents = Array.tabulate(12)(i => Array.tabulate(64)(d =>
      math.sin(i * 64 + d) * 2.0))
    val centsLit = typedLit(cents.map(_.toSeq).toSeq)
    val h = bc(cents)
    val viaLit = emb.select(col("vec_id"),
        call_function("graft_nearest_cell", col("embedding"), centsLit,
          lit(0), lit(cents.length)).as("cell"),
        call_function("graft_nearest_cells", col("embedding"), centsLit,
          lit(0), lit(cents.length), lit(5)).as("cells"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSeq
    val viaBc = emb.select(col("vec_id"),
        OffPlanKernels.nearestCell(col("embedding"), h).as("cell"),
        OffPlanKernels.nearestCells(col("embedding"), h, 5).as("cells"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSeq
    assert(viaBc == viaLit)
  }

  test("off-plan two-level cell/cells equal the composed literal spelling, spill included") {
    val q = lopsided
    val h = bq(q)
    val df = steered
    val topLit = typedLit(q.topCents.map(_.toSeq).toSeq)
    val subLit = typedLit(q.subCents.map(_.toSeq).toSeq)
    val offLit = typedLit(q.offsets.toSeq)
    val cntLit = typedLit(q.counts.toSeq)
    val nprobe = 2 // > counts(0), so top-cell-0 rows exercise the spill arm
    // the pre-r21 literal spelling, verbatim: top argmin, slice argmin,
    // and the per-row undersized-slice CASE
    val sliceRank = call_function("graft_nearest_cells",
      col("embedding"), subLit,
      element_at(offLit, col("top_cell") + 1),
      element_at(cntLit, col("top_cell") + 1), lit(nprobe))
    val viaLit = df.withColumn("top_cell",
        call_function("graft_nearest_cell", col("embedding"), topLit,
          lit(0), lit(q.topCents.length)))
      .select(col("vec_id"), col("top_cell"),
        call_function("graft_nearest_cell", col("embedding"), subLit,
          element_at(offLit, col("top_cell") + 1),
          element_at(cntLit, col("top_cell") + 1)).as("cell"),
        when(element_at(cntLit, col("top_cell") + 1) >= nprobe, sliceRank)
          .otherwise(call_function("graft_nearest_cells", col("embedding"),
            subLit, lit(0), lit(q.subCents.length), lit(nprobe))).as("cells"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getSeq[Int](3))).toSeq
    val viaBc = df.select(col("vec_id"),
        OffPlanKernels.twoLevelCell(col("embedding"), h).as("cell"),
        OffPlanKernels.twoLevelCells(col("embedding"), h, nprobe).as("cells"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSeq
    assert(viaBc == viaLit.map(r => (r._1, r._3, r._4)))
    // both arms actually ran: the fixture steers rows into BOTH top
    // cells, so the 1-wide slice spilled (2 probes despite a 1-cell
    // slice) and the 3-wide slice stayed confined to [1, 4)
    val byTop = viaLit.groupBy(_._2)
    assert(byTop.keySet == Set(0, 1), s"fixture steering broke: ${byTop.keySet}")
    assert(byTop(0).forall(_._4.length == nprobe),
      "undersized slice silently truncated the probe budget")
    assert(byTop(1).forall(_._4.forall(c => c >= 1 && c <= 3)),
      "covered slice leaked probes outside its own cells")
  }

  test("null vectors yield null, not a cell") {
    import spark.implicits._
    val h = bc(Array(Array(1.0, 0.0), Array(0.0, 1.0)))
    val rows = Seq((1L, Some(Array(1.0f, 0.0f))), (2L, None))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"),
        OffPlanKernels.nearestCell(col("embedding"), h).as("cell"),
        OffPlanKernels.nearestCells(col("embedding"), h, 2).as("cells"))
      .collect()
    assert(rows.find(_.getLong(0) == 1L).exists(r => !r.isNullAt(1)))
    assert(rows.find(_.getLong(0) == 2L).exists(r => r.isNullAt(1) && r.isNullAt(2)))
  }

  test("the matrix payload stays OFF the plan (and off explain) in both transports' consumers") {
    val q = lopsided
    // literal spelling: the magic centroid value IS in the plan text
    val litPlan = emb.select(call_function("graft_nearest_cell",
        col("embedding"), typedLit(q.subCents.map(_.toSeq).toSeq),
        lit(0), lit(q.subCents.length)))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
    assert(litPlan.contains("987.654321"),
      "sanity: the literal transport should show the matrix in-plan")
    // off-plan spelling: same matrix, absent from the plan text
    val bcPlan = emb.select(
        OffPlanKernels.twoLevelCell(col("embedding"), bq(q)))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
    assert(!bcPlan.contains("987.654321"),
      s"off-plan kernel leaked the matrix into the plan:\n$bcPlan")
    // and the REGISTERED fitted paths ride the off-plan transport: a
    // two-level index's assignment plan must not embed its sub matrix
    val dir = tmpDir("offplan-fitted")
    Similarity.buildIvfIndex(emb, dir, nlist = 40)
    val cents = spark.read.parquet(s"$dir/centroids")
      .orderBy("list_id").collect().map(_.getSeq[Double](1))
    val needle = cents.head.head.toString.take(12)
    val queries = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val knnPlan = Similarity.knnJoinIvf(spark, dir, queries, k = 3, nprobe = 4)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
    assert(!knnPlan.contains(needle),
      s"fitted knn join still carries centroid values in-plan (needle $needle)")
  }

  test("repeated probe calls against one index reuse ONE broadcast (no per-plan re-ship)") {
    val dir = tmpDir("offplan-reuse")
    Similarity.buildIvfIndex(emb, dir, nlist = 40)
    val queries = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def bcastIds(): Set[Long] = {
      import scala.jdk.CollectionConverters._
      Similarity.quantBcastCache.values.asScala.map(_.id).toSet ++
        Similarity.matBcastCache.values.asScala.map(_.id).toSet
    }
    Similarity.knnJoinIvf(spark, dir, queries, k = 3, nprobe = 4).count()
    val after1 = bcastIds()
    Similarity.knnJoinIvf(spark, dir, queries, k = 3, nprobe = 4).count()
    Similarity.knnJoinIvf(spark, dir, queries, k = 3, nprobe = 4).count()
    assert(bcastIds() == after1,
      "a second probe of the same index minted a new broadcast — " +
        "the micro-batch amortization is broken")
  }
}
