package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Similarity search — exact cosine math, ANN recall vs brute force,
  * near-dup pair integrity. Runs on the sf0.001 embeddings fixture
  * (500 × 64-dim float vectors).
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("cosine of a vector with itself is 1; orthogonal vectors give 0") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f), Array(0.0f, 2.0f)),
      (3L, Array(3.0f, 4.0f), Array(3.0f, 4.0f))
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), round(Similarity.cosine("a", "b"), 9).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(1L -> 1.0, 2L -> 0.0, 3L -> 1.0))
  }

  test("brute-force top-k is ordered desc with vec_id tiebreak and excludes the query vector") {
    val top = Similarity.bruteForceTopK(emb, queryVecId = 0L, k = 20).collect()
    assert(top.length == 20)
    assert(!top.exists(_.getLong(0) == 0L))
    val sims = top.map(r => (r.getDouble(2), r.getLong(0)))
    assert(sims.sortBy { case (c, id) => (-c, id) }.toSeq == sims.toSeq)
  }

  test("ann top-k cosines are exact (every reported value matches brute force)") {
    val bf = Similarity.bruteForceTopK(emb, k = 499)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val ann = Similarity.annTopK(emb, k = 20).collect()
    assert(ann.nonEmpty)
    ann.foreach(r => assert(bf(r.getLong(0)) == r.getDouble(2),
      s"vec ${r.getLong(0)}: ann ${r.getDouble(2)} vs exact ${bf(r.getLong(0))}"))
  }

  test("ann recall@20 vs brute force is adequate for the table/bit config") {
    val bfTop = Similarity.bruteForceTopK(emb, k = 20).collect().map(_.getLong(0)).toSet
    val annTop = Similarity.annTopK(emb, k = 20).collect().map(_.getLong(0)).toSet
    val recall = (bfTop intersect annTop).size.toDouble / bfTop.size
    assert(recall >= 0.25, s"recall@20 = $recall — LSH config degraded")
  }

  test("recall audit: fullprobe methods report exactly 1.0 at every k; production floors hold") {
    // The audit machinery must MEASURE, not assume: fullprobe inputs
    // give the all-ones surface through a real overlap join...
    val audit = Similarity.annRecallAudit(
      Similarity.bruteForceTopK(emb),
      Seq(
        "ivf_fullprobe" -> Similarity.annIvfTopK(emb, nlist = 16, nprobe = 16),
        "lsh_fullprobe" -> Similarity.annTopKFullProbe(emb)),
      Seq(1, 5, 10, 20)).collect()
    assert(audit.length == 8)
    audit.foreach { r =>
      assert(r.getLong(2) == r.getInt(1).toLong, s"$r: n_hits != k")
      assert(r.getDouble(3) == 1.0, s"$r: fullprobe recall != 1")
    }
    // ...and lossy inputs give genuinely lossy numbers in [0, 1] with
    // the established floor at k=20 (0.25 — the LSH-config pin above)
    val prod = Similarity.annRecallAudit(
      Similarity.bruteForceTopK(emb),
      Seq("ivf" -> Similarity.annIvfTopK(emb), "lsh" -> Similarity.annTopK(emb)),
      Seq(1, 5, 10, 20)).collect()
    assert(prod.length == 8)
    prod.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, s"$r out of range")
      assert(r.getLong(2) <= r.getInt(1).toLong, s"$r: hits exceed k")
    }
    prod.filter(r => r.getInt(1) == 20)
      .foreach(r => assert(r.getDouble(3) >= 0.25, s"$r below recall floor"))
    // a method whose ANN frame overlaps nothing still reports (as 0)
    val none = Similarity.annRecallAudit(
      Similarity.bruteForceTopK(emb),
      Seq("empty" -> Similarity.bruteForceTopK(emb).filter(col("vec_id") < 0)),
      Seq(1, 5)).collect()
    assert(none.map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      == Set(("empty", 1, 0L, 0.0), ("empty", 5, 0L, 0.0)))
  }

  test("near-dup pairs: all pairs verified >= threshold, no self/dup pairs, found the top pair") {
    val pairs = Similarity.cosineNearDupPairs(emb, threshold = 0.45).collect()
    assert(pairs.forall(_.getDouble(2) >= 0.45))
    val ids = pairs.map(r => (r.getLong(0), r.getLong(1)))
    assert(ids.forall { case (a, b) => a < b })
    assert(ids.distinct.length == ids.length)
  }

  test("ivf ann: exact cosines on the probed slice; candidates bounded by probed cells") {
    val bf = Similarity.bruteForceTopK(emb, k = 499)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val ivf = Similarity.annIvfTopK(emb, k = 20, nlist = 8, nprobe = 2).collect()
    assert(ivf.nonEmpty && ivf.length <= 20)
    ivf.foreach(r => assert(bf(r.getLong(0)) == r.getDouble(2)))
    // probing every cell must recover the exact brute-force top-k
    val full = Similarity.annIvfTopK(emb, k = 20, nlist = 8, nprobe = 8)
      .collect().map(_.getLong(0)).toSeq
    val bfTop = Similarity.bruteForceTopK(emb, k = 20).collect().map(_.getLong(0)).toSeq
    assert(full == bfTop)
  }

  test("persisted ivf index: pruned query matches the inline path; unprobed cells never read") {
    val dir = tmpDir("ivf-index")
    Similarity.buildIvfIndex(emb, dir, nlist = 8)
    assert(spark.read.parquet(s"$dir/centroids").count() == 8)
    val q = emb.filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble).toArray
    val persisted = Similarity.queryIvfIndex(spark, dir, q, k = 20, nprobe = 2, excludeVecId = 0L)
    // Partition pruning: the probed list_ids are partition filters on the scan.
    val plan = persisted.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("list_id"),
      s"no partition pruning in plan:\n$plan")
    // Same quantizer (shared seed-pinned fit) → same probes → same top-k
    // as the inline path.
    val inline = Similarity.annIvfTopK(emb, k = 20, nlist = 8, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(persisted.collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq == inline)
    // Cosines are exact (match brute force values).
    val bf = Similarity.bruteForceTopK(emb, k = 499)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    persisted.collect().foreach(r => assert(bf(r.getLong(0)) == r.getDouble(2)))
  }

  test("persisted ivf index above the two-level threshold: fullprobe equals brute force exactly") {
    // the build routes through the TWO-LEVEL quantizer above 32 cells;
    // exhaustive probe must still equal brute force no matter what
    // cells the hierarchy produced — the sim_ann_ivf_fullprobe trick,
    // which hash-verifies the assign/store/probe plumbing for the
    // scale path the registered nlist=16 rows never exercise
    val dir = tmpDir("ivf-index-2l")
    Similarity.buildIvfIndex(emb, dir, nlist = 40)
    val nCells = spark.read.parquet(s"$dir/centroids").count().toInt
    assert(nCells > Similarity.twoLevelThreshold && nCells <= 40)
    // every stored row carries a valid cell of the written table
    val cellIds = spark.read.parquet(s"$dir/centroids")
      .select("list_id").collect().map(_.getInt(0)).toSet
    val assignedCells = spark.read.parquet(s"$dir/assigned")
      .select("list_id").distinct().collect().map(_.getInt(0)).toSet
    assert(assignedCells.subsetOf(cellIds))
    assert(spark.read.parquet(s"$dir/assigned").count() == emb.count())
    val q = emb.filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble).toArray
    val full = Similarity
      .queryIvfIndex(spark, dir, q, k = 20, nprobe = nCells, excludeVecId = 0L)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val bf = Similarity.bruteForceTopK(emb, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(full == bf, "two-level fullprobe diverged from brute force")
  }

  test("batched knn join: exact scores, rank dominance vs fullprobe, knn-graph over the whole corpus") {
    val dir = tmpDir("knn-index")
    Similarity.buildIvfIndex(emb, dir, nlist = 8)
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val bf = emb.select("vec_id").collect().map(_.getLong(0)).map { q =>
      q -> Similarity.bruteForceTopK(emb, q, k = 499)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    }.toMap
    // production probe: k rows per query, every cosine EXACT (raw
    // embeddings scored through the shared kernel — an ANN probe may
    // miss neighbors, it must never mis-score one)
    val prod = Similarity.knnJoinIvf(spark, dir, queries, k = 10, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(prod.groupBy(_._1).forall(_._2.length == 10))
    prod.foreach { case (q, v, c) => assert(bf(q.toLong)(v) == c, s"q$q v$v") }
    // rank dominance: at each rank, fullprobe's score >= the pruned
    // probe's (more candidates can only improve a rank's best)
    val full = Similarity.knnJoinIvf(spark, dir, queries, k = 10, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val prodRanks = prod.groupBy(_._1).view.mapValues(_.map(_._3).sortBy(-_)).toMap
    full.groupBy(_._1).foreach { case (q, rows) =>
      rows.map(_._3).sortBy(-_).zip(prodRanks(q)).foreach { case (f, p) =>
        assert(f >= p, s"query $q: fullprobe $f < pruned $p at same rank")
      }
    }
    // and fullprobe IS per-query brute force (the oracle's claim, here
    // against the independently computed map)
    full.groupBy(_._1).foreach { case (q, rows) =>
      val expect = bf(q.toLong).toSeq.sortBy { case (v, c) => (-c, v) }.take(10)
        .map { case (v, c) => (q, v, c) }.toSet
      assert(rows.toSet == expect, s"query $q fullprobe != brute force")
    }
    // knn-graph shape: the corpus queries ITSELF — one plan, 500×k rows
    val graph = Similarity.knnJoinIvf(spark, dir,
      emb.select(col("vec_id").as("query_id"), col("embedding")),
      k = 5, nprobe = 8)
    assert(graph.count() == emb.count() * 5)
  }

  test("batched ADC knn join: bit-equals the single-query LUT path, packed parity, residual detection") {
    val q0 = emb.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"), col("embedding"))
    // RAW-codes index: the batched kernel's (dp, nn) fold must produce
    // the LUT probe's exact doubles — same top-k, same rounded cosines
    val dir = tmpDir("knnpq-index")
    Similarity.buildIvfPqIndex(emb, dir, nlist = 8)
    val q0raw = emb.filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble).toArray
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .orderBy(col("cos_pq").desc, col("vec_id"))
      .select("vec_id", "cos_pq")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val lut = rows(Similarity.queryIvfPq(spark, dir, q0raw, k = 20,
      nprobe = 8, excludeVecId = 0L))
    val batched = rows(Similarity.knnJoinIvfPq(spark, dir, q0, k = 20, nprobe = 8))
    assert(batched == lut, "batched ADC diverged from the LUT probe")
    // the 4-byte at-rest form scores identically
    val packed = rows(Similarity.knnJoinIvfPq(spark, dir, q0, k = 20,
      nprobe = 8, packed = true))
    assert(packed == lut, "packed batched ADC diverged")
    // RESIDUAL index: detected from the marker, cell centroid folded
    // into every reconstruction — again bit-equal to the LUT path
    val rdir = tmpDir("knnpq-res-index")
    Similarity.buildIvfPqResidualDomainIndex(emb, rdir)
    val nCells = Similarity.domainCentroids.length
    val lutRes = rows(Similarity.queryIvfPq(spark, rdir, q0raw, k = 20,
      nprobe = nCells, excludeVecId = 0L))
    val batchedRes = rows(Similarity.knnJoinIvfPq(spark, rdir, q0, k = 20,
      nprobe = nCells))
    assert(batchedRes == lutRes, "batched residual ADC diverged from the LUT probe")
    // a whole query table in one plan: k rows per query, pruned probe
    // scores are a subset quality-wise (rank dominance vs fullprobe)
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val prod = Similarity.knnJoinIvfPq(spark, dir, queries, k = 10, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(prod.groupBy(_._1).forall(_._2.length == 10))
    val full = Similarity.knnJoinIvfPq(spark, dir, queries, k = 10, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    val prodRanks = prod.groupBy(_._1).view.mapValues(_.map(_._2).sortBy(-_)).toMap
    full.groupBy(_._1).foreach { case (q, rs) =>
      rs.map(_._2).sortBy(-_).zip(prodRanks(q)).foreach { case (f, p) =>
        assert(f >= p, s"query $q: fullprobe $f < pruned $p at same rank")
      }
    }
    // a wrong-dim query must fail LOUDLY, never silently mis-score
    val badQ = Seq((99L, Array(1.0f, 2.0f))).toDF("query_id", "embedding")
    val ex = intercept[Exception](
      Similarity.knnJoinIvfPq(spark, dir, badQ, k = 3, nprobe = 8).collect())
    assert(ex.getMessage != null)
    // batched two-stage refine: single-query batched rerank bit-equals
    // queryIvfPq's refine stage (exact cos_sim values, same order)
    def rrRows(df: org.apache.spark.sql.DataFrame) = df
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .select("vec_id", "cos_sim")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val lutRr = rrRows(Similarity.queryIvfPq(spark, dir, q0raw, k = 20,
      nprobe = 8, excludeVecId = 0L, rerank = 40))
    val batchedRr = rrRows(Similarity.knnJoinIvfPq(spark, dir, q0, k = 20,
      nprobe = 8, rerank = 40))
    assert(batchedRr == lutRr, "batched refine diverged from the LUT refine")
    // refusals: a shortlist smaller than k, and a codes-only index
    val exRr = intercept[IllegalArgumentException](
      Similarity.knnJoinIvfPq(spark, dir, q0, k = 10, nprobe = 8, rerank = 5))
    assert(exRr.getMessage.contains("rerank"), exRr.getMessage)
    val codesOnly = tmpDir("knnpq-codesonly")
    Similarity.buildIvfPqIndex(emb, codesOnly, nlist = 8, rawSidecar = false)
    val exSidecar = intercept[IllegalArgumentException](
      Similarity.knnJoinIvfPq(spark, codesOnly, q0, k = 10, nprobe = 8, rerank = 40))
    assert(exSidecar.getMessage.contains("codes-only"), exSidecar.getMessage)
  }

  // ------------------------------------------------------------- ivf-pq

  test("pq codes are valid and survive the store roundtrip") {
    import graft.functions.Pq
    val dir = tmpDir("ivfpq-index")
    Similarity.buildIvfPqIndex(emb, dir, nlist = 8)
    val stored = spark.read.parquet(s"$dir/assigned_pq")
      .select("vec_id", "codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(stored.size == 500)
    stored.values.foreach { codes =>
      assert(codes.length == Pq.M)
      assert(codes.forall(c => c >= 0 && c < Pq.K))
    }
    // store codes == direct expression output (the write/read roundtrip
    // changed nothing)
    val direct = emb.select(col("vec_id"),
        call_function("graft_pq_encode", col("embedding"), lit(Pq.codebookSpec)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(stored === direct)
  }

  test("pq adc scores match driver-side reconstruction cosine (lut grouping)") {
    import graft.functions.Pq
    val dir = tmpDir("ivfpq-adc")
    Similarity.buildIvfPqIndex(emb, dir, nlist = 8)
    val q = emb.filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble).toArray
    val got = Similarity.queryIvfPq(spark, dir, q, k = 499, nprobe = 8, excludeVecId = 0L)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.size == 499)
    // independent driver-side replay: encode, look up centroids, score
    // with the same per-subspace-then-across grouping
    val coder = new Pq.Coder(Pq.codebookSpec)
    val (dotLut, nrmLut) = coder.luts(q)
    val qn = math.sqrt(q.map(x => x * x).sum)
    val codes = emb.filter(col("vec_id") =!= 0L)
      .select(col("vec_id"),
        call_function("graft_pq_encode", col("embedding"), lit(Pq.codebookSpec)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    codes.foreach { case (v, cs) =>
      var dp = 0.0
      var nn = 0.0
      cs.zipWithIndex.foreach { case (c, m) => dp += dotLut(m * Pq.K + c); nn += nrmLut(m * Pq.K + c) }
      val expect = math.rint(dp / (qn * math.sqrt(nn)) * 1e6) / 1e6
      assert(math.abs(got(v) - expect) <= 2e-6, s"vec $v: ${got(v)} vs $expect")
    }
  }

  test("pq quality floors: score error, recall@20, reconstruction mse") {
    import graft.functions.Pq
    val dir = tmpDir("ivfpq-quality")
    Similarity.buildIvfPqIndex(emb, dir, nlist = 8)
    val q = emb.filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble).toArray
    val pq = Similarity.queryIvfPq(spark, dir, q, k = 499, nprobe = 8, excludeVecId = 0L)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val exact = Similarity.bruteForceTopK(emb, k = 499)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // 4-bit codes on a near-random fixture: the PQ score is a NOISY
    // estimate — pin the measured error envelope (deterministic: fixed
    // codebook, fullprobe) with headroom
    val errs = exact.keys.toSeq.map(v => math.abs(pq(v) - exact(v)))
    assert(errs.sum / errs.size <= 0.12, s"mean |cos_pq - cos| ${errs.sum / errs.size}")
    assert(errs.max <= 0.45, s"max |cos_pq - cos| ${errs.max}")
    // recall@20 of the full-probe ADC ranking vs the exact top-20
    val top20 = (m: Map[Long, Double]) =>
      m.toSeq.sortBy { case (v, c) => (-c, v) }.take(20).map(_._1).toSet
    val recall = (top20(pq) & top20(exact)).size / 20.0
    assert(recall >= 0.3, s"fullprobe recall@20 $recall")
    // reconstruction MSE: small relative to unit-ish vector norms, and
    // the registered row's values match a direct coder replay
    val mseRows = Similarity.pqReconMseQuery.fn(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(mseRows.length == 500)
    val meanMse = mseRows.map(_._2).sum / mseRows.length
    assert(meanMse > 0 && meanMse <= 0.02, s"mean recon mse $meanMse")
  }

  test("ivf-pq exact re-rank: two-stage replay, exact scores, recall lift") {
    val dir = tmpDir("ivfpq-rerank")
    Similarity.buildIvfPqIndex(emb, dir, nlist = 8)
    val q = emb.filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble).toArray
    val bf = Similarity.bruteForceTopK(emb, k = 499)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // fullprobe two-stage == driver replay: ADC-rank everything, cut to
    // the 80 best by (rounded score desc, vec_id), exact-rank the pool
    val adcFull = Similarity
      .queryIvfPq(spark, dir, q, k = 499, nprobe = 8, excludeVecId = 0L)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val pool = adcFull.sortBy { case (v, c) => (-c, v) }.take(80).map(_._1).toSet
    val expect = bf.filter { case (v, _) => pool(v) }.toSeq
      .sortBy { case (v, c) => (-c, v) }.take(20)
    val got = Similarity.queryIvfPq(spark, dir, q, k = 20, nprobe = 8,
        excludeVecId = 0L, rerank = 80)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(got == expect)
    // re-ranked scores are EXACT cosines (the raw sidecar roundtripped
    // bit-faithfully and the shared kernel scored it) — not estimates
    got.foreach { case (v, c) => assert(c == bf(v), s"vec $v: $c vs ${bf(v)}") }
    // recall lift at EQUAL nprobe: the refine stage can only help.
    // Three theorems made executable: ADC-top-20 is a 20-subset of the
    // ADC-top-80 pool, so exact-ranking the pool recovers at least as
    // many true-top-20 members; and no pool can beat the coarse-cell
    // ceiling (exact ranking of everything in the probed cells).
    val top20 = bf.toSeq.sortBy { case (v, c) => (-c, v) }.take(20).map(_._1).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double =
      (df.collect().map(_.getLong(0)).toSet & top20).size / 20.0
    val rPlain = recallOf(Similarity.queryIvfPq(spark, dir, q,
      k = 20, nprobe = 2, excludeVecId = 0L))
    val rRerank = recallOf(Similarity.queryIvfPq(spark, dir, q,
      k = 20, nprobe = 2, excludeVecId = 0L, rerank = 80))
    val rCeil = recallOf(Similarity.queryIvfPq(spark, dir, q,
      k = 20, nprobe = 2, excludeVecId = 0L, rerank = 499))
    assert(rPlain <= rRerank && rRerank <= rCeil,
      s"recall order violated: plain $rPlain, rerank $rRerank, ceiling $rCeil")
    // a codes-only index refuses re-rank LOUDLY (not a parquet path error)
    val bare = tmpDir("ivfpq-rerank-bare")
    Similarity.buildIvfPqIndex(emb, bare, nlist = 8, rawSidecar = false)
    val e = intercept[IllegalArgumentException](
      Similarity.queryIvfPq(spark, bare, q, k = 20, nprobe = 8, rerank = 80))
    assert(e.getMessage.contains("codes-only"), e.getMessage)
    // 0 < rerank < k would starve limit(k) from a pool smaller than k —
    // rejected up front, never a silent short result
    val eStarve = intercept[IllegalArgumentException](
      Similarity.queryIvfPq(spark, dir, q, k = 20, nprobe = 8, rerank = 5))
    assert(eStarve.getMessage.contains("rerank"), eStarve.getMessage)
    // codes-only REBUILD IN PLACE over a sidecar'd index must truncate
    // the stale raw store: its embeddings and cell assignments come
    // from the OLD quantizer fit, and every sidecar consumer detects it
    // purely by existence — left behind, re-rank would silently return
    // wrong rows filtered by the new probe cells
    Similarity.buildIvfPqIndex(emb, dir, nlist = 8, rawSidecar = false)
    val rawDir = new java.io.File(s"$dir/assigned_raw")
    assert(!rawDir.exists(), "stale assigned_raw sidecar survived a codes-only rebuild")
    val eBare = intercept[IllegalArgumentException](
      Similarity.queryIvfPq(spark, dir, q, k = 20, nprobe = 8, rerank = 80))
    assert(eBare.getMessage.contains("codes-only"), eBare.getMessage)
  }

  test("ivfadc residual index: per-cell adc replay, ingest parity, marker contracts, recon mechanism") {
    import graft.functions.Pq
    val dir = tmpDir("ivfadc")
    Similarity.buildIvfPqResidualDomainIndex(emb, dir)
    assert(Similarity.isResidualIndex(spark, dir))
    val q = emb.filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble).toArray
    val got = Similarity.queryIvfPq(spark, dir, q, k = 499,
        nprobe = Similarity.domainCentroids.length, excludeVecId = 0L)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.size == 499)
    // driver replay of the per-cell-LUT union: the stored codes (their
    // derivation hash-verified by the oracle row) scored through
    // lutsRecon must reproduce every cos_pq
    val coder = new Pq.Coder(Pq.residualCodebookSpec)
    val qn = math.sqrt(q.map(x => x * x).sum)
    val lutByCell = Similarity.domainCentroids.indices
      .map(c => c -> coder.lutsRecon(q, Similarity.domainCentroids(c))).toMap
    val stored = spark.read.parquet(s"$dir/assigned_pq")
      .filter(col("vec_id") =!= 0L)
      .select("vec_id", "codes", "list_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1), r.getInt(2)))
    assert(stored.length == 499)
    stored.foreach { case (v, cs, cell) =>
      val (dotLut, nrmLut) = lutByCell(cell)
      var dp = 0.0
      var nn = 0.0
      cs.zipWithIndex.foreach { case (c, m) =>
        dp += dotLut(m * Pq.K + c); nn += nrmLut(m * Pq.K + c)
      }
      val expect = math.rint(dp / (qn * math.sqrt(nn)) * 1e6) / 1e6
      assert(math.abs(got(v) - expect) <= 2e-6, s"vec $v: ${got(v)} vs $expect")
    }
    // ingest parity: an identical vector ingested later gets IDENTICAL
    // residual codes (detected residual-ness — a raw encode here would
    // silently corrupt the store) and the sidecar advances in step
    Similarity.assignToPqIndex(spark, dir,
      emb.filter(col("vec_id") === 0L).withColumn("vec_id", lit(9000L)), 1L)
    val byId = spark.read.parquet(s"$dir/assigned_pq")
      .filter(col("vec_id").isin(0L, 9000L))
      .select("vec_id", "codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(byId(9000L) === byId(0L), "ingest produced different residual codes")
    assert(!spark.read.parquet(s"$dir/assigned_raw")
      .filter(col("vec_id") === 9000L).isEmpty)
    // the exact re-rank path is untouched by residual codes (sidecar
    // holds raw floats): re-ranked scores are exact cosines
    val bf = Similarity.bruteForceTopK(emb, k = 499)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    Similarity.queryIvfPq(spark, dir, q, k = 20,
        nprobe = Similarity.domainCentroids.length, excludeVecId = 0L, rerank = 80)
      .collect().filter(_.getLong(0) != 9000L)
      .foreach(r => assert(r.getDouble(2) == bf(r.getLong(0))))
    // marker contracts: a fitted residual build stamps, a non-residual
    // rebuild over the same dir un-stamps (the stale-sidecar discipline)
    val dir2 = tmpDir("ivfadc-marker")
    Similarity.buildIvfPqIndex(emb, dir2, nlist = 8, residual = true)
    assert(Similarity.isResidualIndex(spark, dir2))
    Similarity.buildIvfPqIndex(emb, dir2, nlist = 8)
    assert(!Similarity.isResidualIndex(spark, dir2),
      "stale residual marker survived a raw rebuild")
    // the mechanism IVFADC buys (deterministic on the fixture): coding
    // x − c(x) against the residual codebook reconstructs strictly
    // better than coding x raw — recall-neutral HERE because the
    // fixture is near-isotropic (centroids near the origin), but the
    // error ordering is the structural property a clustered corpus
    // amplifies
    val centsLit = typedLit(Similarity.domainCentroids.map(_.toSeq).toSeq)
    val errs = emb
      .join(Similarity.assignDomains(emb).select("vec_id", "domain"), "vec_id")
      .select(
        call_function("graft_pq_recon_mse",
          col("embedding"), lit(Pq.codebookSpec)).as("raw"),
        call_function("graft_pq_recon_mse",
          zip_with(transform(col("embedding"), x => x.cast("double")),
            element_at(centsLit, col("domain") + 1), (a, b) => a - b),
          lit(Pq.residualCodebookSpec)).as("res"))
      .agg(avg(col("raw")).as("raw"), avg(col("res")).as("res")).head()
    assert(errs.getDouble(1) < errs.getDouble(0),
      s"residual recon ${errs.getDouble(1)} not < raw ${errs.getDouble(0)}")
  }

  test("pq pack/unpack: bit-exact roundtrip, pinned layout, loud errors") {
    import graft.functions.Pq
    import spark.implicits._
    val spec = lit(Pq.codebookSpec)
    // roundtrip over every fixture vector's real codes
    val rows = emb.select(
        call_function("graft_pq_encode", col("embedding"), spec).as("codes"))
      .select(col("codes"),
        call_function("graft_pq_unpack",
          call_function("graft_pq_pack", col("codes"), spec), spec).as("rt"))
      .collect()
    assert(rows.length == 500)
    rows.foreach(r => assert(r.getSeq[Int](0) === r.getSeq[Int](1)))
    // pinned layout: K=16 -> 4 bits/code, MSB-first. codes [1,2,3,4,5,6,7,8]
    // pack to 0x12 0x34 0x56 0x78
    val packed = Seq(Seq(1, 2, 3, 4, 5, 6, 7, 8)).toDF("c")
      .select(call_function("graft_pq_pack", col("c"), spec))
      .collect()(0).getAs[Array[Byte]](0)
    assert(packed.toSeq === Seq(0x12, 0x34, 0x56, 0x78).map(_.toByte))
    // loud errors: wrong arity, out-of-range code, wrong byte width
    def packOf(cs: Seq[Int]) = Seq(cs).toDF("c")
      .select(call_function("graft_pq_pack", col("c"), spec)).collect()
    assert(intercept[Exception](packOf(Seq(1, 2, 3))).getMessage != null)
    assert(intercept[Exception](packOf(Seq(0, 0, 0, 0, 0, 0, 0, 16))).getMessage != null)
    val badBytes = Seq(Array[Byte](1, 2, 3)).toDF("b")
    assert(intercept[Exception] {
      badBytes.select(call_function("graft_pq_unpack", col("b"), spec)).collect()
    }.getMessage != null)
  }

  test("pq pack/unpack roundtrips at non-committed widths (K=4/32/256)") {
    import graft.functions.Pq
    // a production table swap (different K -> different code width) must
    // keep the bit layout invertible; exercise 2-, 5- and 8-bit codes
    // with deterministic pseudo-random code arrays
    for (k <- Seq(4, 32, 256)) {
      val m = 8
      val dsub = 2
      val spec = s"$m $k $dsub " +
        (0 until m * k * dsub).map(i => ((i * 31 + 7) % 97) / 100.0).mkString(" ")
      val coder = new Pq.Coder(spec)
      val rnd = new scala.util.Random(42)
      for (_ <- 0 until 50) {
        val codes = Array.fill(m)(rnd.nextInt(k))
        val rt = coder.unpack(coder.pack(
          org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(codes)))
        assert((0 until m).forall(i => rt.getInt(i) == codes(i)),
          s"K=$k roundtrip mismatch for ${codes.toSeq}")
      }
      assert(coder.packedBytes == (m * coder.codeBits + 7) / 8)
    }
  }

  test("graft_pq_encode fails loudly on wrong dims and NULL elements") {
    import graft.functions.Pq
    import spark.implicits._
    val bad = Seq((1L, Seq.fill(32)(0.5f))).toDF("vec_id", "embedding")
    val e1 = intercept[Exception] {
      bad.select(call_function("graft_pq_encode", col("embedding"), lit(Pq.codebookSpec))).collect()
    }
    assert(e1.getMessage != null)
    val withNull = Seq((1L, Seq.tabulate(64)(i => if (i == 7) null else java.lang.Float.valueOf(0.5f))))
      .toDF("vec_id", "embedding")
    val e2 = intercept[Exception] {
      withNull.select(call_function("graft_pq_encode", col("embedding"), lit(Pq.codebookSpec))).collect()
    }
    assert(e2.getMessage != null)
    // malformed spec fails at analysis time
    val e3 = intercept[Exception] {
      emb.select(call_function("graft_pq_encode", col("embedding"), lit("2 2 2 1.0"))).collect()
    }
    assert(e3.getMessage.contains("graft_pq_encode"), e3.getMessage)
    // adc: malformed spec at analysis; code/LUT arity mismatch at runtime
    val e4 = intercept[Exception] {
      Seq(Seq(0, 1)).toDF("c")
        .select(call_function("graft_pq_adc", col("c"), lit("4 1.0 0.1 0.2"))).collect()
    }
    assert(e4.getMessage.contains("graft_pq_adc"), e4.getMessage)
    val okSpec = "2 1.0 " + (1 to 8).map(_ / 10.0).mkString(" ") // K=2, M=2
    val e5 = intercept[Exception] {
      Seq(Seq(0, 1, 0)).toDF("c")
        .select(call_function("graft_pq_adc", col("c"), lit(okSpec))).collect()
    }
    assert(e5.getMessage != null)
    val e6 = intercept[Exception] {
      Seq(Seq(0, 2)).toDF("c") // code 2 out of range for K=2
        .select(call_function("graft_pq_adc", col("c"), lit(okSpec))).collect()
    }
    assert(e6.getMessage != null)
  }

  test("corrupted centroid store fails loudly on load (NULL / mixed dims / dup list_id / empty)") {
    def writeCentroids(dir: String, rows: Seq[(Int, Seq[Double])]): Unit =
      rows.toDF("list_id", "centroid")
        .withColumn("centroid",
          when(size(col("centroid")) === 0, lit(null)).otherwise(col("centroid")))
        .write.mode("overwrite").parquet(s"$dir/centroids")
    val probe = Array(1.0, 0.0)

    val nullDir = tmpDir("ivf-bad-null")
    writeCentroids(nullDir, Seq(0 -> Seq(1.0, 0.0), 1 -> Seq.empty)) // empty -> NULL
    val eNull = intercept[IllegalArgumentException] {
      Similarity.queryIvfIndex(spark, nullDir, probe, k = 1, nprobe = 1)
    }
    assert(eNull.getMessage.contains("NULL centroid"), eNull.getMessage)

    val mixDir = tmpDir("ivf-bad-mix")
    writeCentroids(mixDir, Seq(0 -> Seq(1.0, 0.0), 1 -> Seq(0.0, 1.0, 0.0)))
    val eMix = intercept[IllegalArgumentException] {
      Similarity.queryIvfIndex(spark, mixDir, probe, k = 1, nprobe = 1)
    }
    assert(eMix.getMessage.contains("heterogeneous"), eMix.getMessage)

    val dupDir = tmpDir("ivf-bad-dup")
    writeCentroids(dupDir, Seq(0 -> Seq(1.0, 0.0), 0 -> Seq(0.0, 1.0)))
    val eDup = intercept[IllegalArgumentException] {
      Similarity.assignToIndex(spark, dupDir,
        Seq((7L, "x", Seq(1.0f, 0.0f))).toDF("vec_id", "label", "embedding"),
        ingestBatch = 1L)
    }
    assert(eDup.getMessage.contains("duplicate list_id"), eDup.getMessage)

    val emptyDir = tmpDir("ivf-bad-empty")
    writeCentroids(emptyDir, Seq(0 -> Seq(1.0, 0.0)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      spark.read.parquet(s"$emptyDir/centroids").schema)
      .write.mode("overwrite").parquet(s"$emptyDir/centroids")
    val eEmpty = intercept[IllegalArgumentException] {
      Similarity.queryIvfIndex(spark, emptyDir, probe, k = 1, nprobe = 1)
    }
    assert(eEmpty.getMessage.contains("empty"), eEmpty.getMessage)
  }

  test("incremental index ingest: appended vectors land in their nearest cell and are queryable") {
    val dir = tmpDir("ivf-incr")
    val seed = emb.filter(col("vec_id") < 400)
    val late = emb.filter(col("vec_id") >= 400)
    Similarity.buildIvfIndex(seed, dir, nlist = 8)
    Similarity.assignToIndex(spark, dir, late, ingestBatch = 1L)
    val assigned = spark.read.parquet(s"$dir/assigned")
    assert(assigned.count() == emb.count())
    assert(assigned.select("vec_id").distinct().count() == emb.count())
    // Appended rows sit in their argmin-L2 cell: recompute driver-side
    // for a handful and compare.
    val cents = spark.read.parquet(s"$dir/centroids").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    def sq(e: Array[Double], c: Array[Double]) =
      e.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
    val sample = assigned.filter(col("vec_id") >= 400).limit(20).collect()
    sample.foreach { r =>
      val e = r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray
      val got = r.getAs[Number]("list_id").intValue()
      val best = cents.minBy { case (_, c) => sq(e, c) }._1
      assert(got == best, s"vec ${r.getAs[Long]("vec_id")} in cell $got, nearest is $best")
    }
    // A full-probe query for an appended vector's embedding finds it at
    // cosine 1.0.
    val probe = late.select("vec_id", "embedding").head()
    val q = probe.getSeq[Float](1).map(_.toDouble).toArray
    val top = Similarity.queryIvfIndex(spark, dir, q, k = 1, nprobe = 8).head()
    assert(top.getLong(0) == probe.getLong(0) && top.getDouble(2) == 1.0)
  }

  test("incremental pq ingest: appended codes match direct encoding and are queryable") {
    import graft.functions.Pq
    val dir = tmpDir("ivfpq-incr")
    val seed = emb.filter(col("vec_id") < 400)
    val late = emb.filter(col("vec_id") >= 400)
    Similarity.buildIvfPqIndex(seed, dir, nlist = 8)
    Similarity.assignToPqIndex(spark, dir, late, ingestBatch = 1L)
    val assigned = spark.read.parquet(s"$dir/assigned_pq")
    assert(assigned.count() == emb.count())
    assert(assigned.select("vec_id").distinct().count() == emb.count())
    // appended rows carry the SAME codes the expression yields directly
    // (the ingest boundary dropped the embedding, nothing else changed)
    val lateCodes = assigned.filter(col("vec_id") >= 400)
      .select("vec_id", "codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val direct = late.select(col("vec_id"),
        call_function("graft_pq_encode", col("embedding"), lit(Pq.codebookSpec)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(lateCodes === direct)
    // an appended vector is findable through the ADC probe: its own
    // embedding as the query ranks it at ITS reconstruction's cosine —
    // top-1 among vectors sharing its codes (ties possible, so assert
    // membership of the code-equal score, not strict identity)
    val probe = late.select("vec_id", "embedding").head()
    val q = probe.getSeq[Float](1).map(_.toDouble).toArray
    val got = Similarity.queryIvfPq(spark, dir, q, k = 499, nprobe = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.contains(probe.getLong(0)))
  }

  test("streaming pq ingest: batches land under their own partitions; replay replaces") {
    import graft.functions.Pq
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val dir = tmpDir("ivfpq-stream")
    Similarity.buildIvfPqIndex(emb.filter(col("vec_id") < 400), dir, nlist = 8)
    val late = emb.filter(col("vec_id") >= 400)
      .select(col("vec_id"), col("label"), col("embedding"))
      .as[(Long, Int, Seq[Float])].collect()
    val (b1, b2) = late.splitAt(50)
    val ms = MemoryStream[(Long, Int, Seq[Float])](spark)(
      org.apache.spark.sql.Encoders.product[(Long, Int, Seq[Float])])
    val q = graft.streaming.Jobs.startPqIngestStream(
      ms.toDF().toDF("vec_id", "label", "embedding"),
      dir, tmpDir("ivfpq-stream-ckpt"), queryTrigger = Trigger.ProcessingTime(0))
    try {
      ms.addData(b1.toIndexedSeq); q.processAllAvailable()
      ms.addData(b2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    val assigned = spark.read.parquet(s"$dir/assigned_pq")
    assert(assigned.count() == 500)
    // build under ingest_batch 0, the two stream batches under 1 and 2
    assert(assigned.select("ingest_batch").distinct().as[Long].collect().toSet
      == Set(0L, 1L, 2L))
    // the packed store and the raw re-rank sidecar advanced in step
    assert(spark.read.parquet(s"$dir/assigned_pq_packed").count() == 500)
    assert(spark.read.parquet(s"$dir/assigned_raw").count() == 500)
    // REPLAY: re-run the LAST batch's body with the same ingest id (the
    // at-least-once case) — BOTH stores must be unchanged by CONTENT,
    // not just row count (a pack-path bug that scrambled bytes while
    // preserving counts must fail here)
    val before = assigned.select("vec_id", "codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    def packedSnapshot(): Map[Long, Seq[Byte]] =
      spark.read.parquet(s"$dir/assigned_pq_packed")
        .select("vec_id", "codes_packed").collect()
        .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val packedBefore = packedSnapshot()
    Similarity.assignToPqIndex(spark, dir,
      b2.toSeq.toDF("vec_id", "label", "embedding"), ingestBatch = 2L)
    val after = spark.read.parquet(s"$dir/assigned_pq")
      .select("vec_id", "codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(after === before)
    assert(packedSnapshot() === packedBefore)
    // CHECKPOINT-RESET GUARD: a second stream with a FRESH checkpoint
    // against the same ingested index would reuse ingest_batch=1 and
    // silently replace the first stream's vectors — it must fail
    // loudly instead
    val ms2 = MemoryStream[(Long, Int, Seq[Float])](spark)(
      org.apache.spark.sql.Encoders.product[(Long, Int, Seq[Float])])
    val q2 = graft.streaming.Jobs.startPqIngestStream(
      ms2.toDF().toDF("vec_id", "label", "embedding"),
      dir, tmpDir("ivfpq-stream-ckpt2"), queryTrigger = Trigger.ProcessingTime(0))
    try {
      ms2.addData(b1.take(5).toIndexedSeq)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      assert(e.getMessage.contains("fresh-checkpoint") ||
        Option(e.getCause).exists(_.getMessage.contains("fresh-checkpoint")),
        s"unexpected failure: ${e.getMessage}")
    } finally q2.stop()
    // the guarded index is intact
    assert(spark.read.parquet(s"$dir/assigned_pq").count() == 500)
    // streamed vectors are queryable through the pruned ADC probe
    val probe = b1.head
    def probeIds() = Similarity.queryIvfPq(spark, dir,
      probe._3.map(_.toDouble).toArray, k = 499, nprobe = 8)
      .collect().map(_.getLong(0)).toSet
    val got = probeIds()
    assert(got.contains(probe._1))

    // COMPACTION: fold the build (0) and first stream batch (1) into one
    // partition per cell, against the GLOBAL live id 2 — codes, packed
    // bytes, probe results, and the live batch's replayability all
    // survive untouched
    import graft.streaming.Jobs.CompactionOutcome
    val outcomes = graft.streaming.Jobs.compactPqIngestStore(spark, dir)
    assert(outcomes.keySet ==
      Set("assigned_pq", "assigned_pq_packed", "assigned_raw"))
    outcomes.values.flatten.foreach(o =>
      assert(!o.isInstanceOf[CompactionOutcome.RolledForward], s"got $o"))
    // at least the cells holding both batch-0 and batch-1 vectors merged
    assert(outcomes("assigned_pq").exists(_.isInstanceOf[CompactionOutcome.Compacted]))
    val postCodes = spark.read.parquet(s"$dir/assigned_pq")
    assert(postCodes.count() == 500)
    assert(postCodes.select("vec_id", "codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap === before)
    assert(packedSnapshot() === packedBefore)
    // no cell folded the live id: batch 2 (the 50 b2 vectors) is still
    // its own partition(s)
    assert(postCodes.filter(col("ingest_batch") === 2L).count() == b2.length)
    assert(probeIds() == got)
    // the live batch still replays idempotently after compaction
    Similarity.assignToPqIndex(spark, dir,
      b2.toSeq.toDF("vec_id", "label", "embedding"), ingestBatch = 2L)
    assert(spark.read.parquet(s"$dir/assigned_pq").count() == 500)
    assert(packedSnapshot() === packedBefore)
    // a second pass finds nothing left to merge
    assert(graft.streaming.Jobs.compactPqIngestStore(spark, dir)
      .values.flatten.forall(_ == CompactionOutcome.NothingToDo))
  }

  test("learned domains: committed-centroid argmin, exhaustive mixture, flattened rebalance") {
    // assignment equals an independent driver-side argmin over the
    // committed table ((e-c)^2 directly, not the relational expansion —
    // same winner because ties are broken on domain id and the fixture
    // has none at double precision)
    val cents = Similarity.domainCentroids
    val got = Similarity.assignDomains(emb).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def sq(a: Array[Double], c: Array[Double]) =
      a.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
    vecs.foreach { case (v, e) =>
      val best = cents.indices.minBy(k => (sq(e, cents(k)), k))
      assert(got(v) == best, s"vec $v: ${got(v)} vs $best")
    }
    // every vector lands in exactly one domain; the mixture conserves
    val mix = Similarity.domainMixtureQuery.fn(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(mix.map(_._2).sum == emb.count())
    assert(math.abs(mix.map(_._3).sum - 1.0) < 1e-4)
    // rebalance: per-domain quota respected, and the take FLATTENS the
    // mixture (alpha=0.5): the max/min domain share of the SAMPLE is
    // strictly closer to 1 than the corpus's
    val nBy = mix.map(m => m._1 -> m._2.toDouble).toMap
    val reb = Similarity.domainRebalanceQuery.fn(spark, "/root/testdata/sf0.001")
      .groupBy("domain").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1).toDouble).toMap
    reb.foreach { case (d, n) => assert(n <= nBy(d)) }
    def spread(m: Map[Int, Double]) = m.values.max / m.values.min
    assert(spread(reb) < spread(nBy),
      s"rebalance did not flatten: ${spread(reb)} vs ${spread(nBy)}")
  }

  test("semdedup: independent replay, tie keeps lowest id, eps monotone, stats conserve") {
    // full-pipeline replay in plain Scala: committed-centroid argmin
    // (the operator's exact ee - 2e·c + cc spelling), per-domain pairs,
    // round-6 cosine, keep-the-farther-from-centroid rule
    val cents = Similarity.domainCentroids
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def foldC(a: Array[Float], c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < c.length) { s += a(i).toDouble * c(i); i += 1 }; s
    }
    def dotF(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
    }
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val assign = vecs.map { case (v, e) =>
      val ee = dotF(e, e)
      v -> cents.indices.map { k =>
        val c = cents(k); var cc = 0.0; var i = 0
        while (i < c.length) { cc += c(i) * c(i); i += 1 }
        (ee - 2.0 * foldC(e, c) + cc, k)
      }.min
    }
    val nrm = vecs.map { case (v, e) => v -> math.sqrt(dotF(e, e)) }
    val ids = vecs.keys.toSeq.sorted
    def droppedAt(eps: Double): Set[Long] = {
      val out = scala.collection.mutable.Set[Long]()
      for { a <- ids; b <- ids if a < b && assign(a)._2 == assign(b)._2 } {
        val cs = round6(dotF(vecs(a), vecs(b)) / (nrm(a) * nrm(b)))
        if (cs >= eps) {
          val (da, db) = (assign(a)._1, assign(b)._1)
          out += (if (da > db) b else if (da < db) a else b)
        }
      }
      out.toSet
    }
    val expect = ids.toSet -- droppedAt(0.3)
    val got = Similarity.semDeDup(emb, eps = 0.3).collect().map(_.getLong(0)).toSet
    assert(got == expect, s"survivors ${got.size} vs replay ${expect.size}")
    assert(got.size < ids.size, "threshold dropped nothing — fixture degenerate")
    // stats row partitions the corpus and agrees with the survivor frame
    val stats = Similarity.semDeDupStatsQuery.fn(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(stats.map(_._2).sum == ids.size)
    assert(stats.map(_._3).sum == got.size)
    stats.foreach { case (d, n, k, dr) => assert(k + dr == n, s"domain $d") }
    // eps monotone: a higher threshold can only keep more
    val gotHi = Similarity.semDeDup(emb, eps = 0.45).collect().map(_.getLong(0)).toSet
    assert(got.subsetOf(gotHi))
    // planted EXACT duplicate of vec 0 under a higher id: same domain,
    // equal d2 -> the tie branch keeps the LOWER id, and an identical
    // twin never changes any other vector's verdict
    val dupId = 9000L
    val planted = emb.unionByName(
      emb.filter(col("vec_id") === 0L).withColumn("vec_id", lit(dupId)))
    val surv = Similarity.semDeDup(planted, eps = 0.3).collect().map(_.getLong(0)).toSet
    assert(!surv.contains(dupId), "planted duplicate with higher id survived the tie-break")
    assert((surv - dupId) == got, "identical twin changed another vector's verdict")
  }

  test("semdedup fitted: nlist=1 replays exactly as single-cell semdedup; twins collapse at any nlist") {
    // nlist=1 with fitFraction=1.0 pins the fit: k-means k=1 converges
    // to the corpus mean, a single cell makes EVERY pair visible, and
    // the keep-rule reduces to local d2-maxima of the full eps-graph —
    // all independently computable in plain Scala
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val ids = vecs.keys.toSeq.sorted
    val dim = vecs(ids.head).length
    val mean = Array.tabulate(dim)(i => ids.map(v => vecs(v)(i).toDouble).sum / ids.size)
    def dotF(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
    }
    def foldC(a: Array[Float], c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < c.length) { s += a(i).toDouble * c(i); i += 1 }; s
    }
    var cc = 0.0
    mean.foreach(x => cc += x * x)
    val d2 = vecs.map { case (v, e) => v -> (dotF(e, e) - 2.0 * foldC(e, mean) + cc) }
    val nrm = vecs.map { case (v, e) => v -> math.sqrt(dotF(e, e)) }
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dropped = scala.collection.mutable.Set[Long]()
    for { a <- ids; b <- ids if a < b } {
      val cs = round6(dotF(vecs(a), vecs(b)) / (nrm(a) * nrm(b)))
      if (cs >= 0.3)
        dropped += (if (d2(a) > d2(b)) b else if (d2(a) < d2(b)) a else b)
    }
    val expect = ids.toSet -- dropped
    val got = Similarity.semDeDupFitted(emb, nlist = 1, eps = 0.3, fitFraction = 1.0)
      .collect().map(_.getLong(0)).toSet
    assert(got == expect, s"survivors ${got.size} vs replay ${expect.size}")
    // at a production-shaped nlist, a planted exact twin still collapses
    // (identical vectors share a cell and d2 exactly; tie keeps lower id)
    // and an identical twin never changes another vector's verdict
    val base16 = Similarity.semDeDupFitted(emb, nlist = 16)
      .collect().map(_.getLong(0)).toSet
    val planted = emb.unionByName(
      emb.filter(col("vec_id") === 0L).withColumn("vec_id", lit(9000L)))
    val surv16 = Similarity.semDeDupFitted(planted, nlist = 16)
      .collect().map(_.getLong(0)).toSet
    assert(!surv16.contains(9000L), "planted twin with higher id survived")
    assert((surv16 - 9000L) == base16, "identical twin changed another verdict")
    // finer blocking sees FEWER pairs: the fitted row is the scale
    // path, never a stricter filter than the exhaustive single cell
    assert(base16.size >= expect.size,
      s"nlist=16 kept ${base16.size} < exhaustive ${expect.size}")
  }

  test("graft_nearest_cell matches the committed-table argmin; slices enforce bounds") {
    // same centroids, same data: the native kernel must pick the same
    // cell as the least(struct(d2, k)) committed argmin (lowest index
    // on ties in both spellings)
    val centsLit = typedLit(Similarity.domainCentroids.map(_.toSeq).toSeq)
    val viaExpr = emb.select(col("vec_id"),
        call_function("graft_nearest_cell", col("embedding"), centsLit,
          lit(0), lit(Similarity.domainCentroids.length)).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaStruct = Similarity.assignDomains(emb)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(viaExpr == viaStruct)
    // a sub-slice restricts the argmin to [start, start+len) and
    // returns the ABSOLUTE index
    val sliced = emb.limit(50).select(
        call_function("graft_nearest_cell", col("embedding"), centsLit,
          lit(3), lit(2)).as("cell"))
      .collect().map(_.getInt(0))
    assert(sliced.forall(c => c == 3 || c == 4))
    // out-of-range slices are a loud error, not a silent wrong argmin
    val ex = intercept[Exception] {
      emb.limit(1).select(call_function("graft_nearest_cell",
        col("embedding"), centsLit, lit(6), lit(5))).collect()
    }
    assert(ex.getMessage.contains("outside") ||
      ex.getCause != null && ex.getCause.getMessage.contains("outside"),
      s"got: ${ex.getMessage}")
  }

  test("fitted-index knn join ranks probes two-probe off the persisted quantizer") {
    // A build above twoLevelThreshold persists its hierarchy at
    // dir/quantizer; the batched join must (a) answer with EXACT
    // cosines, (b) at fullprobe equal brute force (ranking cannot
    // matter), (c) at pruned nprobe confine each query's probes to its
    // winning top cell's slice — the assignTwoLevel approximation,
    // which guarantees a query's own cell is always probed.
    val dir = tmpDir("knn-two-level")
    Similarity.buildIvfIndex(emb, dir, nlist = 40)
    val q = Similarity.readQuantizer(spark, s"$dir/quantizer")
    assert(q.subCents.length ==
      spark.read.parquet(s"$dir/centroids").count())
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val full = Similarity.knnJoinIvf(spark, dir, queries, k = 10, nprobe = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    queries.collect().map(_.getLong(0)).foreach { qid =>
      val bf = Similarity.bruteForceTopK(emb, qid, k = 10)
        .collect().map(r => (qid, r.getLong(0), r.getDouble(2))).toSet
      assert(full.filter(_._1 == qid).toSet == bf,
        s"fitted fullprobe != brute force for query $qid")
    }
    // pruned probes: k exact-scored rows per query, all candidates from
    // cells INSIDE the query's top slice
    val pruned = Similarity.knnJoinIvf(spark, dir, queries, k = 5, nprobe = 4)
    assert(pruned.collect().groupBy(_.getLong(0)).forall(_._2.length == 5))
    // a FLAT rebuild over the same dir must clear the stale hierarchy —
    // ranking under the old cell system against new-cell stores would
    // silently produce wrong candidate sets
    Similarity.buildIvfIndex(emb, dir, nlist = 8)
    assert(!new java.io.File(s"$dir/quantizer").exists(),
      "flat rebuild left a stale two-level quantizer behind")
    assert(Similarity.knnJoinIvf(spark, dir, queries, k = 5, nprobe = 2)
      .count() == 8 * 5)
    // and a hand-planted MISMATCHED quantizer is refused loudly
    val q2 = Similarity.fitQuantizerTwoLevel(emb, nlist = 36)
    Similarity.writeQuantizer(q2, s"$dir/quantizer", spark)
    val ex = intercept[IllegalArgumentException](
      Similarity.knnJoinIvf(spark, dir, queries, k = 5, nprobe = 2).collect())
    assert(ex.getMessage.contains("disagrees"), ex.getMessage)
  }

  test("rebuildIfUnhealthy: skew triggers a marker-guarded in-place rebuild; readers refuse mid-swap and mixed cells") {
    val dir = tmpDir("rebuild-idx")
    Similarity.buildIvfIndex(emb, dir, nlist = 8)
    val queries = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def fullprobe() = Similarity
      .knnJoinIvf(spark, dir, queries, k = 5, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    val before = fullprobe()
    // a healthy index is a no-op
    assert(!Similarity.rebuildIfUnhealthy(spark, dir, maxSkew = 7.9,
      maxDeadFrac = 0.5))
    assert(fullprobe() == before)
    // poison: pile every vector into cell 0 (skew 8, 7/8 cells dead) —
    // the stale-quantizer-under-drift signature, synthesized
    val poisoned = spark.read.parquet(s"$dir/assigned")
      .withColumn("list_id", lit(0))
    poisoned.write.mode("overwrite").partitionBy("list_id", "ingest_batch")
      .option("partitionOverwriteMode", "static").parquet(s"$dir/assigned.tmp")
    val fsP = new org.apache.hadoop.fs.Path(s"$dir/assigned")
    val fs = fsP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(fsP, true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$dir/assigned.tmp"), fsP)
    // mid-swap: the marker alone refuses EVERY reader, loudly
    val marker = new org.apache.hadoop.fs.Path(
      s"$dir/${Similarity.rebuildingMarkerName}")
    fs.create(marker, true).close()
    val exMid = intercept[IllegalArgumentException](fullprobe())
    assert(exMid.getMessage.contains("mid-rebuild"), exMid.getMessage)
    fs.delete(marker, false)
    // the skew triggers the rebuild; the refit re-seats every vector,
    // and at fullprobe (cells cannot matter) the answers are IDENTICAL
    // to the pre-poison graph — the swap changed the cell system, not
    // one served score
    assert(Similarity.rebuildIfUnhealthy(spark, dir, maxSkew = 7.9,
      maxDeadFrac = 0.5))
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/${Similarity.cellsDigestName}")), "rebuild lost the digest stamp")
    assert(!fs.exists(marker), "rebuild left the marker down")
    assert(fullprobe() == before, "rebuild changed fullprobe answers")
    // and the index is healthy again at the same thresholds
    assert(!Similarity.rebuildIfUnhealthy(spark, dir, maxSkew = 7.9,
      maxDeadFrac = 0.5))
    // mixed cell systems refuse: hand-copy ANOTHER index's centroid
    // table over this one — the digest stamp catches what the marker
    // cannot (no swap in progress, just a wrong table)
    val other = tmpDir("rebuild-other")
    Similarity.buildIvfIndex(emb.limit(200), other, nlist = 4)
    val centP = new org.apache.hadoop.fs.Path(s"$dir/centroids")
    fs.delete(centP, true)
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(s"$other/centroids"), fs, centP,
      false, spark.sparkContext.hadoopConfiguration)
    val exMix = intercept[IllegalArgumentException](fullprobe())
    assert(exMix.getMessage.contains("digest"), exMix.getMessage)
    // a codes-only PQ index cannot refit — refused loudly
    val co = tmpDir("rebuild-codesonly")
    Similarity.buildIvfPqIndex(emb, co, nlist = 8, rawSidecar = false)
    val exCo = intercept[IllegalArgumentException](
      Similarity.rebuildIndex(spark, co))
    assert(exCo.getMessage.contains("codes-only"), exCo.getMessage)
    // a PQ index WITH its sidecar rebuilds end to end (stores swapped
    // as one epoch, ADC answers still served)
    val pq = tmpDir("rebuild-pq")
    Similarity.buildIvfPqIndex(emb, pq, nlist = 8)
    val pqBefore = Similarity
      .knnJoinIvfPq(spark, pq, queries, k = 5, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    Similarity.rebuildIndex(spark, pq)
    val pqAfter = Similarity
      .knnJoinIvfPq(spark, pq, queries, k = 5, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    assert(pqAfter == pqBefore,
      "PQ rebuild changed fullprobe ADC answers (codes are a pure " +
        "function of the committed codebook; cells cannot matter)")
  }

  test("knn-graph families: mutual edges only, singletons label themselves, component-min family") {
    import spark.implicits._
    // 2-D unit vectors at chosen angles so top-1 edges are fully
    // determined: a(0°)↔b(5°) is MUTUAL; d(40°)'s top-1 is b but b's
    // is a (one-sided — must NOT merge d into the family); e(90°)'s
    // top-1 is d, also one-sided. Expected: {a,b} one family labeled
    // by the min id, d and e singletons labeling themselves.
    def v(deg: Double) = Seq(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val emb4 = Seq((0L, "a", v(0)), (1L, "b", v(5)),
      (2L, "d", v(40)), (3L, "e", v(90)))
      .toDF("vec_id", "label", "embedding")
    val dir = tmpDir("knn-fam-idx")
    Similarity.buildIvfIndex(emb4, dir, nlist = 2, fitFraction = 1.0)
    val fams = Similarity.knnGraphFamilies(spark, dir, emb4,
        k = 1, nprobe = 2, minCos = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(fams == Set((0L, 0L, 2L), (1L, 0L, 2L), (2L, 2L, 1L), (3L, 3L, 1L)),
      s"got $fams")
    // minCos gates the edge: above cos(5°) even the mutual pair splits
    val strict = Similarity.knnGraphFamilies(spark, dir, emb4,
        k = 1, nprobe = 2, minCos = 0.9999)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(strict == Set((0L, 0L, 1L), (1L, 1L, 1L), (2L, 2L, 1L), (3L, 3L, 1L)),
      s"got $strict")
  }

  test("rebuild swap crash rolls FORWARD: a committed staging completes, an uncommitted one is discarded") {
    val dir = tmpDir("rebuild-rollfwd")
    Similarity.buildIvfIndex(emb, dir, nlist = 8)
    val queries = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def fullprobe() = Similarity
      .knnJoinIvf(spark, dir, queries, k = 5, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    val before = fullprobe()
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    // simulate a swap that died mid-way: a COMPLETE staged epoch
    // (fresh build + tombstones for stores it did not produce +
    // _SWAP_READY), the live assigned store already deleted, the
    // rebuilding marker still down — the worst crash point
    Similarity.buildIvfIndex(emb, s"$dir/.rebuild", nlist = 8)
    Seq("quantizer", "assigned_raw", "assigned_pq", "assigned_pq_packed",
      "_graft_pq_residual").foreach(s =>
      fs.create(p(s"$dir/.rebuild/_DELETE_$s"), true).close())
    fs.create(p(s"$dir/.rebuild/_SWAP_READY"), true).close()
    fs.create(p(s"$dir/${Similarity.rebuildingMarkerName}"), true).close()
    assert(fs.delete(p(s"$dir/assigned"), true))
    // readers refuse while the marker is down
    val exMid = intercept[IllegalArgumentException](fullprobe())
    assert(exMid.getMessage.contains("mid-rebuild"), exMid.getMessage)
    // the recovery path the error message prescribes: rebuild again —
    // which must ROLL THE COMMITTED STAGING FORWARD (the staged copy is
    // the only complete one), never discard it and refit from the
    // half-deleted live stores
    Similarity.rebuildIndex(spark, dir)
    assert(!fs.exists(p(s"$dir/.rebuild")), "staging left behind")
    assert(!fs.exists(p(s"$dir/${Similarity.rebuildingMarkerName}")),
      "marker left down after a completed roll-forward")
    assert(fullprobe() == before, "roll-forward changed fullprobe answers")
    // an UNCOMMITTED staging (no _SWAP_READY — the build itself died)
    // is discarded and the rebuild refits: live stores were untouched
    fs.mkdirs(p(s"$dir/.rebuild/garbage"))
    Similarity.rebuildIndex(spark, dir)
    assert(!fs.exists(p(s"$dir/.rebuild")))
    assert(fullprobe() == before, "fresh rebuild changed fullprobe answers")
  }

  test("two-level quantizer: deterministic, full coverage, twins collapse at scale nlist") {
    val q = Similarity.fitQuantizerTwoLevel(emb, nlist = 40)
    // structure: offsets/counts tile the flat sub matrix exactly
    assert(q.counts.sum == q.subCents.length)
    assert(q.offsets.zip(q.counts).zip(q.offsets.drop(1))
      .forall { case ((o, c), o2) => o + c == o2 })
    assert(q.nlist <= 40 && q.nlist >= q.topCents.length)
    // deterministic: a refit is the same quantizer bit-for-bit
    val q2 = Similarity.fitQuantizerTwoLevel(emb, nlist = 40)
    assert(q.subCents.map(_.toSeq).toSeq == q2.subCents.map(_.toSeq).toSeq &&
      q.offsets.toSeq == q2.offsets.toSeq)
    // assignment: every vector lands in a valid absolute cell of its
    // winning top cell's slice, twice deterministically
    val a1 = Similarity.assignTwoLevel(emb, q)
      .select("vec_id", "list_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a1.values.forall(c => c >= 0 && c < q.nlist))
    assert(a1.size == emb.count())
    val a2 = Similarity.assignTwoLevel(emb, q)
      .select("vec_id", "list_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a1 == a2)
    // under a FIXED pre-fit table (the production shape — fit once,
    // dedup many corpora): a planted exact twin shares cell and d2 and
    // collapses (tie keeps lower id), never changing another verdict
    val base = Similarity.semDeDupWithQuantizer(emb, q)
      .collect().map(_.getLong(0)).toSet
    val planted = emb.unionByName(
      emb.filter(col("vec_id") === 0L).withColumn("vec_id", lit(9000L)))
    val surv = Similarity.semDeDupWithQuantizer(planted, q)
      .collect().map(_.getLong(0)).toSet
    assert(!surv.contains(9000L), "planted twin with higher id survived")
    assert((surv - 9000L) == base, "identical twin changed another verdict")
    // the self-fitting route at nlist > twoLevelThreshold runs the same
    // tail; finer blocking keeps >= the exhaustive single cell
    val routed = Similarity.semDeDupFitted(emb, nlist = 40)
      .collect().map(_.getLong(0)).toSet
    val exhaustive = Similarity.semDeDupFitted(emb, nlist = 1, fitFraction = 1.0)
      .collect().map(_.getLong(0)).toSet
    assert(routed.size >= exhaustive.size)
    assert(routed == base,
      "self-fit route disagrees with the same pre-fit quantizer's verdicts")
  }

  test("semdedup batch operators refuse unscoreable embeddings (the gate's contract)") {
    // a NULL embedding's cosine is NULL and a zero-norm's is 0/0 = NaN:
    // the >= eps verdict is engine-dependent (Spark codegen false,
    // DuckDB NaN-greatest true), so the batch operators must refuse
    // loudly instead of silently surviving-or-eliminating — and
    // seedSemDeDupStore inherits the guard, so a seeded gate store can
    // never start poisoned
    val nullRow = spark.range(1).select(lit(9100L).as("vec_id"),
      lit(null).cast("array<float>").as("embedding"), lit(0).as("label"))
    val e1 = intercept[IllegalArgumentException] {
      Similarity.semDeDup(emb.unionByName(nullRow))
    }
    assert(e1.getMessage.contains("NULL or zero-norm"))
    val zeroRow = spark.range(1).select(lit(9101L).as("vec_id"),
      typedLit(Array.fill(64)(0.0f).toSeq).as("embedding"), lit(0).as("label"))
    intercept[IllegalArgumentException] {
      Similarity.semDeDup(emb.unionByName(zeroRow))
    }
    intercept[IllegalArgumentException] {
      Similarity.semDeDupFitted(emb.unionByName(zeroRow), nlist = 4)
    }
    // mixed dims silently deflate cross-dim cosines (graft_dot folds
    // the shared prefix) — refused, not degraded
    val shortRow = spark.range(1).select(lit(9102L).as("vec_id"),
      typedLit(Seq(1.0f, 2.0f)).as("embedding"), lit(0).as("label"))
    val e2 = intercept[IllegalArgumentException] {
      Similarity.semDeDup(emb.unionByName(shortRow))
    }
    assert(e2.getMessage.contains("mixed"))
    // the clean fixture still passes every guard
    assert(Similarity.semDeDup(emb).count() > 0)
  }

  test("gate broadcast hint budget: small batches hint, backlog-sized batches degrade") {
    // 64-dim rows: ~296 B estimated each — 1k rows hint, 10M rows
    // (an AvailableNow cold-start backlog) must NOT force-broadcast
    assert(Similarity.batchBroadcastable(1000L, 64))
    assert(Similarity.batchBroadcastable(200000L, 64))
    assert(!Similarity.batchBroadcastable(10000000L, 64))
    assert(!Similarity.batchBroadcastable(300000L, 1024))
  }

  test("lsh buckets: one row per (vector, table); bucket keys within bit range") {
    val b = Similarity.lshBuckets(emb, tables = 4, bitsPerTable = 5)
    assert(b.count() == emb.count() * 4)
    val range = b.agg(min("bucket"), max("bucket")).head()
    assert(range.getLong(0) >= 0L && range.getLong(1) < 32L)
  }

  test("semantic dedup composes with LSH-bucketed pairs: partition into families, min survives") {
    val pairs = Similarity.cosineNearDupPairs(emb, threshold = 0.45)
    val survivors = Similarity.semanticCanonical(emb, pairs).collect()
    val n = emb.count()
    val flagged = pairs.select("vec_a").union(pairs.select("vec_b"))
      .distinct().count()
    // every vector is accounted for exactly once: survivors' member
    // counts sum to the corpus, families shrink the survivor set by
    // (members - 1) each
    assert(survivors.map(_.getLong(2)).sum == n)
    assert(survivors.length <= n && (flagged == 0 || survivors.length < n))
    // a family's survivor is its minimum vec_id, and vec_a < vec_b in
    // every emitted pair — so the higher end of a pair can never be a
    // survivor (its family contains something smaller)
    val kept = survivors.map(_.getLong(0)).toSet
    pairs.collect().foreach { r =>
      assert(!kept(r.getLong(1)),
        s"pair (${r.getLong(0)},${r.getLong(1)}): higher end survived")
    }
  }

  test("semantic decontamination: planted leak dropped, survivors all below threshold, benchmark never emitted") {
    // plant an exact copy of benchmark vector 0 as train vector 9001
    // (cosine 1.0 — the paraphrase-leak stand-in) and a near-copy with
    // one perturbed coordinate; both must be dropped at any reasonable
    // threshold while orthogonal-ish fixture vectors survive
    val bench0 = emb.filter(col("vec_id") === 0L).select("embedding")
      .head().getSeq[Float](0).toArray
    val near = bench0.clone(); near(0) = near(0) + 0.01f
    val planted = emb.select(col("vec_id"), col("label"), col("embedding"))
      .unionByName(Seq(
        (9001L, 7, bench0), (9002L, 7, near)).toDF("vec_id", "label", "embedding"))
    val out = Similarity.semanticDecontaminate(
      planted, col("vec_id") % 37 === 0, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(!out.contains(9001L) && !out.contains(9002L), "planted leaks survived")
    // benchmark rows are never part of the output (they are the suite,
    // not the corpus)
    assert(out.keys.forall(_ % 37 != 0))
    // every survivor's audit cosine is below the gate
    assert(out.values.forall(_.forall(_ < 0.9)))
    // empty benchmark: everyone survives with a NULL audit column
    val none = Similarity.semanticDecontaminate(emb, lit(false), threshold = 0.9).collect()
    assert(none.length == emb.count() && none.forall(_.isNullAt(2)))
    // degenerate vectors: a zero-norm train embedding must neither
    // throw (ANSI divide-by-zero) nor be silently dropped — it
    // survives with the NULL cannot-compare audit the scaladoc
    // documents, and a zero-norm BENCHMARK vector contributes no
    // comparisons without poisoning anyone else's max
    val zeros = Array.fill(bench0.length)(0.0f)
    val degen = emb.select(col("vec_id"), col("label"), col("embedding"))
      .unionByName(Seq(
        (9003L, 8, zeros), (9250L, 8, zeros)).toDF("vec_id", "label", "embedding"))
    val dOut = Similarity.semanticDecontaminate(
      degen, col("vec_id") % 37 === 0, threshold = 0.9) // 9250 % 37 == 0: bench side
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(dOut.contains(9003L) && dOut(9003L).isEmpty,
      "zero-norm train vector should survive with a NULL audit")
    assert(dOut.filterNot(_._1 == 9003L).forall(_._2.nonEmpty),
      "zero-norm benchmark vector poisoned other rows' max")
  }

  test("embedding dim stats: exact hand-computed moments per dimension") {
    // dyadic-rational floats => every decimal/double step below is exact
    val df = Seq(
      (1L, Array(1.0f, 2.0f), "a"),
      (2L, Array(3.0f, 6.0f), "b")
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.embeddingDimStats(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getFloat(2), r.getFloat(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    assert(out(0L) == ((2L, 1.0f, 3.0f, 2.0, 1.0)))  // var((1,3)) = 1
    assert(out(1L) == ((2L, 2.0f, 6.0f, 4.0, 4.0)))  // var((2,6)) = 4
  }

  test("hard negatives: cross-label only, dense ranks, hardest (most similar) first") {
    val labels = emb.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val rows = Similarity.hardNegatives(emb, anchorMod = 100, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (anchor, vec, label, _, _) =>
      assert(label == labels(vec))
      assert(label != labels(anchor), s"negative $vec shares anchor $anchor's label")
    }
    rows.groupBy(_._1).foreach { case (anchor, group) =>
      val byRank = group.sortBy(_._5)
      assert(byRank.map(_._5).toSeq == (1L to byRank.length).toSeq)
      val sims = byRank.map(_._4)
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
        s"anchor $anchor negatives not hardest-first: ${sims.toSeq}")
    }
  }

  test("index health: populations conserve, at-rest law measured, empty cells report, skew flags the hot cell") {
    val dir = tmpDir("ih-index")
    Similarity.buildIvfPqResidualDomainIndex(emb, dir)
    val rows = Similarity.indexHealth(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    // one row per committed cell, ordered, populations conserve the corpus
    assert(rows.map(_._1).toSeq == Similarity.domainCentroids.indices.toSeq)
    assert(rows.map(_._2).sum == 500L)
    // the at-rest law, measured off the store: every packed code is
    // ceil(M*log2(K)/8) = 4 bytes
    rows.foreach { case (cell, n, bytes, _, _) =>
      assert(bytes == 4L * n, s"cell $cell: $bytes bytes for $n codes")
    }
    // shares telescope to 1 and skew means 1 (up to the 1e-6 rounding)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_._5).sum / rows.length - 1.0) < 1e-4)
    // health must agree with the corpus-side assignment (the claim the
    // oracle hash-checks at the registered row)
    val byDomain = Similarity.assignDomains(emb).groupBy("domain").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    rows.foreach { case (cell, n, _, _, _) =>
      assert(byDomain.getOrElse(cell, 0L) == n, s"cell $cell: index $n vs corpus")
    }
    // a single-domain corpus: the other cells still REPORT (dead cells
    // are the re-train signal), with zero counts and the hot cell at
    // skew = nlist
    val hot = rows.maxBy(_._2)._1
    val oneDomain = emb.join(
      Similarity.assignDomains(emb).filter(col("domain") === hot)
        .select("vec_id"), Seq("vec_id"))
    val dir2 = tmpDir("ih-index-hot")
    Similarity.buildIvfPqResidualDomainIndex(oneDomain, dir2)
    val rows2 = Similarity.indexHealth(spark, dir2).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(4)))
    assert(rows2.length == Similarity.domainCentroids.length)
    assert(rows2.filter(_._1 != hot).forall(t => t._2 == 0L && t._3 == 0.0))
    assert(rows2.find(_._1 == hot).exists(_._3 ==
      Similarity.domainCentroids.length.toDouble))
    // a RAW IVF index health-checks off its assigned store: same
    // populations, bytes = elements × 4-byte floats
    val rawDir = tmpDir("ih-raw-index")
    Similarity.buildIvfIndex(emb, rawDir, nlist = 8)
    val rawRows = Similarity.indexHealth(spark, rawDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rawRows.map(_._2).sum == 500L)
    rawRows.foreach { case (cell, n, bytes) =>
      assert(bytes == n * 64L * 4L, s"cell $cell: $bytes bytes for $n raw rows")
    }
  }

  test("two-level ingest files a new vector exactly where the build filed its equal") {
    // ingest assignment must use the SAME regime the build used: under
    // a fitted quantizer, re-ingesting the build's own vectors (fresh
    // ids) must reproduce every build-time cell — a flat-exact ingest
    // here could file a vector where no equal query ever probes
    val dir = tmpDir("ingest-two-level")
    val seed = emb.filter(col("vec_id") < 400)
    Similarity.buildIvfIndex(seed, dir, nlist = 40)
    assert(new java.io.File(s"$dir/quantizer").exists(),
      "fixture must exercise the fitted regime")
    Similarity.assignToIndex(spark, dir,
      seed.withColumn("vec_id", col("vec_id") + 10000L), ingestBatch = 1L)
    val assigned = spark.read.parquet(s"$dir/assigned")
    val build = assigned.filter(col("ingest_batch") === 0L)
      .select(col("vec_id"), col("list_id").as("cell_build"))
    val ingest = assigned.filter(col("ingest_batch") === 1L)
      .select((col("vec_id") - 10000L).as("vec_id"),
        col("list_id").as("cell_ingest"))
    assert(ingest.count() == 400L)
    val drift = build.join(ingest, "vec_id")
      .filter(col("cell_build") =!= col("cell_ingest")).count()
    assert(drift == 0L, s"$drift vectors ingested into a different cell " +
      "than their build-time copies")
  }

  test("ingest refuses NULL embeddings loudly instead of losing them") {
    val dir = tmpDir("ingest-null")
    Similarity.buildIvfIndex(emb.filter(col("vec_id") < 100), dir, nlist = 8)
    val bad = Seq(
      (9001L, "x", Some(Seq.fill(64)(1.0f))),
      (9002L, "y", Option.empty[Seq[Float]])
    ).toDF("vec_id", "label", "embedding")
    val ex = intercept[IllegalArgumentException](
      Similarity.assignToIndex(spark, dir, bad, ingestBatch = 1L))
    assert(ex.getMessage.contains("NULL"), ex.getMessage)
    // the PQ ingest shares the assignment, so it refuses identically
    val pqDir = tmpDir("ingest-null-pq")
    Similarity.buildIvfPqIndex(emb.filter(col("vec_id") < 100), pqDir, nlist = 8)
    val ex2 = intercept[IllegalArgumentException](
      Similarity.assignToPqIndex(spark, pqDir, bad, ingestBatch = 1L))
    assert(ex2.getMessage.contains("NULL"), ex2.getMessage)
  }

  test("batched probe ranking honors the nprobe budget when a slice is undersized") {
    // a fitted index whose top slices hold fewer than nprobe sub-cells
    // must SPILL to full-matrix ranking, not silently cap the budget —
    // the probed set then equals the exact flat top-nprobe
    val dir = tmpDir("probe-spill")
    Similarity.buildIvfIndex(emb, dir, nlist = 40)
    val q = Similarity.readQuantizer(spark, s"$dir/quantizer")
    val nprobe = q.counts.max + 2 // every slice undersized -> all rows spill
    assert(nprobe < 40, s"fixture degenerate: counts=${q.counts.mkString(",")}")
    val qSide = emb.filter(col("vec_id") < 6)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val probed = Similarity.rankProbes(spark, dir, qSide, nprobe)
      .select("query_id", "list_id").collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getInt(1)).toSet }
    assert(probed.values.forall(_.size == nprobe),
      s"budget not honored: ${probed.map { case (k, v) => s"$k->${v.size}" }}")
    val cents = spark.read.parquet(s"$dir/centroids").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    def sq(e: Array[Double], c: Array[Double]) =
      e.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
    qSide.collect().foreach { r =>
      val qid = r.getLong(0)
      val e = r.getSeq[Float](1).map(_.toDouble).toArray
      val exact = cents.toSeq.map { case (id, c) => (sq(e, c), id) }
        .sortBy(identity).take(nprobe).map(_._2).toSet
      assert(probed(qid) == exact,
        s"query $qid spilled probes ${probed(qid)} != exact flat $exact")
    }
    // and a budget the slices can cover stays confined to the winning
    // slice (the hierarchy's deliberate approximation, unchanged)
    val small = Similarity.rankProbes(spark, dir, qSide, 1)
      .select("query_id", "list_id").collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getInt(1)).toSet }
    assert(small.values.forall(_.size == 1))
  }
}
