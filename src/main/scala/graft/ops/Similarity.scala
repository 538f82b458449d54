package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Similarity search over the `embeddings` table (vec_id, embedding
  * float[64], label) — LLM-pipeline ANN operators (builder brief).
  *
  * Two tiers, mirroring how a production pipeline scales:
  *  - [[bruteForceTopK]] — exact cosine against every vector; the correct
  *    baseline and the oracle-verified query. One broadcast of the query
  *    vector, one scan, TakeOrderedAndProject for the top-k — no shuffle
  *    of the corpus at all, so even this "brute force" scales linearly.
  *  - [[annTopK]] — random-hyperplane LSH: candidates come only from
  *    buckets the query vector lands in (multi-table for recall), exact
  *    cosine re-rank on the candidate set. At 100 TB the bucketed
  *    candidate join touches a small fraction of the corpus.
  *
  * All vector math goes through the NATIVE codegen expressions
  * graft_dot / graft_cosine (graft.functions.VectorExpressions) — no UDF,
  * no interpreted lambdas. Floats are cast to double BEFORE any
  * arithmetic: both Spark and the DuckDB oracle then do a sequential
  * left-to-right double fold, which keeps the two engines' results equal
  * to ~1e-15 relative (float accumulation would diverge at ~1e-6 and
  * break the hash compare — observed with DuckDB's own
  * list_cosine_similarity, which accumulates in float).
  */
object Similarity {

  /** Sequential double-fold dot product of two array<float/double>
    * columns — the native codegen'd expression (graft.functions
    * .DotProduct; ~10× the interpreted zip_with/aggregate fold, same
    * bits). Requires GraftExtensions on the session (all graft session
    * builders set it).
    */
  def dot(a: String, b: String): Column = expr(s"graft_dot($a, $b)")

  /** Cosine similarity between two vector columns, double throughout
    * (native single-pass expression; NULL on zero-norm input).
    */
  def cosine(a: String, b: String): Column = expr(s"graft_cosine($a, $b)")

  /** The same dot product in DuckDB SQL (sequential double fold — keeps
    * oracle arithmetic bit-comparable to Spark's).
    */
  private def duckDot(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"

  private def duckCosine(a: String, b: String): String =
    s"(${duckDot(a, b)} / (sqrt(${duckDot(a, a)}) * sqrt(${duckDot(b, b)})))"

  // ------------------------------------------------------------ brute force

  /** Exact top-k nearest neighbors of `queryVecId` by cosine. The 1-row
    * query vector is broadcast (safe at any scale); ordering is on the
    * ROUNDED similarity with vec_id tiebreak so top-k boundaries are
    * deterministic across engines and partitionings.
    */
  def bruteForceTopK(embeddings: DataFrame, queryVecId: Long = 0L, k: Int = 20): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_emb"))
    embeddings.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(cosine("embedding", "q_emb"), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  val bruteForceQuery = QueryDef(
    "sim_topk_cosine",
    s"""SELECT b.vec_id, b.label,
       |       round(${duckCosine("b.embedding", "q.q_emb")}, 6) AS cos_sim
       |FROM embeddings b
       |CROSS JOIN (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0) q
       |WHERE b.vec_id != 0
       |ORDER BY cos_sim DESC, b.vec_id LIMIT 20""".stripMargin)(
    (s, d) => bruteForceTopK(Tables.embeddings(s, d)))

  // ---------------------------------------------------------------- lsh ann

  /** LSH bucket keys for every vector: `tables` independent hash tables,
    * each keyed by `bitsPerTable` hyperplane sign bits, via the native
    * graft_hyperplane_buckets expression (ONE compact nested loop over a
    * referenced plane matrix). Output: one row per (vec_id, table) with
    * the packed bucket key.
    *
    * Evolution, each step measured on the bench corpus: (1) per-component
    * xxhash64 inside nested lambdas — interpreted AND re-hashed per row,
    * 17 s; (2) tables×bits folded-literal graft_dot columns — codegen'd,
    * but 128 inlined 64-step loops pushed the stage method past HotSpot's
    * JIT bytecode threshold, so the stage ran as interpreted BYTECODE:
    * ~2.3 s for 2k vectors ≈ 16M flops, with a cliff between 32 and 64
    * inline dots; (3) this native expression — same arithmetic, same
    * bucket keys (pinned bit-equal in VectorExpressionsSpec), a few
    * hundred bytecodes that JIT compiles.
    */
  def lshBuckets(embeddings: DataFrame, tables: Int = 8, bitsPerTable: Int = 6): DataFrame =
    embeddings.select(
      col("vec_id"), col("label"), col("embedding"),
      posexplode(call_function("graft_hyperplane_buckets",
        col("embedding"), lit(tables), lit(bitsPerTable))).as(Seq("tbl", "bucket")))

  /** ANN top-k: candidates = vectors sharing ANY table-bucket with the
    * query vector; exact cosine re-rank on candidates only. Recall is
    * tunable via tables × bits; the candidate set (not the corpus) pays
    * the exact math.
    */
  def annTopK(
      embeddings: DataFrame,
      queryVecId: Long = 0L,
      k: Int = 20,
      tables: Int = 8,
      bitsPerTable: Int = 6): DataFrame = {
    // cache: both join sides reuse the bucket table; without it the
    // hyperplane dots recompute once per side.
    val buckets = lshBuckets(embeddings, tables, bitsPerTable).cache()
    val qBuckets = buckets.filter(col("vec_id") === queryVecId)
      .select(col("tbl"), col("bucket"), col("embedding").as("q_emb"))
    buckets.filter(col("vec_id") =!= queryVecId)
      .join(broadcast(qBuckets), Seq("tbl", "bucket"))
      .select(col("vec_id"), col("label"), col("embedding"), col("q_emb"))
      .dropDuplicates("vec_id")
      .select(col("vec_id"), col("label"),
        round(cosine("embedding", "q_emb"), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Hyperplane hashes are Spark-expression-specific → no DuckDB oracle;
    * SimilaritySpec pins recall vs [[bruteForceTopK]] and verifies every
    * reported cosine against the exact value.
    */
  val annQuery = QueryDef.unverified("sim_ann_lsh_topk")(
    (s, d) => annTopK(Tables.embeddings(s, d)))

  /** Exhaustive-probe LSH: the probe side is EVERY distinct (table,
    * bucket) key the corpus produced (not just the query vector's own
    * buckets), so every vector collides in every table, the candidate
    * set is the whole corpus, and the result must equal brute force
    * EXACTLY — same rows, same rounded similarities — no matter what
    * keys the hyperplanes produced. That makes the LSH bucket-join /
    * dedup / re-rank plumbing itself hash-verifiable against the
    * brute-force DuckDB oracle (the `sim_ann_ivf_fullprobe` trick
    * applied to LSH): a bug that drops a bucket, mangles a key, or
    * re-ranks through anything but the raw embedding breaks the hash.
    * The tables/bits knobs keep their production values — it is the
    * probe SET, not the hashing, that is exhaustive. (The real
    * query-buckets-only speedup path stays suite-pinned for recall,
    * as for any ANN.)
    */
  def annTopKFullProbe(
      embeddings: DataFrame,
      queryVecId: Long = 0L,
      k: Int = 20,
      tables: Int = 8,
      bitsPerTable: Int = 6): DataFrame = {
    val buckets = lshBuckets(embeddings, tables, bitsPerTable).cache()
    val qEmb = embeddings.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_emb"))
    // ≤ tables·2^bits rows (512 at the defaults) — broadcast-sized by
    // construction, same contract as the IVF centroid table.
    val probes = buckets.select(col("tbl"), col("bucket")).distinct()
      .crossJoin(qEmb)
    buckets.filter(col("vec_id") =!= queryVecId)
      .join(broadcast(probes), Seq("tbl", "bucket"))
      .select(col("vec_id"), col("label"), col("embedding"), col("q_emb"))
      .dropDuplicates("vec_id")
      .select(col("vec_id"), col("label"),
        round(cosine("embedding", "q_emb"), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  val annLshFullProbeQuery = QueryDef(
    "sim_ann_lsh_fullprobe",
    s"""SELECT b.vec_id, b.label,
       |       round(${duckCosine("b.embedding", "q.q_emb")}, 6) AS cos_sim
       |FROM embeddings b
       |CROSS JOIN (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0) q
       |WHERE b.vec_id != 0
       |ORDER BY cos_sim DESC, b.vec_id LIMIT 20""".stripMargin)(
    (s, d) => annTopKFullProbe(Tables.embeddings(s, d)))

  // ---------------------------------------------------------------- ivf

  /** IVF (inverted-file) ANN — the other scale path the brief names:
    * a k-means coarse quantizer assigns every vector to one of `nlist`
    * cells; a query probes only the `nprobe` nearest cells and pays
    * exact cosine on that slice of the corpus. Cell assignment is a
    * distributed KMeans fit (seed-pinned for determinism); probe
    * selection is O(nlist) driver math over the centroid array — which
    * is exactly the IVF contract (centroids are the tiny index).
    * At 100 TB: the fit runs on a SAMPLE (below), list_id becomes a
    * partition/cluster column, and a probe reads nprobe/nlist of the data.
    *
    * The quantizer is fit on a `fitFraction` sample, NOT the full corpus:
    * KMeans is maxIter full passes over its input, and 5 passes over
    * 100 TB to place 16 centroids is absurd — a coarse quantizer needs
    * only enough points to estimate cell boundaries (a few hundred per
    * cell). The sample is cached for the iterations and unpersisted after
    * the fit; the full corpus pays exactly ONE pass (`transform`, the cell
    * assignment). Locally fitFraction=0.25 keeps the fixture tests
    * meaningful; at 100 TB you'd set it so the sample is ~256×nlist rows
    * (e.g. 4096 points for nlist=16 — fractions of a millionth). A
    * limit(nlist)-count guard falls back to the full (tiny) corpus when
    * the sample can't seat nlist centroids.
    */
  /** Fit the coarse quantizer (sampled, seed-pinned) and return it with
    * the vectorized corpus — shared by the inline query path
    * ([[annIvfTopK]]) and the persisted index ([[buildIvfIndex]]).
    */
  private def fitQuantizer(
      embeddings: DataFrame,
      nlist: Int,
      fitFraction: Double): (org.apache.spark.ml.clustering.KMeansModel, DataFrame) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val withVec = embeddings.withColumn("features",
      array_to_vector(transform(col("embedding"), x => x.cast("double"))))
    // FAISS-style fixed training budget: a coarse quantizer needs a few
    // hundred points PER CELL, not a corpus fraction — a fraction grows
    // the fit bill O(n·k) with the corpus (O(n²) once k ∝ n, the
    // measured r17 wall). The effective fraction is capped so the
    // sample targets ~256·nlist rows (5% oversample for Bernoulli
    // variance); below the cap the caller's fitFraction semantics are
    // untouched, so fixture-scale fits are bit-identical.
    val corpusN = embeddings.count()
    val cappedFraction = math.min(fitFraction,
      256.0 * nlist * 1.05 / math.max(1L, corpusN))
    // Seed-pinned Bernoulli sample; cached so the KMeans iterations scan
    // the sample, not the corpus. limit(nlist).count() is an early-stop
    // scan (reads at most nlist rows), not a full count.
    val sampled = withVec.sample(withReplacement = false, cappedFraction, seed = 42L).cache()
    val fitData = if (sampled.limit(nlist).count() == nlist) sampled else withVec
    // 5 iterations: coarse-quantizer quality plateaus fast and each
    // iteration is a full Spark job — cell BALANCE matters more than
    // centroid convergence for IVF recall.
    val model = new KMeans()
      .setK(nlist).setSeed(42L).setMaxIter(5)
      .setFeaturesCol("features").setPredictionCol("list_id")
      .fit(fitData)
    sampled.unpersist(blocking = true)
    (model, withVec)
  }

  /** A fitted HIERARCHICAL coarse quantizer: `offsets(t)`/`counts(t)`
    * slice the flat `subCents` matrix into top cell t's children, so
    * list_id IS the absolute sub-centroid index and two
    * graft_nearest_cell probes (kTop, then counts(t)) assign a vector —
    * O(√nlist) per row instead of the flat quantizer's O(nlist).
    */
  private[graft] final case class TwoLevelQuantizer(
      topCents: Array[Array[Double]],
      subCents: Array[Array[Double]],
      offsets: Array[Int],
      counts: Array[Int]) {
    def nlist: Int = subCents.length
  }

  /** Largest-remainder proportional allotment of `nlist` sub-cells over
    * the occupied top cells, min 1 per occupied cell, capped at the
    * cell's sample population (Lloyd's cannot seat more centroids than
    * points). Deterministic: ties nudge the lowest-index cell.
    */
  private[graft] def allotCells(sizes: Seq[(Int, Long)], nlist: Int): Seq[(Int, Int)] = {
    val occupied = sizes.filter(_._2 > 0).sortBy(_._1)
    require(occupied.nonEmpty, "allotCells: no occupied top cells")
    // every occupied cell seats >= 1 sub-cell, so the budget must cover
    // them (always true from fitQuantizerTwoLevel: occupied <= kTop =
    // ceil(sqrt(nlist)) <= nlist) — refused loudly rather than letting
    // the rebalance loop spin on an unsatisfiable floor
    require(occupied.size <= nlist,
      s"allotCells: ${occupied.size} occupied cells cannot seat in nlist=$nlist")
    val total = occupied.map(_._2).sum
    var q = occupied.map { case (t, nt) =>
      (t, nt, math.min(nt, math.max(1L, nlist.toLong * nt / total)).toInt)
    }.toVector
    val want = math.min(nlist.toLong, total).toInt
    var diff = want - q.map(_._3).sum
    while (diff > 0) {
      // add to the cell with the most headroom (points beyond centroids)
      val i = q.indices.filter(i => q(i)._3 < q(i)._2)
        .maxBy(i => (q(i)._2 - q(i)._3, -i))
      q = q.updated(i, (q(i)._1, q(i)._2, q(i)._3 + 1)); diff -= 1
    }
    while (diff < 0) {
      // shrink the largest allotment first (never below 1)
      val i = q.indices.filter(i => q(i)._3 > 1).maxBy(i => (q(i)._3, -i))
      q = q.updated(i, (q(i)._1, q(i)._2, q(i)._3 - 1)); diff += 1
    }
    q.map(x => (x._1, x._3))
  }

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic local Lloyd's over a bounded in-memory sample slice —
    * the per-top-cell sub-fit of [[fitQuantizerTwoLevel]]. Points must
    * arrive in a stable order (the caller sorts by vec_id); with the
    * pinned splitmix64 stream the fit is then a pure function of
    * (points, k, seed). Quality matters more than it looks: the
    * DOWNSTREAM pair bill is Σ|cell|², so a fat cell from a weak fit
    * costs quadratically — hence k-means++ D² seeding (robust to the
    * exact-twin-heavy corpora a deduper sees: a duplicate of a chosen
    * seed has D²=0 and is never drawn again) and farthest-point
    * RESEEDING of emptied clusters (a stale kept centroid just stays
    * empty; the reseed splits the fattest region instead).
    */
  private[graft] def localLloyd(
      points: Array[Array[Double]], k0: Int, iters: Int, seed: Long): Array[Array[Double]] = {
    val k = math.min(k0, points.length)
    val dim = points(0).length
    var rng = seed
    def nextDouble(): Double = {
      rng = splitmix64(rng)
      (rng >>> 11).toDouble / 9007199254740992.0 // 2^53
    }
    def sqdist(p: Array[Double], c: Array[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < dim) { val t = p(i) - c(i); d += t * t; i += 1 }
      d
    }
    // k-means++ init: first seed drawn uniformly, each next proportional
    // to D² against the chosen set (deterministic given the stream)
    val cents = new Array[Array[Double]](k)
    cents(0) = points((nextDouble() * points.length).toInt.min(points.length - 1)).clone()
    val minD2 = points.map(p => sqdist(p, cents(0)))
    var c = 1
    while (c < k) {
      val total = minD2.sum
      val target = nextDouble() * total
      var acc = 0.0; var pick = -1
      var i = 0
      while (i < points.length && pick < 0) {
        acc += minD2(i)
        if (acc >= target && minD2(i) > 0) pick = i
        i += 1
      }
      // all-duplicate tail (total mass 0 beyond the target): fall back
      // to the first point with positive D², else reuse point 0
      if (pick < 0) pick = minD2.indexWhere(_ > 0) match {
        case -1 => 0
        case j => j
      }
      cents(c) = points(pick).clone()
      var j = 0
      while (j < points.length) {
        val d = sqdist(points(j), cents(c))
        if (d < minD2(j)) minD2(j) = d
        j += 1
      }
      c += 1
    }
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k, dim)(0.0)
      val cnts = new Array[Long](k)
      val assign = new Array[Int](points.length)
      val dist = new Array[Double](points.length)
      var pi = 0
      while (pi < points.length) {
        val p = points(pi)
        var best = 0; var bestD = Double.PositiveInfinity
        var j = 0
        while (j < k) {
          val d = sqdist(p, cents(j))
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        assign(pi) = best; dist(pi) = bestD
        var i = 0
        while (i < dim) { sums(best)(i) += p(i); i += 1 }
        cnts(best) += 1
        pi += 1
      }
      var j = 0
      while (j < k) {
        if (cnts(j) > 0) {
          var i = 0
          while (i < dim) { cents(j)(i) = sums(j)(i) / cnts(j); i += 1 }
        } else {
          // reseed at the point farthest from its centroid — splits the
          // fattest region (deterministic: first index wins ties)
          var far = 0; var farD = -1.0
          var p = 0
          while (p < points.length) {
            if (dist(p) > farD) { farD = dist(p); far = p }
            p += 1
          }
          cents(j) = points(far).clone()
          dist(far) = 0.0 // one reseed per point per iteration
        }
        j += 1
      }
      it += 1
    }
    cents
  }

  /** The scale-safe coarse-quantizer fit — both FAISS answers to the
    * O(n²) wall [[fitQuantizer]] hits when nlist grows with the corpus
    * (SCALING.md "Where the bottleneck moves next", the r17 measured
    * 100× bill):
    *
    *  1. FIXED training sample: ~`samplePerCell`·nlist rows
    *     (seed-pinned Bernoulli), never a corpus fraction — fit cost is
    *     a function of nlist alone.
    *  2. TWO-LEVEL fit and assignment: kTop = ⌈√nlist⌉ top cells fit by
    *     the distributed KMeans, then EVERY top cell's sub-cells fit in
    *     ONE flatMapGroups pass (each group a bounded sorted slice of
    *     the sample through deterministic local Lloyd's — kTop
    *     parallel sub-fits in a single Spark job, not kTop driver-looped
    *     MLlib fits), so fit cost is O(sample·√nlist·dim) per level and
    *     corpus assignment ([[assignTwoLevel]]) probes kTop + counts(t)
    *     ≈ 2√nlist cells per row instead of nlist.
    *
    * Sub-cell allotment is proportional to top-cell sample population
    * ([[allotCells]]) — the SemDeDup sizing rule's per-cell density
    * target applied within the hierarchy. Determinism: pinned seeds,
    * vec_id-sorted groups, lowest-index tie-breaks throughout.
    */
  private[graft] def fitQuantizerTwoLevel(
      embeddings: DataFrame,
      nlist: Int,
      samplePerCell: Int = 256): TwoLevelQuantizer = {
    require(nlist >= 2, s"nlist=$nlist — use the exhaustive single cell below 2")
    val spark = embeddings.sparkSession
    import spark.implicits._
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val n = embeddings.count()
    require(n >= nlist,
      s"fitQuantizerTwoLevel: corpus ($n rows) cannot seat nlist=$nlist cells")
    val frac = math.min(1.0, samplePerCell.toDouble * nlist * 1.05 / n)
    val sample = embeddings
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("emb"))
      .sample(withReplacement = false, frac, seed = 42L)
      .cache()
    try {
      val kTop = math.max(1, math.ceil(math.sqrt(nlist.toDouble)).toInt)
      val fitData = sample.withColumn("features", array_to_vector(col("emb")))
      val topModel = new KMeans()
        .setK(kTop).setSeed(42L).setMaxIter(5)
        .setFeaturesCol("features").setPredictionCol("top")
        .fit(fitData)
      val sampleAssigned = topModel.transform(fitData)
        .select(col("top"), col("vec_id"), col("emb"))
      val sizes = sampleAssigned.groupBy("top").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toSeq
      val allot = allotCells(sizes, nlist).toMap
      val allotB = spark.sparkContext.broadcast(allot)
      // ONE job: every occupied top cell's sub-fit runs as a group over
      // its (bounded, ~samplePerCell·counts(t)-row) sample slice
      val subRows = sampleAssigned.as[(Int, Long, Array[Double])]
        .groupByKey(_._1)
        .flatMapGroups { (top: Int, it: Iterator[(Int, Long, Array[Double])]) =>
          val pts = it.map(r => (r._2, r._3)).toArray.sortBy(_._1).map(_._2)
          val k = allotB.value.getOrElse(top, 1)
          localLloyd(pts, k, iters = 10, seed = 42L + top).zipWithIndex
            .map { case (c, s) => (top, s, c) }.iterator
        }
        .collect() // nlist rows — the centroid-table contract, bounded
      allotB.destroy()
      val byTop = subRows.groupBy(_._1).toSeq.sortBy(_._1)
      val topCents = byTop.map { case (t, _) => topModel.clusterCenters(t).toArray }.toArray
      val counts = byTop.map(_._2.length).toArray
      val offsets = counts.scanLeft(0)(_ + _).init
      val subCents = byTop.flatMap(_._2.sortBy(_._2).map(_._3)).toArray
      TwoLevelQuantizer(topCents, subCents, offsets, counts)
    } finally sample.unpersist(blocking = true): Unit
  }

  /** Persist a fitted [[TwoLevelQuantizer]]: `dir/top` the kTop-row
    * top-cell table, `dir/sub` the flat sub-centroid table keyed by
    * (list_id, top_id) — tiny by construction (nlist rows), one file
    * each, the [[buildIvfIndex]] centroid-store discipline. A persisted
    * table is what lets a STREAM (or any later corpus) assign under the
    * grown nlist the sizing rule demands instead of the committed
    * 8-cell fixture table.
    */
  def writeQuantizer(q: TwoLevelQuantizer, dir: String,
      spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    q.topCents.zipWithIndex.map { case (c, t) => (t, c) }.toSeq
      .toDF("top_id", "cent")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/top")
    q.offsets.zip(q.counts).zipWithIndex.flatMap { case ((off, cnt), t) =>
      (0 until cnt).map(s => (off + s, t, q.subCents(off + s)))
    }.toSeq
      .toDF("list_id", "top_id", "cent")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/sub")
  }

  /** Load + validate a persisted quantizer: non-empty levels, uniform
    * dims across BOTH tables (a mixed table silently deflates every
    * d2 — the centroid-store guard discipline), contiguous list_ids
    * grouped by top cell (the flat-slice layout [[assignTwoLevel]]
    * probes), every top cell non-empty. Bounded reads: both tables are
    * nlist-row metadata.
    */
  def readQuantizer(
      spark: org.apache.spark.sql.SparkSession, dir: String): TwoLevelQuantizer = {
    val top = spark.read.parquet(s"$dir/top")
      .orderBy("top_id").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
    val sub = spark.read.parquet(s"$dir/sub")
      .orderBy("list_id").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    require(top.nonEmpty && sub.nonEmpty,
      s"quantizer at $dir is empty — fit and writeQuantizer first")
    require(top.map(_._1).toSeq == top.indices,
      s"quantizer at $dir has non-contiguous top_ids")
    require(sub.map(_._1).toSeq == sub.indices,
      s"quantizer at $dir has non-contiguous list_ids")
    val dims = (top.map(_._2.length) ++ sub.map(_._3.length)).distinct
    require(dims.length == 1,
      s"quantizer at $dir mixes centroid dims ${dims.mkString(",")} — " +
        "a mixed table silently deflates every distance")
    // sub rows must be grouped by top cell in list_id order (the flat
    // slice contract), with every top cell owning at least one sub cell
    val groups = sub.map(_._2)
    require(groups.toSeq == groups.sorted.toSeq,
      s"quantizer at $dir interleaves top cells in list_id order")
    val counts = top.indices.map(t => groups.count(_ == t)).toArray
    require(counts.forall(_ >= 1),
      s"quantizer at $dir has top cells with no sub cells " +
        s"(${counts.zipWithIndex.filter(_._1 == 0).map(_._2).mkString(",")})")
    TwoLevelQuantizer(top.map(_._2), sub.map(_._3),
      counts.scanLeft(0)(_ + _).init, counts)
  }

  /** Two-probe scan-side assignment under a [[TwoLevelQuantizer]]:
    * nearest of the kTop top cells, then nearest within that cell's
    * slice of the flat sub matrix — one codegen'd off-plan kernel
    * (graft.functions.TwoLevelNearestCell: zero exchanges, zero row
    * blowup). The matrices travel in a cached Broadcast handle, NOT as
    * plan literals: unlike the committed domain table (a fixed-size
    * constant), a fitted table is O(nlist·dim) and nlist grows with
    * the corpus — a typedLit transport would re-serialize a
    * multi-GB payload into every fitted query/ingest/serving
    * micro-batch plan at production nlist (the r20 verdict's last
    * plan-payload hazard). Appends `list_id` — the absolute
    * sub-centroid index; same argmin math and lowest-index tie-break
    * as the literal kernel (spec-pinned equal).
    */
  private[graft] def assignTwoLevel(embeddings: DataFrame, q: TwoLevelQuantizer): DataFrame =
    embeddings.withColumn("list_id", graft.functions.OffPlanKernels
      .twoLevelCell(col("embedding"), broadcastQuant(embeddings.sparkSession, q)))

  /** The gate-side assignment projection under a FITTED table — the
    * [[domainAssignedD2]] shape (vec_id, label, embedding, domain, d2,
    * nrm) with `domain` = the quantizer's list_id and d2 against the
    * winning sub centroid (e·e − 2·e·c + c·c, the one spelling).
    * Assignment is the two-probe scan-side kernel; d2 costs one
    * broadcast join against the nlist-row centroid table.
    */
  private[graft] def quantizerAssignedD2(
      embeddings: DataFrame, q: TwoLevelQuantizer): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cents = q.subCents.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
      .toDF("domain", "cent")
    assignTwoLevel(embeddings, q)
      .withColumnRenamed("list_id", "domain")
      .join(broadcast(cents), Seq("domain"))
      .select(col("vec_id"), col("label"), col("embedding"), col("domain"),
        (dot("embedding", "embedding") - lit(2.0) * dot("embedding", "cent") +
          dot("cent", "cent")).as("d2"),
        sqrt(dot("embedding", "embedding")).as("nrm"))
  }

  /** Content digest of the assignment table a SemDeDup store's verdicts
    * were produced under — `None` = the committed domain table. A store
    * gated under table A and later probed under table B would compare
    * vectors across unrelated cell systems and silently mis-verdict;
    * the gates stamp this digest into the store and refuse a mismatch
    * (the loadBenchStore shingle-size lesson, applied to cells).
    */
  private[graft] def assignmentDigest(q: Option[TwoLevelQuantizer]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def add(a: Array[Double]): Unit = {
      val bb = java.nio.ByteBuffer.allocate(8 * a.length)
      a.foreach(bb.putDouble)
      md.update(bb.array())
    }
    val prefix = q match {
      case None =>
        domainCentroids.foreach(add)
        "committed:"
      case Some(qq) =>
        qq.topCents.foreach(add)
        qq.subCents.foreach(add)
        add(qq.offsets.map(_.toDouble))
        "fitted:"
    }
    prefix + md.digest().map("%02x".format(_)).mkString
  }

  def annIvfTopK(
      embeddings: DataFrame,
      queryVecId: Long = 0L,
      k: Int = 20,
      nlist: Int = 16,
      nprobe: Int = 4,
      fitFraction: Double = 0.25): DataFrame = {
    import org.apache.spark.ml.linalg.{Vector => MlVector, Vectors}
    val (model, withVec) = fitQuantizer(embeddings, nlist, fitFraction)
    val assigned = model.transform(withVec).cache()
    val q = assigned.filter(col("vec_id") === queryVecId)
      .select("features").head().getAs[MlVector](0)
    val probes = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, Vectors.sqdist(c, q)) }
      .sortBy(_._2).take(nprobe).map(_._1)
    val qEmb = assigned.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_emb"))
    assigned
      .filter(col("list_id").isin(probes.toIndexedSeq: _*) && col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(qEmb))
      .select(col("vec_id"), col("label"),
        round(cosine("embedding", "q_emb"), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** KMeans cells are seed/partitioning-specific → no DuckDB oracle;
    * SimilaritySpec pins candidate-set discipline and recall.
    */
  val annIvfQuery = QueryDef.unverified("sim_ann_ivf_topk")(
    (s, d) => annIvfTopK(Tables.embeddings(s, d)))

  /** Exhaustive-probe IVF (nprobe = nlist): every cell is a candidate,
    * so the result must equal brute force EXACTLY — same rows, same
    * rounded similarities — no matter what cells the (seed-dependent)
    * quantizer produced. That makes the IVF assign/probe/score plumbing
    * itself hash-verifiable against the brute-force DuckDB oracle: any
    * bug that drops a cell, mis-assigns a vector, or scores through the
    * quantized representation instead of the raw embedding breaks the
    * hash. (The nprobe < nlist speedup path stays suite-pinned for
    * recall, as for any real ANN.)
    */
  val annIvfFullProbeQuery = QueryDef(
    "sim_ann_ivf_fullprobe",
    s"""SELECT b.vec_id, b.label,
       |       round(${duckCosine("b.embedding", "q.q_emb")}, 6) AS cos_sim
       |FROM embeddings b
       |CROSS JOIN (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0) q
       |WHERE b.vec_id != 0
       |ORDER BY cos_sim DESC, b.vec_id LIMIT 20""".stripMargin)(
    (s, d) => annIvfTopK(Tables.embeddings(s, d), nlist = 16, nprobe = 16))

  // ----------------------------------------------------- persisted ivf

  /** Build the IVF index ONCE and persist it: `dir/centroids` is the
    * tiny quantizer table (list_id, centroid), `dir/assigned` the corpus
    * with its cell id, PARTITIONED BY list_id — so queries prune to their
    * probed cells at the FILE level. This is the production ANN shape
    * the inline [[annIvfTopK]] only simulates: the sampled quantizer fit
    * plus one full assignment pass is paid once at ingest; each query
    * after that is O(nlist) driver math over the centroid table plus a
    * partition-pruned scan of nprobe/nlist of the corpus. Re-ingest
    * adds new vectors with [[assignToIndex]] (each ingest under its own
    * `ingest_batch` partition) against the SAME centroids — the
    * quantizer is never refit per batch.
    */
  /** The ONE coarse fit+assign behind both persisted builds: flat
    * MLlib below [[twoLevelThreshold]] (bit-pinning the registered
    * nlist=16 rows), the two-level quantizer above it — at production
    * cell counts the flat assignment is O(n·nlist) and turns O(n²)
    * once nlist tracks the corpus (the capped r17 wall), while the
    * two-level path assigns in O(n·√nlist) scan-side. Returns the
    * (list_id, centroid) table and the assigned corpus. Ingest after
    * the build assigns through the SAME regime the build used
    * ([[nearestCellAssignment]] — flat kernel argmin below the
    * threshold, two-probe under the persisted quantizer above it), so
    * a new vector always files where an equal build-time vector did.
    */
  private def coarseFitAssign(
      embeddings: DataFrame,
      nlist: Int,
      fitFraction: Double): (DataFrame, DataFrame, Option[TwoLevelQuantizer]) = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    if (nlist > twoLevelThreshold) {
      val q = fitQuantizerTwoLevel(embeddings, nlist)
      (q.subCents.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
          .toDF("list_id", "centroid"),
        assignTwoLevel(embeddings, q)
          .select(col("vec_id"), col("label"), col("embedding"), col("list_id")),
        Some(q))
    } else {
      val (model, withVec) = fitQuantizer(embeddings, nlist, fitFraction)
      (model.clusterCenters.zipWithIndex
          .map { case (c, i) => (i, c.toArray) }.toSeq
          .toDF("list_id", "centroid"),
        model.transform(withVec)
          .select(col("vec_id"), col("label"), col("embedding"), col("list_id")),
        None)
    }
  }

  /** Persist (or, on a flat rebuild, REMOVE) the two-level quantizer
    * tables next to an index's centroid store. Probe ranking
    * ([[rankProbes]]) detects `dir/quantizer` by existence, so a flat
    * rebuild over a previously two-level index must delete the stale
    * hierarchy — otherwise probes would rank under the OLD cell system
    * against stores assigned under the new one (the stale-sidecar
    * deletion lesson, applied to the quantizer).
    */
  private def persistOrClearQuantizer(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      q: Option[TwoLevelQuantizer]): Unit = q match {
    case Some(qq) => writeQuantizer(qq, s"$dir/quantizer", spark)
    case None =>
      val stale = new org.apache.hadoop.fs.Path(s"$dir/quantizer")
      val fs = stale.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(stale)) fs.delete(stale, true): Unit
  }

  def buildIvfIndex(
      embeddings: DataFrame,
      dir: String,
      nlist: Int = 16,
      fitFraction: Double = 0.25): Unit = {
    val (centsDf, assigned, quant) = coarseFitAssign(embeddings, nlist, fitFraction)
    centsDf
      .coalesce(1) // nlist rows — one tiny file
      .write.mode("overwrite").parquet(s"$dir/centroids")
    stampCellsDigest(embeddings.sparkSession, dir)
    persistOrClearQuantizer(embeddings.sparkSession, dir, quant)
    assigned
      .withColumn("ingest_batch", lit(0L))
      // cluster rows by cell BEFORE the partitioned write: without it
      // every task opens a writer for every cell it touches — tasks ×
      // nlist files (measured: the nlist=240 build spent ~100 cpu-s on
      // ~7,700 tiny files; at production nlist=10⁵ that is millions of
      // files per write). One shuffle of the written bytes buys file
      // count ≈ nlist, and every probe after that reads one file per
      // cell instead of one per (task, cell).
      .repartition(col("list_id"))
      .write.mode("overwrite").partitionBy("list_id", "ingest_batch")
      // STATIC pinned per-write: a REBUILD must truncate the whole
      // table including stale ingest_batch>0 partitions assigned under
      // the old quantizer — a session-level dynamic default would
      // silently leave them filed under wrong cells
      .option("partitionOverwriteMode", "static")
      .parquet(s"$dir/assigned")
  }

  /** Incremental ingest into a persisted index: assign NEW vectors to
    * their nearest existing cell and add them under THEIR OWN
    * `ingest_batch` partition of the assignment table — the quantizer
    * is never refit per batch (rebuild cadence when the corpus
    * distribution drifts is an offline call). `ingestBatch` is
    * REQUIRED and each distinct ingest must use a distinct id (> 0; 0
    * is the initial build): re-running the SAME id replaces that
    * ingest's partitions (replay idempotence), while reusing an id
    * across DIFFERENT batches would silently replace the earlier one.
    * Assignment is scan-side through the codegen'd graft_nearest_cell
    * kernel ([[nearestCellAssignment]] — zero exchanges, zero row
    * blowup, two-probe under a fitted quantizer) — no per-row MLlib
    * model, no UDF, no |batch|×nlist intermediate.
    */
  /** Read + validate the persisted centroid table (`dir/centroids`) —
    * the same two-aggregate guard discipline as the benchmark embedding
    * store (streaming/Jobs.buildBenchmarkEmbeddingStore): non-empty, no
    * NULL centroids (size(NULL) is NULL, so they would dodge the
    * min/max dim check and then NPE or mis-assign downstream),
    * homogeneous dims (a mixed table would silently skew every |e-c|²
    * since graft_dot folds the shared prefix), and unique list_ids (a
    * duplicate id would double-assign its cell's vectors on ingest and
    * double-read its partition on probe). One bounded aggregate over an
    * nlist-row table — driver-trivial by construction.
    */
  private def loadCentroids(
      spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    // a swap in progress (or one that died mid-way) must refuse every
    // reader rather than let a probe mix the OLD cell system's
    // centroids with the NEW system's stores — the rebuildIndex
    // marker discipline
    val marker = new org.apache.hadoop.fs.Path(s"$dir/$rebuildingMarkerName")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(marker),
      s"index at $dir is mid-rebuild (swap in progress, or a swap that " +
        "failed and left the marker) — retry after rebuildIndex completes, " +
        "or rebuild again")
    val cents = spark.read.parquet(s"$dir/centroids")
    // validation is driver-side over ONE bounded collect (nlist rows —
    // the centroid-table contract): same guards as ever, plus the
    // content digest stamped by the builds
    val rows = cents.collect()
    require(rows.nonEmpty,
      s"IVF centroid store $dir/centroids is empty — build it with buildIvfIndex")
    val nulls = rows.count(_.isNullAt(1))
    require(nulls == 0,
      s"IVF centroid store $dir/centroids has $nulls NULL " +
        "centroid(s) — rebuild it; NULL cells cannot place or probe anything")
    val dims = rows.filter(!_.isNullAt(1)).map(_.getSeq[Double](1).length).distinct
    require(dims.length == 1,
      s"IVF centroid store $dir/centroids is heterogeneous: ${dims.min}..${dims.max} " +
        "dims — a mixed quantizer would silently skew every distance; rebuild it")
    val ids = rows.map(_.getInt(0))
    require(ids.distinct.length == ids.length,
      s"IVF centroid store $dir/centroids has duplicate list_id(s) " +
        s"(${ids.length} rows, ${ids.distinct.length} distinct ids) — a duplicate cell " +
        "double-assigns on ingest and double-reads on probe; rebuild it")
    // digest refusal (the writeQuantizer assignment-digest discipline,
    // applied to the index): builds stamp the centroid matrix's sha
    // next to the store, so a hand-copied or half-swapped centroid
    // table from ANOTHER cell system is refused instead of silently
    // probing stores assigned under different cells. Pre-digest stores
    // (no stamp file) pass — existence is the opt-in.
    val stamp = new org.apache.hadoop.fs.Path(s"$dir/$cellsDigestName")
    if (fs.exists(stamp)) {
      val in = fs.open(stamp)
      val want = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      val got = cellsDigest(
        rows.sortBy(_.getInt(0)).map(_.getSeq[Double](1).toArray))
      require(want == got,
        s"centroid table at $dir/centroids does not match its stamped " +
          "digest — a mixed cell system (half-swapped rebuild or a " +
          "hand-copied store); rebuild the index")
    }
    cents
  }

  private[graft] val rebuildingMarkerName = "_graft_rebuilding"
  private[graft] val cellsDigestName = "_graft_cells_digest"

  /** SHA-256 over the list_id-ordered centroid matrix — the content
    * identity of a cell system (the [[assignmentDigest]] spelling,
    * applied to a persisted index's coarse table).
    */
  private[graft] def cellsDigest(cents: Array[Array[Double]]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    cents.foreach { c =>
      val bb = java.nio.ByteBuffer.allocate(8 * c.length)
      c.foreach(bb.putDouble)
      md.update(bb.array())
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** Stamp the JUST-WRITTEN centroid store's digest next to it — read
    * back from parquet (doubles round-trip bit-exactly) so the stamp
    * certifies the stored bytes, not an in-memory copy.
    */
  private def stampCellsDigest(
      spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val m = spark.read.parquet(s"$dir/centroids").orderBy("list_id")
      .collect().map(_.getSeq[Double](1).toArray)
    val p = new org.apache.hadoop.fs.Path(s"$dir/$cellsDigestName")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(cellsDigest(m).getBytes("UTF-8")) finally out.close()
  }

  /** Validated embedding dim of a persisted index's centroid table —
    * what a serving stream checks its query batches against up front:
    * graft_dot folds the shared prefix, so a wrong-dim query would
    * SILENTLY deflate every score instead of erroring.
    */
  private[graft] def indexDim(
      spark: org.apache.spark.sql.SparkSession, dir: String): Int =
    loadCentroids(spark, dir).select(size(col("centroid"))).head().getInt(0)

  /** The validated centroid table as a dense driver matrix, index =
    * list_id — what [[broadcastCells]] ships to executors for the
    * off-plan probe-ranking/assignment kernels. One bounded nlist-row
    * collect (the [[queryIvfIndex]] centroid contract); contiguity is
    * REQUIRED because the kernel returns array offsets as cell ids.
    */
  private def centroidMatrix(
      spark: org.apache.spark.sql.SparkSession, dir: String): Array[Array[Double]] = {
    val rows = loadCentroids(spark, dir).orderBy("list_id").collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      require(r.getInt(0) == i,
        s"IVF centroid store $dir/centroids has non-contiguous list_ids " +
          s"(expected $i, found ${r.getInt(0)}) — cell ids must be array " +
          "offsets for scan-side probe ranking; rebuild the index")
    }
    rows.map(_.getSeq[Double](1).toArray)
  }

  // --------------------------------------------- off-plan matrix transport
  //
  // Per-process cache of the Broadcast handles that carry fitted
  // centroid/quantizer matrices to executors OFF the query plan (the
  // r20 verdict's last plan-payload scale hazard: a typedLit matrix is
  // O(nlist·dim) serialized into EVERY fitted query/ingest/serving
  // micro-batch plan, and nlist grows with the corpus under the sizing
  // rule). Keyed by (applicationId, content digest): repeated calls —
  // every serving/ingest micro-batch re-reads and re-validates the
  // store (that driver-side digest discipline stays) — reuse ONE
  // broadcast, so the matrix crosses the wire once per executor per
  // process, not once per plan. A rebuilt index changes the digest and
  // naturally gets a fresh broadcast; entries of stopped sessions are
  // dead weight bounded by distinct (app, digest) pairs (test-scale
  // matrices; one pair per index in production).
  private[graft] val matBcastCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.broadcast.Broadcast[graft.functions.CellMatrix]]()
  private[graft] val quantBcastCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.broadcast.Broadcast[graft.functions.QuantMatrix]]()

  private def broadcastCells(
      spark: org.apache.spark.sql.SparkSession,
      cents: Array[Array[Double]])
      : org.apache.spark.broadcast.Broadcast[graft.functions.CellMatrix] =
    matBcastCache.computeIfAbsent(
      spark.sparkContext.applicationId + ":" + cellsDigest(cents),
      _ => spark.sparkContext.broadcast(graft.functions.CellMatrix(cents)))

  private def broadcastQuant(
      spark: org.apache.spark.sql.SparkSession,
      q: TwoLevelQuantizer)
      : org.apache.spark.broadcast.Broadcast[graft.functions.QuantMatrix] =
    quantBcastCache.computeIfAbsent(
      spark.sparkContext.applicationId + ":" + assignmentDigest(Some(q)),
      _ => spark.sparkContext.broadcast(graft.functions.QuantMatrix(
        graft.functions.CellMatrix(q.topCents),
        graft.functions.CellMatrix(q.subCents),
        q.offsets, q.counts)))

  /** Scan-side probe ranking for the batched k-NN joins: appends one
    * exploded `list_id` row per probed cell to the query frame —
    * O(|Q|·nprobe) rows out, ZERO exchanges in — replacing the
    * relational spelling (crossJoin(broadcast(centroids)) + per-query
    * row_number window) whose |Q|×nlist intermediate and query-keyed
    * window shuffle were exactly the SemDeDup assignment wall
    * reappearing in the knn-graph shape (queries = corpus).
    *
    * Three regimes, cheapest first:
    *  - nprobe >= nlist (the fullprobe/oracle shape): every cell is
    *    probed, ranking cannot matter — the cell RANGE explodes as one
    *    literal, zero distance math.
    *  - a two-level quantizer was persisted by the build
    *    (`dir/quantizer`, nlist > [[twoLevelThreshold]]): rank
    *    two-probe like [[assignTwoLevel]] — nearest TOP cell over the
    *    √nlist-row top table, then top-p within that cell's sub-slice
    *    — one off-plan broadcast kernel (graft.functions
    *    .TwoLevelNearestCells; the matrices never ride the plan) — so
    *    probe ranking is O(|Q|·√nlist) per the sizing rule. The trade
    *    is the hierarchy's own: probes confine to the winning top
    *    cell's slice, the same approximation the ASSIGNMENT path
    *    accepted — a query ranks exactly where an equal vector would
    *    have been filed. The probe BUDGET is never silently truncated,
    *    though: a query whose winning slice holds fewer than nprobe
    *    sub-cells spills to ranking over the whole sub matrix (a
    *    per-row CASE — only the affected rows pay the O(nlist) arm),
    *    so nprobe probed cells is a hard contract in both regimes.
    *    This batched ranking still DIVERGES from [[queryIvfIndex]]'s
    *    exact flat ranking at the same (dir, nprobe) whenever the
    *    slice covers the budget: the single-query path ranks all
    *    nlist cells exactly, the batched path trusts the hierarchy.
    *  - flat table (registered fixtures, nlist <= threshold):
    *    top-p over the whole matrix (graft.functions
    *    .NearestCellsOffPlan, same off-plan transport) — O(|Q|·nlist)
    *    scan-side cpu, still zero exchanges and zero row blowup.
    *
    * The trailing `list_id >= 0` guard is the kernel's own contract
    * (argmin indices are non-negative) made explicit — and it marks
    * the probe side SELECTIVE for Catalyst's PartitionPruning rule, so
    * joining the store against this frame (broadcast) plants a
    * dynamic-partition-pruning subquery on the store scan: file-level
    * cell pruning with no driver round-trip, replacing the collected
    * `isin` literal whose 10⁵-entry In predicate would be a plan-size
    * hazard at production nlist.
    */
  private[graft] def rankProbes(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      qSide: DataFrame,
      nprobe: Int): DataFrame =
    rankProbesMat(spark, dir, qSide, nprobe)._1

  /** [[rankProbes]] plus the validated centroid matrix it already
    * collected — so callers that also need the centroids (the IVFADC
    * cent lookup) don't pay a second store read + digest pass.
    */
  private def rankProbesMat(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      qSide: DataFrame,
      nprobe: Int): (DataFrame, Array[Array[Double]]) = {
    val cents = centroidMatrix(spark, dir)
    val nlist = cents.length
    val ranked =
      if (nprobe >= nlist)
        // a NULL-embedding query must stay ABSENT here too (the kernel
        // branches below drop it via null-intolerance; a bare range
        // explode would hand it every cell and serve k NULL-cosine
        // rows — the arbitrary answer the contract refuses)
        qSide.filter(col("q_emb").isNotNull)
          .withColumn("list_id",
            explode(typedLit((0 until nlist).toList)))
      else {
        val qPath = new org.apache.hadoop.fs.Path(s"$dir/quantizer/sub")
        val hasQuant = qPath
          .getFileSystem(spark.sparkContext.hadoopConfiguration).exists(qPath)
        if (hasQuant) {
          val q = readQuantizer(spark, s"$dir/quantizer")
          // the hierarchy and the flat store must describe ONE cell
          // system: a stale quantizer next to rebuilt centroids would
          // rank probes against cells no store partition was assigned
          // under — silently empty (or wrong) candidate sets
          require(q.subCents.length == nlist &&
              q.subCents.zip(cents).forall { case (a, b) => a.sameElements(b) },
            s"quantizer at $dir/quantizer disagrees with $dir/centroids — " +
              "stale hierarchy from an earlier build; rebuild the index")
          // ONE off-plan kernel ranks two-probe (top argmin, then top-p
          // within the winning slice), with the budget contract folded
          // in per row: a slice smaller than nprobe would silently cap
          // the probed set below what the knob promises (recall drops
          // with no signal) — those rows spill to full-matrix ranking
          // inside the kernel, so only the affected rows pay the
          // O(nlist) arm. The matrices travel in a cached Broadcast,
          // never as plan literals (see assignTwoLevel — the fitted
          // table is corpus-scaling, unlike the committed constants).
          qSide.withColumn("list_id", explode(graft.functions.OffPlanKernels
            .twoLevelCells(col("q_emb"), broadcastQuant(spark, q), nprobe)))
        } else {
          qSide.withColumn("list_id", explode(graft.functions.OffPlanKernels
            .nearestCells(col("q_emb"), broadcastCells(spark, cents), nprobe)))
        }
      }
    (ranked.filter(col("list_id") >= 0), cents)
  }

  /** Nearest existing cell per NEW vector — the scan-side argmin the
    * two ingest paths share, one definition so the raw and PQ ingests
    * can never drift in assignment semantics.
    *
    * Both regimes assign through the codegen'd off-plan nearest-cell
    * kernel (||e−c||² argmin with the lowest-list_id tie-break,
    * matrices broadcast instead of plan literals —
    * identical semantics to the retired relational spelling, whose
    * crossJoin(broadcast(cents)) + per-vec_id row_number window paid a
    * |batch|×nlist intermediate and a by-vector shuffle; batch-sized
    * by contract for serving streams, but an AvailableNow cold-start
    * backlog arrives as ONE unbounded batch, and at production
    * nlist = 10⁵ that blowup is the SemDeDup/probe-ranking wall a
    * third time — this was its last appearance in the library):
    *  - a persisted two-level quantizer (`dir/quantizer`, builds above
    *    [[twoLevelThreshold]]) assigns two-probe like the BUILD did
    *    ([[assignTwoLevel]], O(|batch|·√nlist)) — a new vector files
    *    exactly where an equal vector was filed at build time, which
    *    is also where [[rankProbes]] sends an equal query;
    *  - a flat table (≤ threshold, the registered nlist=16 fixtures)
    *    assigns exact over the whole matrix, O(|batch|·nlist)
    *    scan-side with ZERO exchanges and zero row blowup.
    *
    * NULL embeddings are refused loudly (one bounded count over the
    * batch): the kernel's NULL list_id would otherwise file them into
    * a default partition no probe ever reads — silently lost vectors
    * (the old relational spelling was worse still: NULL d2 sorted
    * first and filed them into cell 0 as unfindable garbage).
    */
  private def nearestCellAssignment(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      embeddings: DataFrame): DataFrame = {
    val cents = centroidMatrix(spark, dir)
    val nlist = cents.length
    val nulls = embeddings
      .agg(count(lit(1)).as("n"), count(col("embedding")).as("nn")).head()
    require(nulls.getLong(0) == nulls.getLong(1),
      s"ingest batch carries ${nulls.getLong(0) - nulls.getLong(1)} NULL " +
        "embeddings — a NULL vector cannot be assigned a cell and would be " +
        "unreachable by every probe; drop or fix the rows before ingest")
    val qPath = new org.apache.hadoop.fs.Path(s"$dir/quantizer/sub")
    val hasQuant = qPath
      .getFileSystem(spark.sparkContext.hadoopConfiguration).exists(qPath)
    val assigned =
      if (hasQuant) {
        val q = readQuantizer(spark, s"$dir/quantizer")
        // same one-cell-system guard as rankProbesMat: a stale hierarchy
        // next to rebuilt centroids would file new vectors under cells
        // the store's partitions were never assigned from
        require(q.subCents.length == nlist &&
            q.subCents.zip(cents).forall { case (a, b) => a.sameElements(b) },
          s"quantizer at $dir/quantizer disagrees with $dir/centroids — " +
            "stale hierarchy from an earlier build; rebuild the index")
        assignTwoLevel(embeddings, q)
      } else {
        embeddings.withColumn("list_id", graft.functions.OffPlanKernels
          .nearestCell(col("embedding"), broadcastCells(spark, cents)))
      }
    assigned.select(col("vec_id"), col("label"), col("embedding"), col("list_id"))
  }

  /** The replay-idempotent ingest write (r15, the incrementalDedupBatch
    * discipline): every ingest owns an ingest_batch partition under
    * each cell and dynamic-overwrites ONLY its own — re-running a
    * failed/replayed ingest replaces its partitions instead of
    * double-appending, which a bare mode(append) cannot promise under
    * at-least-once delivery.
    */
  private def writeIngestPartition(df: DataFrame, ingestBatch: Long, path: String): Unit =
    df.withColumn("ingest_batch", lit(ingestBatch))
      // cluster by cell before the write (the buildIvfIndex rationale):
      // file count per ingest batch ≈ cells touched, not tasks × cells
      // — a long-running stream would otherwise compound the
      // small-files explosion every micro-batch, which is exactly the
      // garbage compaction exists to fold
      .repartition(col("list_id"))
      .write.mode("overwrite").partitionBy("list_id", "ingest_batch")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(path)

  def assignToIndex(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      embeddings: DataFrame,
      ingestBatch: Long): Unit = {
    require(ingestBatch > 0, "ingestBatch 0 is the initial build's partition")
    writeIngestPartition(
      nearestCellAssignment(spark, dir, embeddings), ingestBatch, s"$dir/assigned")
  }

  /** Query a persisted IVF index: nearest `nprobe` cells by centroid
    * distance (driver math over the nlist-row centroid table — the
    * documented IVF contract), then exact cosine top-k over ONLY those
    * cells' partitions. The `list_id IN (...)` filter is a partition
    * filter on the read — unprobed cells are never opened.
    *
    * Probe-set note: this single-query path ranks ALL nlist cells
    * exactly. On a fitted (two-level) index the batched path
    * ([[rankProbes]]) ranks within the winning top cell's slice
    * instead, so the two can probe DIFFERENT cell sets at the same
    * (dir, nprobe) — the hierarchy's deliberate approximation, not a
    * bug; both honor the full nprobe budget.
    */
  def queryIvfIndex(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      queryVec: Array[Double],
      k: Int = 20,
      nprobe: Int = 4,
      excludeVecId: Long = -1L): DataFrame = {
    import org.apache.spark.ml.linalg.Vectors
    val q = Vectors.dense(queryVec)
    val probes = loadCentroids(spark, dir)
      .collect()
      .map(r => (r.getInt(0), Vectors.sqdist(Vectors.dense(r.getSeq[Double](1).toArray), q)))
      .sortBy(_._2).take(nprobe).map(_._1)
    spark.read.parquet(s"$dir/assigned")
      .filter(col("list_id").isin(probes.toIndexedSeq: _*) && col("vec_id") =!= excludeVecId)
      .withColumn("q_emb", typedLit(queryVec.toSeq))
      .select(col("vec_id"), col("label"),
        round(cosine("embedding", "q_emb"), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** BATCHED k-NN against a persisted IVF index — the serving/graph
    * shape every single-query probe here only simulates: a whole TABLE
    * of queries (query_id, embedding) gets its top-k neighbors in ONE
    * distributed plan. This is how a k-NN graph is built (queries =
    * the corpus itself) and how offline retrieval eval runs (queries =
    * an eval set) — per-query driver loops would be the collect()
    * anti-pattern at either scale.
    *
    * Anatomy, scale-safe at BOTH ends (serving batches and the
    * corpus-sized knn-graph build):
    *  1. PROBE RANKING is scan-side — [[rankProbes]]' codegen'd
    *     top-p kernel appends each query's nprobe best cells with
    *     ZERO exchanges and zero row blowup (the relational
    *     crossJoin+window spelling paid a |Q|×nlist intermediate and
    *     a query-keyed shuffle — the SemDeDup assignment wall, fatal
    *     when queries = corpus). Fitted indexes rank two-probe in
    *     O(|Q|·√nlist); fullprobe skips ranking entirely.
    *  2. The store scan prunes to the batch's probed cells at the
    *     FILE level via dynamic partition pruning: the broadcast
    *     probe frame plants a DPP subquery on the scan's `list_id`
    *     partition filter (PlanContractSpec pins it), so a batch
    *     touching p distinct cells reads p/nlist of the store —
    *     exactly the single-query contract, amortized, with no
    *     collected `isin` literal (a 10⁵-entry In predicate at
    *     production nlist would be a plan-size hazard).
    *  3. The probe frame broadcasts into the pruned scan (a batch of
    *     queries is small by contract; a corpus-sized query table
    *     should drop the hint and let AQE shuffle on list_id — it
    *     probes most cells anyway, so DPP has nothing to prune),
    *     pairs score through the one shared cosine kernel, and one
    *     query-keyed window cuts top-k — deterministic (rounded cos
    *     DESC, vec_id) order, every engine's tie rule here.
    *
    * nprobe = nlist makes the result a pure per-query brute-force
    * top-k, which is what the hash-verified fullprobe twin replays in
    * DuckDB (the sim_ann_ivf_fullprobe trick, batched).
    *
    * Unscoreable queries: a NULL-embedding query ranks no cells
    * (graft_nearest_cells is null-intolerant) and therefore returns NO
    * answer rows — absent, never k arbitrary rows. The SERVING surface
    * refuses such batches loudly up front ([[graft.streaming.Jobs]]
    * knnServeBatch's gate, including NULL elements inside arrays);
    * batch callers that need the loud contract should run the same
    * gate first.
    */
  /** The cell-keyed PAIR join of the batched k-NN paths, with a
    * parallelism floor for NARROW cell spaces. The per-pair work
    * (cosine / ADC, ~occupancy× the probe rows) happens in the STREAM
    * stage of this join, and at small nlist nothing keeps that stage
    * wide: the cell-key space itself caps hash parallelism
    * (guide-§2.5's too-few-distinct-keys skew), AQE sizes post-shuffle
    * partitions by SHUFFLE BYTES — blind to the row blowup behind the
    * join — and when it broadcast-converts the store side (a tiny
    * fixture store) the stream side falls back to the probe frame's
    * SCAN parallelism: one small parquet file = one row group = ONE
    * task computing every pair (measured: the fullprobe graph row's
    * 4M-cosine stage on 1 task, 5.3 s wall at 5.3 s cpu on 32 cores,
    * in ALL THREE join regimes). Fix: salt the key on the PROBE side —
    * each probe row gets a deterministic per-query salt (xxhash64,
    * retry-stable), store rows explode over the salt range (the store
    * is the side AQE broadcasts here, so its ×salts copy is
    * broadcast-sized, never shuffled) — and pin the PROBE exchange at
    * the session's configured width (`spark.sql.shuffle.partitions`,
    * the documented scale knob — never a hard-coded core count; an
    * explicitly numbered repartition is exempt from AQE's byte-based
    * coalescing AND survives its broadcast-join conversion, which is
    * exactly why the pin must ride the stream side). The salt range is
    * ceil(4·width / nlist) (≥4 key combos per partition slot so the
    * hash spreads): at production nlist (≫ width under the sizing
    * rule) it is 1 and this arm is byte-for-byte the old plan — the
    * floor only exists when the cell count is the bottleneck. Pair SET
    * is unchanged either way (each (store,probe) pair matches on
    * exactly one salt; salt dropped after the join), so every
    * hash-verified consumer is unaffected.
    */
  private def cellPairJoin(
      spark: org.apache.spark.sql.SparkSession,
      store: DataFrame,
      probed: DataFrame,
      nlist: Int,
      hintBroadcast: Boolean): DataFrame =
    if (hintBroadcast) store.join(broadcast(probed), Seq("list_id"))
    else {
      val width = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val salts = math.max(1, math.ceil(4.0 * width / math.max(nlist, 1)).toInt)
      if (salts <= 1) store.join(probed, Seq("list_id"))
      else
        store
          .withColumn("pair_salt",
            explode(typedLit((0 until salts).toList)))
          .join(probed.withColumn("pair_salt",
              pmod(xxhash64(col("query_id")), lit(salts.toLong)).cast("int"))
            .repartition(width, col("list_id"), col("pair_salt")),
            Seq("list_id", "pair_salt"))
          .drop("pair_salt")
    }

  def knnJoinIvf(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      queries: DataFrame,
      k: Int = 10,
      nprobe: Int = 4,
      excludeSelf: Boolean = true,
      hintBroadcast: Boolean = true): DataFrame = {
    require(k >= 1 && nprobe >= 1, s"k=$k nprobe=$nprobe")
    val qSide = queries.select(col("query_id"), col("embedding").as("q_emb"))
    val (probed, centsMat) = rankProbesMat(spark, dir, qSide, nprobe)
    val store = pruneToCells(spark.read.parquet(s"$dir/assigned"),
      probed, hintBroadcast)
    // serving batches broadcast (small by contract); a CORPUS-sized
    // query table — the knn-graph build — passes hintBroadcast=false
    // and shuffles on the (salted when narrow) cell key — see
    // [[cellPairJoin]]
    val pairs = cellPairJoin(spark, store, probed, centsMat.length, hintBroadcast)
      .filter(if (excludeSelf) col("vec_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("vec_id"), col("label"),
        // the ONE single-pass cosine kernel — same fold the brute-force
        // oracle replays, so the fullprobe twin hashes
        round(cosine("embedding", "q_emb"), 6).as("cos_sim"))
    val rankW = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("vec_id"))
    pairs
      .withColumn("rn", row_number().over(rankW))
      .filter(col("rn") <= k)
      .select("query_id", "vec_id", "label", "cos_sim")
  }

  /** [[knnJoinIvf]] against the CODES of a persisted IVF-PQ index —
    * batched ADC serving. The raw join serves from D floats per
    * vector; this one scans the PQ store (or its 4-byte packed form),
    * so at 100 TB the joined side is the ~64×-smaller index PQ exists
    * for. Same probe ranking, file-level cell pruning, broadcast
    * discipline, and (rounded cos DESC, vec_id) top-k rule; scoring
    * runs through the batched graft_pq_adc_pair kernel — codebook as
    * ONE foldable spec, query vector a runtime column — with the
    * relational cosine `dp / (|q|·sqrt(nn))` spelled exactly like the
    * single-query LUT probe, so the two paths bit-agree and the
    * fullprobe twin (nprobe = nlist ⇒ cells cannot matter ⇒ pure
    * function of codes + committed codebook) is DuckDB-replayable.
    * Residual-ness is detected from the index marker: residual codes
    * score with the probed cell's centroid folded into the
    * reconstruction (IVFADC), raw codes with an empty cent array.
    */
  def knnJoinIvfPq(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      queries: DataFrame,
      k: Int = 10,
      nprobe: Int = 4,
      excludeSelf: Boolean = true,
      hintBroadcast: Boolean = true,
      packed: Boolean = false,
      rerank: Int = 0): DataFrame = {
    require(k >= 1 && nprobe >= 1, s"k=$k nprobe=$nprobe")
    // queryIvfPq's refine contract, batched: a shortlist smaller than k
    // silently starves the final top-k
    require(rerank <= 0 || rerank >= k,
      s"rerank=$rerank must be >= k=$k (the refine shortlist feeds the " +
        "final top-k; a smaller pool silently starves it) — " +
        "use rerank=0 for pure ADC scores")
    val residualIdx = isResidualIndex(spark, dir)
    val spec =
      if (residualIdx) graft.functions.Pq.residualCodebookSpec
      else graft.functions.Pq.codebookSpec
    val qSide = queries.select(col("query_id"), col("embedding").as("q_emb"))
    val (ranked, centsMat) = rankProbesMat(spark, dir, qSide, nprobe)
    val probed0 = ranked.withColumn("qn", sqrt(dot("q_emb", "q_emb")))
    val probed =
      // raw codes reconstruct without the cell constant — empty cent
      // selects the kernel's raw branch; IVFADC folds the probed
      // cell's centroid into every reconstruction, attached via a
      // broadcast join against the nlist-row centroid frame built from
      // the matrix rankProbesMat already collected and digest-verified
      // (an element_at over the full matrix as a plan literal would be
      // the same plan-size hazard at production nlist that the
      // collected isin was; a broadcast of nlist rows is not — and a
      // second loadCentroids read/collect/digest per call would be
      // redundant driver IO on every serving micro-batch)
      (if (residualIdx) {
        import spark.implicits._
        probed0.join(
          broadcast(centsMat.zipWithIndex
            .map { case (c, i) => (i, c.toSeq) }.toSeq
            .toDF("list_id", "cent")),
          Seq("list_id"))
      }
      else probed0.withColumn("cent", typedLit(Seq.empty[Double])))
        .select(col("query_id"), col("q_emb"), col("qn"), col("cent"),
          col("list_id"))
    val store0 = pruneToCells(
      spark.read
        .parquet(s"$dir/${if (packed) "assigned_pq_packed" else "assigned_pq"}"),
      probed, hintBroadcast)
    val store =
      if (packed) store0.withColumn("codes",
          call_function("graft_pq_unpack", col("codes_packed"), lit(spec)))
        .drop("codes_packed")
      else store0
    val pairs = cellPairJoin(spark, store, probed, centsMat.length, hintBroadcast)
      .filter(if (excludeSelf) col("vec_id") =!= col("query_id") else lit(true))
      .withColumn("pp", call_function("graft_pq_adc_pair",
        col("q_emb"), col("codes"), col("cent"), lit(spec)))
      .select(col("query_id"), col("vec_id"), col("label"),
        round(col("pp.dp") / (col("qn") * sqrt(col("pp.nn"))), 6).as("cos_pq"))
    val rankW = Window.partitionBy("query_id").orderBy(col("cos_pq").desc, col("vec_id"))
    if (rerank <= 0)
      pairs
        .withColumn("rn", row_number().over(rankW))
        .filter(col("rn") <= k)
        .select("query_id", "vec_id", "label", "cos_pq")
    else {
      // Batched two-stage refine (queryIvfPq rerank>0, per-query): ADC
      // shortlists each query's probed cells to `rerank` candidates via
      // ONE query-keyed window, then ONLY those (query, candidate)
      // pairs score exactly against the raw sidecar — pruned to the
      // batch's probed cells at the FILE level, the candidate frame
      // (|Q|·rerank rows) on the broadcast side. Per-batch raw IO is
      // probed-cells-sized, never corpus-sized, and exact scores use
      // the one shared cosine kernel, directly comparable to every
      // exact row in the library.
      val rawPath = new org.apache.hadoop.fs.Path(s"$dir/assigned_raw")
      require(rawPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(rawPath),
        s"re-rank requested but the index at $dir was built codes-only " +
          "(no assigned_raw sidecar) — rebuild with rawSidecar=true, or " +
          "join with rerank=0 for pure ADC scores")
      val cands = pairs
        .withColumn("crn", row_number().over(rankW))
        .filter(col("crn") <= rerank)
        .select(col("query_id"), col("vec_id"))
      val qFrame = qSide.select(col("query_id"), col("q_emb"))
      val exact = spark.read.parquet(s"$dir/assigned_raw")
        // file-level cell pruning on the raw sidecar, the DPP spelling:
        // the candidate join below is on vec_id (no partition column),
        // so the probed-cell semi-join is what keeps refine IO
        // probed-cells-sized instead of corpus-sized
        .join(broadcast(probed.select("list_id").distinct()),
          Seq("list_id"), "left_semi")
        .join(maybeBroadcast(cands, hintBroadcast), Seq("vec_id"))
        .join(maybeBroadcast(qFrame, hintBroadcast), Seq("query_id"))
        .select(col("query_id"), col("vec_id"), col("label"),
          round(cosine("embedding", "q_emb"), 6).as("cos_sim"))
      val exactW = Window.partitionBy("query_id")
        .orderBy(col("cos_sim").desc, col("vec_id"))
      exact
        .withColumn("rn", row_number().over(exactW))
        .filter(col("rn") <= k)
        .select("query_id", "vec_id", "label", "cos_sim")
    }
  }

  /** Scratch dir for the registered persisted-index query: ONE fixed
    * path PER PROCESS (user + pid), deleted by a shutdown hook.
    * Within a process, overwrite semantics make re-runs replace rather
    * than accumulate (a per-invocation dir would leak a partitioned
    * copy of the corpus per bench/verify run, because a lazy DataFrame
    * can't delete its own inputs after the caller's action). Across
    * processes, the pid keeps concurrent bench/verify runs from
    * overwriting each other's index mid-query, and the user.name keeps
    * the path non-pre-creatable by other users on a shared host; the
    * hook reclaims the copy the process would otherwise leave behind.
    */
  private def processScratchDir(prefix: String): String = {
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"),
      s"$prefix-${sys.props.getOrElse("user.name", "anon")}-" +
        ProcessHandle.current.pid)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(dir)
    }))
    dir.toString
  }

  private lazy val ivfScratchDir: String = processScratchDir("graft-ivf-persisted")

  // Build-once-per-(process, sfDir) memo for the registered
  // persisted-index rows: the index build is INGEST-time cost (paid
  // once per corpus in production), while the rows' measurement
  // contract is the PROBE — three raw-IVF consumers and three PQ
  // consumers would otherwise each re-fit the quantizer and rewrite the
  // store inside their timed windows, measuring six builds and six
  // probes. The first caller (a Bench warmup, or whichever row runs
  // first) pays the build; every later consumer reads the store. Keyed
  // by sfDir so a process that switches fixtures rebuilds. Thread-safe
  // via computeIfAbsent (Verify/Bench are single-threaded over queries,
  // but nothing here should rely on that).
  private val builtIvf = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val builtIvfPq = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val builtIvfPqResDom = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val builtIvfPqRes = new java.util.concurrent.ConcurrentHashMap[String, String]()

  // each sfDir builds into its OWN subdirectory of the process scratch
  // root — memoizing per sfDir onto one shared dir would serve a STALE
  // index after a fixture switch (A builds, B overwrites, A's memo hit
  // returns B's index), and concurrent different-sfDir builds would
  // race one path. computeIfAbsent + per-key dirs make both impossible.
  private def sfDigest(sfDir: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(sfDir.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString

  /** Ensure the raw-IVF persisted index for `sfDir` exists in this
    * process' scratch area; returns the index dir (per sfDir). */
  def ensureIvfIndex(spark: org.apache.spark.sql.SparkSession, sfDir: String): String =
    builtIvf.computeIfAbsent(sfDir, { _ =>
      val dir = s"$ivfScratchDir/${sfDigest(sfDir)}"
      buildIvfIndex(Tables.embeddings(spark, sfDir), dir)
      dir
    })

  /** Ensure the IVF-PQ persisted index (codes + packed stores) for
    * `sfDir` exists in this process' scratch area; returns the index
    * dir (per sfDir). */
  def ensureIvfPqIndex(spark: org.apache.spark.sql.SparkSession, sfDir: String): String =
    builtIvfPq.computeIfAbsent(sfDir, { _ =>
      val dir = s"$ivfPqScratchDir/${sfDigest(sfDir)}"
      buildIvfPqIndex(Tables.embeddings(spark, sfDir), dir)
      dir
    })

  /** The committed-domain RESIDUAL index for `sfDir` — the oracle
    * anchor's build: coarse cells are the committed domain table, codes
    * the committed residual codebook, so the whole store is a pure
    * function of (corpus, two committed tables) and DuckDB replays it.
    */
  def ensureIvfPqResidualDomainIndex(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): String =
    builtIvfPqResDom.computeIfAbsent(sfDir, { _ =>
      val dir = s"${processScratchDir("graft-ivfpqresdom")}/${sfDigest(sfDir)}"
      buildIvfPqResidualDomainIndex(Tables.embeddings(spark, sfDir), dir)
      dir
    })

  /** The FITTED residual index for `sfDir` (same seed-pinned coarse
    * quantizer recipe as [[ensureIvfPqIndex]], residual codes) — the
    * production IVFADC shape the recall panel compares against raw-code
    * PQ at identical nprobe/rerank.
    */
  def ensureIvfPqResidualIndex(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): String =
    builtIvfPqRes.computeIfAbsent(sfDir, { _ =>
      val dir = s"${processScratchDir("graft-ivfpqres")}/${sfDigest(sfDir)}"
      buildIvfPqIndex(Tables.embeddings(spark, sfDir), dir, residual = true)
      dir
    })

  /** End-to-end persisted-index exercise as a registered query: build
    * into the process-scoped scratch path ([[ivfScratchDir]]) once per
    * process ([[ensureIvfIndex]]), query with vector 0's embedding.
    * Same no-oracle story as [[annIvfQuery]].
    */
  val annIvfPersistedQuery = QueryDef.unverified("sim_ann_ivf_persisted")(
    (s, d) => {
      val dir = ensureIvfIndex(s, d)
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") === 0L)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
      queryIvfIndex(s, dir, q, excludeVecId = 0L)
    })

  /** Exhaustive-probe query AGAINST THE PERSISTED INDEX (nprobe = nlist):
    * must equal brute force exactly, which hash-verifies the parts the
    * inline full-probe row can't — the partitioned parquet round trip of
    * the assignment table (embedding fidelity through float storage),
    * the centroid-table read, and the partition-pruned probe path with
    * every partition probed. Builds into the same process-scoped scratch
    * dir as [[annIvfPersistedQuery]] (overwrite semantics make the two
    * registered queries share one build per process).
    */
  val annIvfPersistedFullProbeQuery = QueryDef(
    "sim_ann_ivf_persisted_fullprobe",
    s"""SELECT b.vec_id, b.label,
       |       round(${duckCosine("b.embedding", "q.q_emb")}, 6) AS cos_sim
       |FROM embeddings b
       |CROSS JOIN (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0) q
       |WHERE b.vec_id != 0
       |ORDER BY cos_sim DESC, b.vec_id LIMIT 20""".stripMargin)(
    (s, d) => {
      val dir = ensureIvfIndex(s, d)
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") === 0L)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
      queryIvfIndex(s, dir, q, nprobe = 16, excludeVecId = 0L)
    })

  /** Exhaustive-probe batched k-NN (nprobe = nlist): each of the 8
    * query vectors' top-10 must equal its per-query brute force exactly
    * — same rows, same rounded cosines, same (cos DESC, vec_id) rank
    * cuts — no matter what cells the quantizer produced. Hash-verifies
    * the whole batched pipeline: the relational probe ranking, the
    * cell-pruned scan, the broadcast pair join, and the per-query
    * window cut.
    */
  val knnJoinFullProbeQuery = QueryDef(
    "sim_knn_join_fullprobe",
    s"""WITH qs AS (
       |  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
       |  WHERE vec_id < 8),
       |pairs AS (
       |  SELECT q.query_id, e.vec_id, e.label,
       |         round(${duckCosine("e.embedding", "q.q_emb")}, 6) AS cos_sim
       |  FROM embeddings e CROSS JOIN qs q
       |  WHERE e.vec_id != q.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, label, cos_sim,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos_sim DESC, vec_id) AS rn
       |  FROM pairs)
       |SELECT query_id, vec_id, label, cos_sim FROM ranked WHERE rn <= 10
       |ORDER BY query_id, cos_sim DESC, vec_id""".stripMargin)(
    (s, d) => {
      val dir = ensureIvfIndex(s, d)
      val emb = Tables.embeddings(s, d)
      knnJoinIvf(s, dir,
        emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding")),
        k = 10, nprobe = 16)
        .orderBy(col("query_id"), col("cos_sim").desc, col("vec_id"))
    })

  /** The production probe (nprobe=4 of 16 cells) — rows-only like every
    * lossy ANN probe, on the identical code path as the hash-verified
    * fullprobe twin; SimilaritySpec pins its candidate discipline.
    */
  val knnJoinQuery = QueryDef.unverified("sim_knn_join_topk")(
    (s, d) => {
      val dir = ensureIvfIndex(s, d)
      val emb = Tables.embeddings(s, d)
      knnJoinIvf(s, dir,
        emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding")),
        k = 10, nprobe = 4)
        .orderBy(col("query_id"), col("cos_sim").desc, col("vec_id"))
    })

  /** The batched-ADC replay: [[duckPqAdcCtes]]' encode + per-subspace
    * partials parametrized over a query SET (the first 8 corpus
    * vectors), grouped per (query, vector) with the identical
    * `list_sum(list(... ORDER BY m))` m-order fold the single-query
    * oracle uses — the SQL mirror of the graft_pq_adc_pair kernel.
    * nprobe = nlist makes cells unobservable, so the rows are a pure
    * function of (codes, committed codebook) like every fullprobe twin.
    */
  private def duckKnnPqCtes: String = {
    import graft.functions.Pq.{Dsub, M}
    s"""$duckPqPrelude,
       |pq_code AS (
       |  SELECT vec_id, label, m, c,
       |         row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, c) AS rn
       |  FROM pq_sub),
       |ms AS (SELECT unnest(generate_series(0, ${M - 1})) AS m),
       |kq_raw AS (SELECT vec_id AS query_id, embedding AS q_raw
       |           FROM embeddings WHERE vec_id < 8),
       |kq_sub AS (
       |  SELECT q.query_id, ms.m,
       |         list_transform(list_slice(q.q_raw,
       |           ms.m * $Dsub + 1, ms.m * $Dsub + $Dsub),
       |           x -> CAST(x AS DOUBLE)) AS sub
       |  FROM kq_raw q, ms),
       |kq_n AS (
       |  SELECT query_id, sqrt(list_sum(list_transform(q_raw,
       |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS qnorm
       |  FROM kq_raw),
       |kq_parts AS (
       |  SELECT qs.query_id, ch.vec_id, ch.label, ch.m,
       |         list_sum(list_transform(list_zip(qs.sub, cb.cent),
       |           p -> p[1] * p[2])) AS dp,
       |         list_sum(list_transform(cb.cent, x -> x * x)) AS nn
       |  FROM (SELECT vec_id, label, m, c FROM pq_code WHERE rn = 1) ch
       |  JOIN pq_cb cb ON cb.m = ch.m AND cb.c = ch.c
       |  JOIN kq_sub qs ON qs.m = ch.m),
       |kq_scored AS (
       |  SELECT query_id, vec_id, label,
       |         list_sum(list(dp ORDER BY m)) AS dpsum,
       |         list_sum(list(nn ORDER BY m)) AS nnsum
       |  FROM kq_parts GROUP BY query_id, vec_id, label),
       |kq_ranked AS (
       |  SELECT s.query_id, s.vec_id, s.label,
       |         round(s.dpsum / (n.qnorm * sqrt(s.nnsum)), 6) AS cos_pq,
       |         row_number() OVER (PARTITION BY s.query_id
       |           ORDER BY round(s.dpsum / (n.qnorm * sqrt(s.nnsum)), 6) DESC,
       |                    s.vec_id) AS rn
       |  FROM kq_scored s JOIN kq_n n USING (query_id)
       |  WHERE s.vec_id != s.query_id)""".stripMargin
  }

  private def duckKnnPqSelect: String =
    s"""WITH $duckKnnPqCtes
       |SELECT query_id, vec_id, label, cos_pq FROM kq_ranked WHERE rn <= 10
       |ORDER BY query_id, cos_pq DESC, vec_id""".stripMargin

  /** Batched ADC k-NN join, exhaustive probe — the first hash-verified
    * BATCHED PQ rows: serving answers whose scanned side is the codes
    * store, replayed value-for-value by DuckDB.
    */
  lazy val knnJoinPqFullProbeQuery = QueryDef(
    "sim_knn_join_pq_fullprobe", duckKnnPqSelect)(
    (s, d) => {
      val dir = ensureIvfPqIndex(s, d)
      val emb = Tables.embeddings(s, d)
      knnJoinIvfPq(s, dir,
        emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding")),
        k = 10, nprobe = 16)
        .orderBy(col("query_id"), col("cos_pq").desc, col("vec_id"))
    })

  /** The 4-byte at-rest form through the identical oracle — pack/unpack
    * composed with batched ADC at the value level.
    */
  lazy val knnJoinPqPackedFullProbeQuery = QueryDef(
    "sim_knn_join_pq_packed_fullprobe", duckKnnPqSelect)(
    (s, d) => {
      val dir = ensureIvfPqIndex(s, d)
      val emb = Tables.embeddings(s, d)
      knnJoinIvfPq(s, dir,
        emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding")),
        k = 10, nprobe = 16, packed = true)
        .orderBy(col("query_id"), col("cos_pq").desc, col("vec_id"))
    })

  /** Batched two-stage refine, exhaustive probe: ADC shortlists every
    * query to 40 candidates, the raw sidecar re-ranks them exactly —
    * both stages per query, the whole pipeline a pure function of
    * (corpus, committed codebook) at nprobe = nlist, so DuckDB replays
    * shortlist AND exact stage value-for-value.
    */
  lazy val knnJoinPqRerankFullProbeQuery = QueryDef(
    "sim_knn_join_pq_rerank_fullprobe",
    s"""WITH $duckKnnPqCtes,
       |kq_cand AS (SELECT query_id, vec_id FROM kq_ranked WHERE rn <= 40),
       |kq_exact AS (
       |  SELECT c.query_id, b.vec_id, b.label,
       |         round(${duckCosine("b.embedding", "q.q_raw")}, 6) AS cos_sim
       |  FROM kq_cand c
       |  JOIN embeddings b ON b.vec_id = c.vec_id
       |  JOIN kq_raw q ON q.query_id = c.query_id),
       |kq_rr AS (
       |  SELECT query_id, vec_id, label, cos_sim,
       |         row_number() OVER (PARTITION BY query_id
       |           ORDER BY cos_sim DESC, vec_id) AS rn
       |  FROM kq_exact)
       |SELECT query_id, vec_id, label, cos_sim FROM kq_rr WHERE rn <= 10
       |ORDER BY query_id, cos_sim DESC, vec_id""".stripMargin)(
    (s, d) => {
      val dir = ensureIvfPqIndex(s, d)
      val emb = Tables.embeddings(s, d)
      knnJoinIvfPq(s, dir,
        emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding")),
        k = 10, nprobe = 16, rerank = 40)
        .orderBy(col("query_id"), col("cos_sim").desc, col("vec_id"))
    })

  /** The production batched-ADC probe (nprobe=4 of 16 cells) — rows-only
    * like every lossy ANN probe, identical code path as the two
    * hash-verified fullprobe twins above.
    */
  val knnJoinPqQuery = QueryDef.unverified("sim_knn_join_pq_topk")(
    (s, d) => {
      val dir = ensureIvfPqIndex(s, d)
      val emb = Tables.embeddings(s, d)
      knnJoinIvfPq(s, dir,
        emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding")),
        k = 10, nprobe = 4)
        .orderBy(col("query_id"), col("cos_pq").desc, col("vec_id"))
    })

  /** The k-NN GRAPH build, exhaustive probe — the corpus queries
    * ITSELF through [[knnJoinIvf]] (hintBroadcast=false: a corpus-sized
    * query table must shuffle on list_id under AQE, never force a
    * broadcast), every vector's top-3 neighbors in ONE distributed
    * plan. nprobe = nlist makes the graph a pure function of the
    * corpus — DuckDB replays it as the all-pairs window — so the row
    * hash-verifies the graph shape END TO END: scan-side probe
    * ranking over a corpus-sized query table, the non-broadcast
    * cell-keyed pair join, and the per-node top-k cut. This is the
    * registered anchor for the knn-graph scaladoc claim (semantic
    * clustering, graph-based dedup, link prediction all start here).
    */
  val knnGraphFullProbeQuery = QueryDef(
    "sim_knn_graph_fullprobe",
    s"""WITH pairs AS (
       |  SELECT q.vec_id AS query_id, e.vec_id, e.label,
       |         round(${duckCosine("e.embedding", "q.embedding")}, 6) AS cos_sim
       |  FROM embeddings e CROSS JOIN embeddings q
       |  WHERE e.vec_id != q.vec_id),
       |ranked AS (
       |  SELECT query_id, vec_id, label, cos_sim,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos_sim DESC, vec_id) AS rn
       |  FROM pairs)
       |SELECT query_id, vec_id, label, cos_sim FROM ranked WHERE rn <= 3
       |ORDER BY query_id, cos_sim DESC, vec_id""".stripMargin)(
    (s, d) => {
      val dir = ensureIvfIndex(s, d)
      knnJoinIvf(s, dir,
        Tables.embeddings(s, d)
          .select(col("vec_id").as("query_id"), col("embedding")),
        k = 3, nprobe = 16, hintBroadcast = false)
        .orderBy(col("query_id"), col("cos_sim").desc, col("vec_id"))
    })

  /** The production graph shape (nprobe=4 of 16) — rows-only like
    * every lossy ANN probe, identical code path as the hash-verified
    * fullprobe graph above; SimilaritySpec pins exactness of every
    * reported score.
    */
  val knnGraphQuery = QueryDef.unverified("sim_knn_graph_topk")(
    (s, d) => {
      val dir = ensureIvfIndex(s, d)
      knnJoinIvf(s, dir,
        Tables.embeddings(s, d)
          .select(col("vec_id").as("query_id"), col("embedding")),
        k = 3, nprobe = 4, hintBroadcast = false)
        .orderBy(col("query_id"), col("cos_sim").desc, col("vec_id"))
    })

  /** SEMANTIC FAMILIES over a persisted index — the composite the k-NN
    * graph exists to feed: mutual-kNN edges (a in b's top-k AND b in
    * a's top-k, cosine ≥ `minCos` — one-sided edges are hub
    * attraction and would chain unrelated families), then connected
    * components through the ONE shared label-propagation loop
    * ([[graft.ops.Dedup.nearDupClusters]] — the near-dup family
    * machinery, reused verbatim so the two family systems cannot
    * drift in semantics). Every corpus vector comes back with its
    * `family` (component-min vec_id; singletons label themselves) and
    * `n_members` — the embedding-space sibling of the near-dup family
    * split: leakage-free train/val/test by SEMANTIC family,
    * family-stratified sampling, and family-granular semantic dedup
    * all start from this frame.
    *
    * Scale shape: the graph build is [[knnJoinIvf]]'s contract
    * (scan-side probe ranking, cell-pruned store, n·k edges out);
    * mutuality is ONE aggregation over the directed edges (count = 2
    * on the sorted pair — no self-join, the graph is never evaluated
    * twice); propagation is one broadcast-ish join + grouped min per
    * round, rounds bounded by family DIAMETER (semantic families are
    * near-cliques in practice; `maxIter` caps pathological chains and
    * under-iteration warns loudly inside the shared loop).
    */
  def knnGraphFamilies(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      embeddings: DataFrame,
      k: Int = 3,
      nprobe: Int = 4,
      minCos: Double = 0.3,
      hintBroadcast: Boolean = false,
      maxIter: Int = 200): DataFrame = {
    val knn = knnJoinIvf(spark, dir,
      embeddings.select(col("vec_id").as("query_id"), col("embedding")),
      k = k, nprobe = nprobe, excludeSelf = true,
      hintBroadcast = hintBroadcast)
      .filter(col("cos_sim") >= minCos)
    val mutual = mutualKnnEdges(
      knn.select(col("query_id").as("src_id"), col("vec_id").as("dst_id")))
    val labels = graft.ops.Dedup.nearDupClusters(mutual, maxIter = maxIter)
      .select(col("doc_id").as("vec_id"), col("cluster"))
    val sizes = labels.groupBy("cluster").agg(count(lit(1)).as("n"))
    embeddings.select(col("vec_id"), col("label"))
      .join(labels, Seq("vec_id"), "left")
      .withColumn("family", coalesce(col("cluster"), col("vec_id")))
      .join(sizes.withColumnRenamed("cluster", "family"), Seq("family"), "left")
      .select(col("vec_id"), col("label"), col("family"),
        coalesce(col("n"), lit(1L)).as("n_members"))
  }

  /** The family frame at fullprobe — mutual edges, components, sizes
    * and singleton handling are then a pure function of the corpus, so
    * DuckDB replays the WHOLE composite (all-pairs top-3 window →
    * mutual-pair aggregation → recursive transitive closure →
    * component-min labels) value-for-value. This is the first
    * hash-verified GRAPH-CLUSTERING row: it pins the propagation
    * loop's fixed point against an exact closure, not just a spec.
    */
  val knnGraphFamiliesQuery = QueryDef(
    "sim_knn_graph_families",
    s"""WITH RECURSIVE gf_pairs AS (
       |  SELECT q.vec_id AS query_id, e.vec_id,
       |         round(${duckCosine("e.embedding", "q.embedding")}, 6) AS cos_sim
       |  FROM embeddings e CROSS JOIN embeddings q
       |  WHERE e.vec_id != q.vec_id),
       |gf_ranked AS (
       |  SELECT query_id, vec_id, cos_sim,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos_sim DESC, vec_id) AS rn
       |  FROM gf_pairs),
       |gf_dir AS (
       |  SELECT query_id, vec_id FROM gf_ranked
       |  WHERE rn <= 3 AND cos_sim >= 0.3),
       |gf_mut AS (
       |  SELECT least(query_id, vec_id) AS doc_a,
       |         greatest(query_id, vec_id) AS doc_b
       |  FROM gf_dir GROUP BY 1, 2 HAVING count(*) = 2),
       |gf_edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM gf_mut
       |  UNION SELECT doc_b, doc_a FROM gf_mut),
       |gf_reach AS (
       |  SELECT src, dst FROM gf_edges
       |  UNION
       |  SELECT r.src, e2.dst FROM gf_reach r JOIN gf_edges e2 ON r.dst = e2.src),
       |gf_labels AS (
       |  SELECT src AS vec_id, least(src, min(dst)) AS family
       |  FROM gf_reach GROUP BY src),
       |gf_sizes AS (SELECT family, count(*) AS n FROM gf_labels GROUP BY family)
       |SELECT b.vec_id, b.label,
       |       coalesce(l.family, b.vec_id) AS family,
       |       coalesce(s.n, 1) AS n_members
       |FROM embeddings b
       |LEFT JOIN gf_labels l ON b.vec_id = l.vec_id
       |LEFT JOIN gf_sizes s ON coalesce(l.family, b.vec_id) = s.family
       |ORDER BY b.vec_id""".stripMargin)(
    (s, d) => {
      val dir = ensureIvfIndex(s, d)
      knnGraphFamilies(s, dir, Tables.embeddings(s, d),
        k = 3, nprobe = 16, minCos = 0.3)
        .orderBy("vec_id")
    })

  /** Undirected MUTUAL edges from a directed top-k edge frame
    * (`src_id`, `dst_id`) — the ONE aggregation both family systems
    * share: sort each directed edge into canonical (doc_a ≤ doc_b)
    * order and keep pairs seen from BOTH sides. A directed edge
    * appears at most once per side (top-k ids are distinct), so
    * cnt = 2 ⇔ both directions exist ⇔ mutual. Scale shape: no
    * self-join — the graph is aggregated once, ONE exchange on the
    * sorted pair key (PlanContractSpec pins it).
    */
  private[graft] def mutualKnnEdges(directed: DataFrame): DataFrame =
    directed
      .select(least(col("src_id"), col("dst_id")).as("doc_a"),
        greatest(col("src_id"), col("dst_id")).as("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") === 2)
      .select("doc_a", "doc_b")

  /** INCREMENTAL family assignment — the streaming lift of
    * [[knnGraphFamilies]] under the gates' FIRST-ARRIVAL-WINS
    * contract: a batch of NEW vectors is labeled against the admitted
    * members already filed in the index at `dir`, without ever
    * retracting an admitted label. Per batch vector v, mutual-kNN
    * edges are evaluated in the scope S = admitted ∪ batch:
    *
    *  1. v's directed top-k over S = rank(index candidates via the
    *     [[rankProbes]]/cell-pruned-store recipe ∪ within-batch exact
    *     pairs), cosine ≥ minCos AFTER the rank — the batch operator's
    *     exact spelling;
    *  2. the REVERSE direction for an admitted neighbor m recomputes
    *     m's top-k over S — m's index candidates among the admitted,
    *     unioned with step 1's pairs FLIPPED (the batch members whose
    *     candidate sets contain m; zero new cosines, and a batch
    *     member too far from m to probe its cell is absent from both
    *     sides of the check — the forward direction's own
    *     cell-confinement approximation, exact at fullprobe); for a
    *     batch neighbor w, step 1 already IS w's top-k over S;
    *  3. mutual admitted edges collapse to (v, family(m)) anchors,
    *     mutual batch edges keep (v, w); components run through the
    *     ONE shared label-propagation loop
    *     ([[graft.ops.Dedup.nearDupClusters]]) — so a batch vector
    *     joins the smallest anchored family in its component, else
    *     the component-min batch id, else its own id (singleton).
    *
    * Divergence from the batch operator, stated honestly: admitted
    * labels never change, so (a) a new vector mutually tied to TWO
    * existing families joins the smaller id and the larger family is
    * NOT merged, and (b) an early vector's top-k was ranked over the
    * smaller corpus of its arrival time. When families are
    * minCos-separated near-cliques no wider than k+1 — the regime the
    * operator exists for — both effects vanish and the incremental
    * labels EQUAL [[knnGraphFamilies]] on the union under ascending
    * vec_id arrival (spec-pinned). Scale shape: every stage is sized
    * by |batch| (candidates n·nprobe, within-batch pairs |batch|²
    * behind the [[batchBroadcastable]] require — a backlog-sized
    * corpus should seed via [[knnGraphFamilies]] instead, the
    * documented seed path), and the store scans prune to probed cells
    * at the file level in both join regimes.
    *
    * `maxIngest` bounds the index partitions read (`ingest_batch <
    * maxIngest`) so a replayed streaming batch never sees its own
    * crashed attempt's rows; batch callers leave the default.
    *
    * `familyBuckets > 0` declares the families frame id-hash-bucketed
    * under [[familyBucketOf]] (the seedFamilyStore layout): the anchor
    * lookup then joins on (fam_bucket, id) with the bounded mutual
    * frame broadcast, so a bucket-partitioned store scan prunes to the
    * batch's touched buckets at the file level instead of reading the
    * whole admitted history per micro-batch.
    */
  /** The ONE id-hash bucket spelling for the family store — writer
    * (seedFamilyStore / familyAssignBatch) and reader (the anchor join
    * above) must agree or pruning silently drops anchors. xxhash64 is
    * deterministic across retries (the guide's rand-repartition
    * hazard); pmod keeps it non-negative for the `>= 0` DPP filter.
    */
  private[graft] def familyBucketOf(id: Column, buckets: Int): Column = {
    require(buckets >= 1, s"familyBuckets=$buckets must be >= 1")
    pmod(xxhash64(id), lit(buckets.toLong)).cast("int")
  }

  def assignFamiliesBatch(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      families: DataFrame,
      batch: DataFrame,
      k: Int = 3,
      nprobe: Int = 4,
      minCos: Double = 0.3,
      hintBroadcast: Boolean = true,
      maxIter: Int = 200,
      maxIngest: Long = Long.MaxValue,
      familyBuckets: Int = 0): DataFrame = {
    require(k >= 1 && nprobe >= 1, s"k=$k nprobe=$nprobe")
    require(familyBuckets <= 0 || families.columns.contains("fam_bucket"),
      s"familyBuckets=$familyBuckets but the families frame carries no " +
        "fam_bucket column — the store layout and the caller's bucket " +
        "count must describe ONE bucketing (seedFamilyStore's marker)")
    val nDim = batch.agg(count(lit(1)).as("n"),
      min(size(col("embedding"))).as("dim")).head()
    require(nDim.isNullAt(1) || batchBroadcastable(nDim.getLong(0), nDim.getInt(1)),
      s"batch of ${nDim.getLong(0)} vectors exceeds the within-batch " +
        "mutual-kNN budget (the batch×batch pair stage is quadratic by " +
        "definition); seed a corpus this size with knnGraphFamilies + " +
        "seedFamilyStore instead of streaming it as one batch")
    val qSide = batch.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    val bEmb = broadcast(batch.select(col("vec_id").as("nb_id"),
      col("embedding").as("nb_emb")))
    def storeRead(): DataFrame = spark.read.parquet(s"$dir/assigned")
      .filter(col("ingest_batch") < maxIngest)
      .select(col("vec_id"), col("embedding"), col("list_id"))
    def rankTopK(pairs: DataFrame): DataFrame = {
      val w = Window.partitionBy("query_id")
        .orderBy(col("cos_sim").desc, col("nb_id"))
      pairs.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k && col("cos_sim") >= minCos)
        .drop("rn")
    }
    // 1. v's top-k over S: index candidates ∪ within-batch exact pairs.
    //    Pair rows are SLIM (ids + cosine, never an embedding — a 256 B
    //    vector on a pair-scale row multiplies every shuffle) and the
    //    admitted pairs persist ONCE: the reverse pass below reuses
    //    them flipped instead of recomputing a single cosine.
    val probed = rankProbes(spark, dir, qSide, nprobe)
    val pairsA = pruneToCells(storeRead(), probed, hintBroadcast)
      .join(maybeBroadcast(probed, hintBroadcast), Seq("list_id"))
      .select(col("query_id"), col("vec_id").as("nb_id"),
        round(cosine("embedding", "q_emb"), 6).as("cos_sim"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val pairsB = qSide.crossJoin(bEmb)
      .filter(col("nb_id") =!= col("query_id"))
      .select(col("query_id"), col("nb_id"),
        round(cosine("nb_emb", "q_emb"), 6).as("cos_sim"))
    val topB = rankTopK(pairsA.withColumn("nb_new", lit(false))
        .unionByName(pairsB.withColumn("nb_new", lit(true))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    var mutual: DataFrame = null
    try {
      // 2. reverse direction for the admitted neighbors that appeared
      //    (Ms, |batch|·k-bounded): m's top-k over S ranks m's OWN
      //    index candidates among the admitted (embeddings fetched
      //    from the store pruned to the batch's probed cells — every
      //    Ms member was a candidate there) against the batch members
      //    whose candidate sets contain m — the forward pairs FLIPPED,
      //    zero new cosines. A batch member too far from m to probe
      //    its cell is absent from BOTH sides of the mutual check:
      //    the same cell-confinement approximation the forward
      //    direction accepts, and exact at fullprobe (spec-pinned).
      val msIds = topB.filter(!col("nb_new"))
        .select(col("nb_id")).distinct()
      val ms = pruneToCells(storeRead(), probed, hintBroadcast)
        .join(broadcast(msIds.withColumnRenamed("nb_id", "vec_id")),
          Seq("vec_id"), "left_semi")
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      val probedM = rankProbes(spark, dir, ms, nprobe)
      val pairsMA = pruneToCells(storeRead(), probedM, hintBroadcast)
        .join(maybeBroadcast(probedM, hintBroadcast), Seq("list_id"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("nb_id"),
          round(cosine("embedding", "q_emb"), 6).as("cos_sim"))
      val pairsMB = pairsA
        .join(broadcast(msIds), Seq("nb_id"), "left_semi")
        .select(col("nb_id").as("query_id"), col("query_id").as("nb_id"),
          col("cos_sim"))
      val topM = rankTopK(pairsMA.unionByName(pairsMB))
      // 3. mutual edges; admitted neighbors collapse to family anchors.
      //    When the store is bucket-partitioned (familyBuckets > 0, the
      //    seedFamilyStore layout) the anchor lookup reads ONLY the
      //    buckets holding the batch's mutual ids: the touched-bucket
      //    set is collected driver-side — bounded by min(|batch|·k,
      //    familyBuckets) ints, a BATCH-sized constant per the
      //    batchBroadcastable contract, never corpus-sized (unlike the
      //    r19 probed-cell isin this is not an nlist-scaling literal) —
      //    and applied as a literal partition filter, so the file-level
      //    prune is deterministic rather than left to the DPP
      //    planner's broadcast-reuse heuristics (measured degrading to
      //    dynamicpruningexpression(true) on exactly this join shape).
      //    This bounds the one per-batch read that grew with the
      //    stream's lifetime (the r20 "What's missing #3" scan).
      val vToM = topB.filter(!col("nb_new"))
        .select(col("query_id").as("v"), col("nb_id").as("m"))
      val mToV = topM.select(col("nb_id").as("v"), col("query_id").as("m"))
      mutual = vToM.join(mToV, Seq("v", "m"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      val famSlim =
        if (familyBuckets <= 0)
          families.select(col("vec_id").as("m"), col("family"))
        else {
          val touched = mutual
            .select(familyBucketOf(col("m"), familyBuckets).as("b"))
            .distinct().collect().map(_.getInt(0)).sorted
          families
            .filter(col("fam_bucket").isin(touched.toIndexedSeq: _*))
            .select(col("vec_id").as("m"), col("family"))
        }
      val e1 = broadcast(mutual).join(famSlim, Seq("m"))
        .select(col("v").as("doc_a"), col("family").as("doc_b"))
      val e2 = mutualKnnEdges(topB.filter(col("nb_new"))
        .select(col("query_id").as("src_id"), col("nb_id").as("dst_id")))
      // the ANCHORS this batch matched — |batch|·k-bounded by the same
      // contract as the mutual frame; collected so the returned plan
      // references only the checkpointed labels (the persisted pair
      // frames are freed in the finally below, before the caller
      // materializes the result)
      val anchorIds = e1.select(col("doc_b")).distinct()
        .collect().map(_.getLong(0))
      val labels = graft.ops.Dedup
        .nearDupClusters(e1.unionByName(e2), maxIter = maxIter)
        .select(col("doc_id").as("vec_id"), col("cluster"))
      // anchored-family remap: label propagation picks the component
      // MIN id, which equals the smallest anchored family id only when
      // batch ids arrive ABOVE every admitted id. If an out-of-order
      // batch id undercuts its component's anchor, the raw label would
      // silently SPLIT the semantic family (batch rows filed under the
      // new small id while the admitted members keep the old family).
      // Remap every component that contains at least one anchor to its
      // smallest anchored family id — a no-op under ascending arrival
      // (the anchor already IS the component min, spec-pinned), a
      // permanent-split fix otherwise. One |labels|-bounded aggregate.
      import spark.implicits._
      val anchorMin = labels
        .join(broadcast(anchorIds.toSeq.toDF("vec_id")), Seq("vec_id"), "left_semi")
        .groupBy("cluster").agg(min(col("vec_id")).as("anchored"))
      val remapped = labels.join(broadcast(anchorMin), Seq("cluster"), "left")
        .select(col("vec_id"), coalesce(col("anchored"), col("cluster")).as("cluster"))
      batch.select(col("vec_id"), col("label"))
        .join(remapped, Seq("vec_id"), "left")
        .select(col("vec_id"), col("label"),
          coalesce(col("cluster"), col("vec_id")).as("family"))
    } finally {
      topB.unpersist(blocking = false)
      pairsA.unpersist(blocking = false)
      if (mutual != null) mutual.unpersist(blocking = false): Unit
    }
  }

  // ------------------------------------------------------------- ivf-pq

  /** Build a persisted IVF-PQ index: the [[buildIvfIndex]] layout with
    * the assignment table holding PQ CODES instead of raw embeddings —
    * `dir/centroids` the coarse quantizer (validated on load like any
    * centroid store), `dir/assigned_pq` the corpus as (vec_id, label,
    * codes) PARTITIONED BY list_id. Codes come from the committed
    * codebook ([[graft.functions.Pq]]) via the codegen'd
    * graft_pq_encode — scan-side compiled compute, no shuffle beyond
    * the partitioned write.
    *
    * This is the 100 TB ANN memory shape: 64 floats (256 B) become 8
    * small ints (4-bit-packable: 4 B) per vector, so a corpus whose raw
    * embeddings need 256 TB of RAM-adjacent storage probes from ~4 TB
    * of codes plus a codebook measured in kilobytes. Query-time cost is
    * table lookups (ADC, [[queryIvfPq]]) over the probed cells only.
    *
    * Design choice, stated: codes quantize the RAW vectors, not the
    * per-cell residuals (x − centroid) of classical IVFADC (Jégou et
    * al. 2011 §IV). Deliberate: residual codes are a function of the
    * seed-fit coarse centroids, which would (a) make the codes
    * non-replayable by the committed-codebook oracle — the fullprobe
    * hash anchor only exists because codes are a pure function of
    * (vector, committed table) — and (b) invalidate every stored code
    * whenever the coarse quantizer refits, coupling the 100 TB store's
    * lifetime to re-clustering cadence. Raw-vector PQ trades a modest
    * recall delta for portable codes and an auditable pipeline; a
    * residual variant is the same expressions over residual inputs if
    * a deployment wants it.
    */
  def buildIvfPqIndex(
      embeddings: DataFrame,
      dir: String,
      nlist: Int = 16,
      fitFraction: Double = 0.25,
      rawSidecar: Boolean = true,
      residual: Boolean = false): Unit = {
    val (centsDf, assigned, quant) = coarseFitAssign(embeddings, nlist, fitFraction)
    val spark = embeddings.sparkSession
    centsDf
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/centroids")
    stampCellsDigest(spark, dir)
    persistOrClearQuantizer(spark, dir, quant)
    // residual-ness stamps the index (or a rebuild un-stamps it): every
    // consumer detects the marker, so codes can never be mis-read under
    // the wrong interpretation (the stale-sidecar deletion lesson)
    val marker = residualMarker(spark, dir)
    val markerFs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (residual) markerFs.create(marker, true).close()
    else if (markerFs.exists(marker)) markerFs.delete(marker, false): Unit
    def writeStatic(df: DataFrame, store: String): Unit =
      df.withColumn("ingest_batch", lit(0L))
        // cluster by cell before the write (the buildIvfIndex rationale)
        .repartition(col("list_id"))
        .write.mode("overwrite").partitionBy("list_id", "ingest_batch")
        // static pinned: rebuild truncates stale ingest partitions (see
        // buildIvfIndex)
        .option("partitionOverwriteMode", "static")
        .parquet(s"$dir/$store")
    // ONE assignment pass feeds every store. With the raw sidecar on
    // ([[queryIvfPq]] rerank>0 — raw vectors under the SAME coarse
    // cells as the codes, so the refine read prunes to the probed
    // partitions: the FAISS IVFPQ+refine two-tier shape, codes hot /
    // raw cold), the sidecar is written FIRST and the codes derive
    // from the just-written raw store — the ingest path's no-drift
    // chain, and the codes quantize exactly the floats a re-rank
    // reads back. Codes-only builds (rawSidecar=false, for
    // deployments that accept ADC recall) encode from the in-memory
    // assignment directly.
    val codesSource =
      if (rawSidecar) {
        writeStatic(assigned, "assigned_raw")
        spark.read.parquet(s"$dir/assigned_raw")
      } else {
        // Every sidecar consumer (queryIvfPq's rerank gate,
        // assignToPqIndex's hasRaw, Jobs.pqStores) detects the sidecar
        // purely by existence — a codes-only rebuild in place over a
        // previously sidecar'd index must therefore REMOVE the stale
        // raw store, or re-rank would filter old-quantizer cell
        // assignments by the new probe cells and silently return wrong
        // rows. Mirror of the static-overwrite truncation the written
        // stores get.
        val stale = new org.apache.hadoop.fs.Path(s"$dir/assigned_raw")
        val fs = stale.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(stale)) fs.delete(stale, true)
        assigned
      }
    writeStatic(
      if (residual) residualCodes(codesSource, centsDf)
      else codesSource.select(col("vec_id"), col("label"),
        call_function("graft_pq_encode",
          col("embedding"), lit(graft.functions.Pq.codebookSpec)).as("codes"),
        col("list_id")),
      "assigned_pq")
    // the AT-REST form: codes bit-packed to ceil(M*log2(K)/8) bytes per
    // vector (4 B at the committed K=16 — 64x vs the raw floats). Same
    // partitioning; derived from the JUST-WRITTEN codes table so the
    // two stores cannot drift (one encode pass total).
    writeStatic(packedFromCodes(spark.read.parquet(s"$dir/assigned_pq")),
      "assigned_pq_packed")
  }

  /** [[buildIvfPqIndex]] with the COMMITTED domain table as the coarse
    * quantizer — the residual (IVFADC) layout whose every byte is a
    * pure function of (corpus, committed domain table, committed
    * residual codebook), which is what lets the residual fullprobe row
    * hash-match a DuckDB replay (the round-17 design note traded
    * residual recall away precisely because a FITTED coarse table made
    * codes engine-seeded; committing the coarse table recovers it).
    * Same store layout, marker, sidecar, and consumer contracts as the
    * fitted build.
    */
  def buildIvfPqResidualDomainIndex(
      embeddings: DataFrame,
      dir: String,
      rawSidecar: Boolean = true): Unit = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val centsDf = domainCentroids.zipWithIndex
      .map { case (c, i) => (i, c) }.toSeq
      .toDF("list_id", "centroid")
    centsDf.coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    stampCellsDigest(spark, dir)
    // same stale-sidecar discipline as the other two build sites: a
    // quantizer left by a prior two-level build at this dir describes a
    // DIFFERENT cell system, and every pruned-probe query would fail
    // the 'quantizer disagrees' require until the dir was hand-deleted
    persistOrClearQuantizer(spark, dir, None)
    val marker = residualMarker(spark, dir)
    marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .create(marker, true).close()
    def writeStatic(df: DataFrame, store: String): Unit =
      df.withColumn("ingest_batch", lit(0L))
        // cluster by cell before the write (the buildIvfIndex rationale)
        .repartition(col("list_id"))
        .write.mode("overwrite").partitionBy("list_id", "ingest_batch")
        .option("partitionOverwriteMode", "static")
        .parquet(s"$dir/$store")
    val assigned = embeddings
      .withColumn("best", least(domainCandidates: _*))
      .select(col("vec_id"), col("label"), col("embedding"),
        col("best.domain").as("list_id"))
    val codesSource =
      if (rawSidecar) {
        writeStatic(assigned, "assigned_raw")
        spark.read.parquet(s"$dir/assigned_raw")
      } else {
        val stale = new org.apache.hadoop.fs.Path(s"$dir/assigned_raw")
        val fs = stale.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(stale)) fs.delete(stale, true)
        assigned
      }
    writeStatic(residualCodes(codesSource, centsDf), "assigned_pq")
    writeStatic(packedFromCodes(spark.read.parquet(s"$dir/assigned_pq")),
      "assigned_pq_packed")
  }

  /** Query a persisted IVF-PQ index by asymmetric distance (ADC): probe
    * the `nprobe` nearest cells (same validated-centroid driver math as
    * [[queryIvfIndex]]), then score ONLY codes — per query, two M×K
    * lookup tables are built on the driver from the committed codebook
    * (query·centroid partial dots and centroid self-dots,
    * [[graft.functions.Pq.Coder.luts]]), broadcast as literals, and the
    * PQ-reconstructed cosine is
    * `Σₘ dotLut[m][codeₘ] / (|q| · sqrt(Σₘ nrmLut[m][codeₘ]))` —
    * computed by the native codegen'd graft_pq_adc expression (a
    * compiled lookup loop; Spark's transform/aggregate HOFs are
    * interpreted, the VectorExpressions lesson). The raw corpus
    * embeddings are never read: that is the entire point of PQ.
    *
    * Arithmetic-order contract: the per-subspace LUT entries use the
    * same left-to-right dim fold as the oracle's list_sum chains, and
    * the fold over subspaces runs in code order (aggregate over the
    * M-element codes array) — so the fullprobe twin hash-matches the
    * DuckDB replay exactly.
    */
  def queryIvfPq(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      queryVec: Array[Double],
      k: Int = 20,
      nprobe: Int = 4,
      excludeVecId: Long = -1L,
      packed: Boolean = false,
      rerank: Int = 0): DataFrame = {
    // The exact-rank stage can only emit rows from the rerank-sized
    // candidate pool: 0 < rerank < k would silently starve limit(k)
    // with no error. The reference refine stage always shortlists
    // >= k (Jégou et al. §V uses multiples of k), so demand it.
    require(rerank <= 0 || rerank >= k,
      s"rerank=$rerank must be >= k=$k (the refine shortlist feeds the " +
        "final top-k; a smaller pool silently truncates results) — " +
        "use rerank=0 for pure ADC scores")
    import org.apache.spark.ml.linalg.Vectors
    // residual-ness is detected from the index, never passed: codes in
    // a residual store mean x − c(x) and scoring them raw would be
    // silently wrong for every vector
    val residualIdx = isResidualIndex(spark, dir)
    val coder = new graft.functions.Pq.Coder(
      if (residualIdx) graft.functions.Pq.residualCodebookSpec
      else graft.functions.Pq.codebookSpec)
    // |q|: the same left-to-right full-length fold as graft_dot/list_sum
    var q2 = 0.0
    var i = 0
    while (i < queryVec.length) { q2 += queryVec(i) * queryVec(i); i += 1 }
    val qNorm = math.sqrt(q2)
    val q = Vectors.dense(queryVec)
    val centRows = loadCentroids(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    val probes = centRows
      .map { case (id, c) => (id, Vectors.sqdist(Vectors.dense(c), q)) }
      .sortBy(_._2).take(nprobe).map(_._1)
    val store =
      if (!packed) spark.read.parquet(s"$dir/assigned_pq")
      else spark.read.parquet(s"$dir/assigned_pq_packed")
        .withColumn("codes", call_function("graft_pq_unpack",
          col("codes_packed"), lit(graft.functions.Pq.codebookSpec)))
    // the ADC kernel as a NATIVE expression, not transform/aggregate
    // HOFs: Spark's higher-order functions are interpreted
    // (CodegenFallback — the VectorExpressions lesson), so the per-row
    // lookup loop compiles instead. Same per-accumulator left-to-right
    // fold over m; LUT doubles round-trip bit-exact through
    // Double.toString in the foldable spec.
    val adc =
      if (!residualIdx) {
        val (dotLut, nrmLut) = coder.luts(queryVec)
        val adcSpec = coder.k + " " + qNorm + " " +
          dotLut.mkString(" ") + " " + nrmLut.mkString(" ")
        store
          .filter(col("list_id").isin(probes.toIndexedSeq: _*) &&
            col("vec_id") =!= excludeVecId)
          .select(col("vec_id"), col("label"),
            round(call_function("graft_pq_adc", col("codes"), lit(adcSpec)), 6).as("cos_pq"))
      } else {
        // IVFADC scoring: reconstruction is c(cell) + r̂, so the LUT
        // pair folds the PROBED CELL's centroid into every entry
        // (Coder.lutsRecon) and the unchanged graft_pq_adc kernel
        // computes cos(q, ĉ + r̂) — one partition-pruned scan per
        // probed cell, unioned (nprobe × M × K driver doubles of lut
        // work per query, still centroid-table-sized)
        val centById = centRows.toMap
        probes.toIndexedSeq.map { cell =>
          val (dotLut, nrmLut) = coder.lutsRecon(queryVec, centById(cell))
          val adcSpec = coder.k + " " + qNorm + " " +
            dotLut.mkString(" ") + " " + nrmLut.mkString(" ")
          store
            .filter(col("list_id") === cell && col("vec_id") =!= excludeVecId)
            .select(col("vec_id"), col("label"),
              round(call_function("graft_pq_adc", col("codes"), lit(adcSpec)), 6).as("cos_pq"))
        }.reduce(_ unionAll _)
      }
    if (rerank <= 0)
      adc.orderBy(col("cos_pq").desc, col("vec_id")).limit(k)
    else {
      // Two-stage exact re-rank (Jégou et al. 2011 §V, the refine
      // stage every production IVF-PQ runs): ADC scores shortlist the
      // probed cells down to `rerank` candidates — a TakeOrderedAndProject
      // over the codes-only scan, same deterministic
      // (rounded score desc, vec_id) order as every top-k here — then
      // ONLY those candidates are scored exactly against the raw
      // sidecar. The raw read carries the SAME list_id partition filter
      // (candidates came from probed cells by construction), so the
      // expensive store is pruned to nprobe/nlist at the FILE level and
      // the candidate semi-join broadcasts `rerank` ids against it —
      // per-query raw IO is cells-probed-sized, never corpus-sized.
      // Exact scores use the one shared cosine kernel (graft_dot), so
      // re-ranked results are directly comparable to every exact row.
      val rawPath = new org.apache.hadoop.fs.Path(s"$dir/assigned_raw")
      require(rawPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(rawPath),
        s"re-rank requested but the index at $dir was built codes-only " +
          "(no assigned_raw sidecar) — rebuild with rawSidecar=true, or " +
          "query with rerank=0 for pure ADC scores")
      val cands = adc.orderBy(col("cos_pq").desc, col("vec_id")).limit(rerank)
        .select(col("vec_id"))
      spark.read.parquet(s"$dir/assigned_raw")
        .filter(col("list_id").isin(probes.toIndexedSeq: _*) &&
          col("vec_id") =!= excludeVecId)
        .join(broadcast(cands), "vec_id")
        .withColumn("q_emb", typedLit(queryVec.toSeq))
        .select(col("vec_id"), col("label"),
          round(cosine("embedding", "q_emb"), 6).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(k)
    }
  }

  /** Incremental ingest into a persisted IVF-PQ index: encode NEW
    * vectors against the committed codebook and assign them to their
    * nearest existing coarse cell, APPENDing into the partitioned codes
    * table — the [[assignToIndex]] recipe with the same validated
    * centroid load and the same never-refit-per-batch contract, but the
    * appended rows carry CODES, not embeddings (the raw vector is
    * dropped at the ingest boundary, which is where a 100 TB deployment
    * wants the 32x compression to happen — nothing downstream ever
    * pays embedding-width IO again).
    */
  def assignToPqIndex(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      embeddings: DataFrame,
      ingestBatch: Long): Unit = {
    require(ingestBatch > 0, "ingestBatch 0 is the initial build's partition")
    // Sidecar presence is decided once at build time and detected here,
    // so every store the index HAS advances in step — an index built
    // with the raw sidecar must never see an ingest that leaves the
    // sidecar behind (re-rank would silently lose the new vectors).
    val rawPath = new org.apache.hadoop.fs.Path(s"$dir/assigned_raw")
    val hasRaw = rawPath
      .getFileSystem(spark.sparkContext.hadoopConfiguration).exists(rawPath)
    // ONE assignment pass, pinned for the batch: the sidecar and codes
    // writes both consume it, and pinning (batch-sized frame) beats
    // either recomputing the centroid cross-join per write or reading
    // the whole ever-growing sidecar store back per micro-batch just to
    // recover rows this frame already holds (floats roundtrip parquet
    // bit-exactly — the sidecar spec pins it — so codes from the
    // in-memory frame equal codes from a read-back, no drift window)
    val assigned = nearestCellAssignment(spark, dir, embeddings)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    try {
      if (hasRaw)
        writeIngestPartition(assigned, ingestBatch, s"$dir/assigned_raw")
      // a residual index encodes x − c(cell) against the residual
      // codebook (detected, never passed — mis-encoding an ingest would
      // corrupt the store silently); same ONE shared projection as the
      // build, so build and ingest codes can never drift
      val codes =
        if (isResidualIndex(spark, dir))
          residualCodes(assigned, loadCentroids(spark, dir))
        else assigned.select(col("vec_id"), col("label"),
          call_function("graft_pq_encode",
            col("embedding"), lit(graft.functions.Pq.codebookSpec)).as("codes"),
          col("list_id"))
      writeIngestPartition(codes, ingestBatch, s"$dir/assigned_pq")
      // both PQ stores advance in step, derived from the SAME pinned
      // assignment (encode and pack are pure functions of the floats,
      // so the stores cannot drift; a read-back of the just-written
      // partition would re-pay full-store partition discovery on every
      // micro-batch of a long-running stream)
      writeIngestPartition(packedFromCodes(codes),
        ingestBatch, s"$dir/assigned_pq_packed")
    } finally assigned.unpersist(blocking = true)
  }

  /** Residual-ness is an INDEX property, not a query option: codes in a
    * residual store mean x − c(x), and scoring/ingesting them as raw
    * codes would be silently, systematically wrong. The build stamps a
    * marker file; query and ingest DETECT it, so a caller can never
    * mismatch the interpretation.
    */
  private def residualMarker(
      spark: org.apache.spark.sql.SparkSession, dir: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(s"$dir/_graft_pq_residual")

  private[graft] def isResidualIndex(
      spark: org.apache.spark.sql.SparkSession, dir: String): Boolean = {
    val p = residualMarker(spark, dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** The ONE residual-codes projection (build and ingest share it):
    * r = x − c(x) elementwise against the broadcast centroid table,
    * encoded with the committed RESIDUAL codebook (IVFADC, Jégou et
    * al. 2011 §IV). The subtraction is one scan-side zip_with at
    * ingest — paid once where the 32× compression happens, never on
    * the query path.
    */
  private def residualCodes(assigned: DataFrame, cents: DataFrame): DataFrame =
    assigned
      .join(broadcast(cents.select(col("list_id"), col("centroid"))), Seq("list_id"))
      .select(col("vec_id"), col("label"),
        call_function("graft_pq_encode",
          zip_with(transform(col("embedding"), x => x.cast("double")),
            col("centroid"), (a, b) => a - b),
          lit(graft.functions.Pq.residualCodebookSpec)).as("codes"),
        col("list_id"))

  /** The ONE codes→packed projection (build and ingest share it). */
  private def packedFromCodes(codes: DataFrame): DataFrame =
    codes.select(col("vec_id"), col("label"),
      call_function("graft_pq_pack",
        col("codes"), lit(graft.functions.Pq.codebookSpec)).as("codes_packed"),
      col("list_id"))

  /** Process-scoped scratch for the persisted IVF-PQ store — same
    * lifecycle contract as [[ivfScratchDir]] (one fixed path per
    * process, overwrite semantics, shutdown-hook cleanup), separate
    * path so the PQ rows and the raw-IVF rows never overwrite each
    * other's store mid-suite.
    */
  private lazy val ivfPqScratchDir: String = processScratchDir("graft-ivfpq")

  private def duckPqPrelude: String =
    s"""pq_cb(m, c, cent) AS (
       |  SELECT * FROM (VALUES ${graft.functions.Pq.duckCodebookValues}) t),
       |pq_sub AS (
       |  SELECT e.vec_id, e.label, cb.m, cb.c,
       |         list_sum(list_transform(list_zip(
       |           list_transform(list_slice(e.embedding,
       |             cb.m * ${graft.functions.Pq.Dsub} + 1,
       |             cb.m * ${graft.functions.Pq.Dsub} + ${graft.functions.Pq.Dsub}),
       |             x -> CAST(x AS DOUBLE)),
       |           cb.cent), p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
       |  FROM embeddings e CROSS JOIN pq_cb cb)""".stripMargin

  /** Exhaustive-probe ADC query against the persisted IVF-PQ store
    * (nprobe = nlist): because every cell is probed, the result is a
    * pure function of the CODES and the committed codebook — the
    * (seed/partitioning-dependent) coarse cells cannot affect it — so
    * the DuckDB oracle replays the whole pipeline value-for-value:
    * encode every vector against the committed VALUES codebook (argmin
    * with the same left-to-right dim fold and lowest-c tie-break),
    * reconstruct, and score the PQ cosine with the identical
    * per-subspace-then-across-subspace summation grouping. Any bug in
    * the code write/read roundtrip, the LUT math, or the probe union
    * breaks the hash. (The nprobe < nlist speedup path is the
    * [[annIvfPqQuery]] twin, recall-pinned in SimilaritySpec.)
    */
  /** The full ADC replay as a CTE chain (prelude → per-vector
    * `scored(vec_id, label, dpsum, nnsum)` + `qn(qnorm)`): encode every
    * vector against the committed VALUES codebook (argmin with the same
    * left-to-right dim fold and lowest-c tie-break), then the
    * per-subspace LUT partials with the identical summation grouping.
    * Shared by the fullprobe row and the re-rank row's candidate stage
    * so the two oracles can never drift in ADC semantics.
    */
  private def duckPqAdcCtes: String =
    s"""$duckPqPrelude,
       |pq_code AS (
       |  SELECT vec_id, label, m, c,
       |         row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, c) AS rn
       |  FROM pq_sub),
       |ms AS (SELECT unnest(generate_series(0, ${graft.functions.Pq.M - 1})) AS m),
       |qraw AS (SELECT embedding AS q_raw FROM embeddings WHERE vec_id = 0),
       |qsub AS (
       |  SELECT ms.m,
       |         list_transform(list_slice(q.q_raw,
       |           ms.m * ${graft.functions.Pq.Dsub} + 1,
       |           ms.m * ${graft.functions.Pq.Dsub} + ${graft.functions.Pq.Dsub}),
       |           x -> CAST(x AS DOUBLE)) AS sub
       |  FROM qraw q, ms),
       |qn AS (
       |  SELECT sqrt(list_sum(list_transform(q_raw,
       |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS qnorm
       |  FROM qraw),
       |parts AS (
       |  SELECT ch.vec_id, ch.label, ch.m,
       |         list_sum(list_transform(list_zip(qs.sub, cb.cent),
       |           p -> p[1] * p[2])) AS dp,
       |         list_sum(list_transform(cb.cent, x -> x * x)) AS nn
       |  FROM (SELECT vec_id, label, m, c FROM pq_code WHERE rn = 1) ch
       |  JOIN pq_cb cb ON cb.m = ch.m AND cb.c = ch.c
       |  JOIN qsub qs ON qs.m = ch.m),
       |scored AS (
       |  SELECT vec_id, label,
       |         list_sum(list(dp ORDER BY m)) AS dpsum,
       |         list_sum(list(nn ORDER BY m)) AS nnsum
       |  FROM parts GROUP BY vec_id, label)""".stripMargin

  val annIvfPqFullProbeQuery = QueryDef(
    "sim_ann_ivfpq_fullprobe",
    s"""WITH $duckPqAdcCtes
       |SELECT s.vec_id, s.label,
       |       round(s.dpsum / (q.qnorm * sqrt(s.nnsum)), 6) AS cos_pq
       |FROM scored s CROSS JOIN qn q
       |WHERE s.vec_id != 0
       |ORDER BY cos_pq DESC, s.vec_id LIMIT 20""".stripMargin)(
    (s, d) => {
      val dir = ensureIvfPqIndex(s, d)
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") === 0L)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
      queryIvfPq(s, dir, q, nprobe = 16, excludeVecId = 0L)
    })

  /** The PACKED store driven through the identical fullprobe oracle:
    * reading `assigned_pq_packed` (4 bytes/vector), unpacking with the
    * codegen'd graft_pq_unpack, and ADC-scoring every cell must produce
    * the EXACT score surface DuckDB derives from raw embeddings + the
    * committed codebook — which hash-verifies the pack/unpack bit
    * layout end-to-end at the value level (any bit slip reorders the
    * top-k or shifts a score).
    */
  val annIvfPqPackedFullProbeQuery = QueryDef(
    "sim_ann_ivfpq_packed_fullprobe",
    annIvfPqFullProbeQuery.oracle.get)(
    (s, d) => {
      val dir = ensureIvfPqIndex(s, d)
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") === 0L)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
      queryIvfPq(s, dir, q, nprobe = 16, excludeVecId = 0L, packed = true)
    })

  /** Two-stage exact re-rank driven through every cell (nprobe =
    * nlist, rerank = 80): ADC shortlists the corpus to the 80 best
    * candidates by quantized score, then ONLY those are scored exactly
    * from the raw sidecar. Because every cell is probed, both stages
    * are pure functions of (codes, committed codebook, raw floats) —
    * so the DuckDB oracle replays the WHOLE two-stage pipeline
    * value-for-value: the shared [[duckPqAdcCtes]] ADC scoring, the
    * identical (rounded cos_pq DESC, vec_id) top-80 cut, then the
    * exact-cosine re-rank with the same left-to-right fold. Any bug in
    * candidate selection, the sidecar write/read roundtrip, the
    * semi-join, or the exact kernel breaks the hash. (The oracle
    * deliberately replays the pipeline rather than asserting
    * rerank≡brute-force: the candidate cut is part of the semantics
    * under test, and equality-to-exact is the RECALL story, measured
    * in [[annRecallQuery]] and pinned in SimilaritySpec.)
    */
  val annIvfPqRerankFullProbeQuery = QueryDef(
    "sim_ann_ivfpq_rerank_fullprobe",
    s"""WITH $duckPqAdcCtes,
       |cand AS (
       |  SELECT s.vec_id,
       |         round(s.dpsum / (q.qnorm * sqrt(s.nnsum)), 6) AS cos_pq
       |  FROM scored s CROSS JOIN qn q
       |  WHERE s.vec_id != 0
       |  ORDER BY cos_pq DESC, s.vec_id LIMIT 80)
       |SELECT b.vec_id, b.label,
       |       round(${duckCosine("b.embedding", "q.q_emb")}, 6) AS cos_sim
       |FROM embeddings b
       |JOIN cand c ON c.vec_id = b.vec_id
       |CROSS JOIN (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0) q
       |ORDER BY cos_sim DESC, b.vec_id LIMIT 20""".stripMargin)(
    (s, d) => {
      val dir = ensureIvfPqIndex(s, d)
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") === 0L)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
      queryIvfPq(s, dir, q, nprobe = 16, excludeVecId = 0L, rerank = 80)
    })

  /** Production IVF-PQ probe (nprobe = 4): partition-pruned ADC over
    * the persisted store. Coarse cells are KMeans-seeded → no DuckDB
    * oracle (the sim_ann_ivf_topk story); the scoring machinery is the
    * hash-verified [[annIvfPqFullProbeQuery]] (identical code path,
    * every cell probed) and SimilaritySpec pins recall floors vs the
    * exact top-k.
    */
  val annIvfPqQuery = QueryDef.unverified("sim_ann_ivfpq_topk")(
    (s, d) => {
      val dir = ensureIvfPqIndex(s, d)
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") === 0L)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
      queryIvfPq(s, dir, q, excludeVecId = 0L)
    })

  /** Per-vector PQ reconstruction MSE under the committed codebook —
    * the quantization-quality audit an IVF-PQ deployment watches before
    * trusting PQ scores (rising MSE = the codebook has drifted from the
    * corpus distribution and needs refitting). Native codegen'd kernel
    * (graft_pq_recon_mse), one scan, no shuffle; the oracle recomputes
    * every per-subspace minimum from the same VALUES codebook and sums
    * with the identical subspace grouping, so the error surface is
    * hash-verified value-by-value.
    */
  val pqReconMseQuery = QueryDef(
    "sim_pq_reconstruction_mse",
    s"""WITH $duckPqPrelude,
       |best AS (
       |  SELECT vec_id, m, min(d2) AS d2 FROM pq_sub GROUP BY vec_id, m)
       |SELECT vec_id,
       |       round(list_sum(list(d2 ORDER BY m)) / ${graft.functions.Pq.D}, 6) AS recon_mse
       |FROM best GROUP BY vec_id ORDER BY vec_id""".stripMargin)(
    (s, d) => Tables.embeddings(s, d)
      .select(col("vec_id"),
        round(call_function("graft_pq_recon_mse",
          col("embedding"), lit(graft.functions.Pq.codebookSpec)), 6).as("recon_mse"))
      .orderBy("vec_id"))

  // ------------------------------------------------------- recall audit

  /** Recall@k of ANN result frames against the exact top-k, as data:
    * rank both sides by (rounded cosine desc, vec_id) — the same
    * deterministic total order every top-k here uses — join on vec_id,
    * and per (method, k) count how many of the ANN's top k are in the
    * exact top k. Methods with an empty overlap still report (recall 0)
    * via the seeded (method, k) base frame. Every input is a ≤ kMax-row
    * result frame, so the windows/joins here are result-sized — the
    * corpus-scale work happened inside the ANN queries themselves.
    */
  def annRecallAudit(
      exact: DataFrame,
      annByMethod: Seq[(String, DataFrame)],
      ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), s"ks must be positive (got $ks)")
    val spark = exact.sparkSession
    import spark.implicits._
    def ranked(df: DataFrame, rkCol: String): DataFrame =
      df.withColumn(rkCol,
        row_number().over(Window.orderBy(col("cos_sim").desc, col("vec_id"))))
        .select(col("vec_id"), col(rkCol))
    val e = ranked(exact, "e_rk")
    val overlaps = annByMethod.map { case (m, ann) =>
      ranked(ann, "a_rk").join(e, "vec_id").withColumn("method", lit(m))
    }.reduce(_ unionByName _)
    val hits = overlaps
      .withColumn("k", explode(array(ks.map(lit): _*)))
      .groupBy("method", "k")
      .agg(sum(when(col("a_rk") <= col("k") && col("e_rk") <= col("k"), 1L)
        .otherwise(0L)).as("n_hits"))
    annByMethod.map(_._1).flatMap(m => ks.map(k => (m, k))).toDF("method", "k")
      .join(hits, Seq("method", "k"), "left")
      .na.fill(0L, Seq("n_hits"))
      .withColumn("recall", col("n_hits").cast("double") / col("k"))
      .orderBy("method", "k")
  }

  /** The fullprobe-equals-brute-force property (the anchor behind both
    * `_fullprobe` rows) turned into a queryable, hash-verified metric:
    * recall@{1,5,10,20} of the exhaustive-probe LSH and IVF paths
    * against the exact top-k, computed by a REAL overlap join of the
    * independently-produced frames (any plumbing bug that drops or
    * reorders a candidate shows up as recall < 1 here). The oracle
    * replays both sides from the brute-force CTE and runs the identical
    * rank-join-count, so the expected all-ones surface is verified
    * value-by-value, not assumed. Production-path recall (the genuinely
    * lossy numbers) is the [[annRecallQuery]] twin.
    */
  val annRecallAuditQuery = QueryDef(
    "sim_ann_recall_audit",
    s"""WITH exact AS (
       |  SELECT b.vec_id,
       |         round(${duckCosine("b.embedding", "q.q_emb")}, 6) AS cos_sim
       |  FROM embeddings b
       |  CROSS JOIN (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0) q
       |  WHERE b.vec_id != 0
       |  ORDER BY cos_sim DESC, b.vec_id LIMIT 20),
       |ranked AS (
       |  SELECT vec_id, row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rk
       |  FROM exact),
       |ks(k) AS (SELECT * FROM (VALUES (1), (5), (10), (20)) t),
       |methods(method) AS (SELECT * FROM (VALUES ('ivf_fullprobe'), ('lsh_fullprobe')) t)
       |SELECT m.method, ks.k,
       |       CAST(sum(CASE WHEN a.rk <= ks.k AND e.rk <= ks.k THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       |       CAST(sum(CASE WHEN a.rk <= ks.k AND e.rk <= ks.k THEN 1 ELSE 0 END) AS DOUBLE) / ks.k AS recall
       |FROM ranked a JOIN ranked e ON a.vec_id = e.vec_id
       |CROSS JOIN ks CROSS JOIN methods m
       |GROUP BY m.method, ks.k
       |ORDER BY method, k""".stripMargin)(
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      annRecallAudit(
        bruteForceTopK(emb),
        Seq(
          "ivf_fullprobe" -> annIvfTopK(emb, nlist = 16, nprobe = 16),
          "lsh_fullprobe" -> annTopKFullProbe(emb)),
        Seq(1, 5, 10, 20))
    })

  /** The IVFADC pipeline in DuckDB: committed-domain assignment
    * ([[duckDomainAssigned]]'s dom_cents/dom_assigned), per-vector
    * residual, per-subspace encode against the committed RESIDUAL
    * codebook (same row_number argmin as [[duckPqAdcCtes]]),
    * reconstruction ĉ + r̂ per subspace, then the identical
    * dp/nn/cosine scoring — every fold the same left-to-right chain the
    * Spark kernels run.
    */
  private def duckPqResidualAdcCtes: String = {
    val dsub = graft.functions.Pq.Dsub
    s"""$duckDomainAssigned,
       |rcb(m, c, cent) AS (
       |  SELECT * FROM (VALUES ${graft.functions.Pq.duckResidualCodebookValues}) t),
       |res AS (
       |  SELECT a.vec_id, a.label, a.domain,
       |         list_transform(list_zip(e.embedding, dc.cent),
       |           p -> CAST(p[1] AS DOUBLE) - p[2]) AS r
       |  FROM dom_assigned a
       |  JOIN embeddings e ON a.vec_id = e.vec_id
       |  JOIN dom_cents dc ON dc.domain = a.domain),
       |rsub AS (
       |  SELECT r.vec_id, r.label, r.domain, cb.m, cb.c,
       |         list_sum(list_transform(list_zip(
       |           list_slice(r.r, cb.m * $dsub + 1, cb.m * $dsub + $dsub),
       |           cb.cent), p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
       |  FROM res r CROSS JOIN rcb cb),
       |rcode AS (
       |  SELECT vec_id, label, domain, m, c,
       |         row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, c) AS rn
       |  FROM rsub),
       |recon AS (
       |  SELECT ch.vec_id, ch.label, ch.m,
       |         list_transform(list_zip(
       |           list_slice(dc.cent, ch.m * $dsub + 1, ch.m * $dsub + $dsub),
       |           cb.cent), p -> p[1] + p[2]) AS rec
       |  FROM (SELECT vec_id, label, domain, m, c FROM rcode WHERE rn = 1) ch
       |  JOIN dom_cents dc ON dc.domain = ch.domain
       |  JOIN rcb cb ON cb.m = ch.m AND cb.c = ch.c),
       |ms AS (SELECT unnest(generate_series(0, ${graft.functions.Pq.M - 1})) AS m),
       |qraw AS (SELECT embedding AS q_raw FROM embeddings WHERE vec_id = 0),
       |qsub AS (
       |  SELECT ms.m,
       |         list_transform(list_slice(q.q_raw,
       |           ms.m * $dsub + 1, ms.m * $dsub + $dsub),
       |           x -> CAST(x AS DOUBLE)) AS sub
       |  FROM qraw q, ms),
       |qn AS (
       |  SELECT sqrt(list_sum(list_transform(q_raw,
       |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS qnorm
       |  FROM qraw),
       |parts AS (
       |  SELECT rc.vec_id, rc.label, rc.m,
       |         list_sum(list_transform(list_zip(qs.sub, rc.rec),
       |           p -> p[1] * p[2])) AS dp,
       |         list_sum(list_transform(rc.rec, x -> x * x)) AS nn
       |  FROM recon rc JOIN qsub qs ON qs.m = rc.m),
       |scored AS (
       |  SELECT vec_id, label,
       |         list_sum(list(dp ORDER BY m)) AS dpsum,
       |         list_sum(list(nn ORDER BY m)) AS nnsum
       |  FROM parts GROUP BY vec_id, label)""".stripMargin
  }

  /** Exhaustive-probe IVFADC against the committed-domain residual
    * index: with every cell probed, the result is a pure function of
    * (corpus, committed domain table, committed residual codebook), so
    * DuckDB replays the ENTIRE residual pipeline — coarse assignment,
    * residual, encode, ĉ + r̂ reconstruction, per-cell-LUT ADC scoring
    * — value-for-value. A bug in the residual subtraction, the
    * residual encode, the per-cell LUT folding, or the cell-union
    * breaks the hash. (Raw-code PQ keeps its own fullprobe anchors;
    * this is the IVFADC member r17 skipped as non-replayable under a
    * fitted coarse table.)
    */
  lazy val annIvfPqResidualFullProbeQuery = QueryDef(
    "sim_ann_ivfpq_residual_fullprobe",
    s"""WITH $duckPqResidualAdcCtes
       |SELECT s.vec_id, s.label,
       |       round(s.dpsum / (q.qnorm * sqrt(s.nnsum)), 6) AS cos_pq
       |FROM scored s CROSS JOIN qn q
       |WHERE s.vec_id != 0
       |ORDER BY cos_pq DESC, s.vec_id LIMIT 20""".stripMargin)(
    (s, d) => {
      val dir = ensureIvfPqResidualDomainIndex(s, d)
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") === 0L)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
      queryIvfPq(s, dir, q, nprobe = domainCentroids.length, excludeVecId = 0L)
    })

  /** The packed residual store through the identical oracle — the
    * pack/unpack bit layout composed with residual decode, at the value
    * level.
    */
  lazy val annIvfPqResidualPackedFullProbeQuery = QueryDef(
    "sim_ann_ivfpq_residual_packed_fullprobe",
    annIvfPqResidualFullProbeQuery.oracle.get)(
    (s, d) => {
      val dir = ensureIvfPqResidualDomainIndex(s, d)
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") === 0L)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
      queryIvfPq(s, dir, q, nprobe = domainCentroids.length, excludeVecId = 0L,
        packed = true)
    })

  /** Index-health report over a persisted IVF-PQ store: per coarse
    * cell — code count, measured at-rest bytes, corpus share, and skew
    * vs the mean cell (n·nlist/total; the number that sizes the worst
    * probe and the pair bill, and the signal a production deployment
    * watches to decide a re-train — a cell drifting toward skew ≫ 1
    * makes every probe that touches it pay the imbalance). EMPTY cells
    * report too (left join from the centroid table): a dead cell is
    * wasted nlist and a symptom of a stale quantizer. Reads ONLY the
    * index (centroid table + packed codes store, partition-listed) —
    * the corpus is never scanned, so at 100 TB the health check costs
    * the index's bytes, not the data lake's.
    */
  def indexHealth(
      spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val cells = loadCentroids(spark, dir).select("list_id")
    // PQ index → the packed store (true at-rest bytes); raw IVF index
    // → the assigned store, bytes = stored embedding width (elements ×
    // 4-byte floats). Same report either way: the health check follows
    // the index's own storage form.
    val packedPath = new org.apache.hadoop.fs.Path(s"$dir/assigned_pq_packed")
    val hasPacked = packedPath
      .getFileSystem(spark.sparkContext.hadoopConfiguration).exists(packedPath)
    val perCell =
      (if (hasPacked)
        spark.read.parquet(s"$dir/assigned_pq_packed")
          .withColumn("row_bytes", length(col("codes_packed")).cast("long"))
      else
        spark.read.parquet(s"$dir/assigned")
          .withColumn("row_bytes", size(col("embedding")).cast("long") * 4L))
      .groupBy("list_id")
      .agg(count(lit(1)).as("n_codes"),
        sum(col("row_bytes")).as("bytes_at_rest"))
    val joined = cells.join(perCell, Seq("list_id"), "left")
      .select(col("list_id"),
        coalesce(col("n_codes"), lit(0L)).as("n_codes"),
        coalesce(col("bytes_at_rest"), lit(0L)).as("bytes_at_rest"))
    val tot = joined.agg(sum(col("n_codes")).cast("double").as("n_tot"),
      count(lit(1)).cast("double").as("nlist"))
    joined.crossJoin(broadcast(tot))
      .select(col("list_id"), col("n_codes"), col("bytes_at_rest"),
        (floor(col("n_codes") / col("n_tot") * 1e6 + 0.5) / 1e6).as("share"),
        (floor(col("n_codes") * col("nlist") / col("n_tot") * 1e6 + 0.5) / 1e6)
          .as("skew"))
      .orderBy("list_id")
  }

  /** Rebuild a persisted index IN PLACE from its own stored vectors —
    * the maintenance recipe [[indexHealth]]'s skew/dead-cell signal
    * exists to trigger. The refit routes through [[coarseFitAssign]]
    * (two-level above [[twoLevelThreshold]], the same build path as
    * day one), and the swap is the ROLL-FORWARD protocol the store
    * compactions use (resolvePending's _TARGET_ discipline):
    *
    *  1. the new index builds COMPLETELY under `dir/.rebuild` (a
    *     dot-dir, invisible to every parquet listing of the live
    *     stores) while the old index keeps serving; stores the fresh
    *     build does NOT produce get an explicit `_DELETE_*` tombstone
    *     in staging, then the `_SWAP_READY` marker commits the staged
    *     epoch — deletes of live stores NEVER happen before it exists;
    *  2. the `_graft_rebuilding` marker goes down, every store swaps
    *     (staged present → delete old, rename staged in; tombstone →
    *     delete old), the marker lifts on success. Readers
    *     ([[loadCentroids]], hence every probe, join, ingest, serve
    *     batch and health check) REFUSE while the marker is present; a
    *     swap that dies mid-way leaves BOTH markers, and the next
    *     rebuildIndex call ROLLS IT FORWARD (the per-store swap is
    *     idempotent: a store already renamed in has no staged copy
    *     left and is skipped) instead of re-fitting from half-deleted
    *     sources. An UNCOMMITTED staging (no `_SWAP_READY`) is
    *     discarded — the live stores are still intact by (1). Every
    *     delete/rename is require()d: a false return stops the swap
    *     with the refusal marker still protecting readers, never
    *     silently;
    *  3. the fresh build's `_graft_cells_digest` stamp travels with
    *     the swap. Note the enforcement boundary honestly: the marker
    *     and digest are checked when a plan is BUILT (loadCentroids);
    *     a plan built before the swap and executed after can still
    *     scan the new store against the old probe literals — Spark
    *     cannot re-validate a running plan. In practice the exposure
    *     is one in-flight query: the serving stream re-plans every
    *     micro-batch, so its next batch either refuses (mid-swap) or
    *     serves the new epoch;
    *  4. INGEST FENCING: the staged build snapshots the source store
    *     at read time, so ingest batches landing during the (long)
    *     build window would be silently dropped by the swap. The
    *     refusal marker therefore goes up BEFORE the final fence
    *     compare — ingests starting from then on refuse loudly at
    *     loadCentroids — and the compare of the source store's
    *     partition listing against the build-time snapshot ABORTS
    *     loudly (staging discarded, marker lifted, live index
    *     untouched) if ingest advanced during the build. Residual
    *     exposure: a batch already past its loadCentroids check when
    *     the marker went up can still commit after the compare —
    *     quiesce ingest streams around a rebuild (defense-in-depth,
    *     no longer the only guard).
    *
    * Raw IVF indexes refit from `dir/assigned`; PQ indexes from the
    * `assigned_raw` sidecar (codes cannot be refit — a codes-only
    * index is refused loudly: rebuild it from the corpus instead).
    * Residual-ness is preserved via the marker. All ingest batches
    * fold into the rebuilt `ingest_batch=0` partition — the rebuild
    * IS the new epoch. `nlist = 0` keeps the current cell count;
    * pass the sizing rule's value to grow it with the corpus.
    */
  def rebuildIndex(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      nlist: Int = 0): Unit = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = s"$dir/.rebuild"
    val stagingPath = new org.apache.hadoop.fs.Path(staging)
    val ready = new org.apache.hadoop.fs.Path(s"$staging/_SWAP_READY")
    if (fs.exists(stagingPath)) {
      if (fs.exists(ready)) {
        // a committed staged epoch from a swap that died mid-way: the
        // live stores may already be half-deleted and the staged copy
        // is the only complete one — ROLL IT FORWARD, never re-fit
        swapStagedIndex(fs, dir, staging)
        return
      }
      // uncommitted staging: the build never finished, live stores are
      // untouched — discard and build fresh
      require(fs.delete(stagingPath, true),
        s"could not clear stale staging $staging")
    }
    val isPq = fs.exists(new org.apache.hadoop.fs.Path(s"$dir/assigned_pq_packed"))
    val srcStore =
      if (!isPq) s"$dir/assigned"
      else {
        require(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/assigned_raw")),
          s"index at $dir is codes-only — PQ codes cannot be refit into " +
            "new cells (the raw vectors are gone); rebuild from the corpus " +
            "with buildIvfPqIndex, or build future indexes with " +
            "rawSidecar=true to make them rebuildable")
        s"$dir/assigned_raw"
      }
    val residual = isResidualIndex(spark, dir)
    val targetNlist =
      if (nlist > 0) nlist
      else spark.read.parquet(s"$dir/centroids").count().toInt
    val vectors = spark.read.parquet(srcStore)
      .select(col("vec_id"), col("label"), col("embedding"))
    // ingest-fence snapshot: the set of partition dirs the build reads
    def srcListing(): Set[String] = {
      val p = new org.apache.hadoop.fs.Path(srcStore)
      if (!fs.exists(p)) Set.empty
      else {
        val it = fs.listFiles(p, true)
        val b = Set.newBuilder[String]
        while (it.hasNext) {
          val parent = it.next().getPath.getParent.toString
          if (parent.contains("ingest_batch=")) b += parent
        }
        b.result()
      }
    }
    val srcBefore = srcListing()
    // build completely BEFORE the swap: every action below reads the
    // live stores and writes only under the staging dot-dir
    if (isPq)
      buildIvfPqIndex(vectors, staging, nlist = targetNlist,
        rawSidecar = true, residual = residual)
    else buildIvfIndex(vectors, staging, nlist = targetNlist)
    // tombstones for stores the fresh build did not produce (e.g. the
    // quantizer on a flat rebuild, a residual marker on a raw one) —
    // the idempotent swap needs them to distinguish "delete the stale
    // old store" from "already renamed in by an earlier attempt"
    rebuildParts.foreach { s =>
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$staging/$s")))
        fs.create(new org.apache.hadoop.fs.Path(s"$staging/_DELETE_$s"), true)
          .close()
    }
    // FENCE ORDER MATTERS: the refusal marker goes up BEFORE the final
    // listing compare, so an ingest that starts after this point
    // refuses loudly at loadCentroids instead of committing into the
    // window between the compare and the swap's deletes (check-then-
    // commit would silently delete such a batch). A batch already past
    // its loadCentroids check can still land in the window — the fence
    // compare below catches it if it commits before the compare; the
    // documented quiesce advice covers the one-in-flight residue as
    // defense-in-depth rather than as the only guard.
    val marker = new org.apache.hadoop.fs.Path(s"$dir/$rebuildingMarkerName")
    fs.create(marker, true).close()
    if (srcListing() != srcBefore) {
      // abort: live index untouched; lift the marker so readers resume
      require(fs.delete(stagingPath, true),
        s"could not discard staging $staging after an aborted rebuild")
      require(fs.delete(marker, false),
        s"could not lift the rebuild marker $marker after an aborted rebuild")
      throw new IllegalStateException(
        s"ingest advanced under $srcStore while the rebuild was staging — " +
          "the swap would silently drop the new batches; quiesce ingest " +
          "streams around rebuildIndex and re-run")
    }
    fs.create(ready, true).close() // the commit point: deletes may now run
    swapStagedIndex(fs, dir, staging)
  }

  /** Every store/marker a rebuild may need to swap or tombstone. */
  private val rebuildParts = Seq("centroids", cellsDigestName, "quantizer",
    "assigned", "assigned_raw", "assigned_pq", "assigned_pq_packed",
    "_graft_pq_residual")

  /** The idempotent marker-guarded swap of a COMMITTED staged epoch
    * (`_SWAP_READY` present) into the live index dir — see
    * [[rebuildIndex]] step 2. Safe to re-run after a crash at any
    * point: staged-present stores swap, tombstoned stores delete,
    * already-swapped stores no-op.
    */
  private def swapStagedIndex(
      fs: org.apache.hadoop.fs.FileSystem, dir: String, staging: String): Unit = {
    val marker = new org.apache.hadoop.fs.Path(s"$dir/$rebuildingMarkerName")
    fs.create(marker, true).close()
    rebuildParts.foreach { s =>
      val old = new org.apache.hadoop.fs.Path(s"$dir/$s")
      val fresh = new org.apache.hadoop.fs.Path(s"$staging/$s")
      if (fs.exists(fresh)) {
        if (fs.exists(old))
          require(fs.delete(old, true), s"could not delete $old for the swap")
        require(fs.rename(fresh, old), s"could not rename $fresh to $old")
      } else if (fs.exists(new org.apache.hadoop.fs.Path(s"$staging/_DELETE_$s"))) {
        if (fs.exists(old))
          require(fs.delete(old, true), s"could not delete stale $old")
      }
    }
    require(fs.delete(new org.apache.hadoop.fs.Path(staging), true),
      s"could not remove staging $staging after the swap")
    require(fs.delete(marker, false),
      s"could not lift the rebuild marker $marker")
  }

  /** The re-train trigger: read [[indexHealth]]'s report (index bytes
    * only — the corpus is never scanned to DECIDE), and rebuild in
    * place when the worst cell's skew exceeds `maxSkew` or more than
    * `maxDeadFrac` of cells are dead. Returns whether a rebuild ran.
    * Thresholds are the production knobs: skew ≫ 1 makes every probe
    * touching that cell pay the imbalance; dead cells are wasted nlist
    * and the signature of a stale quantizer under drift.
    */
  def rebuildIfUnhealthy(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      maxSkew: Double = 4.0,
      maxDeadFrac: Double = 0.25,
      nlist: Int = 0): Boolean = {
    val h = indexHealth(spark, dir).agg(
      max(col("skew")).as("worst"),
      avg((col("n_codes") === 0L).cast("double")).as("dead")).head()
    val unhealthy = h.getDouble(0) > maxSkew || h.getDouble(1) > maxDeadFrac
    if (unhealthy) rebuildIndex(spark, dir, nlist)
    unhealthy
  }

  /** [[indexHealth]] over the committed-domain residual index, whose
    * cell layout is a pure function of (corpus, committed domain
    * table) — so DuckDB replays the populations from the corpus via
    * the shared assignment CTE while Spark reads them off the INDEX,
    * and the bytes column doubles as a hash-checked proof of the
    * at-rest size law (every packed code is ceil(M·log2(K)/8) = 4
    * bytes). Share/skew use the [[domainMixtureQuery]] floor-rounding
    * spelling so a last-ulp division difference can't flip a digit.
    */
  lazy val annIndexHealthQuery = QueryDef(
    "sim_ann_index_health",
    s"""WITH $duckDomainAssigned,
       |ih_counts AS (
       |  SELECT domain AS list_id, count(*) AS n_codes
       |  FROM dom_assigned GROUP BY domain),
       |ih_cells AS (
       |  SELECT c.domain AS list_id, coalesce(n.n_codes, 0) AS n_codes
       |  FROM dom_cents c LEFT JOIN ih_counts n ON c.domain = n.list_id),
       |ih_tot AS (SELECT CAST(sum(n_codes) AS DOUBLE) AS n_tot,
       |                  CAST(count(*) AS DOUBLE) AS nlist FROM ih_cells)
       |SELECT c.list_id, c.n_codes, 4 * c.n_codes AS bytes_at_rest,
       |       floor(c.n_codes / t.n_tot * 1e6 + 0.5) / 1e6 AS share,
       |       floor(c.n_codes * t.nlist / t.n_tot * 1e6 + 0.5) / 1e6 AS skew
       |FROM ih_cells c CROSS JOIN ih_tot t
       |ORDER BY c.list_id""".stripMargin)(
    (s, d) => indexHealth(s, ensureIvfPqResidualDomainIndex(s, d)))

  /** Production-path ANN quality observability: recall@k of the real
    * (lossy) LSH and IVF probe paths at their registered defaults.
    * Hyperplane/KMeans internals are Spark-specific → no DuckDB oracle
    * (same story as the `_topk` rows it measures); SimilaritySpec pins
    * floors, and the measurement MACHINERY is the hash-verified
    * [[annRecallAuditQuery]] (identical code path, fullprobe inputs).
    */
  val annRecallQuery = QueryDef.unverified("sim_ann_recall")(
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      // ivfpq joins the production panel (r15): the genuinely lossy
      // score path — 4-bit codes — next to the exact-score probes, so
      // quantization-induced recall loss is a queryable metric, not
      // just the SimilaritySpec floor. Probed through the shared
      // per-process store; cos_pq is this panel's cos_sim.
      val pqDir = ensureIvfPqIndex(s, d)
      val resDir = ensureIvfPqResidualIndex(s, d)
      val q = emb.filter(col("vec_id") === 0L)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
      annRecallAudit(
        bruteForceTopK(emb),
        Seq("ivf" -> annIvfTopK(emb), "lsh" -> annTopK(emb),
          "ivfpq" -> queryIvfPq(s, pqDir, q, k = 20, nprobe = 4, excludeVecId = 0L)
            .withColumnRenamed("cos_pq", "cos_sim"),
          // the re-rank twin at the SAME nprobe: the panel's answer to
          // "what does the exact refine stage buy at equal probe cost"
          // — quantization loss disappears from the ranking; only
          // coarse-cell misses (vectors outside the probed cells)
          // remain as recall loss
          "ivfpq_rerank" -> queryIvfPq(s, pqDir, q, k = 20, nprobe = 4,
            excludeVecId = 0L, rerank = 80),
          // residual (IVFADC) twins at IDENTICAL nprobe/rerank on the
          // same fitted coarse recipe: the panel's answer to "what does
          // residual encoding buy at equal probe and refine cost"
          "ivfpq_res" -> queryIvfPq(s, resDir, q, k = 20, nprobe = 4,
            excludeVecId = 0L).withColumnRenamed("cos_pq", "cos_sim"),
          "ivfpq_res_rerank" -> queryIvfPq(s, resDir, q, k = 20, nprobe = 4,
            excludeVecId = 0L, rerank = 80)),
        Seq(1, 5, 10, 20))
    })

  // ------------------------------------------------------ near-dup pairs

  /** Embedding-cosine near-dup pairs (the vector analog of Dedup): pairs
    * sharing an LSH table-bucket, verified with exact cosine ≥ threshold.
    * Same never-all-pairs anatomy as MinHash-LSH: bucket join → distinct
    * candidate pairs → output-sized verify.
    *
    * SIZING CONTRACT at scale: within-bucket pairing is quadratic in
    * bucket size, so `bitsPerTable` must grow with log₂(n) to hold the
    * expected bucket population (n / 2^bits) constant — 8 bits suits the
    * test fixture; ~20 bits suits a 10⁹-vector corpus (same knob as IVF's
    * nlist). Unlike prefix blocks (Dedup), oversized buckets here are not
    * boilerplate noise but genuinely dense near-dup clusters — capping
    * them would drop true pairs, so the correct response to skew is more
    * bits (finer buckets still co-locate ε-close vectors w.h.p.), not a
    * cap. (The historical codegen-size cost of 128 inlined plane dots is
    * gone — bucket keys come from the native graft_hyperplane_buckets
    * expression; see HyperplaneExpression.scala.)
    */
  def cosineNearDupPairs(
      embeddings: DataFrame,
      threshold: Double = 0.45,
      tables: Int = 16,
      bitsPerTable: Int = 8): DataFrame = {
    val buckets = lshBuckets(embeddings, tables, bitsPerTable)
      .select(col("vec_id"), col("tbl"), col("bucket"))
      .cache() // reused as both sides of the candidate self-join
    val candidates = buckets.as("a")
      .join(buckets.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    // Precompute each vector's norm ONCE (corpus-sized work) so the
    // pair-level verify pays a single dot product, not three.
    val vecs = embeddings.select(col("vec_id"), col("embedding"),
      sqrt(dot("embedding", "embedding")).as("nrm"))
    candidates
      .join(vecs.toDF("vec_a", "ea", "na"), "vec_a")
      .join(vecs.toDF("vec_b", "eb", "nb"), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        round(dot("ea", "eb") / (col("na") * col("nb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** The deterministic hyperplane matrix as DuckDB VALUES rows — one
    * row per (table, bit) with its 64-dim plane. [[graft.functions.Hyperplanes]]
    * is a pure splitmix64 stream, so the EXACT planes the native
    * graft_hyperplane_buckets expression hashes with can be embedded in
    * the oracle: Double.toString renders shortest-round-trip text, so
    * the SQL literal parses back to the identical bits on DuckDB's side.
    */
  private def duckPlaneValues(tables: Int, bits: Int): String = {
    val planes = graft.functions.Hyperplanes.planes(tables * bits)
    (for { t <- 0 until tables; b <- 0 until bits } yield
      s"($t, $b, [${planes(t * bits + b).mkString(", ")}])").mkString(", ")
  }

  /** Full DuckDB replay of [[cosineNearDupPairs]] — bucketing included:
    * bucket key t = Σ_b (1 << b over planes with dot > 0), the exact
    * sign rule of graft_hyperplane_buckets (acc > 0 sets the bit) over
    * the exact committed-stream planes, then the same bucket-join →
    * DISTINCT candidates → exact round-6 cosine verify. Every dot is
    * the shared sequential fold ([[duckDot]]), so bucket keys — and
    * therefore the candidate set — are bit-identical across engines:
    * this row hash-verifies the LSH candidate plumbing itself, the one
    * family member r17 left rows-only.
    */
  private def duckNearDupPairs(threshold: Double, tables: Int, bits: Int): String =
    s"""WITH planes(tbl, bit, plane) AS (VALUES ${duckPlaneValues(tables, bits)}),
       |buckets AS (
       |  SELECT e.vec_id, pl.tbl,
       |         sum(CASE WHEN ${duckDot("e.embedding", "pl.plane")} > 0
       |             THEN (CAST(1 AS BIGINT) << pl.bit) ELSE 0 END) AS bucket
       |  FROM embeddings e CROSS JOIN planes pl
       |  GROUP BY e.vec_id, pl.tbl),
       |cands AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM buckets a JOIN buckets b
       |    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
       |v AS (SELECT vec_id, embedding,
       |             sqrt(${duckDot("embedding", "embedding")}) AS nrm
       |      FROM embeddings)
       |SELECT c.vec_a, c.vec_b,
       |       round(${duckDot("va.embedding", "vb.embedding")} / (va.nrm * vb.nrm), 6) AS cos_sim
       |FROM cands c JOIN v va ON c.vec_a = va.vec_id JOIN v vb ON c.vec_b = vb.vec_id
       |WHERE round(${duckDot("va.embedding", "vb.embedding")} / (va.nrm * vb.nrm), 6) >= $threshold
       |ORDER BY vec_a, vec_b""".stripMargin

  val nearDupQuery = QueryDef(
    "sim_cosine_neardup_pairs",
    duckNearDupPairs(0.45, tables = 16, bits = 8))(
    (s, d) => cosineNearDupPairs(Tables.embeddings(s, d)).orderBy("vec_a", "vec_b"))

  /** The same pipeline at a looser verify threshold (0.3): the 0.45 row
    * passes ~1 pair at the verify SF, thin evidence for the bucket
    * plumbing — this row pushes a few hundred pairs through the
    * identical bucket-join/distinct/verify path, so a dropped bucket,
    * mangled key, or non-distinct candidate duplicates the hash breaks.
    */
  val nearDupLoQuery = QueryDef(
    "sim_cosine_neardup_pairs_lo",
    duckNearDupPairs(0.3, tables = 16, bits = 8))(
    (s, d) => cosineNearDupPairs(Tables.embeddings(s, d), threshold = 0.3)
      .orderBy("vec_a", "vec_b"))

  /** Exact cosine pairs within same-label blocks — the shared pair
    * pipeline behind BOTH oracle rows that need a DuckDB-replayable
    * graph ([[labelBlockedQuery]] at 0.3, [[semanticCanonicalQuery]] at
    * 0.5): one spelling, so a norm/rounding change can never silently
    * break one row's hash while the other stays green. Norms are
    * precomputed per vector and the pair dot runs ONCE, feeding both
    * the threshold filter and the output (the first version evaluated
    * the full cosine twice per pair — 4× the fold work).
    */
  def labelBlockedPairs(embeddings: DataFrame, threshold: Double): DataFrame = {
    val e = embeddings.select(col("label"), col("vec_id"), col("embedding"),
      sqrt(dot("embedding", "embedding")).as("nrm"))
    e.toDF("label", "vec_a", "ea", "na")
      .join(e.toDF("label", "vec_b", "eb", "nb"), "label")
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos_sim", round(dot("ea", "eb") / (col("na") * col("nb")), 6))
      .filter(col("cos_sim") >= threshold)
      .select("vec_a", "vec_b", "cos_sim")
  }

  /** Oracle-checkable exact variant on a BLOCKED pair set (same label):
    * proves the cosine arithmetic against DuckDB on a bounded join. (The
    * label here is a stand-in for any real blocking key; the unblocked
    * scale path is [[cosineNearDupPairs]].)
    */
  val labelBlockedQuery = QueryDef(
    "sim_label_blocked_pairs",
    s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |       round(${duckCosine("a.embedding", "b.embedding")}, 6) AS cos_sim
       |FROM embeddings a JOIN embeddings b
       |  ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE round(${duckCosine("a.embedding", "b.embedding")}, 6) >= 0.3
       |ORDER BY vec_a, vec_b""".stripMargin)(
    (s, d) => labelBlockedPairs(Tables.embeddings(s, d), threshold = 0.3)
      .orderBy("vec_a", "vec_b"))

  // --------------------------------------------- semantic decontamination

  /** SEMANTIC benchmark decontamination — the embedding-space member of
    * the decontamination family (Dedup has the lexical forms:
    * pair-attribution shingle gate, exact-union gate, Bloom sweep, span
    * strip). A paraphrased or translated benchmark item shares few
    * 3-token shingles with its leak but sits close in embedding space —
    * exactly the leakage the shingle gates cannot see. Drop every
    * train vector whose cosine against ANY benchmark vector reaches
    * `threshold`; survivors carry their max benchmark cosine so the
    * caller can audit how close the kept tail sits to the suite. A
    * NULL audit column means the row could not be compared — empty
    * benchmark, or a degenerate (zero-norm / NULL) embedding on either
    * side of every pairing (guarded like [[cosine]]'s zero-norm-NULL
    * contract rather than dividing: ANSI mode would otherwise throw on
    * the first corrupt vector). Degenerate TRAIN vectors therefore
    * survive with a NULL audit — semantic comparison is undefined for
    * them, and the lexical gates (Dedup.decontaminate*) remain
    * responsible; dropping them silently here would hide data-quality
    * problems behind a leakage gate.
    *
    * Scale shape: the benchmark side is small by nature (a few thousand
    * suite items) and rides BROADCAST into a nested-loop over the
    * corpus — per train vector the cost is |bench| fused dot products
    * (graft_dot, codegen'd), zero corpus shuffle except the per-vector
    * max aggregate, which repartitions nothing the scan didn't already
    * give (map-side combine → vec_id-sized). This linear
    * corpus × small-bench pass IS the standard production shape; for a
    * benchmark too large to broadcast, route candidates through
    * [[lshBuckets]] / the IVF index first and verify exactly, as
    * [[cosineNearDupPairs]] does.
    */
  def semanticDecontaminate(
      embeddings: DataFrame,
      benchPred: Column,
      threshold: Double = 0.9): DataFrame = {
    require(threshold > 0, s"threshold must be positive (got $threshold)")
    // NULL-predicate rows count as train, not silently dropped: a bare
    // filter(is_bench)/filter(!is_bench) pair excludes NULL from BOTH
    // sides, so a caller passing a nullable predicate would lose those
    // train vectors from the output entirely with no warning
    val e = embeddings.select(col("vec_id"), col("label"), col("embedding"),
      sqrt(dot("embedding", "embedding")).as("nrm"),
      coalesce(benchPred, lit(false)).as("is_bench"))
    semanticSurvivorsAgainst(
      e.filter(!col("is_bench")),
      e.filter(col("is_bench"))
        .select(col("embedding").as("be"), col("nrm").as("bn")),
      threshold)
  }

  /** The two-frame core of [[semanticDecontaminate]], shared with the
    * streaming gate ([[graft.streaming.Jobs.semanticGateBatch]]): train
    * rows (vec_id, label, embedding, nrm) against an explicit benchmark
    * frame (be, bn), broadcast — survivors with their max bench cosine
    * as the audit column. One definition, so the batch and streaming
    * verdicts share every arithmetic detail (rounding, zero-norm NULL
    * contract, left-join empty-bench behavior).
    */
  private[graft] def semanticSurvivorsAgainst(
      train: DataFrame,
      bench: DataFrame,
      threshold: Double): DataFrame =
    train.select(col("vec_id"), col("label"))
      .join(semanticMaxCosAgainst(train, bench), Seq("vec_id"), "left")
      .filter(coalesce(col("max_bench_cos"), lit(-1.0)) < threshold)
      .select(col("vec_id"), col("label"), col("max_bench_cos"))

  /** The scoring kernel itself — (vec_id, embedding, nrm) against a
    * broadcast (be, bn) benchmark → per-vector max rounded cosine. The
    * ONE definition of the semantic verdict arithmetic, consumed by the
    * batch operator, the streaming gate (via
    * [[semanticSurvivorsAgainst]]), and the streaming audit's stage 9
    * (drop side) — so the three surfaces cannot drift in rounding,
    * zero-norm NULL contract, or max semantics.
    */
  private[graft] def semanticMaxCosAgainst(
      train: DataFrame,
      bench: DataFrame): DataFrame =
    train.crossJoin(broadcast(bench))
      .select(col("vec_id"),
        when(col("nrm") > 0 && col("bn") > 0,
          round(dot("embedding", "be") / (col("nrm") * col("bn")), 6)).as("cs"))
      .groupBy("vec_id").agg(max(col("cs")).as("max_bench_cos"))

  /** Norm-annotated (vec_id, label, embedding, nrm) projection — the
    * shape both sides of the semantic gate store/stream in.
    */
  private[graft] def withNorm(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), col("label"), col("embedding"),
      sqrt(dot("embedding", "embedding")).as("nrm"))

  /** Registered with vec_id % 37 = 0 as the held-out "benchmark" slice
    * and a fixture-discriminating threshold (the synthetic embeddings'
    * max bench cosines span 0.03-0.39, so 0.25 exercises both branches;
    * production thresholds sit near 0.9 on meaningful embeddings).
    * Fully oracle-replayable: same round-then-max, same left-join NULL
    * contract.
    */
  val semanticDecontaminateQuery = QueryDef(
    "sim_decontaminate_semantic",
    s"""WITH bench AS (
       |  SELECT embedding FROM embeddings WHERE vec_id % 37 = 0),
       |m AS (
       |  SELECT t.vec_id,
       |         max(CASE WHEN sqrt(${duckDot("t.embedding", "t.embedding")}) > 0
       |                   AND sqrt(${duckDot("b.embedding", "b.embedding")}) > 0
       |              THEN round(${duckCosine("t.embedding", "b.embedding")}, 6) END) AS max_bench_cos
       |  FROM embeddings t CROSS JOIN bench b
       |  WHERE t.vec_id % 37 <> 0
       |  GROUP BY t.vec_id)
       |SELECT t.vec_id, t.label, m.max_bench_cos
       |FROM embeddings t LEFT JOIN m ON t.vec_id = m.vec_id
       |WHERE t.vec_id % 37 <> 0
       |  AND coalesce(m.max_bench_cos, -1.0) < 0.25
       |ORDER BY t.vec_id""".stripMargin)(
    (s, d) => semanticDecontaminate(
      // no scanWide here, measured deliberately: the rebalanced variant
      // is reproducibly ~3x the process CPU (8.9 -> 30 s at sf0.1) —
      // the broadcast nested-loop's per-task overheads outweigh the
      // fixture's single-split scan skew for this row shape
      Tables.embeddings(s, d), col("vec_id") % 37 === 0, threshold = 0.25)
      .orderBy("vec_id"))

  // ------------------------------------------------------ semantic dedup

  /** SEMANTIC dedup end-to-end (the SemDeDup shape): embedding-cosine
    * near-dup pairs → transitive closure → one canonical vector per
    * semantic family. Pair formation and clustering reuse the verified
    * pieces ([[cosineNearDupPairs]]' bucket-join anatomy,
    * [[Dedup.nearDupClusters]]' min-label propagation); this function
    * just renames the pair columns into the clusterer's contract and
    * joins the survivors back to their attributes.
    */
  def semanticCanonical(
      embeddings: DataFrame,
      pairs: DataFrame): DataFrame = {
    val docsLike = embeddings.select(col("vec_id").as("doc_id"))
    val asDocPairs = pairs.select(
      col("vec_a").as("doc_a"), col("vec_b").as("doc_b"), col("cos_sim"))
    Dedup.canonicalSurvivors(docsLike, asDocPairs)
      .join(embeddings.select(col("vec_id").as("keep_vec_id"), col("label")),
        col("keep_doc_id") === col("keep_vec_id"))
      .select(col("keep_vec_id"), col("label"), col("n_members"))
  }

  /** Registered with the ORACLE-CHECKABLE pair graph (label-blocked
    * exact cosine, the hash-verified [[labelBlockedQuery]] measure at
    * threshold 0.5) so DuckDB can replay closure + canonicalization with
    * the same recursive CTE as `dedup_cluster_canonical` — the embedding
    * analog of that row. The unblocked scale path feeds
    * [[cosineNearDupPairs]] into [[semanticCanonical]] instead (same
    * contract, LSH-bucketed candidates).
    */
  val semanticCanonicalQuery = QueryDef(
    "sim_semantic_canonical",
    s"""WITH RECURSIVE pairs AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM embeddings a JOIN embeddings b
       |    ON a.label = b.label AND a.vec_id < b.vec_id
       |  WHERE round(${duckCosine("a.embedding", "b.embedding")}, 6) >= 0.5),
       |edges AS (
       |  SELECT vec_a AS src, vec_b AS dst FROM pairs
       |  UNION SELECT vec_b, vec_a FROM pairs),
       |reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |labels AS (
       |  SELECT src AS vec_id, least(src, min(dst)) AS cluster
       |  FROM reach GROUP BY src),
       |sizes AS (SELECT cluster, count(*) AS n_members FROM labels GROUP BY cluster)
       |SELECT e.vec_id AS keep_vec_id, e.label,
       |       coalesce(s.n_members, 1) AS n_members
       |FROM embeddings e
       |LEFT JOIN labels l ON e.vec_id = l.vec_id
       |LEFT JOIN sizes s ON e.vec_id = s.cluster
       |WHERE l.cluster IS NULL OR l.cluster = e.vec_id
       |ORDER BY keep_vec_id""".stripMargin)(
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      semanticCanonical(emb, labelBlockedPairs(emb, threshold = 0.5))
        .orderBy("keep_vec_id")
    })

  // ------------------------------------------------- int8 quantization

  /** Per-vector symmetric int8 quantization audit: scale (= absmax/127)
    * and mean squared reconstruction error — the go/no-go report before
    * compressing a 100 TB float32 embedding store 4× (is the MSE within
    * recall tolerance, per vector, not just on average?). Pure scan-side
    * compute through two native codegen'd expressions (graft_absmax /
    * graft_int8_mse — whole-stage-codegen tight loops, no shuffle, no
    * HOF interpretation), so throughput is parquet-scan-bound at any
    * scale. Outputs floor-rounded at 1e-10 (the engine-independent
    * convention) so the DuckDB list-fold oracle hash-matches.
    */
  def quantizeInt8Stats(embeddings: DataFrame): DataFrame = {
    def r10(c: Column): Column = floor(c * 1e10 + 0.5) / 1e10
    embeddings.select(
      col("vec_id"), col("label"),
      r10(expr("graft_absmax(embedding)") / 127.0).as("scale"),
      r10(expr("graft_int8_mse(embedding)")).as("mse"))
  }

  val quantizeInt8Query = QueryDef(
    "sim_quantize_int8",
    """WITH base AS (
      |  SELECT vec_id, label, embedding,
      |         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS amax
      |  FROM embeddings
      |)
      |SELECT vec_id, label,
      |       floor(amax / 127.0 * 1e10 + 0.5) / 1e10 AS scale,
      |       floor(CASE WHEN amax = 0 THEN 0.0 ELSE
      |         list_sum(list_transform(embedding, x ->
      |           (CAST(x AS DOUBLE)
      |              - floor(CAST(x AS DOUBLE) / (amax / 127.0) + 0.5) * (amax / 127.0))
      |           * (CAST(x AS DOUBLE)
      |              - floor(CAST(x AS DOUBLE) / (amax / 127.0) + 0.5) * (amax / 127.0))))
      |         / len(embedding) END * 1e10 + 0.5) / 1e10 AS mse
      |FROM base ORDER BY vec_id""".stripMargin)(
    (s, d) => quantizeInt8Stats(Tables.embeddings(s, d)).orderBy("vec_id"))

  // ---------------------------------------------------- dimension stats

  /** Per-dimension profile of the embedding corpus — the QA pass run
    * before trusting a vector store: count, min/max, mean, and population
    * variance for every dimension. A collapsed dimension (variance ≈ 0)
    * or a runaway one (|mean| or max far off the others) is how encoder
    * regressions and normalization bugs surface at corpus scale.
    *
    * Scale shape: posexplode → ONE hash aggregate over exactly `dims`
    * groups (64 here) — map-side partial aggregation reduces each
    * partition to `dims` rows before the single tiny shuffle, so the cost
    * is the scan itself. Sums run over DECIMAL(18,9)-cast values (exact,
    * order-independent — a raw double sum would be partition-order-
    * dependent); products of scale-9 decimals stay inside DECIMAL(38)
    * in BOTH engines (a (24,10) cast would push DuckDB's multiply past
    * width 38, silently degrading it to double). Mean and variance are
    * spelled identically on both sides from the two exact sums.
    */
  def embeddingDimStats(embeddings: DataFrame): DataFrame = {
    def r10(c: Column): Column = floor(c * 1e10 + 0.5) / 1e10
    embeddings
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("dim").cast("long").as("dim"), col("x"),
        col("x").cast("double").cast("decimal(18,9)").as("xd"))
      .groupBy("dim")
      .agg(
        count(lit(1)).as("n"),
        min(col("x")).as("min_v"),
        max(col("x")).as("max_v"),
        sum(col("xd")).cast("double").as("s"),
        sum(col("xd") * col("xd")).cast("double").as("ss"))
      .select(col("dim"), col("n"), col("min_v"), col("max_v"),
        r10(col("s") / col("n")).as("mean"),
        r10(col("ss") / col("n") - (col("s") / col("n")) * (col("s") / col("n")))
          .as("variance"))
  }

  val dimStatsQuery = QueryDef(
    "sim_embedding_dimstats",
    """WITH x AS (
      |  SELECT i - 1 AS dim,
      |         embedding[i] AS xf,
      |         CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(18,9)) AS xd
      |  FROM embeddings,
      |       LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) t),
      |g AS (
      |  SELECT dim, count(*) AS n, min(xf) AS min_v, max(xf) AS max_v,
      |         CAST(sum(xd) AS DOUBLE) AS s, CAST(sum(xd * xd) AS DOUBLE) AS ss
      |  FROM x GROUP BY 1)
      |SELECT dim, n, min_v, max_v,
      |       floor(s / n * 1e10 + 0.5) / 1e10 AS mean,
      |       floor((ss / n - (s / n) * (s / n)) * 1e10 + 0.5) / 1e10 AS variance
      |FROM g ORDER BY dim""".stripMargin)(
    (s, d) => embeddingDimStats(Tables.embeddings(s, d)).orderBy("dim"))

  // ----------------------------------------------------- hard negatives

  /** Hard-negative mining for contrastive training: for each anchor,
    * the k most-similar vectors carrying a DIFFERENT label — the
    * "looks alike, isn't" examples that make embedding/reranker training
    * effective, mined deterministically instead of sampled.
    *
    * Scale shape: the anchor set is bounded (vec_id % anchorMod — in
    * production, the current training batch) and BROADCASTS into a
    * nested-loop join against the corpus: candidates-per-anchor work,
    * never an all-pairs corpus join. Ranking windows partition by
    * anchor — bounded partitions. cos_sim is rounded to 6 decimals
    * BEFORE ranking (this family's convention) with vec_id breaking
    * ties, so the keep-set is engine-independent.
    */
  def hardNegatives(
      embeddings: DataFrame,
      anchorMod: Int = 50,
      k: Int = 5): DataFrame = {
    require(anchorMod > 0 && k > 0, s"anchorMod and k must be > 0 (got $anchorMod, $k)")
    val anchors = embeddings.filter(col("vec_id") % anchorMod === 0)
      .select(col("vec_id").as("anchor_id"), col("label").as("anchor_label"),
        col("embedding").as("a_emb"))
    embeddings
      .join(broadcast(anchors), col("label") =!= col("anchor_label"))
      .select(col("anchor_id"), col("vec_id"), col("label"),
        round(cosine("embedding", "a_emb"), 6).as("cos_sim"))
      .withColumn("neg_rank", row_number().over(
        Window.partitionBy("anchor_id").orderBy(col("cos_sim").desc, col("vec_id")))
        .cast("long"))
      .filter(col("neg_rank") <= k)
  }

  val hardNegativesQuery = QueryDef(
    "sim_hard_negatives",
    s"""WITH a AS (SELECT vec_id AS anchor_id, label AS anchor_label, embedding AS a_emb
       |           FROM embeddings WHERE vec_id % 50 = 0),
       |c AS (SELECT a.anchor_id, b.vec_id, b.label,
       |             round(${duckCosine("b.embedding", "a.a_emb")}, 6) AS cos_sim
       |      FROM embeddings b JOIN a ON b.label != a.anchor_label),
       |r AS (SELECT *, row_number() OVER
       |               (PARTITION BY anchor_id ORDER BY cos_sim DESC, vec_id) AS neg_rank
       |      FROM c)
       |SELECT anchor_id, vec_id, label, cos_sim, neg_rank FROM r
       |WHERE neg_rank <= 5 ORDER BY anchor_id, neg_rank""".stripMargin)(
    (s, d) => hardNegatives(Tables.embeddings(s, d)).orderBy("anchor_id", "neg_rank"))

  // ------------------------------------------------------ learned domains

  /** Committed corpus-domain centroids — unsupervised mixture control
    * for a corpus with NO provenance column (the 100 TB reality: the
    * `source`-stratified mixing rows need a label the bytes rarely
    * carry; these domains are learned from the embeddings themselves).
    * DATA, not code: emitted by the deterministic
    * `sbt "runMain graft.tools.DomainTrain"` (full-dim Lloyd's k-means,
    * spread seeding by vec_id rank, lowest-id tie-break, 6-decimal
    * rounding — the PqTrain discipline), so the Scala literal, the
    * assignment arithmetic, and the DuckDB VALUES list parse identical
    * doubles. K=8 fits the fixture; production commits a bigger table,
    * the operators are table-size-agnostic.
    */
  val domainCentroids: Array[Array[Double]] = Array(
    Array(-0.017834, -0.003864, 0.032788, -0.02381, -0.009658, -0.042518, -0.029225, 0.024658,
      0.043254, 0.025847, -0.011097, 0.0079, 0.013377, -0.044045, 0.03126, -0.03028,
      0.006704, 0.031052, 0.012159, -0.008523, -0.033257, 0.005578, 0.028394, -0.040023,
      0.006883, 0.042418, 0.03722, -0.039854, -0.011924, 0.04561, 0.007935, 0.092019,
      0.014973, -0.043396, -0.027683, -0.001448, -0.043832, 0.010168, -0.025704, -0.013771,
      0.005643, -0.019958, -0.02768, 0.016828, 0.01554, 0.052703, 0.03915, 0.005202,
      -0.039785, -0.080066, 0.001986, 0.042936, 0.041087, -0.011086, -0.019479, 0.041312,
      0.013349, -0.001863, -0.040841, -0.062429, -0.010484, 0.023429, -0.006939, -0.031686),
    Array(0.009533, -0.023237, 0.011066, 0.032362, 0.040446, 0.007866, -0.010747, 0.001686,
      0.02007, -0.051983, 0.04513, 0.030402, 0.014035, 0.04843, -0.07905, 0.080654,
      0.002, 0.016432, -0.056679, -0.054921, -0.004989, -0.009269, 0.006057, -0.091716,
      -0.008218, -0.012959, -0.059083, 0.009421, 0.036106, -0.018767, 0.05543, -0.034426,
      -0.010216, -0.044701, -0.053304, 0.001289, 0.012554, -0.013547, -0.0051, 0.019592,
      0.029721, 0.006296, 0.02386, 7.59E-4, -0.060368, 0.037864, 0.047891, 0.043473,
      -0.00923, -0.020527, 7.61E-4, 0.035386, 0.038619, 0.076687, 0.052868, 0.003648,
      -0.034414, 0.012606, 0.001695, -0.004989, 0.014923, -0.008918, 0.04817, 0.027656),
    Array(-0.008985, -0.030115, 0.04784, 0.035076, -0.006991, -0.032097, 0.011456, 0.083625,
      -0.032816, 0.077247, -0.016418, 0.047717, 0.013798, 0.00286, 0.049571, 0.029197,
      0.024839, -0.013928, 0.015755, 0.015146, 0.004028, -0.007952, -0.013013, -0.001588,
      0.002881, 0.003677, 0.001333, 0.047704, -0.045683, -0.031785, 0.017087, -0.047936,
      0.037171, 0.017362, -0.006848, 0.079232, 0.006477, -0.035311, -0.024013, -0.035355,
      0.028007, -0.009278, -0.023366, -0.010073, -0.02775, -0.070134, -0.046771, 0.008282,
      0.021779, 0.018699, 0.038808, 0.019027, 0.006123, 0.024303, 0.048469, -0.022155,
      -0.009504, 0.015734, -0.016532, -0.003056, -0.009023, 0.005435, -0.072731, -0.035082),
    Array(0.036854, -0.021081, -0.024413, 0.034425, -0.096136, -0.017482, -0.013371, -0.069712,
      -0.01925, -0.003281, 0.001948, -0.018562, -0.0637, 0.005671, -0.03876, -0.020801,
      -0.013095, -0.013762, -0.022299, 0.009411, 0.007011, 0.041475, -0.018325, 0.088359,
      -0.00114, 0.002299, -0.007843, -0.013964, 0.02095, 0.014127, -0.002596, -0.030227,
      -0.007345, -0.039022, 0.014975, 0.008205, -3.76E-4, -0.079349, -0.00142, 0.044855,
      0.049998, 0.053965, 0.088365, 0.015989, -0.018943, 0.010226, 0.038466, -0.040337,
      0.035033, 0.033067, 0.013173, -0.024455, 0.04069, -0.045546, -0.028787, 0.015999,
      -9.69E-4, -0.007547, 0.002983, 0.005273, -0.033816, 0.013092, 0.010493, 0.002934),
    Array(0.027881, -0.034805, -0.001769, -0.035452, 0.045931, 0.023697, -0.067022, -0.013782,
      0.02849, 0.025298, 0.005692, -0.027301, 0.023471, -0.018899, 0.013206, 0.019315,
      0.034314, 0.042375, 0.038273, 0.041353, -0.016068, -0.00802, -0.005087, -0.009485,
      -0.041604, -0.0013, -0.014776, 0.005069, 0.016956, -0.028992, 0.004431, -0.022982,
      -0.007094, 0.039683, 0.081221, -0.053205, -0.01445, 0.025827, -0.012407, -0.013261,
      -0.042344, -0.01961, 0.016634, 7.6E-4, 0.002215, 0.012883, -0.067524, 0.041178,
      -0.012148, -0.007386, -0.015422, -0.033532, 0.001601, -0.018291, 0.036201, -0.003033,
      -0.024659, 0.03345, 0.04633, -0.019182, -0.052244, -0.008409, 0.040671, -0.020402),
    Array(-0.038331, 0.037829, -0.005436, -0.061856, -0.015857, 0.0384, 0.007139, 0.009657,
      0.010004, -0.065585, -0.041527, 0.003505, -0.023805, 0.026784, -0.04124, -0.012972,
      0.038474, -0.028177, 0.038344, 0.011048, 0.001926, 0.043016, 0.077894, -0.030936,
      0.017538, 0.038006, -0.039747, -0.019325, -0.017149, -0.022091, -0.064469, 0.024365,
      -0.008431, -0.001477, -0.047247, -0.007631, 0.059769, 0.051815, 0.063934, -0.028894,
      -8.38E-4, 0.050167, -0.033637, -0.042703, -0.032645, 5.33E-4, 0.003344, -0.060305,
      0.031921, -0.039068, -0.037819, -5.68E-4, -0.021978, -0.029603, -0.008676, -0.079034,
      0.021556, -0.013019, -0.003392, 0.021985, -0.021445, 0.079322, -0.008588, -0.006903),
    Array(0.036128, 0.059992, 0.009315, 0.026659, 0.043215, 0.009217, -0.03518, 0.048273,
      -0.050282, -0.065745, 0.015478, -0.051432, -0.06484, -0.0738, -0.013531, -6.38E-4,
      -0.066723, 0.014066, 0.010785, -0.012432, -0.007236, -0.010747, 0.009942, 0.02959,
      -0.006372, -0.002564, 0.054036, 0.001943, 0.004182, 0.025407, -0.003113, -0.011858,
      0.004081, 0.004578, 0.030178, 0.003394, -0.045343, 0.036492, 0.005368, 0.029542,
      -0.045058, -0.058929, 0.008405, -0.004793, -0.049755, 0.015831, -6.59E-4, 0.054204,
      0.003563, 0.029853, 0.065592, -0.029503, -0.052117, -0.015214, -0.021184, -0.029682,
      0.093255, 2.2E-4, -0.015705, 0.046565, 0.027256, -0.039288, -0.006342, 0.039204),
    Array(-0.028871, 0.003798, -0.044381, -0.035518, 0.060127, 0.081303, 0.007262, -0.015045,
      -0.032054, 0.002222, 0.047927, 0.030147, 0.033935, 0.078725, 0.0337, -0.013402,
      -0.0123, -0.019831, -0.048921, -0.00749, 0.024952, -0.019665, -0.032289, -0.005561,
      0.025174, 0.030657, 0.002289, 0.083084, -0.007338, 0.018161, 0.015545, -0.021596,
      0.033138, -0.001525, 0.017609, -0.011628, 0.003383, -0.006397, 0.015863, 0.001363,
      -0.025489, -0.070561, -0.039327, 0.006524, 0.049365, -0.024849, 0.008289, -0.021667,
      -0.038762, -0.007164, 0.008752, -0.020709, -0.002582, -0.010536, -0.030974, 0.017195,
      -0.001541, -0.066225, -0.018738, -0.024037, 0.08885, -0.011225, -0.012112, -0.055186),
  )

  private def duckDomainValues: String =
    domainCentroids.zipWithIndex.map { case (c, i) =>
      s"($i, [${c.mkString(", ")}])"
    }.mkString(", ")

  /** The committed-centroid assignment + its DuckDB replay, shared by
    * both domain rows: d2 = e·e − 2·e·c + c·c with every dot the same
    * sequential double fold on both engines ([[dot]]/[[duckDot]] — the
    * bit-parity every cosine row already proves), lowest (d2, domain)
    * wins. Ends in `dom_assigned(vec_id, label, domain)`.
    */
  private def duckDomainAssigned: String =
    s"""dom_cents(domain, cent) AS (SELECT * FROM (VALUES $duckDomainValues) t),
       |dom_d2 AS (
       |  SELECT e.vec_id, e.label, c.domain,
       |         ${duckDot("e.embedding", "e.embedding")}
       |         - 2 * ${duckDot("e.embedding", "c.cent")}
       |         + ${duckDot("c.cent", "c.cent")} AS d2
       |  FROM embeddings e CROSS JOIN dom_cents c),
       |dom_assigned AS (
       |  SELECT vec_id, label, domain, d2 FROM (
       |    SELECT vec_id, label, domain, d2,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY d2, domain) AS rn
       |    FROM dom_d2) WHERE rn = 1)""".stripMargin

  /** Domain of every vector under the committed centroids: ZERO-shuffle
    * scan-side argmin — the K centroids ride the plan as literals, d2_k
    * = e·e − 2·e·c_k + c_k·c_k per row (each dot the codegen'd
    * graft_dot; c_k·c_k is a driver-side left-fold over the committed
    * doubles, the same sequential order as duckDot), and the winner is
    * `least(struct(d2_k, k)...)` — struct ordering IS the (d2, domain)
    * tie-break, evaluated inside whole-stage codegen. Contrast
    * [[nearestCellAssignment]] (fitted store, K× row blowup + window):
    * against a COMMITTED table the argmin needs no join and no
    * exchange at all, so at 100 TB this runs at parquet scan speed —
    * and the committed table is what makes the result a pure function
    * of (corpus, table) and therefore DuckDB-replayable.
    */
  /** The per-centroid (d2, domain) candidate structs over `embedding` —
    * ONE spelling of the committed-table argmin arithmetic, shared by
    * [[assignDomains]] and [[semDeDup]] so the two can never disagree
    * on which domain a vector lands in.
    */
  private def domainCandidates: Seq[Column] = {
    val ee = dot("embedding", "embedding")
    domainCentroids.zipWithIndex.map { case (c, k) =>
      var cc = 0.0
      var i = 0
      while (i < c.length) { cc += c(i) * c(i); i += 1 }
      struct(
        (ee - lit(2.0) * call_function("graft_dot",
          col("embedding"), typedLit(c.toSeq)) + lit(cc)).as("d2"),
        lit(k).as("domain"))
    }
  }

  def assignDomains(embeddings: DataFrame): DataFrame =
    embeddings
      .withColumn("best", least(domainCandidates: _*))
      .select(col("vec_id"), col("label"), col("best.domain").as("domain"))

  /** Learned-domain mixture report: how the corpus distributes over the
    * committed domains — the number a mixture-controlled training run
    * watches (drift here = the corpus composition moved; retrain the
    * domain table or adjust quotas). One scan + an 8-row aggregate.
    */
  val domainMixtureQuery = QueryDef(
    "sim_domain_mixture",
    s"""WITH $duckDomainAssigned,
       |tot AS (SELECT count(*) AS n FROM dom_assigned)
       |SELECT domain, count(*) AS n_vecs,
       |       floor(count(*) / (SELECT CAST(n AS DOUBLE) FROM tot) * 1e6 + 0.5) / 1e6 AS share
       |FROM dom_assigned GROUP BY domain ORDER BY domain""".stripMargin)(
    (s, d) => {
      val assigned = assignDomains(Tables.embeddings(s, d))
      val tot = assigned.agg(count(lit(1)).cast("double").as("n"))
      assigned.groupBy("domain").agg(count(lit(1)).as("n_vecs"))
        .crossJoin(broadcast(tot))
        .select(col("domain"), col("n_vecs"),
          (floor(col("n_vecs") / col("n") * 1e6 + 0.5) / 1e6).as("share"))
        .orderBy("domain")
    })

  /** Temperature-rebalanced sampling over the LEARNED domains — the
    * [[graft.ops.Coverage.temperatureTakeSample]] quota-and-take
    * discipline (alpha=0.5 flattening, 10-decimal share stabilization,
    * md5 rank order: content-deterministic under any file layout) with
    * the committed-centroid domain as the stratum key instead of a
    * provenance column. THE unsupervised mixture-control operator:
    * upweight rare corpus regions without knowing what they are.
    */
  val domainRebalanceQuery = QueryDef(
    "sim_domain_rebalance",
    s"""WITH $duckDomainAssigned,
       |counts AS (
       |  SELECT domain, count(*) AS n_k, pow(count(*), 0.5) AS w_k
       |  FROM dom_assigned GROUP BY domain),
       |quota AS (
       |  SELECT domain,
       |         least(n_k, CAST(floor(200.0 * (floor(w_k / (SELECT sum(w_k) FROM counts) * 1e10 + 0.5) / 1e10) + 0.5) AS BIGINT)) AS take_k
       |  FROM counts),
       |ranked AS (
       |  SELECT vec_id, domain,
       |         row_number() OVER (PARTITION BY domain ORDER BY md5(CAST(vec_id AS VARCHAR))) AS rn
       |  FROM dom_assigned)
       |SELECT r.vec_id, r.domain FROM ranked r JOIN quota q ON r.domain = q.domain
       |WHERE r.rn <= q.take_k
       |ORDER BY vec_id""".stripMargin)(
    (s, d) => {
      val assigned = assignDomains(Tables.embeddings(s, d))
      val counts = assigned.groupBy("domain").agg(count(lit(1)).as("n_k"))
        .withColumn("w_k", pow(col("n_k").cast("double"), 0.5))
      val z = counts.agg(sum(col("w_k")).as("z"))
      val share = floor(col("w_k") / col("z") * 1e10 + 0.5) / 1e10
      val quota = counts.crossJoin(broadcast(z))
        .select(col("domain"),
          least(col("n_k"), floor(lit(200.0) * share + 0.5).cast("long")).as("take_k"))
      val w = Window.partitionBy("domain").orderBy(md5(col("vec_id").cast("string")))
      assigned
        .withColumn("rn", row_number().over(w))
        .join(broadcast(quota), "domain")
        .filter(col("rn") <= col("take_k"))
        .select(col("vec_id"), col("domain"))
        .orderBy("vec_id")
    })

  // ------------------------------------------------------------ SemDeDup

  /** One-scan projection behind [[semDeDup]]: the committed-centroid
    * argmin ([[domainCandidates]] — same structs as [[assignDomains]])
    * plus the vector itself, its norm, and its OWN-centroid distance
    * `d2` — everything the pair stage and the keep-rule need, computed
    * scan-side with zero exchanges.
    */
  private[graft] def domainAssignedD2(embeddings: DataFrame): DataFrame =
    embeddings
      .withColumn("best", least(domainCandidates: _*))
      .select(col("vec_id"), col("label"), col("embedding"),
        col("best.domain").as("domain"), col("best.d2").as("d2"),
        sqrt(dot("embedding", "embedding")).as("nrm"))

  /** Dropped vec_ids under the SemDeDup keep-rule: within a domain,
    * every ε-close pair eliminates its member CLOSER to the centroid
    * (larger-d2 survives; tie → lower vec_id survives). A vector is
    * dropped iff it loses ANY pair — survivors are the local d2-maxima
    * of the ε-neighborhood graph, which never drops a vector unless an
    * ε-close, more-centroid-distant neighbor exists. (Per-component
    * keep-one would additionally drop chain members that are NOT
    * ε-close to the survivor — this rule is the tighter one, and it is
    * one deterministic relational pass instead of a transitive closure.)
    */
  private def semDeDupDroppedIds(assigned: DataFrame, eps: Double): DataFrame =
    semDeDupPairLosses(assigned, eps).select("vec_id")

  /** The keep-rule with WINNER attribution: every ε-losing vector keyed
    * to the smallest pair-opponent that beat it — what a rejection
    * ledger renders as the drop reason (`semdup_of=`), and the ONE
    * spelling of the pair arithmetic [[semDeDupDroppedIds]] (the
    * hash-verified committed rows) also flows through, so the ledger
    * and the oracle can never drift on a verdict. Input must carry
    * (domain, vec_id, embedding, nrm, d2) — the [[domainAssignedD2]]
    * shape.
    */
  private[graft] def semDeDupPairLosses(assigned: DataFrame, eps: Double): DataFrame = {
    val l = assigned.select(col("domain"), col("vec_id").as("vec_a"),
      col("embedding").as("ea"), col("nrm").as("na"), col("d2").as("da"))
    val r = assigned.select(col("domain"), col("vec_id").as("vec_b"),
      col("embedding").as("eb"), col("nrm").as("nb"), col("d2").as("db"))
    // The within-domain pair join is the [[cellPairJoin]] situation with
    // the committed domain table as the cell space: at fixture scale the
    // 8-domain key caps hash parallelism and AQE broadcast-converts the
    // tiny build side, so the quadratic pair/cosine stage runs at the
    // corpus scan's parallelism (one row group = ONE task). Same fix,
    // same no-op at scale: salt the pair key — vec_b rows carry a
    // deterministic per-vector salt, vec_a rows explode over the salt
    // range and pin their exchange at the configured shuffle width (the
    // exploded side is the bigger one, so it is the side that streams;
    // the un-exploded side stays broadcast-sized). At production the
    // domain table grows with the corpus (the SemDeDup paper's own
    // scaling argument — 50k clusters at web scale ≫ any shuffle
    // width), the salt range is 1, and this is byte-for-byte the old
    // plan. Pair SET is unchanged (each (a,b) matches on exactly
    // s(vec_b)), so the hash-verified rows are unaffected.
    val spark = assigned.sparkSession
    val width = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val nDom = domainCentroids.length
    val salts = math.max(1, math.ceil(4.0 * width / math.max(nDom, 1)).toInt)
    val paired =
      if (salts <= 1) l.join(r, Seq("domain"))
      else
        l.withColumn("pair_salt", explode(typedLit((0 until salts).toList)))
          .repartition(width, col("domain"), col("pair_salt"))
          .join(r.withColumn("pair_salt",
            pmod(xxhash64(col("vec_b")), lit(salts.toLong)).cast("int")),
            Seq("domain", "pair_salt"))
          .drop("pair_salt")
    paired
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos_sim", round(dot("ea", "eb") / (col("na") * col("nb")), 6))
      .filter(col("cos_sim") >= eps)
      .select(
        when(col("da") > col("db"), col("vec_b"))
          .when(col("da") < col("db"), col("vec_a"))
          .otherwise(col("vec_b")).as("vec_id"),
        when(col("da") > col("db"), col("vec_a"))
          .when(col("da") < col("db"), col("vec_b"))
          .otherwise(col("vec_a")).as("winner"))
      .groupBy("vec_id").agg(min(col("winner")).as("matched_id"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication by clustering embeddings and removing ε-close pairs
    * WITHIN each cluster — the quadratic all-pairs cost is bounded to
    * Σ|cluster|², which is the paper's entire scaling argument: grow
    * the cluster count with the corpus (they run 50k clusters at web
    * scale; the committed table here is the 8-domain fixture fit) and
    * within-cluster pairing stays tractable while cross-cluster pairs
    * — overwhelmingly non-duplicates — are never materialized.
    * Representative choice follows the paper: among duplicates, KEEP
    * the vector farthest from its centroid (diversity-preserving
    * low-centroid-similarity keep, §4), here made deterministic with a
    * lowest-vec_id tie-break.
    *
    * Unlike [[cosineNearDupPairs]] (fitted LSH buckets) this blocks on
    * the COMMITTED domain table, so the full pipeline — assignment,
    * pairing, keep-rule — is a pure function of (corpus, table) and
    * DuckDB replays it exactly: the only hash-verified near-dup
    * REMOVAL operator in the embedding family. At scale the domain
    * join shuffles on the cluster key (parallelism = cluster count —
    * another reason the table must grow with the corpus) and the
    * drop-set anti-join is output-sized.
    */
  /** The streaming gate's scoreability contract applied to the BATCH
    * operators (and returning the batch's uniform dim): a NULL or
    * zero-norm embedding yields a NULL/NaN cosine whose `>= eps`
    * verdict is engine-dependent (Spark codegen says false, DuckDB's
    * NaN-is-greatest says true) — so an unscoreable vector either
    * silently survives every pair or spuriously eliminates in-domain
    * neighbors, and mixed dims silently deflate every cosine
    * (graft_dot folds the shared prefix). ONE aggregate over the
    * corpus, refused loudly — the [[graft.streaming.Jobs.semDeDupGateBatch]]
    * discipline, so a seeded store can never inherit a poisoned
    * survivor set.
    */
  private def requireScoreable(embeddings: DataFrame, who: String): Int = {
    val chk = embeddings.agg(count(lit(1)).as("n"),
      // count(embedding) skips NULL arrays: nn < n detects one anywhere
      count(col("embedding")).as("nn"),
      min(dot("embedding", "embedding")).as("mn"),
      min(size(col("embedding"))).as("lo"),
      max(size(col("embedding"))).as("hi")).head()
    require(chk.getLong(0) == 0 ||
        (chk.getLong(1) == chk.getLong(0) && !chk.isNullAt(2) && chk.getDouble(2) > 0),
      s"$who: corpus carries NULL or zero-norm embeddings — their cosines " +
        "are unscoreable and the >= eps verdict is engine-dependent " +
        "(silent survival or spurious elimination); filter or fix upstream")
    require(chk.getLong(0) == 0 || chk.getInt(3) == chk.getInt(4),
      s"$who: corpus carries mixed ${chk.getInt(3)}..${chk.getInt(4)}-dim " +
        "embeddings — cross-dim cosines silently deflate; fix upstream")
    if (chk.getLong(0) == 0) 0 else chk.getInt(3)
  }

  def semDeDup(embeddings: DataFrame, eps: Double = 0.3): DataFrame = {
    requireScoreable(embeddings, "semDeDup"): Unit
    val assigned = domainAssignedD2(embeddings)
    assigned
      .join(semDeDupDroppedIds(assigned, eps), Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("label"), col("domain"))
  }

  /** Scan-side (vec_id, label, embedding, domain, nrm) projection the
    * incremental gate streams and stores — [[domainCandidates]] argmin
    * plus the norm, zero exchanges, the [[withNorm]] shape with the
    * committed domain attached.
    */
  private[graft] def domainWithNorm(embeddings: DataFrame): DataFrame =
    embeddings
      .withColumn("best", least(domainCandidates: _*))
      .select(col("vec_id"), col("label"), col("embedding"),
        col("best.domain").as("domain"),
        sqrt(dot("embedding", "embedding")).as("nrm"))

  /** Batch-vs-history ε-match behind the streaming SemDeDup gate:
    * vec_ids of batch vectors ε-close (same round-6 cosine spelling as
    * [[semDeDup]], so the threshold means the same thing on both
    * surfaces) to ANY already-admitted store vector of the same domain.
    * The micro-batch side is broadcast into the store scan — per-batch
    * history IO is domain-filtered and never shuffles the store.
    */
  /** Whether the micro-batch side of a gate join is safely
    * FORCE-broadcastable: estimated in-memory bytes (dim floats + row
    * overhead) within a fixed driver budget. Under Trigger.AvailableNow
    * a cold-start backlog arrives as ONE arbitrarily large batch — an
    * unconditional broadcast() hint there risks driver OOM instead of
    * degrading to a shuffle join, so oversized batches drop the hint
    * and let AQE size the domain-keyed join at runtime.
    */
  private[graft] def batchBroadcastable(rows: Long, dim: Int): Boolean =
    rows * (dim.toLong * 4 + 48) <= (64L << 20)

  private def maybeBroadcast(df: DataFrame, hint: Boolean): DataFrame =
    if (hint) broadcast(df) else df

  /** File-level cell pruning for a `list_id`-partitioned store scan,
    * in BOTH join regimes of the batched k-NN joins:
    *
    *  - hintBroadcast = true (serving batches): the pair join itself
    *    broadcasts the probe frame, so Catalyst plants its DPP
    *    subquery on this scan — nothing to add;
    *  - hintBroadcast = false (cold-start backlog, knn-graph): the
    *    pair join is shuffle-sized and DPP's default
    *    reuseBroadcastOnly finds no broadcast to reuse — the scan
    *    would silently read the WHOLE store. The probed-CELL frame is
    *    nlist-bounded after distinct (unlike the query frame), so
    *    force-broadcast a semi-join against it: DPP fires off that
    *    broadcast and file pruning survives every pair-join strategy,
    *    still with no driver round-trip and no In-literal.
    */
  private def pruneToCells(
      store: DataFrame, probed: DataFrame, hintBroadcast: Boolean): DataFrame =
    if (hintBroadcast) store
    else store.join(broadcast(probed.select("list_id").distinct()),
      Seq("list_id"), "left_semi")

  private[graft] def semDeDupGateDropped(
      batch: DataFrame, store: DataFrame, eps: Double,
      hintBroadcast: Boolean = true): DataFrame =
    maybeBroadcast(batch.select(col("vec_id"), col("domain"),
        col("embedding").as("qe"), col("nrm").as("qn"))
        // the argmin contract (domains are non-negative cell indices)
        // made explicit — and it marks the batch side SELECTIVE for
        // Catalyst's PartitionPruning, so when the store scan is
        // domain-partitioned (the streaming gate's admitted store) this
        // join plants a DPP subquery on it: per-batch history IO prunes
        // to the batch's domains at the FILE level, no domain literal
        .filter(col("domain") >= 0), hintBroadcast)
      .join(store, Seq("domain"))
      .filter(round(dot("qe", "embedding") / (col("qn") * col("nrm")), 6) >= eps)
      .select("vec_id").distinct()

  /** [[semDeDupGateDropped]] with match ATTRIBUTION: the store exposes
    * its admitted ids as `adm_id` and every ε-matched batch vector
    * comes back with its SMALLEST admitted match — what a rejection
    * ledger renders as the drop reason. Same broadcast-batch /
    * scan-history join shape, same round-6 cosine.
    */
  private[graft] def semDeDupGateMatches(
      batch: DataFrame, store: DataFrame, eps: Double,
      hintBroadcast: Boolean = true): DataFrame =
    maybeBroadcast(batch.select(col("vec_id"), col("domain"),
        col("embedding").as("qe"), col("nrm").as("qn"))
        // selective-marking filter for DPP on a domain-partitioned
        // store scan — see [[semDeDupGateDropped]]
        .filter(col("domain") >= 0), hintBroadcast)
      .join(store, Seq("domain"))
      .filter(round(dot("qe", "embedding") / (col("qn") * col("nrm")), 6) >= eps)
      .groupBy("vec_id").agg(min(col("adm_id")).as("matched_id"))

  /** The SemDeDup pipeline in DuckDB: committed-centroid assignment
    * (shared [[duckDomainAssigned]] CTE, now carrying d2), per-domain
    * pair elimination, identical keep-rule CASE.
    */
  private def duckSemDeDup(eps: Double): String =
    s"""$duckDomainAssigned,
       |sd_vecs AS (
       |  SELECT a.vec_id, a.label, a.domain, a.d2, e.embedding,
       |         sqrt(${duckDot("e.embedding", "e.embedding")}) AS nrm
       |  FROM dom_assigned a JOIN embeddings e ON a.vec_id = e.vec_id),
       |sd_dropped AS (
       |  SELECT DISTINCT CASE WHEN a.d2 > b.d2 THEN b.vec_id
       |                       WHEN a.d2 < b.d2 THEN a.vec_id
       |                       ELSE b.vec_id END AS vec_id
       |  FROM sd_vecs a JOIN sd_vecs b
       |    ON a.domain = b.domain AND a.vec_id < b.vec_id
       |  WHERE round(${duckDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) >= $eps)""".stripMargin

  val semDeDupQuery = QueryDef(
    "sim_semdedup",
    s"""WITH ${duckSemDeDup(0.3)}
       |SELECT v.vec_id, v.label, v.domain FROM sd_vecs v
       |WHERE v.vec_id NOT IN (SELECT vec_id FROM sd_dropped)
       |ORDER BY v.vec_id""".stripMargin)(
    (s, d) => semDeDup(Tables.embeddings(s, d), eps = 0.3).orderBy("vec_id"))

  /** Per-domain removal accounting — the number a curation run watches
    * to see WHERE semantic redundancy concentrates (a domain shedding
    * most of its mass is template boilerplate; near-zero removal means
    * the threshold is below that domain's natural spread).
    */
  val semDeDupStatsQuery = QueryDef(
    "sim_semdedup_stats",
    s"""WITH ${duckSemDeDup(0.3)}
       |SELECT v.domain, count(*) AS n_vecs,
       |       count(*) - count(d.vec_id) AS n_kept,
       |       count(d.vec_id) AS n_dropped
       |FROM sd_vecs v LEFT JOIN sd_dropped d ON v.vec_id = d.vec_id
       |GROUP BY v.domain ORDER BY v.domain""".stripMargin)(
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      requireScoreable(emb, "sim_semdedup_stats"): Unit
      val assigned = domainAssignedD2(emb)
      val dropped = semDeDupDroppedIds(assigned, eps = 0.3)
        .withColumn("is_dropped", lit(1L))
      assigned.select("vec_id", "domain")
        .join(dropped, Seq("vec_id"), "left")
        .groupBy("domain")
        .agg(count(lit(1)).as("n_vecs"),
          sum(coalesce(col("is_dropped"), lit(0L))).as("n_dropped"))
        .select(col("domain"), col("n_vecs"),
          (col("n_vecs") - col("n_dropped")).as("n_kept"), col("n_dropped"))
        .orderBy("domain")
    })

  /** [[semDeDup]] over a table FITTED to the corpus — the paper's
    * sizing rule made executable: the cluster count grows with the
    * corpus (nlist ≈ n / target-cell-population) so the within-cell
    * pair bill stays linear in n instead of quadratic. Same pair stage,
    * same farthest-from-centroid keep-rule ([[semDeDupDroppedIds]] —
    * d2 spelled exactly as the committed path: e·e − 2·e·c + c·c), but
    * the table comes from the seed-pinned k-means fit every IVF path
    * uses ([[fitQuantizer]]), so like the other fitted ANN rows this is
    * engine-seeded: suite-verified, not oracle-replayed. nlist = 1
    * degenerates to EXACT SemDeDup (a single cell makes every pair
    * visible) — the correctness anchor SimilaritySpec replays
    * independently against the corpus-mean centroid.
    */
  /** Above this nlist, [[semDeDupFitted]] routes through the two-level
    * quantizer: the flat MLlib fit/assign is fine (and bit-pinned by
    * the registered nlist=16 row) at fixture cell counts, but turns
    * O(n²) once nlist tracks the corpus under the sizing rule — 32 is
    * where the committed-argmin JIT cliff also lives, a natural seam.
    */
  private[graft] val twoLevelThreshold: Int = 32

  def semDeDupFitted(
      embeddings: DataFrame,
      nlist: Int = 64,
      eps: Double = 0.3,
      fitFraction: Double = 0.25): DataFrame = {
    require(nlist >= 1, s"nlist=$nlist")
    requireScoreable(embeddings, "semDeDupFitted"): Unit
    val spark = embeddings.sparkSession
    import spark.implicits._
    // MLlib KMeans requires k >= 2; k = 1 converges to the corpus mean
    // anyway, so the exhaustive single-cell anchor computes it directly
    // (one Summarizer aggregate, no iterations).
    val (centRows, assignedRaw) =
      if (nlist == 1) {
        import org.apache.spark.ml.functions.array_to_vector
        import org.apache.spark.ml.stat.Summarizer
        val mean = embeddings
          .withColumn("features",
            array_to_vector(transform(col("embedding"), x => x.cast("double"))))
          .select(Summarizer.mean(col("features")).as("m"))
          .head().getAs[org.apache.spark.ml.linalg.Vector](0).toArray
        (Seq((0, mean)),
          embeddings.select(col("vec_id"), col("label"), col("embedding"),
            lit(0).as("domain")))
      } else if (nlist > twoLevelThreshold) {
        // the scale path: fixed per-cell training sample + hierarchical
        // fit/assign keep the quantizer bill O(n·√nlist) when nlist
        // grows with the corpus (the r17 measured wall was the flat
        // fit/assign turning O(n²) under the sizing rule)
        val q = fitQuantizerTwoLevel(embeddings, nlist)
        (q.subCents.zipWithIndex.map { case (c, i) => (i, c) }.toSeq,
          assignTwoLevel(embeddings, q).select(col("vec_id"), col("label"),
            col("embedding"), col("list_id").as("domain")))
      } else {
        val (model, withVec) = fitQuantizer(embeddings, nlist, fitFraction)
        (model.clusterCenters.zipWithIndex
            .map { case (c, i) => (i, c.toArray) }.toSeq,
          model.transform(withVec).select(col("vec_id"), col("label"),
            col("embedding"), col("list_id").as("domain")))
      }
    semDeDupTail(spark, centRows, assignedRaw, eps)
  }

  /** The shared fitted-SemDeDup tail: attach own-centroid d2 + norm via
    * a broadcast of the (nlist-row) centroid table, then the one
    * keep-rule pass — common to the flat, two-level, and pre-fit paths
    * so the three can never drift in arithmetic.
    */
  private def semDeDupTail(
      spark: org.apache.spark.sql.SparkSession,
      centRows: Seq[(Int, Array[Double])],
      assignedRaw: DataFrame,
      eps: Double): DataFrame = {
    import spark.implicits._
    val cents = centRows.toDF("domain", "cent")
    val assigned = assignedRaw
      .join(broadcast(cents), Seq("domain"))
      .select(col("vec_id"), col("label"), col("embedding"), col("domain"),
        (dot("embedding", "embedding") - lit(2.0) * dot("embedding", "cent") +
          dot("cent", "cent")).as("d2"),
        sqrt(dot("embedding", "embedding")).as("nrm"))
    assigned
      .join(semDeDupDroppedIds(assigned, eps), Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("label"), col("domain"))
  }

  /** [[semDeDupFitted]] against a PRE-FIT quantizer — the production
    * shape the sizing rule implies: fit the table once (offline, on a
    * reference sample), then dedup any number of corpora/batches under
    * the SAME cells, so verdicts are comparable across runs and the fit
    * bill is paid once. Also what makes the twin-invariance property
    * exactly testable: under a fixed table, adding an exact twin can
    * never change any other vector's verdict (twins share cell and d2),
    * whereas a refit-per-corpus resamples and may re-draw every cell
    * boundary.
    */
  def semDeDupWithQuantizer(
      embeddings: DataFrame,
      q: TwoLevelQuantizer,
      eps: Double = 0.3): DataFrame = {
    requireScoreable(embeddings, "semDeDupWithQuantizer"): Unit
    semDeDupTail(embeddings.sparkSession,
      q.subCents.zipWithIndex.map { case (c, i) => (i, c) }.toSeq,
      assignTwoLevel(embeddings, q).select(col("vec_id"), col("label"),
        col("embedding"), col("list_id").as("domain")),
      eps)
  }

  /** Registered at nlist=16 on the 500-vector fixture (~31 vectors per
    * cell — the production density the sizing rule targets).
    */
  val semDeDupFittedQuery = QueryDef.unverified("sim_semdedup_fitted")(
    (s, d) => semDeDupFitted(Tables.embeddings(s, d), nlist = 16).orderBy("vec_id"))

  val all: Seq[QueryDef] =
    Seq(bruteForceQuery, annQuery, annLshFullProbeQuery, annIvfQuery, annIvfFullProbeQuery,
      annIvfPersistedQuery, annIvfPersistedFullProbeQuery,
      knnJoinFullProbeQuery, knnJoinQuery,
      knnGraphFullProbeQuery, knnGraphQuery, knnGraphFamiliesQuery,
      knnJoinPqFullProbeQuery, knnJoinPqPackedFullProbeQuery,
      knnJoinPqRerankFullProbeQuery, knnJoinPqQuery,
      annIvfPqFullProbeQuery, annIvfPqPackedFullProbeQuery,
      annIvfPqRerankFullProbeQuery, annIvfPqResidualFullProbeQuery,
      annIvfPqResidualPackedFullProbeQuery, annIndexHealthQuery,
      annIvfPqQuery, pqReconMseQuery,
      annRecallAuditQuery, annRecallQuery, nearDupQuery, nearDupLoQuery,
      labelBlockedQuery,
      semanticDecontaminateQuery, semanticCanonicalQuery, quantizeInt8Query, dimStatsQuery,
      hardNegativesQuery, domainMixtureQuery, domainRebalanceQuery,
      semDeDupQuery, semDeDupStatsQuery, semDeDupFittedQuery)
}
