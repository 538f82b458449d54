package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Dev-only: the residual-encoding (IVFADC) recall experiment on a
  * CLUSTERED synthetic corpus — the fixture the committed embeddings
  * table cannot be (it is near-isotropic, where residual encoding is
  * honestly recall-neutral: SCALING.md r18). Jégou et al. 2011's claim
  * is distributional: when vectors concentrate around the coarse
  * centroids, residuals have far smaller dynamic range than raw
  * vectors, so the same PQ bit budget quantizes them with far less
  * error. This harness synthesizes that regime and measures it:
  *
  *  - corpus: `nClusters` gaussian cluster centers in 64-dim, each
  *    vector = center + sigma·noise, deterministic splitmix64 stream
  *    (seeded Box-Muller — no RNG state outside the seed);
  *  - coarse quantizer: [[Similarity.fitQuantizerTwoLevel]] at
  *    nlist = nClusters over the corpus (the production fit path);
  *  - codebooks: fitted PER EXPERIMENT from a seeded corpus sample via
  *    the same [[Similarity.localLloyd]] the quantizer fit uses — raw
  *    codebook on vectors, residual codebook on (vector − cell
  *    centroid) — because this is the offline-trainer path every
  *    production deployment runs (tools/PqTrain); the library's
  *    COMMITTED codebooks are constants of the hash-verified fixture
  *    rows and would mis-scale on an arbitrary synthetic corpus;
  *  - probes: scan-side graft_nearest_cells ranking (the knnJoinIvf
  *    r19 kernel), ADC scoring through graft_pq_adc_pair with the
  *    experiment codebook as the foldable spec — identical kernels,
  *    different constants;
  *  - metric: mean recall@k of ADC top-k vs exact-cosine top-k over
  *    `nQueries` corpus members (self excluded), at each sigma —
  *    sigma sweeps tight→isotropic so the table shows WHERE residual
  *    starts paying.
  *
  * Prints the markdown table committed in SCALING.md's IVFADC section.
  */
object StressAnnClustered {
  private val M = 8
  private val K = 16
  private val Dsub = 8
  private val dim = M * Dsub

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic standard gaussian for (stream, index) — Box-Muller
    * over two splitmix64 uniforms; pure function of the key.
    */
  private def gauss(stream: Long, i: Long): Double = {
    def unit(k: Long): Double =
      ((splitmix64(k) >>> 11).toDouble + 0.5) / (1L << 53).toDouble
    val u1 = unit(stream * 0x9e3779b97f4a7c15L + 2 * i)
    val u2 = unit(stream * 0xbf58476d1ce4e5b9L + 2 * i + 1)
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }

  private def fitCodebook(sample: Array[Array[Double]], seed: Long): String = {
    val cb = Array.tabulate(M) { m =>
      Similarity.localLloyd(
        sample.map(_.slice(m * Dsub, (m + 1) * Dsub)), K, iters = 10,
        seed = seed + m)
    }
    s"$M $K $Dsub " + cb.flatMap(_.flatMap(_.map(_.toString))).mkString(" ")
  }

  def main(args: Array[String]): Unit = {
    val nClusters = sys.env.getOrElse("SPARK_GRAFT_CLUSTERS", "64").toInt
    val perCluster = sys.env.getOrElse("SPARK_GRAFT_PER_CLUSTER", "937").toInt
    val nQueries = 64
    val kTop = 20
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    println("BEGIN-IVFADC-CLUSTERED")
    println(s"Corpus: $nClusters clusters x $perCluster vectors, $dim-dim; " +
      s"coarse nlist=$nClusters (two-level fit), M=$M K=$K codebooks fitted " +
      s"per (sigma, encoding) on a 1/16 sample; $nQueries corpus queries, " +
      "recall@10/20 vs exact cosine, self excluded.")
    println()
    println("| sigma | nprobe | raw adc r@10 | res adc r@10 | raw adc r@20 | res adc r@20 |")
    println("|---|---|---|---|---|---|")
    val refineLines = scala.collection.mutable.ArrayBuffer.empty[String]

    for (sigma <- Seq(0.15, 0.35, 0.7, 1.0)) {
      val sigmaKey = (sigma * 100).toInt
      val centers = Array.tabulate(nClusters)(c =>
        Array.tabulate(dim)(d => gauss(1000L + sigmaKey, c.toLong * dim + d)))
      val rows: Seq[(Long, String, Array[Float])] =
        (0 until nClusters).flatMap { c =>
          (0 until perCluster).map { i =>
            val id = c.toLong * perCluster + i
            (id, s"c$c", Array.tabulate(dim)(d =>
              (centers(c)(d) + sigma * gauss(2000L + sigmaKey, id * dim + d)).toFloat))
          }
        }
      val corpus = rows.toDF("vec_id", "label", "embedding")
        .repartition(32)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      corpus.count(): Unit

      val q = Similarity.fitQuantizerTwoLevel(corpus, nlist = nClusters)
      val cents = q.subCents
      val nlist = cents.length
      val centsDf = cents.zipWithIndex.map { case (cArr, i) => (i, cArr) }.toSeq
        .toDF("list_id", "cent")
      val assigned = Similarity.assignTwoLevel(corpus, q)
        .join(broadcast(centsDf), Seq("list_id"))

      // seeded 1/16 sample -> raw + residual codebooks (driver-side fit,
      // the offline-trainer shape)
      val sample = assigned.filter(col("vec_id") % 16 === 0)
        .select(col("embedding"), col("cent"))
        .collect()
        .map(r => (r.getSeq[Float](0).map(_.toDouble).toArray,
          r.getSeq[Double](1).toArray))
      val rawSpec = fitCodebook(sample.map(_._1), seed = 7L)
      val resSpec = fitCodebook(
        sample.map { case (x, c) => x.indices.map(i => x(i) - c(i)).toArray },
        seed = 77L)

      val store = assigned.select(col("vec_id"), col("list_id"), col("cent"),
          call_function("graft_pq_encode",
            transform(col("embedding"), x => x.cast("double")),
            lit(rawSpec)).as("codes_raw"),
          call_function("graft_pq_encode",
            zip_with(transform(col("embedding"), x => x.cast("double")),
              col("cent"), (a, b) => a - b),
            lit(resSpec)).as("codes_res"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      store.count(): Unit

      val queries = corpus.filter(col("vec_id") % perCluster === 5)
        .limit(nQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      queries.count(): Unit

      // exact cosine top-20 per query — the recall reference
      val exactW = Window.partitionBy("query_id")
        .orderBy(col("cos").desc, col("vec_id"))
      val exact = corpus.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          round(Similarity.cosine("embedding", "q_emb"), 6).as("cos"))
        .withColumn("rn", row_number().over(exactW))
        .filter(col("rn") <= kTop)
        .select(col("query_id"), col("vec_id"), col("rn"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      exact.count(): Unit

      // ADC shortlist to `depth` per query — the shared first stage of
      // both the ADC-only recall and the two-stage refine
      def adcShortlist(nprobe: Int, residual: Boolean, depth: Int): DataFrame = {
        val centsLit = typedLit(cents.map(_.toSeq).toSeq)
        val probed = queries
          .withColumn("list_id", explode(call_function("graft_nearest_cells",
            col("q_emb"), centsLit, lit(0), lit(nlist), lit(nprobe))))
        val spec = if (residual) resSpec else rawSpec
        val pairs = store
          .join(broadcast(probed), Seq("list_id"))
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("pp", call_function("graft_pq_adc_pair",
            col("q_emb"),
            (if (residual) col("codes_res") else col("codes_raw")),
            (if (residual) col("cent") else typedLit(Seq.empty[Double])),
            lit(spec)))
          .select(col("query_id"), col("vec_id"),
            (col("pp.dp") /
              (sqrt(Similarity.dot("q_emb", "q_emb")) * sqrt(col("pp.nn"))))
              .as("cos_pq"))
        val w = Window.partitionBy("query_id").orderBy(col("cos_pq").desc, col("vec_id"))
        pairs.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= depth)
          .select("query_id", "vec_id")
      }
      def recallOf(got: DataFrame, at: Int): Double =
        got.join(exact.filter(col("rn") <= at), Seq("query_id", "vec_id"))
          .count().toDouble / (nQueries.toLong * at)
      def recallAt(nprobe: Int, residual: Boolean, at: Int): Double =
        recallOf(adcShortlist(nprobe, residual, at), at)
      // the PRODUCTION recipe: ADC shortlist to `rerank`, exact-cosine
      // re-rank of only those candidates (queryIvfPq's two-stage shape)
      def recallRefined(nprobe: Int, residual: Boolean, rerank: Int, at: Int): Double = {
        val refined = adcShortlist(nprobe, residual, rerank)
          .join(corpus, Seq("vec_id"))
          .join(broadcast(queries), Seq("query_id"))
          .select(col("query_id"), col("vec_id"),
            round(Similarity.cosine("embedding", "q_emb"), 6).as("cos"))
        val w2 = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
        recallOf(refined.withColumn("rn2", row_number().over(w2))
          .filter(col("rn2") <= at).select("query_id", "vec_id"), at)
      }

      for (nprobe <- Seq(4, 8)) {
        val r10raw = recallAt(nprobe, residual = false, at = 10)
        val r10res = recallAt(nprobe, residual = true, at = 10)
        val r20raw = recallAt(nprobe, residual = false, at = 20)
        val r20res = recallAt(nprobe, residual = true, at = 20)
        println(f"| $sigma%.2f | $nprobe | $r10raw%.3f | $r10res%.3f " +
          f"| $r20raw%.3f | $r20res%.3f |")
        val rr = 80
        refineLines += f"| $sigma%.2f | $nprobe | $rr " +
          f"| ${recallRefined(nprobe, residual = false, rr, at = 10)}%.3f " +
          f"| ${recallRefined(nprobe, residual = true, rr, at = 10)}%.3f " +
          f"| ${recallRefined(nprobe, residual = false, rr, at = 20)}%.3f " +
          f"| ${recallRefined(nprobe, residual = true, rr, at = 20)}%.3f |"
      }
      Seq(corpus, store, queries, exact).foreach(_.unpersist(blocking = true))
    }
    println()
    println("Two-stage refine at identical settings (ADC shortlist to rerank, " +
      "exact re-rank of only those candidates — the queryIvfPq production " +
      "recipe): the absolute recalls a deployment should size from.")
    println()
    println("| sigma | nprobe | rerank | raw+refine r@10 | res+refine r@10 " +
      "| raw+refine r@20 | res+refine r@20 |")
    println("|---|---|---|---|---|---|---|")
    refineLines.foreach(println)
    println("END-IVFADC-CLUSTERED")
    spark.stop()
  }
}
