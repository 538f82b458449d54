package graft.tools

/** Dev main: learn the committed DOMAIN centroids
  * ([[graft.ops.Similarity.domainCentroids]]) from the embeddings
  * fixture — unsupervised corpus domains for mixture control when no
  * source/label column exists (the 100 TB reality: you know the
  * bytes, not the provenance).
  *
  * Full-dimension Lloyd's k-means under the PqTrain determinism
  * discipline, so a re-run reproduces the committed table
  * byte-for-byte:
  *  - corpus collected ordered by vec_id;
  *  - initial centroids are the vectors at K evenly-spaced ranks in
  *    vec_id order (spread seeding, no RNG);
  *  - assignment breaks distance ties on the LOWEST domain id,
  *    accumulation runs in vec_id order, an empty domain keeps its
  *    previous centroid;
  *  - final values rounded to 6 decimals so the Scala literal, the
  *    assignment expression, and the DuckDB VALUES list parse the
  *    IDENTICAL doubles.
  *
  * K=8 suits the 500-vector fixture; a production corpus would commit
  * a larger table — the operators are table-size-agnostic.
  *
  * Run with:
  *   sbt "runMain graft.tools.DomainTrain"
  * and paste the printed literal into ops/Similarity.scala.
  */
object DomainTrain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val K = 8
    val iters = 15
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val vecs: Array[Array[Double]] = graft.Tables.embeddings(spark, sfDir)
      .orderBy("vec_id").select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = vecs.length
    val d = vecs.head.length
    println(s"[train] $n vectors, dim $d, K=$K")

    var cents: Array[Array[Double]] =
      Array.tabulate(K)(k => vecs((k.toLong * n / K).toInt).clone())
    def sq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < d) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    (1 to iters).foreach { it =>
      val assign = vecs.map { v =>
        var best = 0; var bd = sq(v, cents(0)); var k = 1
        while (k < K) {
          val dk = sq(v, cents(k))
          if (dk < bd) { bd = dk; best = k } // strict: lowest id wins ties
          k += 1
        }
        best
      }
      val sums = Array.fill(K)(new Array[Double](d))
      val cnt = new Array[Int](K)
      var i = 0
      while (i < n) {
        val k = assign(i); cnt(k) += 1
        var j = 0
        while (j < d) { sums(k)(j) += vecs(i)(j); j += 1 }
        i += 1
      }
      cents = Array.tabulate(K)(k =>
        if (cnt(k) == 0) cents(k)
        else Array.tabulate(d)(j => sums(k)(j) / cnt(k)))
      if (it == iters) {
        val inertia = vecs.zip(assign).map { case (v, k) => sq(v, cents(k)) }.sum
        println(f"[train] final inertia ${inertia / n}%.4f, sizes ${cnt.mkString(",")}")
      }
    }
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    println("\n  val domainCentroids: Array[Array[Double]] = Array(")
    cents.foreach { c =>
      println("    Array(" + c.map(r6).grouped(8).map(_.mkString(", "))
        .mkString(",\n      ") + "),")
    }
    println("  )")
    spark.stop()
  }
}
