package graft.tools

/** Dev main: learn the committed product-quantization codebook
  * ([[graft.functions.Pq.codebook]]) from the embeddings fixture.
  *
  * Classic PQ training (Jégou, Douze, Schmid 2011, "Product
  * Quantization for Nearest Neighbor Search" — the public algorithm
  * behind every IVF-PQ index): split the D-dim space into M contiguous
  * subspaces of D/M dims and run k-means independently in each; a
  * vector's code is its per-subspace nearest-centroid index, so storage
  * drops from D floats to M small ints and distances become table
  * lookups.
  *
  * Every step here is DETERMINISTIC so a re-run reproduces the
  * committed table byte-for-byte (the BpeTrain discipline):
  *  - the corpus is collected ordered by vec_id (500 × 64 floats at
  *    sf0.01 — driver-trivial; the committed codebook is DATA, the
  *    training scale is irrelevant to the query path);
  *  - initial centroids are the subvectors of K evenly-spaced ranks in
  *    vec_id order (deterministic spread seeding, no RNG);
  *  - Lloyd assignment breaks distance ties on the LOWEST centroid id,
  *    accumulation runs in vec_id order, an empty cell keeps its
  *    previous centroid;
  *  - final values are rounded to 6 decimals so the committed Scala
  *    literal, the expression spec string, and the DuckDB VALUES list
  *    all parse the IDENTICAL doubles from the identical decimal text.
  *
  * K=16 per subspace (4-bit codes) suits the 500-vector fixture — a
  * production corpus would use K=256 (8-bit codes, the classical
  * setting); both are just different committed tables for the same
  * expression, exactly like swapping a BPE vocabulary.
  *
  * Run with:
  *   sbt "runMain graft.tools.PqTrain"
  * and paste the printed Scala literal into functions/Pq.scala.
  */
object PqTrain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val M = 8
    val K = 16
    val iters = 15
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val rows = graft.Tables.embeddings(spark, sfDir)
      .orderBy("vec_id")
      .collect()
      .map(r => r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray)
    spark.stop()
    require(rows.nonEmpty, s"no embeddings at $sfDir")
    val d = rows.head.length
    require(rows.forall(_.length == d), "heterogeneous embedding dims in fixture")
    require(d % M == 0, s"dim $d not divisible by M=$M")
    val dsub = d / M

    def sqdist(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }

    val codebook: Seq[Seq[Array[Double]]] = (0 until M).map { m =>
      val pts = rows.map(_.slice(m * dsub, m * dsub + dsub))
      // deterministic spread seeding: K evenly-spaced ranks in vec_id order
      var cents: Array[Array[Double]] =
        (0 until K).map(j => pts((j.toLong * pts.length / K).toInt).clone()).toArray
      for (_ <- 0 until iters) {
        val sums = Array.fill(K)(new Array[Double](dsub))
        val counts = new Array[Long](K)
        for (p <- pts) {
          var best = 0
          var bestD = sqdist(p, cents(0))
          var c = 1
          while (c < K) {
            val dd = sqdist(p, cents(c))
            if (dd < bestD) { bestD = dd; best = c } // strict <: ties keep lowest c
            c += 1
          }
          var i = 0
          while (i < dsub) { sums(best)(i) += p(i); i += 1 }
          counts(best) += 1
        }
        cents = cents.zipWithIndex.map { case (old, c) =>
          if (counts(c) == 0) old // empty cell keeps its previous centroid
          else sums(c).map(_ / counts(c))
        }
      }
      cents.map(_.map(v => math.rint(v * 1e6) / 1e6)).toSeq
    }

    // training diagnostics: per-subspace quantization MSE + cell balance
    val mse = (0 until M).map { m =>
      val pts = rows.map(_.slice(m * dsub, m * dsub + dsub))
      pts.map(p => codebook(m).map(c => sqdist(p, c.toArray)).min).sum / pts.length
    }
    println(s"// M=$M K=$K dsub=$dsub, trained on ${rows.length} vectors from $sfDir")
    println(s"// per-subspace quantization MSE: ${mse.map(v => f"$v%.4f").mkString(" ")}")
    println("  val codebook: Vector[Vector[Vector[Double]]] = Vector(")
    println(codebook.map { cents =>
      "    Vector(\n" + cents.map(c =>
        "      Vector(" + c.mkString(", ") + ")").mkString(",\n") + ")"
    }.mkString(",\n"))
    println("  )")
  }
}
