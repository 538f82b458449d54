package graft.tools

/** Dev main: learn the committed RESIDUAL product-quantization codebook
  * ([[graft.functions.Pq.residualCodebook]]) — classical IVFADC (Jégou
  * et al. 2011 §IV): quantize x − c(x), the vector's offset from its
  * coarse centroid, instead of x itself. Residuals concentrate near the
  * origin with most of the coarse structure removed, so the same code
  * budget spends its K cells on the fine detail the raw-vector codebook
  * wastes on cell-to-cell offsets — the recall lift the recall panel
  * measures.
  *
  * The coarse assignment here is the COMMITTED domain table
  * ([[graft.ops.Similarity.assignDomains]]) — the same committed-table
  * discipline that makes the residual fullprobe row DuckDB-replayable
  * (codes stay a pure function of (vector, two committed tables)).
  * Training mechanics are [[PqTrain]]'s, byte-for-byte reproducible:
  * vec_id-ordered corpus, spread seeding, lowest-id tie-breaks,
  * vec_id-ordered accumulation, empty cells keep their centroid,
  * 6-decimal rounding of the final values.
  *
  * Run with:
  *   sbt "runMain graft.tools.PqResidualTrain"
  * and paste the printed Scala literal into functions/Pq.scala.
  */
object PqResidualTrain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val M = 8
    val K = 16
    val iters = 15
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = graft.Tables.embeddings(spark, sfDir)
    val assigned = graft.ops.Similarity.assignDomains(emb)
      .select("vec_id", "domain")
    val rows = emb.join(assigned, "vec_id")
      .orderBy("vec_id")
      .select("vec_id", "embedding", "domain")
      .collect()
      .map { r =>
        val x = r.getSeq[Float](1).map(_.toDouble).toArray
        val c = graft.ops.Similarity.domainCentroids(r.getInt(2))
        Array.tabulate(x.length)(i => x(i) - c(i))
      }
    spark.stop()
    require(rows.nonEmpty, s"no embeddings at $sfDir")
    val d = rows.head.length
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
            if (dd < bestD) { bestD = dd; best = c }
            c += 1
          }
          var i = 0
          while (i < dsub) { sums(best)(i) += p(i); i += 1 }
          counts(best) += 1
        }
        cents = cents.zipWithIndex.map { case (old, c) =>
          if (counts(c) == 0) old
          else sums(c).map(_ / counts(c))
        }
      }
      cents.map(_.map(v => math.rint(v * 1e6) / 1e6)).toSeq
    }

    val mse = (0 until M).map { m =>
      val pts = rows.map(_.slice(m * dsub, m * dsub + dsub))
      pts.map(p => codebook(m).map(c => sqdist(p, c.toArray)).min).sum / pts.length
    }
    println(s"// M=$M K=$K dsub=$dsub, trained on ${rows.length} residuals from $sfDir")
    println(s"// per-subspace residual quantization MSE: ${mse.map(v => f"$v%.4f").mkString(" ")}")
    println("  val residualCodebook: Vector[Vector[Vector[Double]]] = Vector(")
    println(codebook.map { cents =>
      "    Vector(\n" + cents.map(c =>
        "      Vector(" + c.mkString(", ") + ")").mkString(",\n") + ")"
    }.mkString(",\n"))
    println("  )")
  }
}
