package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Dev main: fit the committed hashed-feature linear quality classifier
  * ([[graft.functions.QualityClf]]) on the documents fixture — the
  * fastText recipe (Joulin et al. 2016) at committed-table scale.
  *
  * Labels are the hash-verified heuristic quality score's verdict
  * (quality >= 0.55, the curation pipeline's own gate threshold): the
  * standard bootstrap where a cheap labeling function supervises a
  * model that scores faster (one md5+lookup per feature vs five
  * regex/stoplist passes) and generalizes past the rule set.
  *
  * Every step is DETERMINISTIC so a re-run reproduces the committed
  * weights byte-for-byte (the BpeTrain/PqTrain discipline):
  *  - docs are collected ordered by doc_id;
  *  - features (unigrams then adjacent bigrams, in token order) use the
  *    same [[graft.functions.QualityClf.bucket]] the scorer compiles;
  *  - plain logistic SGD, no RNG: weights init 0, fixed epochs, fixed
  *    learning rate, docs visited in doc_id order every epoch;
  *  - final weights round to 6 decimals so the Scala literal, the spec
  *    string, and the DuckDB list literal parse identical doubles.
  *
  * Run with:
  *   sbt "runMain graft.tools.QualityTrain"
  * and paste the printed literals into functions/QualityClf.scala.
  */
object QualityTrain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val B = graft.functions.QualityClf.B
    val epochs = 30
    val lr = 0.5
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val labels = graft.ops.TextAnalysis.qualityScores.fn(spark, sfDir)
      .select(col("doc_id"),
        when(coalesce(col("quality"), lit(0.0)) >= 0.55, 1.0).otherwise(0.0).as("y"))
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
      .join(labels, "doc_id")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getSeq[String](1).toArray, r.getDouble(2)))
    val nPos = docs.count(_._2 == 1.0)
    println(s"[train] ${docs.length} docs, $nPos positive (${nPos * 100 / docs.length}%)")

    // pre-bucket every doc once (features are static)
    val bucketed: Array[(Array[Int], Double)] = docs.map { case (toks, y) =>
      val f = new scala.collection.mutable.ArrayBuffer[Int](2 * toks.length)
      toks.foreach(t => f += graft.functions.QualityClf.bucket(UTF8String.fromString(t), B))
      var i = 0
      while (i < toks.length - 1) {
        f += graft.functions.QualityClf.bucket(
          UTF8String.fromString(toks(i) + "_" + toks(i + 1)), B)
        i += 1
      }
      (f.toArray, y)
    }

    val w = new Array[Double](B)
    var bias = 0.0
    (1 to epochs).foreach { ep =>
      var loss = 0.0
      bucketed.foreach { case (f, y) =>
        if (f.nonEmpty) {
          var z = bias
          var s = 0.0
          f.foreach(b => s += w(b))
          z += s / f.length
          val p = 1.0 / (1.0 + math.exp(-z))
          loss += -(y * math.log(math.max(p, 1e-12)) +
            (1 - y) * math.log(math.max(1 - p, 1e-12)))
          val g = p - y
          bias -= lr * g
          val scale = lr * g / f.length
          f.foreach(b => w(b) -= scale)
        }
      }
      if (ep % 5 == 0 || ep == 1)
        println(f"[train] epoch $ep%2d loss ${loss / bucketed.length}%.4f")
    }

    // round to the committed precision, then report accuracy AT that
    // precision (what the shipped model actually does)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val wr = w.map(r6)
    val br = r6(bias)
    var tp = 0; var tn = 0; var fp = 0; var fn = 0
    bucketed.foreach { case (f, y) =>
      var s = 0.0
      f.foreach(b => s += wr(b))
      val z = if (f.isEmpty) br else br + s / f.length
      val pred = if (z >= 0) 1.0 else 0.0
      (pred, y) match {
        case (1.0, 1.0) => tp += 1
        case (0.0, 0.0) => tn += 1
        case (1.0, 0.0) => fp += 1
        case _ => fn += 1
      }
    }
    println(s"[train] committed-precision confusion: tp=$tp tn=$tn fp=$fp fn=$fn " +
      f"acc=${(tp + tn).toDouble / bucketed.length}%.4f")

    println(s"\n  val bias: Double = $br\n")
    println("  val weights: Array[Double] = Array(")
    wr.grouped(8).foreach(g => println("    " + g.mkString(", ") + ","))
    println("  )")
    spark.stop()
  }
}
