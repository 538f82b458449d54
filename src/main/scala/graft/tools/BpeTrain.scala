package graft.tools

import scala.collection.mutable

/** Dev main: learn the committed BPE merges table
  * ([[graft.functions.Bpe.merges]]) from the documents fixture.
  *
  * Classic BPE training (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units" — the public
  * algorithm): pre-tokenize the corpus with the committed pre-tokenizer
  * ([[graft.functions.Bpe.PretokenPattern]]), count word frequencies,
  * then repeatedly merge the most frequent adjacent symbol pair. Every
  * step is deterministic: ties on frequency break lexicographically on
  * the pair, so re-running this tool on the same fixture reproduces the
  * committed table byte-for-byte.
  *
  * Run with:
  *   sbt "runMain graft.tools.BpeTrain"
  * and paste the printed Scala literal into functions/Bpe.scala.
  *
  * The merges count is capped at 48: the synthetic fixture has a ~31
  * word vocabulary, so an uncapped run would memorize every word into a
  * single token and the encoder would degenerate into a word lookup.
  * 48 leaves the vocabulary mid-merge — some words one token, some
  * still split — which is the regime a real subword tokenizer operates
  * in and the one worth testing.
  */
object BpeTrain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val numMerges = args.headOption.map(_.toInt).getOrElse(48)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._

    // Word frequencies over the fixture — a driver-sized map (the
    // pre-token vocabulary of any corpus is tiny relative to the corpus;
    // training reads counts, never text).
    // lit(), not a SQL string literal: the SQL parser would eat the
    // pattern's backslashes ('\s' -> 's')
    val wordFreq: Map[String, Long] = graft.Tables.documents(spark, sfDir)
      .select(explode(regexp_extract_all(
        col("text"), lit(graft.functions.Bpe.PretokenPattern), lit(0))).as("w"))
      .groupBy("w").count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    spark.stop()

    // vocab: word as symbol sequence -> corpus frequency
    var vocab: Map[Vector[String], Long] =
      wordFreq.map { case (w, f) =>
        w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp))) -> f
      }

    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var step = 0
    var continue = true
    while (step < numMerges && continue) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
        pairCounts((syms(i), syms(i + 1))) = pairCounts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (pairCounts.isEmpty) continue = false
      else {
        // Deterministic argmax: frequency desc, then pair lexicographic asc
        val best = pairCounts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += best
        vocab = vocab.map { case (syms, f) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += syms(i) + syms(i + 1); i += 2
            } else { out += syms(i); i += 1 }
          }
          out.result() -> f
        }
        step += 1
      }
    }

    println(s"// ${merges.length} merges learned from $sfDir by graft.tools.BpeTrain")
    println("val merges: Vector[(String, String)] = Vector(")
    println(merges.map { case (l, r) => s"""    ("$l", "$r")""" }.mkString(",\n"))
    println("  )")
    // Sanity: token count distribution after all merges
    val sizes = vocab.toSeq.map { case (syms, f) => (syms.mkString("|"), syms.length, f) }
      .sortBy(_._1)
    println(s"// final segmentation (${sizes.length} distinct words):")
    sizes.foreach { case (s, n, f) => println(s"//   $s  ($n toks, freq $f)") }
  }
}
