package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** Text analysis — language-ID on real multilingual snippets (the fixture
  * tags langs but its text is synthetic English-ish, so the heuristic is
  * exercised here), quality-score bounds, fingerprint locality.
  */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(rows: (Long, String)*): DataFrame =
    rows.map { case (id, t) => (id, t, "xx", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  private def run(q: graft.QueryDef, df: DataFrame) = {
    df.createOrReplaceTempView("tmp_docs")
    // QueryDefs read from a dir; for unit data, rebuild the op inline via
    // the public fns where available — here we call fn against a temp dir
    // written once.
    val dir = tmpDir("ta")
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    q.fn(spark, dir)
  }

  test("language-ID picks the right language for real snippets") {
    val df = docsOf(
      1L -> "the cat is in the house and it is warm for the winter",
      2L -> "le chat est dans la maison et les enfants sont dans le jardin pour ce soir",
      3L -> "el perro es un animal que vive en la casa con los gatos por la noche",
      4L -> "der hund ist in den garten gelaufen und die katze ist mit der maus nicht da",
      5L -> "这是一个中文句子用来测试语言识别的功能",
      6L -> "zxcv qwerty asdf ghjkl")
    val out = run(TextAnalysis.langId, df)
      .collect().map(r => r.getLong(0) -> r.getString(6)).toMap
    assert(out == Map(1L -> "en", 2L -> "fr", 3L -> "es", 4L -> "de", 5L -> "zh", 6L -> "und"))
  }

  test("quality scores are bounded in [0,1] and rank clean text above noise") {
    val clean = "the quick brown fox jumps over the lazy dog and it is a fine day for the race to begin " * 4
    val noise = "@@## $$%% ^^&& !!?? ;;:: ~~`` ||\\\\ 11 22"
    val out = run(TextAnalysis.qualityScores, docsOf(1L -> clean, 2L -> noise))
      .collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(out.values.forall(q => q >= 0.0 && q <= 1.0))
    assert(out(1L) > out(2L) + 0.3, s"clean ${out(1L)} vs noise ${out(2L)}")
  }

  test("token stats: bpe pieces >= ws tokens; punctuation splits into pieces") {
    val out = run(TextAnalysis.tokenStats, docsOf(1L -> "hello, world! it's 42"))
      .head()
    val (ws, bpe) = (out.getLong(1), out.getLong(2))
    assert(ws == 4)
    // hello , world ! it ' s 42
    assert(bpe == 8)
  }

  test("text cleaning strips urls, tags, boilerplate markers and collapses whitespace") {
    val out = run(TextAnalysis.cleanText, docsOf(
      1L -> "see https://example.com/x?y=1 for <b>details</b>   [HEADER] now",
      2L -> "plain text stays"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "see for details now")
    assert(out(2L) == "plain text stays")
  }

  test("pii masking replaces emails and phone numbers with typed placeholders") {
    val out = run(TextAnalysis.piiMask, docsOf(
      1L -> "contact jane.doe+spam@example.co.uk or call +1 (555) 123-4567 today",
      2L -> "no pii here just words"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toList
    assert(out(0)._2 == "contact <EMAIL> or call <PHONE> today")
    assert(out(0)._3 == 1L)
    assert(out(1)._2 == "no pii here just words" && out(1)._3 == 0L)
  }

  test("repetition ratio: looping text scores high, varied text low") {
    val out = run(TextAnalysis.repetitionQuery, docsOf(
      1L -> ("buy now " * 30).trim,
      2L -> "the quick brown fox jumps over the lazy dog while birds sing softly outside"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) > 0.45, s"looping text scored ${out(1L)}")
    assert(out(2L) < 0.15, s"varied text scored ${out(2L)}")
  }

  test("tfidf top terms match hand-computed weights with deterministic tiebreak") {
    val out = TextAnalysis.tfidfTopTerms(docsOf(
      1L -> "apple banana apple",
      2L -> "banana cherry",
      3L -> "cherry durian cherry cherry"))
      .collect().map(r => (r.getLong(0), r.getInt(4)) -> ((r.getString(1), r.getLong(2), r.getDouble(3)))).toMap
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    // N=3; df: apple 1, banana 2, cherry 2, durian 1.
    assert(out((1L, 1)) == (("apple", 2L, r4(2 * math.log(3.0)))))
    assert(out((1L, 2)) == (("banana", 1L, r4(math.log(1.5)))))
    assert(out((3L, 1)) == (("cherry", 3L, r4(3 * math.log(1.5)))))
    assert(out((3L, 2)) == (("durian", 1L, r4(math.log(3.0)))))
    // doc 2: banana and cherry tie at 1*ln(1.5) — lexicographic tiebreak.
    assert(out((2L, 1))._1 == "banana" && out((2L, 2))._1 == "cherry")
    assert(out((2L, 1))._3 == out((2L, 2))._3)
  }

  test("bigram LM score ranks formulaic text above token salad; hand arithmetic matches") {
    // corpus: three docs repeating one construction, one doc of bigrams
    // seen nowhere else — the salad must score strictly lower
    val common = "the cat sat on the mat"
    val df = docsOf(
      1L -> common, 2L -> common, 3L -> common,
      4L -> "zebra quantum furnace ballet ocean")
    val out = run(TextAnalysis.lmScoreQuery, df)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L) == out(2L) && out(2L) == out(3L))
    assert(out(1L)._1 == 5L && out(4L)._1 == 4L) // tokens - 1 bigrams
    assert(out(4L)._2 < out(1L)._2, s"salad ${out(4L)._2} !< common ${out(1L)._2}")
    // hand arithmetic on the salad doc: each of its 4 bigrams is unique
    // (cb=1) with context count 1; V = 10 distinct tokens in the corpus
    val expSalad = math.log((1 + 0.5) / (1 + 0.5 * 10))
    assert(out(4L)._2 == math.floor(expSalad * 10000 + 0.5) / 10000)
    // a doc with fewer than two tokens has zero bigrams and a NULL score
    val tiny = run(TextAnalysis.lmScoreQuery, docsOf(1L -> "solo", 2L -> "a b"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.isNullAt(2)))).toMap
    assert(tiny(1L) == ((0L, true)))
    assert(tiny(2L)._1 == 1L && !tiny(2L)._2)
  }

  test("fingerprint: identical docs hash equal; near-identical docs share the min-gram hash") {
    val base = "the quick brown fox jumps over the lazy dog while the cat sleeps on the windowsill"
    val out = run(TextAnalysis.fingerprint, docsOf(
      1L -> base, 2L -> base, 3L -> (base + " tonight"), 4L -> "zzz"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    assert(out(1L) == out(2L))
    assert(out(1L)._1 != out(3L)._1)          // full hash differs on any edit
    assert(out(1L)._2 == out(3L)._2)          // min 8-gram window survives a suffix edit
    assert(out(4L)._2.isEmpty)                // shorter than the window => NULL
  }

  test("importance weights rank target-like docs above background-like docs") {
    import org.apache.spark.sql.functions.col
    // target slice (src=t) speaks alpha/beta; background adds gamma/delta
    // docs. An unseen doc phrased in target language must out-weight an
    // unseen doc phrased in background-only language.
    val df = Seq(
      (1L, "alpha beta alpha beta alpha", "en", "t", 27L),
      (2L, "beta alpha beta alpha beta", "en", "t", 26L),
      (3L, "gamma delta gamma delta gamma", "en", "b", 29L),
      (4L, "delta gamma delta gamma delta", "en", "b", 29L),
      (5L, "alpha beta alpha", "en", "b", 16L),   // target-like, not in target
      (6L, "gamma delta gamma", "en", "b", 17L),  // background-only phrasing
      (7L, "solo", "en", "b", 4L)                 // no bigrams
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.importanceWeights(df, col("source") === "t").collect()
      .map(r => r.getLong(0) -> r).toMap
    val w5 = out(5L).getDouble(4)
    val w6 = out(6L).getDouble(4)
    assert(w5 > w6, s"target-like weight $w5 should exceed background-like $w6")
    assert(w5 > 0, s"target-like doc should look more target than corpus (got $w5)")
    assert(w6 < 0, s"background-only doc should look less target than corpus (got $w6)")
    // no-bigram doc: n_bigrams 0, NULL scores (loud absence, not a 0.0)
    assert(out(7L).getLong(1) == 0L && out(7L).isNullAt(4))
  }

  test("chunking: full coverage, exact overlap, no duplicate tail, offsets traceable") {
    val out = TextAnalysis.chunkDocuments(docsOf(1L -> "abcdefghij"), chunkChars = 5, overlap = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))).sortBy(_._1)
    // chars 9-10 ride in chunk 2's tail; a 4th chunk ("j") would be a
    // strict suffix of chunk 2 and must NOT be emitted
    assert(out.toSeq == Seq(
      (0L, 0L, "abcde", 5L),
      (1L, 3L, "defgh", 5L),
      (2L, 6L, "ghij", 4L)))
    // stride prefixes + the full final chunk reassemble the document
    val reassembled = out.dropRight(1).map(_._3.take(3)).mkString + out.last._3
    assert(reassembled == "abcdefghij")
    // a doc no longer than the overlap still yields exactly one chunk
    val tiny = TextAnalysis.chunkDocuments(docsOf(1L -> "ab"), chunkChars = 5, overlap = 2)
      .collect().map(r => (r.getLong(1), r.getString(3)))
    assert(tiny.toSeq == Seq((0L, "ab")))
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkDocuments(docsOf(1L -> "x"), chunkChars = 5, overlap = 5)
    }
  }

  test("quality classifier: kernel bit-equals the catalyst-builtin spelling; loud spec errors") {
    import graft.functions.QualityClf
    // the compiled kernel vs an INDEPENDENT spelling from catalyst
    // builtins only: conv(md5-hex15) buckets, element_at weight lookup,
    // transform-in-order + left-to-right aggregate fold, same mean —
    // every codegen kernel in this repo is pinned against its HOF
    // spelling this way
    val docs = docsOf(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "Mixed CASE tokens   and   odd    spacing here",
      3L -> "one",
      4L -> "punctuation, heavy! text? with; symbols... everywhere")
    val toks = split(lower(col("text")), "\\s+")
    val hof = docs
      .select(col("doc_id"), QualityClf.hofMargin(toks).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val kernel = docs.select(col("doc_id"),
      call_function("graft_quality_margin", toks, lit(QualityClf.modelSpec)).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(kernel == hof, s"kernel $kernel vs hof $hof") // BIT equality
    // empty feature set: unreachable from split() output (it yields
    // [""]), but the twin contract is EVERY input — both sides must
    // return the bare bias, not NULL from a 0.0/0 division
    val emptyToks = array().cast("array<string>")
    val emptyRow = docsOf(9L -> "ignored").select(
      QualityClf.hofMargin(emptyToks).as("hof"),
      call_function("graft_quality_margin",
        emptyToks, lit(QualityClf.modelSpec)).as("kernel")).head()
    assert(!emptyRow.isNullAt(0) && emptyRow.getDouble(0) == QualityClf.bias,
      s"hof empty-array margin ${emptyRow.get(0)}")
    assert(emptyRow.getDouble(1) == QualityClf.bias,
      s"kernel empty-array margin ${emptyRow.get(1)}")
    // malformed specs are analysis-time errors, not executor crashes
    def call(spec: String) = docs.select(call_function("graft_quality_margin",
      toks, lit(spec))).collect()
    assert(intercept[Exception](call("512 0.0 1.0 2.0")).getMessage != null)
    assert(intercept[Exception](call("")).getMessage != null)
  }

  test("quality classifier: committed model beats the majority class on held-out docs") {
    import graft.functions.QualityClf
    // labels = the heuristic quality verdict (the trainer's supervision).
    // sf0.001 is a DIFFERENT 500-doc sample than the sf0.01 training
    // fixture, so this is held-out generalization, not memorization:
    // trainer measured 0.85 on train; 0.776 held-out at commit time vs
    // a ~0.55 majority baseline
    val sf = "/root/testdata/sf0.001"
    val labels = TextAnalysis.qualityScores.fn(spark, sf)
      .select(col("doc_id"),
        (coalesce(col("quality"), lit(0.0)) >= 0.55).cast("int").as("y"))
    val preds = TextAnalysis.qualityClassifierQuery.fn(spark, sf)
      .select(col("doc_id"), col("pred").cast("int").as("p"))
    val joined = labels.join(preds, "doc_id")
      .select(count(lit(1)), sum(when(col("y") === col("p"), 1).otherwise(0)),
        sum(col("y"))).head()
    val (n, correct, pos) = (joined.getLong(0), joined.getLong(1), joined.getLong(2))
    val acc = correct.toDouble / n
    val majority = math.max(pos, n - pos).toDouble / n
    assert(acc >= 0.72, s"committed-model held-out accuracy $acc")
    assert(acc > majority + 0.1, s"no real signal: acc $acc vs majority $majority")
  }

  test("vocab/OOV audit: top-V by frequency with asc-token tiebreak, exact rates") {
    // corpus counts: a=4, b=3, c=2, d=2, e=1. V=3 -> {a, b, c} (c beats d
    // on the asc tiebreak at count 2).
    val out = TextAnalysis.vocabOovAudit(docsOf(
      1L -> "a a b b c d",
      2L -> "a a b c d e"), vocabSize = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((6L, 1L, math.floor(1.0 / 6 * 10000 + 0.5) / 10000)))
    assert(out(2L) == ((6L, 2L, math.floor(2.0 / 6 * 10000 + 0.5) / 10000)))
  }
}
