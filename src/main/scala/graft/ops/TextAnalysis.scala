package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Text analysis over `documents` — LLM-pipeline quality/filtering
  * operators (builder brief): token counting, quality scoring,
  * language-ID, document fingerprinting.
  *
  * Everything is narrow (shuffle-free) scan-side compute built from
  * codegen'd builtins — split/filter/transform/aggregate/regexp — so at
  * 100 TB these run at parquet scan speed with full column pruning.
  * All scoring math is fixed-order double arithmetic and every constant
  * is spelled identically in the DuckDB oracle, keeping the hash compare
  * bit-stable.
  */
object TextAnalysis {

  /** Match count via the native graft_regex_count expression — same
    * java.util.regex engine and find() semantics as
    * size(regexp_extract_all(c, pattern, 0)), but the pattern compiles
    * once per query (not per row) and no match array is materialized
    * just to be counted (that spelling allocates every matched
    * substring — pure GC pressure on the per-document counting paths).
    */
  private[ops] def regexCount(c: org.apache.spark.sql.Column, pattern: String) =
    call_function("graft_regex_count", c, lit(pattern))

  /** Stop-hit counting via the native graft_hits_in expression — same
    * result as `size(filter(arr, w -> w IN (...)))`, but a compiled
    * byte-comparison loop inside whole-stage codegen instead of an
    * interpreted per-token lambda (the curation scorer runs FIVE of
    * these per document; the HOF spelling was its hottest path).
    */
  private[ops] def hitsIn(arr: org.apache.spark.sql.Column, words: Seq[String]) = {
    // The word set rides to the expression as a comma-joined string; a
    // word containing a comma would silently split into two different
    // words there (analysis-time validation only rejects EMPTY
    // segments). Reject it at the call site, where the caller's word
    // list is still intact.
    val bad = words.filter(_.contains(","))
    require(bad.isEmpty,
      s"hitsIn words must not contain commas (delimiter): ${bad.mkString("'", "', '", "'")}")
    call_function("graft_hits_in", arr, lit(words.mkString(",")))
  }

  // ------------------------------------------------------------- tokens

  /** Token counting: whitespace tokens, BPE-ish pieces (word chunks +
    * standalone punctuation — the pre-tokenizer split every BPE uses),
    * and the chars/4 heuristic estimate.
    */
  val tokenStats = QueryDef(
    "text_token_stats",
    """SELECT doc_id,
      |       CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_ws_tokens,
      |       CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_pieces,
      |       CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens
      |FROM documents ORDER BY doc_id""".stripMargin)(
    (s, d) => Rebalance.scanWide(Tables.documents(s, d), col("doc_id"))
      .select(
        col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("n_ws_tokens"),
        regexCount(col("text"), "[A-Za-z0-9]+|[^A-Za-z0-9\\s]")
          .cast("long").as("n_bpe_pieces"),
        ceil(length(col("text")) / 4.0).cast("long").as("est_bpe_tokens"))
      .orderBy("doc_id"))

  // ------------------------------------------------------------ quality

  /** Tiny deterministic stoplist (quality signal, not linguistics). */
  private[ops] val enStops = Seq("the", "of", "and", "to", "in", "a", "is", "that", "it", "for")

  private[ops] def inList(words: Seq[String]) = words.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Quality scoring: length, stopword density, uniqueness, punctuation
    * noise — the standard cheap filters a training-data pipeline runs
    * before anything expensive. `quality` is a fixed-weight blend in
    * [0, 1]; every term is bounded so one signal cannot dominate.
    *
    * Rounding is floor(x·10⁴ + 0.5)/10⁴ on BOTH engines, NOT round():
    * on a half-way double like 0.53174999…₂ (= "0.53175") Spark's round
    * rounds the shortest decimal repr up while DuckDB rounds the binary
    * value down — caught by the sf0.1 oracle run. Floor arithmetic on
    * the identical double is engine-independent.
    */
  private[ops] def r4duck(x: String) = s"floor(($x) * 10000 + 0.5) / 10000"
  val qualityScores = QueryDef(
    "text_quality_scores",
    // punct_ratio and quality divide by length(text): NULL for empty
    // text on BOTH engines (Spark 4 ANSI raises DIVIDE_BY_ZERO even for
    // doubles; the fixture has no empty docs, but the operator must not
    // explode on a corpus that does)
    s"""SELECT doc_id,
       |  ${r4duck("least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)")} AS len_score,
       |  ${r4duck(s"CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t IN ${inList(enStops)})) AS DOUBLE) / CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE)")} AS stop_ratio,
       |  ${r4duck("CAST(len(list_distinct(string_split_regex(lower(text), '\\s+'))) AS DOUBLE) / CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE)")} AS uniq_ratio,
       |  CASE WHEN length(text) >= 1 THEN ${r4duck("CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) / CAST(length(text) AS DOUBLE)")} END AS punct_ratio,
       |  CASE WHEN length(text) >= 1 THEN ${r4duck(s"""least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.25
       |      + least(CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t IN ${inList(enStops)})) AS DOUBLE)
       |              / CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE) * 5.0, 1.0) * 0.35
       |      + CAST(len(list_distinct(string_split_regex(lower(text), '\\s+'))) AS DOUBLE)
       |        / CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE) * 0.2
       |      + (1.0 - least(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
       |                     / CAST(length(text) AS DOUBLE) * 10.0, 1.0)) * 0.2""")} END AS quality
       |FROM documents ORDER BY doc_id""".stripMargin)(
    (s, d) => {
      val tokens = split(col("text"), "\\s+")
      val lowTokens = split(lower(col("text")), "\\s+")
      val nTokens = size(tokens).cast("double")
      val stopHits = hitsIn(lowTokens, enStops).cast("double")
      val uniq = size(array_distinct(lowTokens)).cast("double")
      val punct = regexCount(col("text"), "[^A-Za-z0-9\\s]").cast("double")
      val chars = length(col("text")).cast("double")
      val lenScore = least(chars / 500.0, lit(1.0))
      val stopRatio = stopHits / nTokens
      val uniqRatio = uniq / nTokens
      val punctRatio = punct / chars
      def r4(c: org.apache.spark.sql.Column) = floor(c * 10000 + 0.5) / 10000
      Rebalance.scanWide(Tables.documents(s, d), col("doc_id")).select(
        col("doc_id"),
        r4(lenScore).as("len_score"),
        r4(stopRatio).as("stop_ratio"),
        r4(uniqRatio).as("uniq_ratio"),
        when(chars > 0, r4(punctRatio)).as("punct_ratio"),
        when(chars > 0,
          r4(lenScore * 0.25
            + least(stopRatio * 5.0, lit(1.0)) * 0.35
            + uniqRatio * 0.2
            + (lit(1.0) - least(punctRatio * 10.0, lit(1.0))) * 0.2)).as("quality"))
        .orderBy("doc_id")
    })

  // ------------------------------------------------------------ lang id

  private[ops] val stops: Seq[(String, Seq[String])] = Seq(
    "en" -> enStops,
    "es" -> Seq("el", "los", "y", "en", "un", "una", "es", "que", "por", "con"),
    "fr" -> Seq("le", "la", "les", "des", "et", "une", "est", "dans", "pour", "ce"),
    "de" -> Seq("der", "die", "das", "und", "zu", "den", "von", "ist", "mit", "nicht"))

  /** Language-ID heuristic: stopword hits per language + CJK codepoint
    * density. Deterministic argmax (priority order en > es > fr > de on
    * ties); 'zh' when ≥30% of chars are CJK; 'und' when nothing fires.
    * This is the n-gram-free flavor of fastText-style cheap lang-ID —
    * one scan, no model artifact to ship.
    */
  val langId = {
    val hitExprsDuck = stops.map { case (l, ws) =>
      s"CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t IN ${inList(ws)})) AS BIGINT) AS ${l}_hits"
    }.mkString(",\n       ")
    val predDuck =
      """CASE WHEN CAST(len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS DOUBLE) * 10.0 >= CAST(length(text) AS DOUBLE) * 3.0 THEN 'zh'
        |     WHEN greatest(en_hits, es_hits, fr_hits, de_hits) = 0 THEN 'und'
        |     WHEN en_hits >= greatest(es_hits, fr_hits, de_hits) THEN 'en'
        |     WHEN es_hits >= greatest(fr_hits, de_hits) THEN 'es'
        |     WHEN fr_hits >= de_hits THEN 'fr'
        |     ELSE 'de' END""".stripMargin
    QueryDef(
      "text_lang_id",
      s"""SELECT * FROM (
         |SELECT doc_id, lang AS tagged_lang,
         |       $hitExprsDuck,
         |       $predDuck AS pred_lang
         |FROM documents) ORDER BY doc_id""".stripMargin)(
      (s, d) => {
        val withHits = stops.foldLeft(
          Rebalance.scanWide(Tables.documents(s, d), col("doc_id")).select(col("doc_id"), col("lang").as("tagged_lang"), col("text"))) {
          case (df, (l, ws)) =>
            df.withColumn(s"${l}_hits",
              hitsIn(split(lower(col("text")), "\\s+"), ws).cast("long"))
        }
        withHits
          .withColumn("cjk", regexCount(col("text"), "[\\x{4e00}-\\x{9fff}]").cast("double"))
          .withColumn("pred_lang",
            when(col("cjk") * 10.0 >= length(col("text")).cast("double") * 3.0, "zh")
              .when(greatest(col("en_hits"), col("es_hits"), col("fr_hits"), col("de_hits")) === 0, "und")
              .when(col("en_hits") >= greatest(col("es_hits"), col("fr_hits"), col("de_hits")), "en")
              .when(col("es_hits") >= greatest(col("fr_hits"), col("de_hits")), "es")
              .when(col("fr_hits") >= col("de_hits"), "fr")
              .otherwise("de"))
          .select(col("doc_id"), col("tagged_lang"),
            col("en_hits"), col("es_hits"), col("fr_hits"), col("de_hits"), col("pred_lang"))
          .orderBy("doc_id")
      })
  }

  // -------------------------------------------------------- fingerprint

  /** Rolling-hash document fingerprint: a Rabin-Karp polynomial hash of
    * the whole text mod 1e9+7 (per-step mod keeps both engines inside
    * int64 — DuckDB errors on overflow rather than wrapping), plus the
    * MINIMUM 8-gram window hash (the winnowing primitive: near-identical
    * docs share their minimum window hash with high probability).
    */
  val fingerprint = {
    // 31^k mod p for the unrolled 8-gram polynomial, highest power first.
    val P = 1000000007L
    val pows = Iterator.iterate(1L)(x => x * 31 % P).take(8).toSeq.reverse
    // CAST to BIGINT before multiplying: ascii() is 32-bit in both engines
    // and ascii * 31^6 overflows INT (Spark ANSI and DuckDB both error
    // on overflow rather than wrapping).
    def gram(i: String) =
      "(" + pows.zipWithIndex.map { case (pw, k) =>
        s"CAST(ascii(substr(text, $i + $k, 1)) AS BIGINT) * $pw" }.mkString(" + ") + s") % $P"
    val gramDuck = gram _
    QueryDef(
      "text_fingerprint",
      s"""SELECT doc_id,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split(text, ''), c -> ascii(c))),
         |              (acc, c) -> (acc * 31 + c) % $P) AS doc_hash,
         |  CASE WHEN length(text) < 8 THEN NULL
         |       ELSE list_min(list_transform(range(1, length(text) - 6), i -> ${gramDuck("i")}))
         |  END AS min_gram_hash
         |FROM documents ORDER BY doc_id""".stripMargin)(
      (s, d) => {
        // Native graft_polyhash/graft_mingram expressions (see
        // functions/TextExpressions.scala): identical math to the HOF
        // formulation (per-codepoint fold; sum-then-mod 8-gram windows)
        // but as a compiled loop inside whole-stage codegen. The
        // interpreted-HOF version of this query measured 7.6 s at sf0.1;
        // bit-equality against the HOF shape is pinned in
        // VectorExpressionsSpec and the DuckDB oracle is unchanged.
        Rebalance.scanWide(Tables.documents(s, d), col("doc_id"))
          .select(
            col("doc_id"),
            expr("graft_polyhash(text)").as("doc_hash"),
            expr("graft_mingram(text, 8)").as("min_gram_hash"))
          .orderBy("doc_id")
      })
  }

  /** Text cleaning — the normalization pass that precedes dedup/scoring
    * in every training-data pipeline: strip URLs and HTML-ish tags,
    * drop bracketed boilerplate markers, collapse whitespace, trim.
    * Pure regexp_replace chain (codegen'd, scan-speed); patterns are
    * spelled identically for Java regex and DuckDB's RE2.
    */
  val cleanText = QueryDef(
    "text_clean",
    """SELECT doc_id,
      |  trim(regexp_replace(
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(text, 'https?://[^ ]+', ' '),
      |        '<[^>]*>', ' '),
      |      '\[[A-Z_]+\]', ' '),
      |    '\s+', ' ')) AS clean_text,
      |  CAST(length(text) - length(trim(regexp_replace(
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(text, 'https?://[^ ]+', ' '),
      |        '<[^>]*>', ' '),
      |      '\[[A-Z_]+\]', ' '),
      |    '\s+', ' '))) AS BIGINT) AS n_chars_removed
      |FROM documents ORDER BY doc_id""".stripMargin)(
    (s, d) => {
      def cleaned(c: org.apache.spark.sql.Column) =
        trim(regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(c, "https?://[^ ]+", " "),
              "<[^>]*>", " "),
            "\\[[A-Z_]+\\]", " "),
          "\\s+", " "))
      Rebalance.scanWide(Tables.documents(s, d), col("doc_id")).select(
        col("doc_id"),
        cleaned(col("text")).as("clean_text"),
        (length(col("text")) - length(cleaned(col("text")))).cast("long").as("n_chars_removed"))
        .orderBy("doc_id")
    })

  /** PII masking — emails and phone-shaped numbers replaced with typed
    * placeholder tokens (the redaction pass before text ships anywhere).
    * Same regex dialect subset in Java and RE2.
    */
  val piiMask = QueryDef(
    "text_pii_mask",
    """SELECT doc_id,
      |  regexp_replace(
      |    regexp_replace(text,
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>'),
      |    '\+?[0-9][0-9()\- ]{7,}[0-9]', '<PHONE>') AS masked,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails
      |FROM documents ORDER BY doc_id""".stripMargin)(
    (s, d) => Rebalance.scanWide(Tables.documents(s, d), col("doc_id")).select(
      col("doc_id"),
      regexp_replace(
        regexp_replace(col("text"),
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        "\\+?[0-9][0-9()\\- ]{7,}[0-9]", "<PHONE>").as("masked"),
      regexCount(col("text"), "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")
        .cast("long").as("n_emails"))
      .orderBy("doc_id"))

  /** Repetition ratio (Gopher-style quality filter): fraction of the
    * doc's word-bigram occurrences taken by its single most frequent
    * bigram. Relational shape (explode → window lead → two grouped
    * aggregations) — same codegen-first reasoning as Dedup's minhash.
    * High ratio = looping/boilerplate text.
    */
  def repetitionRatio(documents: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("pos")
    val grams = documents
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        posexplode(split(lower(col("text")), "\\s+")).as(Seq("pos", "tok")))
      .withColumn("nxt", lead(col("tok"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tok"), col("nxt")).as("gram"))
    grams
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(max(col("c")).as("max_c"), sum(col("c")).as("total"))
      .select(col("doc_id"),
        (floor(col("max_c").cast("double") / col("total").cast("double") * 10000 + 0.5) / 10000)
          .as("rep_ratio"))
  }

  val repetitionQuery = QueryDef(
    "text_repetition_ratio",
    """WITH grams AS (
      |  SELECT doc_id, tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS gram
      |  FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok,
      |               generate_subscripts(string_split_regex(lower(text), '\s+'), 1) AS pos
      |        FROM documents)),
      |counts AS (
      |  SELECT doc_id, gram, count(*) AS c FROM grams WHERE gram IS NOT NULL GROUP BY 1, 2)
      |SELECT doc_id,
      |       floor(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) * 10000 + 0.5) / 10000 AS rep_ratio
      |FROM counts GROUP BY doc_id ORDER BY doc_id""".stripMargin)(
    (s, d) => repetitionRatio(Rebalance.scanWide(Tables.documents(s, d), col("doc_id"))).orderBy("doc_id"))

  // -------------------------------------------------------------- tf-idf

  /** Per-document top-k TF-IDF terms — the classic corpus-statistics
    * operator (characteristic vocabulary per doc, feature selection,
    * keyword extraction). All-relational, two aggregations:
    * tf = per-(doc, term) counts (one shuffle on (doc_id, term)),
    * df = per-term doc counts derived FROM tf (map-side-combinable
    * second aggregation over already-distinct rows), and N arrives as a
    * broadcast 1-row cross join — never a driver-side constant baked
    * into the plan, so the same query works when `documents` is a 100 TB
    * table. Weights are floor-rounded to 4 decimals BEFORE ranking with
    * a term-lexicographic tiebreak: libm `ln` may differ from the JVM's
    * in the last ulp, and an ulp at a top-k boundary would flip the
    * selection between engines — after rounding, any such pair is a tie
    * resolved identically on both sides.
    */
  def tfidfTopTerms(documents: DataFrame, topK: Int = 3): DataFrame = {
    val toks = documents.filter(col("text").isNotNull)
      .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = documents.agg(count_distinct(col("doc_id")).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("weight").desc, col("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("weight",
        floor(col("tf") * log(col("n_docs").cast("double") / col("df").cast("double")) * 10000 + 0.5) / 10000)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col("doc_id"), col("term"), col("tf"), col("weight"), col("rk"))
  }

  val tfidfQuery = QueryDef(
    "text_tfidf_topterms",
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS term
       |  FROM documents WHERE text IS NOT NULL),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
       |w AS (
       |  SELECT tf.doc_id, tf.term, tf.tf,
       |         ${r4duck("tf.tf * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE))")} AS weight
       |  FROM tf JOIN df USING (term) CROSS JOIN n),
       |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY weight DESC, term) AS rk
       |      FROM w)
       |SELECT doc_id, term, tf, weight, CAST(rk AS INTEGER) AS rk FROM r WHERE rk <= 3
       |ORDER BY doc_id, rk""".stripMargin)(
    (s, d) => tfidfTopTerms(Rebalance.scanWide(Tables.documents(s, d), col("doc_id"))).orderBy("doc_id", "rk"))

  // ---------------------------------------------------- n-gram LM scoring

  /** Corpus bigram language-model scoring — the statistical form of
    * CCNet-style perplexity filtering (no learned model runtime in this
    * environment, so the LM is the corpus' own bigram statistics, which
    * is exactly what KenLM-over-the-corpus degenerates to at order 2):
    * each document scores the average add-k-smoothed log-probability of
    * its bigrams, P(w2|w1) = (c(w1,w2)+k) / (c(w1·)+k·V). Documents
    * full of common constructions score high; token-salad and
    * out-of-distribution text score low — the rank a perplexity gate
    * thresholds on.
    *
    * Scale shape: everything downstream of the first aggregation runs
    * at DISTINCT-bigram scale, never occurrence scale. The corpus-wide
    * explode feeds one grouped count to (doc_id, w1, w2) — map-side
    * partial combine collapses each doc's repeated bigrams before the
    * exchange — and every later stage (the (w1,w2) count table, its
    * per-w1 rollup, the lp join, the per-doc sum) consumes that
    * per-doc-distinct frame. The round-11 shape instead joined the raw
    * occurrence frame against the count tables twice — the suite's
    * single biggest shuffle, and the one row whose official time never
    * approached its quiet-machine minimum under machine load (r11:
    * 4.63 s official vs 1.84 s clean); shrinking the joined rows to the
    * distinct frame removes most of those shuffle bytes outright. V
    * rides in as a broadcast single-row frame — no all-pairs stage, no
    * driver collect.
    *
    * Numeric contract: a doc's n repeats of one bigram contribute
    * n × lp instead of n summed copies — exactly equal BECAUSE the
    * arithmetic is decimal end-to-end: lp is DECIMAL(24,12), n rides as
    * DECIMAL(13,0) so the product is DECIMAL(38,12) with no precision
    * overflow (Spark would silently shrink the scale to 6 past
    * precision 38 — the long→decimal(20,0) default hits that), and
    * decimal addition is exact and commutative, so the result is
    * independent of partition order AND bit-equal to the oracle's
    * per-occurrence sum; the one ln() per distinct bigram is the same
    * libm call the TF-IDF oracle row already proves cross-engine
    * stable.
    */
  /** One row per bigram OCCURRENCE: (doc_id, w1, w2) over the
    * lowercased whitespace split — the shared front of [[lmBigramScores]]
    * (self-scoring) and [[lmScoreAgainst]] (scoring vs a persisted
    * store; the streaming LM gate's shape).
    */
  private[graft] def bigramOccurrences(
      documents: DataFrame, extra: Seq[String] = Nil): DataFrame = {
    // `extra` columns ride along unchanged (e.g. importanceWeights' is_t
    // flag) so callers never re-implement the 0-based sequence/get
    // construction below — the one copy of that indexing lives here.
    val keep = col("doc_id") +: extra.map(col)
    val arr = documents.select(keep :+ split(lower(col("text")), "\\s+").as("a"): _*)
    arr.filter(size(col("a")) >= 2)
      .select(keep :+
        explode(transform(sequence(lit(0), size(col("a")) - 2),
          i => struct(get(col("a"), i).as("w1"), get(col("a"), i + 1).as("w2"))))
          .as("bg"): _*)
      .select(keep :+ col("bg.w1").as("w1") :+ col("bg.w2").as("w2"): _*)
  }

  /** Distinct (doc_id, w1, w2, n) rows — each doc's bigram multiset
    * collapsed to counts by ONE grouped aggregation whose map-side
    * partial combine is what keeps every later join/aggregate at
    * distinct-bigram scale (see [[lmBigramScores]] scaladoc). Extra
    * columns ride through the grouping unchanged (they are per-doc
    * constants, e.g. [[importanceWeights]]' is_t flag).
    */
  private def docBigramCounts(
      documents: DataFrame, extra: Seq[String] = Nil): DataFrame =
    bigramOccurrences(documents, extra)
      .groupBy((("doc_id" +: extra) :+ "w1" :+ "w2").map(col): _*)
      .agg(count(lit(1)).as("n"))

  /** Per-doc (n_bigrams, r4 avg) from (doc_id, n, lp) rows: each
    * distinct bigram contributes its occurrence count and n × lp, with
    * the multiply kept exact in decimal (n as DECIMAL(13,0) so the
    * product type is DECIMAL(38,12) — no precision-overflow scale
    * shrink). Docs with no bigrams surface with n_bigrams = 0 and NULL
    * avg_logp.
    */
  private def perDocAvgLogp(documents: DataFrame, scored: DataFrame): DataFrame = {
    val agg = scored.groupBy("doc_id")
      .agg(sum(col("n")).as("n_bigrams"),
        sum(col("lp") * col("n").cast("decimal(13,0)")).cast("double").as("s"))
    documents.select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        (floor(col("s") / col("n_bigrams") * 10000 + 0.5) / 10000).as("avg_logp"))
  }

  def lmBigramScores(documents: DataFrame, k: Double = 0.5): DataFrame = {
    require(k > 0, s"smoothing k must be > 0 (got $k)")
    val arr = documents.select(col("doc_id"), split(lower(col("text")), "\\s+").as("a"))
    // Cache ownership (same contract as Dedup.minhashLsh): dbc feeds
    // BOTH the count-table rollup and the per-doc lp join — uncached,
    // the corpus-wide tokenize+explode+aggregate pipeline runs twice
    // (measured r12: 42 s process-CPU uncached vs 24 s cached at
    // sf0.1). Serialized storage: narrow (long, string, string, long)
    // rows compress well and keep the old-gen footprint — the r11
    // official run's contention exposure on exactly this query — small.
    // The harness barrier frees it between runs.
    val dbc = docBigramCounts(documents)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val cb = dbc.groupBy("w1", "w2").agg(sum("n").as("cb"))
    // context counts are exactly the per-w1 sums of the bigram counts
    // (the identity the LM store relies on) — deriving them from cb
    // instead of re-grouping saves a third corpus-wide explode
    val cu = cb.groupBy("w1").agg(sum("cb").as("cu"))
    val v = arr.select(explode(col("a")).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    // lp per DISTINCT bigram, computed once on the count table — the
    // doc-side join then carries one row per (doc, distinct bigram)
    val lp = cb
      .join(cu, Seq("w1"))
      .crossJoin(broadcast(v))
      .select(col("w1"), col("w2"),
        log((col("cb") + k) / (col("cu") + col("v") * k))
          .cast("decimal(24,12)").as("lp"))
    perDocAvgLogp(documents, dbc.join(lp, Seq("w1", "w2")))
  }

  /** [[lmBigramScores]] against a PERSISTED model instead of the batch's
    * own statistics — the incremental-pipeline form: build the counts
    * once over the reference corpus, then score every later batch with
    * no corpus-wide aggregation at all (two hash joins against the
    * count tables plus a scan-side smoothing formula). Bigrams and
    * contexts the store has never seen coalesce to count 0 and take the
    * full smoothing penalty ln(k / (k·V)) = −ln(V) — out-of-distribution
    * text scores low by construction, which is the gate's point.
    */
  def lmScoreAgainst(
      documents: DataFrame,
      bigramCounts: DataFrame,
      contextCounts: DataFrame,
      vocabSize: Long,
      k: Double = 0.5): DataFrame = {
    require(k > 0, s"smoothing k must be > 0 (got $k)")
    require(vocabSize > 0, s"vocabSize must be > 0 (got $vocabSize)")
    val scored = docBigramCounts(documents)
      .join(bigramCounts, Seq("w1", "w2"), "left")
      .join(contextCounts, Seq("w1"), "left")
      .select(col("doc_id"), col("n"),
        log((coalesce(col("cb"), lit(0L)) + k) /
          (coalesce(col("cu"), lit(0L)) + vocabSize * k))
          .cast("decimal(24,12)").as("lp"))
    perDocAvgLogp(documents, scored)
  }

  val lmScoreQuery = QueryDef(
    "text_lm_bigram_score",
    """WITH arr AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS a FROM documents),
      |bi AS (SELECT doc_id, a[i] AS w1, a[i + 1] AS w2
      |       FROM arr, LATERAL (SELECT unnest(generate_series(1, len(a) - 1)) AS i) t),
      |cb AS (SELECT w1, w2, count(*) AS cb FROM bi GROUP BY 1, 2),
      |cu AS (SELECT w1, count(*) AS cu FROM bi GROUP BY 1),
      |v AS (SELECT count(DISTINCT tok) AS v
      |      FROM (SELECT unnest(a) AS tok FROM arr)),
      |scored AS (
      |  SELECT b.doc_id,
      |         CAST(ln((cb.cb + 0.5) / (cu.cu + 0.5 * v.v)) AS DECIMAL(24,12)) AS lp
      |  FROM bi b JOIN cb USING (w1, w2) JOIN cu USING (w1) CROSS JOIN v),
      |agg AS (SELECT doc_id, count(*) AS n_bigrams, CAST(sum(lp) AS DOUBLE) AS s
      |        FROM scored GROUP BY 1)
      |SELECT d.doc_id,
      |       coalesce(a2.n_bigrams, 0) AS n_bigrams,
      |       floor(a2.s / a2.n_bigrams * 10000 + 0.5) / 10000 AS avg_logp
      |FROM documents d LEFT JOIN agg a2 USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin)(
    (s, d) => lmBigramScores(Rebalance.scanWide(Tables.documents(s, d), col("doc_id"))).orderBy("doc_id"))

  // ------------------------------------------- DSIR importance weights

  /** Data Selection with Importance Resampling (Xie et al. 2023) in its
    * bigram-LM form: every document's importance weight is
    * log p_target(doc) − log p_background(doc) under two add-k-smoothed
    * bigram LMs — the target LM fit on the high-quality slice
    * (`targetPred`), the background LM on the whole corpus. Documents
    * whose language-model fit looks more target-like than corpus-like get
    * positive weights; resampling by weight shifts the training mix
    * toward the target distribution without hand-written rules.
    *
    * Single-scan shape: the corpus is tokenized ONCE and the per-doc
    * distinct-bigram frame ([[docBigramCounts]]) carries an `is_target`
    * flag, so BOTH LMs come out of ONE grouped aggregation (target
    * counts are conditional sums of per-doc counts) — not two pipelines
    * over two scans. The per-(w1,w2) count table is
    * distinct-bigram-sized, its per-w1 rollup reuses the cu = Σcb
    * identity from [[lmBigramScores]], the vocab sizes broadcast as a
    * 1-row frame, and per-doc sums multiply each distinct bigram's
    * DECIMAL(24,12) lp by its exact-decimal count (order-independent
    * and bit-equal to the per-occurrence sum — the same numeric
    * contract, and the same occurrence-scale-join removal, as
    * [[lmBigramScores]]). Unseen-in-target bigrams take the smoothing
    * penalty by coalesced zero counts, exactly like [[lmScoreAgainst]].
    *
    * Contract: `targetPred` must select a non-empty slice — an empty
    * target degenerates the smoothing denominator (v_t = 0) and every
    * weight surfaces NULL rather than a number (loud, not silently
    * wrong). Weight is rounded ONCE from the unrounded quotients, so the
    * reported components and the weight stay each exactly 4-decimal.
    */
  def importanceWeights(
      documents: DataFrame,
      targetPred: org.apache.spark.sql.Column,
      k: Double = 0.5): DataFrame = {
    require(k > 0, s"smoothing k must be > 0 (got $k)")
    def r4(c: org.apache.spark.sql.Column) = floor(c * 10000 + 0.5) / 10000
    val flagged = documents.withColumn("is_t", targetPred)
    // cached for the same two-consumer reason as lmBigramScores' dbc
    val dbc = docBigramCounts(flagged, extra = Seq("is_t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val cb = dbc.groupBy("w1", "w2").agg(
      sum("n").as("cb_b"),
      sum(when(col("is_t"), col("n")).otherwise(lit(0L))).as("cb_t"))
    val cu = cb.groupBy("w1").agg(sum("cb_b").as("cu_b"), sum("cb_t").as("cu_t"))
    val v = flagged
      .select(col("is_t"), explode(split(lower(col("text")), "\\s+")).as("tok"))
      .agg(countDistinct(col("tok")).as("v_b"),
        countDistinct(when(col("is_t"), col("tok"))).as("v_t"))
    val lp = cb
      .join(cu, Seq("w1"))
      .crossJoin(broadcast(v))
      .select(col("w1"), col("w2"),
        log((col("cb_t") + k) / (col("cu_t") + col("v_t") * k))
          .cast("decimal(24,12)").as("lp_t"),
        log((col("cb_b") + k) / (col("cu_b") + col("v_b") * k))
          .cast("decimal(24,12)").as("lp_b"))
    val nDec = col("n").cast("decimal(13,0)")
    val agg = dbc.join(lp, Seq("w1", "w2")).groupBy("doc_id").agg(
      sum(col("n")).as("n_bigrams"),
      sum(col("lp_t") * nDec).cast("double").as("st"),
      sum(col("lp_b") * nDec).cast("double").as("sb"))
    documents.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        r4(col("st") / col("n_bigrams")).as("logp_target"),
        r4(col("sb") / col("n_bigrams")).as("logp_background"),
        r4(col("st") / col("n_bigrams") - col("sb") / col("n_bigrams")).as("weight"))
  }

  /** Registered form: target = the English slice (the corpus' largest,
    * playing the "trusted high-quality corpus" role DSIR gives e.g.
    * Wikipedia), background = everything.
    */
  val importanceQuery = QueryDef(
    "mix_importance_weights",
    """WITH arr AS (SELECT doc_id, (lang = 'en') AS is_t,
      |                    string_split_regex(lower(text), '\s+') AS a FROM documents),
      |bi AS (SELECT doc_id, is_t, a[i] AS w1, a[i + 1] AS w2
      |       FROM arr, LATERAL (SELECT unnest(generate_series(1, len(a) - 1)) AS i) t),
      |cb AS (SELECT w1, w2, count(*) AS cb_b,
      |              sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS cb_t
      |       FROM bi GROUP BY 1, 2),
      |cu AS (SELECT w1, sum(cb_b) AS cu_b, sum(cb_t) AS cu_t FROM cb GROUP BY 1),
      |v AS (SELECT count(DISTINCT tok) AS v_b,
      |             count(DISTINCT CASE WHEN is_t THEN tok END) AS v_t
      |      FROM (SELECT is_t, unnest(a) AS tok FROM arr)),
      |scored AS (
      |  SELECT b.doc_id,
      |         CAST(ln((cb.cb_t + 0.5) / (cu.cu_t + v.v_t * 0.5)) AS DECIMAL(24,12)) AS lp_t,
      |         CAST(ln((cb.cb_b + 0.5) / (cu.cu_b + v.v_b * 0.5)) AS DECIMAL(24,12)) AS lp_b
      |  FROM bi b JOIN cb USING (w1, w2) JOIN cu USING (w1) CROSS JOIN v),
      |agg AS (SELECT doc_id, count(*) AS n_bigrams,
      |               CAST(sum(lp_t) AS DOUBLE) AS st, CAST(sum(lp_b) AS DOUBLE) AS sb
      |        FROM scored GROUP BY 1)
      |SELECT d.doc_id,
      |       coalesce(a2.n_bigrams, 0) AS n_bigrams,
      |       floor(a2.st / a2.n_bigrams * 10000 + 0.5) / 10000 AS logp_target,
      |       floor(a2.sb / a2.n_bigrams * 10000 + 0.5) / 10000 AS logp_background,
      |       floor((a2.st / a2.n_bigrams - a2.sb / a2.n_bigrams) * 10000 + 0.5) / 10000 AS weight
      |FROM documents d LEFT JOIN agg a2 USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin)(
    (s, d) => importanceWeights(Rebalance.scanWide(Tables.documents(s, d), col("doc_id")), col("lang") === "en").orderBy("doc_id"))

  // --------------------------------------------------------- chunking

  /** Overlapping fixed-width chunking — the retrieval/embedding-index
    * prep step: split each document into `chunkChars`-char windows
    * advancing by `chunkChars − overlap`, keeping the source offset so
    * chunks remain traceable to their document span. The final chunk is
    * whatever remains (possibly short); every character is covered and
    * consecutive chunks share `overlap` chars of context.
    *
    * Scale shape: pure scan-side compute — sequence/explode/substr are
    * all codegen'd builtins, no shuffle anywhere; output order funcs as
    * (doc_id, chunk_idx) so downstream embedding jobs can repartition on
    * doc_id without losing chunk identity. Integer arithmetic only, so
    * the oracle replays it bit-for-bit.
    *
    * The index bound is floor(max(len − overlap − 1, 0) / stride), NOT
    * floor((len−1)/stride): the naive bound emits a final chunk whenever
    * any character sits past the last stride boundary, and when the tail
    * length is ≤ overlap that chunk is a strict SUFFIX of the previous
    * one — a pure duplicate in the retrieval index (with 200/50 defaults
    * that's every doc whose length mod 150 lands in [1, 50]). The
    * tightened bound starts a new chunk only when it adds unseen
    * characters; coverage stays total.
    */
  def chunkDocuments(
      documents: DataFrame,
      chunkChars: Int = 200,
      overlap: Int = 50): DataFrame = {
    require(chunkChars > 0, s"chunkChars must be > 0 (got $chunkChars)")
    require(overlap >= 0 && overlap < chunkChars,
      s"overlap must be in [0, chunkChars) (got $overlap)")
    val stride = chunkChars - overlap
    documents
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .select(col("doc_id"), col("text"), length(col("text")).as("len"))
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L),
          floor(greatest(col("len") - (overlap + 1), lit(0)) / stride).cast("long")))
          .as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * stride).as("chunk_start"),
        col("text").substr((col("chunk_idx") * stride + 1).cast("int"), lit(chunkChars))
          .as("chunk_text"))
      .withColumn("chunk_len", length(col("chunk_text")).cast("long"))
  }

  val chunkQuery = QueryDef(
    "text_chunk_documents",
    """WITH base AS (SELECT doc_id, text, length(text) AS len
      |              FROM documents WHERE text IS NOT NULL AND length(text) > 0),
      |c AS (SELECT doc_id, i AS chunk_idx, i * 150 AS chunk_start,
      |             substring(text, CAST(i * 150 + 1 AS INT), 200) AS chunk_text
      |      FROM base,
      |           LATERAL (SELECT unnest(generate_series(0,
      |                      CAST(floor(greatest(len - 51, 0) / 150.0) AS BIGINT))) AS i) t)
      |SELECT doc_id, chunk_idx, chunk_start, chunk_text,
      |       length(chunk_text) AS chunk_len
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin)(
    (s, d) => chunkDocuments(Rebalance.scanWide(Tables.documents(s, d), col("doc_id"))).orderBy("doc_id", "chunk_idx"))

  // ------------------------------------------------- vocab / OOV audit

  /** Tokenizer-coverage audit: build the top-`vocabSize` corpus
    * vocabulary by frequency (token asc breaks count ties, so the
    * boundary is deterministic in both engines) and report each
    * document's out-of-vocabulary token count and rate — the check run
    * before committing to a tokenizer or vocab budget ("how much of the
    * corpus does a V-token vocab actually cover, and which docs fall
    * outside it").
    *
    * Scale shape: the count table is distinct-token-sized; the top-V
    * comes from orderBy + limit, which Spark plans as
    * TakeOrderedAndProject — distributed partial top-K per partition,
    * NOT a single-partition row_number window. The V-row vocab then
    * broadcasts into the per-token left join, and n_oov is
    * count(*) − count(matched) so both engines emit BIGINT (a SUM(CASE)
    * would surface HUGEINT in DuckDB and fail the type-sensitive
    * compare).
    */
  def vocabOovAudit(documents: DataFrame, vocabSize: Int = 1000): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be > 0 (got $vocabSize)")
    def r4(c: org.apache.spark.sql.Column) = floor(c * 10000 + 0.5) / 10000
    val tok = documents.select(col("doc_id"),
      explode(split(lower(col("text")), "\\s+")).as("tok"))
    val vocab = tok.groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc)
      .limit(vocabSize)
      .select(col("tok"), lit(1).as("in_vocab"))
    val perDoc = tok.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        (count(lit(1)) - count(col("in_vocab"))).as("n_oov"))
    // left-join back so NULL-text docs surface with 0 tokens instead of
    // silently vanishing from the audit (perDocAvgLogp convention)
    documents.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        r4(col("n_oov").cast("double") / col("n_tokens").cast("double")).as("oov_rate"))
  }

  val vocabOovQuery = QueryDef(
    "text_vocab_oov",
    """WITH tok AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
      |             FROM documents),
      |vocab AS (SELECT tok, 1 AS in_vocab
      |          FROM (SELECT tok, count(*) AS n FROM tok GROUP BY 1)
      |          ORDER BY n DESC, tok ASC LIMIT 1000),
      |j AS (SELECT t.doc_id, v.in_vocab FROM tok t LEFT JOIN vocab v USING (tok)),
      |g AS (SELECT doc_id, count(*) AS n_tokens,
      |             count(*) - count(in_vocab) AS n_oov,
      |             floor(CAST(count(*) - count(in_vocab) AS DOUBLE) / CAST(count(*) AS DOUBLE)
      |                   * 10000 + 0.5) / 10000 AS oov_rate
      |      FROM j GROUP BY doc_id)
      |SELECT d.doc_id, coalesce(g.n_tokens, 0) AS n_tokens,
      |       coalesce(g.n_oov, 0) AS n_oov, g.oov_rate
      |FROM documents d LEFT JOIN g USING (doc_id) ORDER BY d.doc_id""".stripMargin)(
    (s, d) => vocabOovAudit(Rebalance.scanWide(Tables.documents(s, d), col("doc_id"))).orderBy("doc_id"))

  // ------------------------------------------------------- bpe tokens

  /** Real subword token counts under the committed BPE merges table —
    * the native graft_bpe_count expression (functions/Bpe.scala) run
    * over every document, next to the whitespace count and the
    * resulting subword-per-whitespace inflation factor (the 1.x×
    * misestimate every chars/4-style heuristic hides). Scan-side
    * compiled compute, zero shuffles; the DuckDB oracle replays the
    * greedy merge loop over the same committed table via a recursive
    * CTE, so the whole encoder is hash-verified, not just row counts.
    *
    * `bpe_per_ws` never divides by zero: split('\s+') yields at least
    * one element (possibly empty-string) on both engines, so the
    * whitespace count is >= 1 for any non-NULL text.
    */
  val bpeTokens = QueryDef(
    "text_bpe_tokens",
    s"""WITH RECURSIVE ${graft.functions.Bpe.duckDocTokens}
       |SELECT d.doc_id,
       |       CAST(len(regexp_extract_all(d.text, '${graft.functions.Bpe.PretokenPattern}')) AS BIGINT) AS n_pretokens,
       |       t.n_bpe_tokens,
       |       ${r4duck(s"CAST(t.n_bpe_tokens AS DOUBLE) / CAST(len(string_split_regex(d.text, '\\s+')) AS BIGINT)")} AS bpe_per_ws
       |FROM documents d JOIN bpe_doc_tokens t USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin)(
    (s, d) => {
      val bpe = call_function("graft_bpe_count",
        col("text"), lit(graft.functions.Bpe.mergesSpec)).cast("long")
      val ws = size(split(col("text"), "\\s+")).cast("long")
      Rebalance.scanWide(Tables.documents(s, d), col("doc_id"))
        .select(
          col("doc_id"),
          regexCount(col("text"), graft.functions.Bpe.PretokenPattern)
            .cast("long").as("n_pretokens"),
          bpe.as("n_bpe_tokens"),
          (floor(bpe.cast("double") / ws * 10000 + 0.5) / 10000).as("bpe_per_ws"))
        .orderBy("doc_id")
    })

  /** decode(encode(text)) through the REAL id pipeline — the loader's
    * detokenizer verified end-to-end. Whitespace never reaches the
    * encoder, so the invariant is equality with the pretokens joined by
    * '' — which the oracle states INDEPENDENTLY via regexp_extract_all,
    * with no knowledge of merges or ids at all: any bug in the id
    * assignment, the decode expansion, or the order preservation breaks
    * the hash. Scan-side compiled compute, zero shuffle (modulo the
    * output ordering).
    */
  val bpeRoundtrip = QueryDef(
    "text_bpe_roundtrip",
    s"""SELECT doc_id,
       |       array_to_string(regexp_extract_all(text, '${graft.functions.Bpe.PretokenPattern}'), '') AS detok
       |FROM documents ORDER BY doc_id""".stripMargin)(
    (s, d) => {
      val spec = lit(graft.functions.Bpe.mergesSpec)
      Rebalance.scanWide(Tables.documents(s, d), col("doc_id"))
        .select(col("doc_id"),
          call_function("graft_bpe_decode",
            call_function("graft_bpe_encode", col("text"), spec), spec).as("detok"))
        .orderBy("doc_id")
    })

  // --------------------------------------------------- learned quality

  /** Learned quality classifier — the hashed-feature linear model
    * ([[graft.functions.QualityClf]], fastText shape) scored by the
    * codegen'd graft_quality_margin kernel over the pinned cross-engine
    * tokenization. Emits the MARGIN (monotone in the probability — no
    * transcendentals near the hash compare) r6-rounded, plus the
    * thresholded prediction on the raw margin. The DuckDB oracle
    * replays every step value-for-value: the identical split, the
    * md5-hex15 bucket, the committed weight list (1-indexed), the
    * fixed-order mean, the same floor-rounding — so a drift anywhere in
    * the kernel, the spec literal, or the bucket math breaks the hash.
    *
    * Scale shape: one scan, zero shuffle, model literals inside the
    * plan — identical to the heuristic scorer it upgrades; at 100 TB
    * this runs at parquet scan speed with full column pruning.
    */
  val qualityClassifierQuery = QueryDef(
    "text_quality_classifier",
    s"""WITH w AS (SELECT ${graft.functions.QualityClf.duckWeightsList} AS wts),
       |toks AS (
       |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t
       |  FROM documents),
       |feat AS (
       |  SELECT doc_id,
       |         list_concat(t, list_transform(generate_series(1, len(t) - 1),
       |           i -> t[i] || '_' || t[i + 1])) AS f
       |  FROM toks),
       |scored AS (
       |  SELECT doc_id,
       |         CASE WHEN len(f) = 0 THEN ${graft.functions.QualityClf.bias}
       |              ELSE ${graft.functions.QualityClf.bias}
       |                + list_sum(list_transform(f, x ->
       |                    w.wts[(CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)
       |                           % ${graft.functions.QualityClf.B}) + 1])) / len(f)
       |         END AS z
       |  FROM feat CROSS JOIN w)
       |SELECT doc_id,
       |       floor(z * 1000000 + 0.5) / 1000000 AS margin,
       |       CASE WHEN z >= 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS pred
       |FROM scored ORDER BY doc_id""".stripMargin)(
    (s, d) => Rebalance.scanWide(Tables.documents(s, d), col("doc_id"))
      .select(col("doc_id"),
        call_function("graft_quality_margin",
          split(lower(col("text")), "\\s+"),
          lit(graft.functions.QualityClf.modelSpec)).as("z"))
      .select(col("doc_id"),
        (floor(col("z") * 1000000 + 0.5) / 1000000).as("margin"),
        when(col("z") >= 0, lit(1L)).otherwise(lit(0L)).as("pred"))
      .orderBy("doc_id"))

  val all: Seq[QueryDef] =
    Seq(tokenStats, qualityScores, langId, fingerprint, cleanText, piiMask, repetitionQuery,
      tfidfQuery, lmScoreQuery, importanceQuery, chunkQuery, vocabOovQuery, bpeTokens,
      bpeRoundtrip, qualityClassifierQuery)
}
