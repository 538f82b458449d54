package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{QueryDef, Tables}

/** Remaining SURVEY.md §2 coverage: the wide nested projection (T8), the
  * physical hints exercised as query-shaping operators (P1-P3), and the
  * local collection source (S9).
  */
object Coverage {

  /** T8 — wide explicit nested projection: the reference's 15-field
    * tweet-indicator schema (IndicateursStreaming.scala:14-30) built as a
    * JSON envelope, parsed with the explicitly-declared StructType (never
    * inferred — §1.2), and projected field-by-field
    * (IndicateursStreaming.scala:118-134). The oracle recomputes the same
    * 15 derivations directly — a lossless envelope round-trip.
    *
    * Scale note: from_json + a 15-field projection collapses to a single
    * codegen'd Project; Catalyst prunes the struct to exactly the fields
    * read (here: all 15, by design).
    */
  val t8WideProjection = {
    val schema = StructType(Array(
      StructField("event_date", StringType), StructField("id", StringType),
      StructField("text", StringType), StructField("lang", StringType),
      StructField("userid", StringType), StructField("name", StringType),
      StructField("screenName", StringType), StructField("location", StringType),
      StructField("followersCount", IntegerType), StructField("retweetCount", IntegerType),
      StructField("favoriteCount", IntegerType), StructField("Zipcode", StringType),
      StructField("ZipCodeType", StringType), StructField("City", StringType),
      StructField("State", StringType)))
    QueryDef(
      "t8_wide_nested_projection",
      """SELECT event_id,
        |  strftime(ts, '%Y-%m-%d') AS event_date,
        |  CAST(event_id AS VARCHAR) AS id,
        |  'event ' || event_type AS text,
        |  CASE WHEN user_id % 2 = 0 THEN 'en' ELSE 'fr' END AS lang,
        |  CAST(user_id AS VARCHAR) AS userid,
        |  'user_' || CAST(user_id AS VARCHAR) AS name,
        |  '@u' || CAST(user_id AS VARCHAR) AS screenName,
        |  'loc_' || CAST(user_id % 100 AS VARCHAR) AS location,
        |  CAST(user_id % 5000 AS INTEGER) AS followersCount,
        |  CAST(CASE WHEN value > 100 THEN 1 ELSE 0 END AS INTEGER) AS retweetCount,
        |  CAST(event_id % 50 AS INTEGER) AS favoriteCount,
        |  lpad(CAST(user_id % 99999 AS VARCHAR), 5, '0') AS Zipcode,
        |  'STANDARD' AS ZipCodeType,
        |  ['Paris', 'Lyon', 'Lille', 'Nantes'][CAST(user_id % 4 AS INTEGER) + 1] AS City,
        |  ['IDF', 'ARA', 'HDF', 'PDL'][CAST(user_id % 4 AS INTEGER) + 1] AS State
        |FROM events ORDER BY event_id""".stripMargin)(
      (s, d) => {
        val cities = array(lit("Paris"), lit("Lyon"), lit("Lille"), lit("Nantes"))
        val states = array(lit("IDF"), lit("ARA"), lit("HDF"), lit("PDL"))
        // Cheap scan, expensive map: the per-row Jackson envelope build +
        // parse dwarfs the scan — rebalance ahead of it when the input
        // is narrow (measured 3.5 s wall / 5.8 s cpu on 32 cores from
        // the fixture's one-split parquet; see [[Rebalance.scanWide]]
        // for the gate that makes this free on many-split inputs).
        // Catalyst keeps the expensive projection above the exchange.
        val envelope = Rebalance.scanWide(Tables.events(s, d), col("event_id")).select(
          col("event_id"),
          to_json(struct(
            date_format(col("ts"), "yyyy-MM-dd").as("event_date"),
            col("event_id").cast("string").as("id"),
            concat(lit("event "), col("event_type")).as("text"),
            when(pmod(col("user_id"), lit(2)) === 0, "en").otherwise("fr").as("lang"),
            col("user_id").cast("string").as("userid"),
            concat(lit("user_"), col("user_id").cast("string")).as("name"),
            concat(lit("@u"), col("user_id").cast("string")).as("screenName"),
            concat(lit("loc_"), pmod(col("user_id"), lit(100)).cast("string")).as("location"),
            pmod(col("user_id"), lit(5000)).cast("int").as("followersCount"),
            when(col("value") > 100, 1).otherwise(0).cast("int").as("retweetCount"),
            pmod(col("event_id"), lit(50)).cast("int").as("favoriteCount"),
            lpad(pmod(col("user_id"), lit(99999)).cast("string"), 5, "0").as("Zipcode"),
            lit("STANDARD").as("ZipCodeType"),
            element_at(cities, pmod(col("user_id"), lit(4)).cast("int") + 1).as("City"),
            element_at(states, pmod(col("user_id"), lit(4)).cast("int") + 1).as("State"))).as("kafka_json"))
        envelope
          .select(col("event_id"), from_json(col("kafka_json"), schema).as("t"))
          .select(col("event_id"),
            col("t.event_date"), col("t.id"), col("t.text"), col("t.lang"),
            col("t.userid"), col("t.name"), col("t.screenName"), col("t.location"),
            col("t.followersCount"), col("t.retweetCount"), col("t.favoriteCount"),
            col("t.Zipcode"), col("t.ZipCodeType"), col("t.City"), col("t.State"))
          .orderBy("event_id")
      })
  }

  /** P1-P3 — repartition / cache / coalesce exercised in one query
    * (reference: cache IndicateursStreaming.scala:80, repartition :84,
    * coalesce :69). The cached per-user aggregate is consumed TWICE (once
    * for the max, once for the final filter join) — exactly the reuse
    * pattern the reference cached for; repartition(8, user_id) pins the
    * aggregation's partitioning; the result is coalesced for output.
    * None of these change values, so the oracle is the plain SQL.
    */
  val p123PhysicalOps = QueryDef(
    "p123_repartition_cache",
    """SELECT user_id, n FROM (SELECT user_id, count(*) AS n FROM events GROUP BY 1)
      |WHERE n = (SELECT max(n) FROM (SELECT count(*) AS n FROM events GROUP BY user_id))
      |ORDER BY user_id""".stripMargin)(
    (s, d) => {
      val perUser = Tables.events(s, d)
        .repartition(8, col("user_id"))                       // P2
        .groupBy("user_id").agg(count(lit(1)).as("n"))
        .cache()                                              // P3
      val maxN = perUser.agg(max(col("n")).as("max_n"))
      perUser.join(broadcast(maxN), col("n") === col("max_n"))
        .select("user_id", "n")
        .coalesce(1)                                          // P1
        .orderBy("user_id")
    })

  /** S9 — local collection source (reference: `Seq(...).toDF("libellé")`,
    * IndicateursStreaming.scala:66-68): a driver-local LocalRelation
    * participating in a distributed plan as the broadcast side of a join
    * — the canonical tiny-dimension enrichment.
    */
  val s9LocalCollection = QueryDef(
    "s9_local_collection_join",
    """SELECT e.event_type, p.priority, count(*) AS n
      |FROM events e
      |JOIN (VALUES ('purchase', 1), ('signup', 2), ('click', 3), ('view', 4), ('error', 5))
      |     AS p(event_type, priority)
      |  ON e.event_type = p.event_type
      |GROUP BY 1, 2 ORDER BY p.priority""".stripMargin)(
    (s, d) => {
      import s.implicits._
      val local = Seq(
        ("purchase", 1), ("signup", 2), ("click", 3), ("view", 4), ("error", 5))
        .toDF("event_type", "priority")
      Tables.events(s, d)
        .join(broadcast(local), "event_type")
        .groupBy(col("event_type"), col("priority"))
        .agg(count(lit(1)).as("n"))
        .orderBy("priority")
    })

  /** PIVOT — event types to columns, one value column per type. Spark
    * plans this as a single two-phase hash aggregate over the pivot
    * expressions (values enumerated explicitly — never a driver-side
    * distinct scan); the oracle is the equivalent conditional
    * aggregation.
    */
  val pivotQuery = QueryDef(
    "q_pivot_daily_by_type",
    """SELECT strftime(ts, '%Y-%m-%d') AS d,
      |       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
      |       CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view,
      |       CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)(
    (s, d) => Tables.events(s, d)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("d"))
      .pivot("event_type", Seq("purchase", "view", "click"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("d"))

  /** Set operations — UNION/INTERSECT/EXCEPT (absent from the reference,
    * SURVEY §2.4 note): high- vs low-value purchaser overlap. All three
    * plan as aggregates/joins over pruned scans — no distinct-sort.
    */
  val setOpsQuery = QueryDef(
    "q_set_ops_users",
    """WITH hi AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' AND value > 150),
      |     lo AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' AND value < 50)
      |SELECT 'both' AS bucket, count(*) AS n FROM (SELECT * FROM hi INTERSECT SELECT * FROM lo)
      |UNION ALL
      |SELECT 'hi_only', count(*) FROM (SELECT * FROM hi EXCEPT SELECT * FROM lo)
      |UNION ALL
      |SELECT 'either', count(*) FROM (SELECT * FROM hi UNION SELECT * FROM lo)
      |ORDER BY bucket""".stripMargin)(
    (s, d) => {
      val purchases = Tables.events(s, d).filter(col("event_type") === "purchase")
      val hi = purchases.filter(col("value") > 150).select("user_id").distinct()
      val lo = purchases.filter(col("value") < 50).select("user_id").distinct()
      val both = hi.intersect(lo).agg(count(lit(1)).as("n")).withColumn("bucket", lit("both"))
      val hiOnly = hi.except(lo).agg(count(lit(1)).as("n")).withColumn("bucket", lit("hi_only"))
      val either = hi.union(lo).distinct().agg(count(lit(1)).as("n")).withColumn("bucket", lit("either"))
      both.unionByName(hiOnly).unionByName(either)
        .select("bucket", "n").orderBy("bucket")
    })

  /** Stratified sampling (data mixing): per-stratum fractions via
    * `sampleBy` — THE mixing primitive for training-data recipes
    * ("30% of source A, 5% of source B"). Seeded and deterministic for
    * a fixed partitioning, but partitioning-dependent → no cross-engine
    * oracle; CoverageSpec pins proportions and determinism.
    */
  def stratifiedMix(documents: org.apache.spark.sql.DataFrame,
      fractions: Map[String, Double], seed: Long = 42L): org.apache.spark.sql.DataFrame =
    documents.stat.sampleBy("lang", fractions, seed)

  val mixQuery = QueryDef.unverified("mix_stratified_sample")(
    (s, d) => stratifiedMix(
      Tables.documents(s, d),
      Map("en" -> 0.8, "fr" -> 0.5, "es" -> 0.5, "de" -> 0.2, "zh" -> 0.1))
      .select("doc_id", "lang").orderBy("doc_id"))

  /** Temperature-scaled mixing — the multilingual-LLM rebalancing rule
    * (sample source i with probability ∝ nᵢ^α, α < 1 upweights
    * low-resource sources; α = 1 is natural proportions). The per-source
    * fractions derive from counts with one aggregation whose result is
    * BOUNDED (one row per source — the documented low-cardinality
    * contract, same as every sampleBy recipe), then one sampleBy pass.
    * Fractions are capped at 1.0: sampling cannot mint rows, so the
    * target share of very small sources saturates (epoch repetition is
    * a training-loop concern, not a sampling one).
    *
    * targetRows sets the output budget; at 100 TB both passes are
    * scan-shaped (count-aggregate, then filter-sample) with no join.
    */
  def temperatureMix(
      documents: org.apache.spark.sql.DataFrame,
      keyCol: String = "lang",
      alpha: Double = 0.5,
      targetRows: Long = 200L,
      seed: Long = 42L,
      maxStrata: Int = 100000): org.apache.spark.sql.DataFrame = {
    // String-key contract, checked up front (a non-string key would only
    // fail later as a ClassCastException in the collect below). Null-key
    // rows are excluded DELIBERATELY, matching sampleBy's treatment of
    // keys absent from the fractions map — a null entry in that map would
    // otherwise sample them by accident.
    require(
      documents.schema(keyCol).dataType ==
        org.apache.spark.sql.types.StringType,
      s"temperatureMix requires a string key column; '$keyCol' is " +
        documents.schema(keyCol).dataType.simpleString)
    require(maxStrata >= 1, s"maxStrata must be >= 1 (got $maxStrata)")
    val keyed = documents.filter(col(keyCol).isNotNull)
    // The per-stratum counts land on the DRIVER (sampleBy's fractions
    // map is a driver-side argument) — fine for any realistic source
    // key (languages, domains, crawls: hundreds to low thousands), but
    // a high-cardinality key would bloat the driver map unboundedly.
    // Probe via limit(max+1) so the aggregate stays distributed and the
    // driver never receives more than max+1 rows even when failing.
    val probe = keyed.groupBy(keyCol).count().limit(maxStrata + 1).collect()
    require(probe.length <= maxStrata,
      s"temperatureMix found more than $maxStrata distinct '$keyCol' strata — " +
        "the per-stratum fractions map lives on the driver, so a " +
        "high-cardinality key does not scale here; use the deterministic " +
        "window-ranked twin (temperatureTakeSample / tokenBudgetSample), " +
        "which keeps per-key quotas distributed, or raise maxStrata " +
        "deliberately")
    val counts = probe.map(r => r.getString(0) -> r.getLong(1)).toMap
    // No non-null keys → no strata: return the (empty) keyed frame
    // rather than dividing by a zero normalizer (z = 0 would make every
    // fraction NaN and sampleBy would throw).
    if (counts.isEmpty) return keyed
    val weights = counts.map { case (k, n) => k -> math.pow(n.toDouble, alpha) }
    val z = weights.values.sum
    val fractions = weights.map { case (k, w) =>
      // share of the budget this source should contribute, as a fraction
      // of the rows it actually has
      k -> math.min(1.0, targetRows * (w / z) / counts(k).toDouble)
    }
    keyed.stat.sampleBy(keyCol, fractions, seed)
  }

  val temperatureMixQuery = QueryDef.unverified("mix_temperature_sample")(
    (s, d) => temperatureMix(Tables.documents(s, d))
      .select("doc_id", "lang").orderBy("doc_id"))

  /** Deterministic stratified sampling — the oracle-checkable counterpart
    * of [[stratifiedMix]]: within each stratum, rank docs by
    * md5(doc_id) (a content-derived, storage-independent order — the
    * [[tokenBudgetSample]] technique) and keep the first
    * floor(n_k · fraction_k + 0.5) of them. Same expected proportions as
    * Bernoulli sampleBy, but the selection is a pure function of corpus
    * content: identical under any partitioning, file layout, or engine —
    * which is what makes a 100 TB sampling run re-executable bit-for-bit
    * AND lets DuckDB replay it. One shuffle on the key; the two window
    * functions (rank + stratum count) share a single partition pass.
    * The Bernoulli [[stratifiedMix]] stays registered for sampleBy API
    * parity; this is the form a reproducible pipeline should use.
    */
  def hashStratifiedSample(
      documents: org.apache.spark.sql.DataFrame,
      keyCol: String = "lang",
      fractions: Map[String, Double]): org.apache.spark.sql.DataFrame = {
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0),
      "fractions must be within [0, 1]")
    val w = Window.partitionBy(col(keyCol)).orderBy(md5(col("doc_id").cast("string")))
    val wAll = Window.partitionBy(col(keyCol))
    val frac = fractions.foldLeft(lit(0.0)) { case (acc, (k, f)) =>
      when(col(keyCol) === k, f).otherwise(acc)
    }
    documents
      .filter(col(keyCol).isin(fractions.keys.toSeq: _*))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_k", count(lit(1)).over(wAll))
      .filter(col("rn") <= floor(col("n_k") * frac + 0.5).cast("long"))
      .select(col("doc_id"), col(keyCol))
  }

  private val mixFractions = Seq(
    "en" -> 0.8, "fr" -> 0.5, "es" -> 0.5, "de" -> 0.2, "zh" -> 0.1)

  val hashStratifiedQuery = QueryDef(
    "mix_stratified_take",
    s"""WITH ranked AS (
       |  SELECT doc_id, lang,
       |         row_number() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn,
       |         count(*) OVER (PARTITION BY lang) AS n_k
       |  FROM documents
       |  WHERE lang IN ('en', 'fr', 'es', 'de', 'zh'))
       |SELECT doc_id, lang FROM ranked
       |WHERE rn <= CAST(floor(n_k * (CASE lang ${mixFractions.map { case (k, f) => s"WHEN '$k' THEN $f" }.mkString(" ")} END) + 0.5) AS BIGINT)
       |ORDER BY doc_id""".stripMargin)(
    (s, d) => hashStratifiedSample(Tables.documents(s, d), fractions = mixFractions.toMap)
      .orderBy("doc_id"))

  /** Deterministic temperature-scaled sampling — the oracle-checkable
    * counterpart of [[temperatureMix]]: per-source quotas
    * floor(target · n_kᵃ / Σ n_kᵃ + 0.5) filled in md5(doc_id) order.
    * Fully relational — the per-key counts and the global normalizer are
    * aggregates joined back (counts frame is one row per source, the
    * documented low-cardinality contract → broadcast), no driver collect.
    * Deterministic for the same reason as [[hashStratifiedSample]].
    */
  def temperatureTakeSample(
      documents: org.apache.spark.sql.DataFrame,
      keyCol: String = "lang",
      alpha: Double = 0.5,
      targetRows: Long = 200L): org.apache.spark.sql.DataFrame = {
    val keyed = documents.filter(col(keyCol).isNotNull)
    val counts = keyed.groupBy(keyCol).agg(count(lit(1)).as("n_k"))
      .withColumn("w_k", pow(col("n_k").cast("double"), alpha))
    val z = counts.agg(sum(col("w_k")).as("z"))
    // The share w_k/z divides two doubles whose values depend on the
    // engine's summation order; floor-round it to 10 decimals BEFORE the
    // integer quota floor (the repo's r4 convention, one digit deeper)
    // so a last-ulp difference in z can't flip a quota by 1 at a .5
    // boundary between Spark and the DuckDB oracle.
    val share = floor(col("w_k") / col("z") * 1e10 + 0.5) / 1e10
    val quota = counts.crossJoin(broadcast(z))
      .select(col(keyCol),
        least(col("n_k"),
          floor(lit(targetRows.toDouble) * share + 0.5).cast("long")).as("take_k"))
    val w = Window.partitionBy(col(keyCol)).orderBy(md5(col("doc_id").cast("string")))
    keyed
      .withColumn("rn", row_number().over(w))
      .join(broadcast(quota), keyCol)
      .filter(col("rn") <= col("take_k"))
      .select(col("doc_id"), col(keyCol))
  }

  val temperatureTakeQuery = QueryDef(
    "mix_temperature_take",
    """WITH counts AS (
      |  SELECT lang, count(*) AS n_k, pow(count(*), 0.5) AS w_k
      |  FROM documents WHERE lang IS NOT NULL GROUP BY lang),
      |quota AS (
      |  SELECT lang,
      |         least(n_k, CAST(floor(200.0 * (floor(w_k / (SELECT sum(w_k) FROM counts) * 1e10 + 0.5) / 1e10) + 0.5) AS BIGINT)) AS take_k
      |  FROM counts),
      |ranked AS (
      |  SELECT doc_id, lang,
      |         row_number() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn
      |  FROM documents WHERE lang IS NOT NULL)
      |SELECT r.doc_id, r.lang FROM ranked r JOIN quota q ON r.lang = q.lang
      |WHERE r.rn <= q.take_k
      |ORDER BY doc_id""".stripMargin)(
    (s, d) => temperatureTakeSample(Tables.documents(s, d)).orderBy("doc_id"))

  /** Deterministic token-budget sampling — "take ~N training tokens per
    * source": within each key, docs are taken in md5(doc_id) order until
    * the running token count passes the budget. Unlike [[stratifiedMix]]
    * (row-order-dependent Bernoulli), the selection is a pure function of
    * the corpus CONTENT: the hash order is storage-independent, so the
    * same corpus yields the same sample under any partitioning or file
    * layout — re-runs of a 100 TB pipeline are reproducible without
    * pinning physical layout. md5 (not xxhash64) so the order is
    * cross-engine checkable. Cost: one shuffle on the key + per-key sort
    * — the window never sees more than one key's docs per partition; a
    * skewed key sorts only its own rows.
    */
  def tokenBudgetSample(
      documents: org.apache.spark.sql.DataFrame,
      keyCol: String = "lang",
      budgetTokens: Long = 5000L): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(md5(col("doc_id").cast("string")))
    documents
      .withColumn("n_tokens", size(split(col("text"), "\\s+")).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budgetTokens)
      .select(col("doc_id"), col(keyCol), col("n_tokens"), col("cum_tokens"))
  }

  val tokenBudgetQuery = QueryDef(
    "mix_token_budget",
    """WITH toks AS (
      |  SELECT doc_id, lang,
      |         CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens,
      |         md5(CAST(doc_id AS VARCHAR)) AS ord
      |  FROM documents),
      |cum AS (
      |  SELECT doc_id, lang, n_tokens,
      |         CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY ord) AS BIGINT) AS cum_tokens
      |  FROM toks)
      |SELECT doc_id, lang, n_tokens, cum_tokens
      |FROM cum WHERE cum_tokens <= 5000 ORDER BY doc_id""".stripMargin)(
    (s, d) => tokenBudgetSample(Tables.documents(s, d)).orderBy("doc_id"))

  // ------------------------------------------------------ sequence packing

  /** GPT-style sequence packing: concatenate the corpus in a
    * deterministic order and chunk the token stream into fixed
    * `seqTokens`-sized training sequences, SPLITTING documents across
    * sequence boundaries (concat-then-chunk — the packing used for
    * GPT/LLaMA-style pretraining, as opposed to first-fit bin packing
    * which drops or pads). Emits one row per (document, sequence)
    * overlap: where in the doc the slice starts (`doc_off`), where in
    * the sequence it lands (`seq_off`), and how many tokens
    * (`n_toks`) — the manifest a loader needs to assemble input_ids
    * without re-tokenizing.
    *
    * The global running sum is NOT a single-partition window (that
    * serializes the corpus through one task). The md5 order key's first
    * two hex chars split the corpus into 256 ranges that align with the
    * global order (a prefix of the sort key), so each range's running
    * sum is an independent 256-way-parallel window; range-level offsets
    * come from a 256-row aggregate windowed on the driver-sized frame
    * and broadcast back. Doc → sequence expansion is an output-sized
    * explode (a doc spans ceil(n/B)+1 sequences at most).
    *
    * Determinism: md5(doc_id) ordering is content-independent,
    * cross-engine reproducible, and shuffles long/similar docs apart —
    * the same rationale as [[tokenBudgetSample]].
    */
  def packSequences(
      documents: org.apache.spark.sql.DataFrame,
      seqTokens: Long = 2048L,
      tokenCount: Option[org.apache.spark.sql.Column] = None,
      carry: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    require(seqTokens >= 1, s"seqTokens must be >= 1 (got $seqTokens)")
    // Pluggable token denomination: whitespace tokens by default, or a
    // caller-supplied counter (e.g. the native BPE expression for real
    // LLM token budgets — mix_pack_sequences_bpe). A zero-token doc
    // occupies no span and is dropped up front: tok_start == tok_end
    // would otherwise make the sequence() bounds run BACKWARD when
    // tok_start lands exactly on a boundary (Spark's sequence(x, x-1)
    // emits a descending 2-row array, not an empty one).
    val nTokens = tokenCount.getOrElse(size(split(col("text"), "\\s+")).cast("long"))
    // `carry` columns ride the ONE metadata shuffle (e.g. the token-id
    // arrays of mix_pack_manifest_bpe) — strictly cheaper than a second
    // encode scan or a corpus-sized join-back afterwards.
    val carryCols = carry.map(col)
    val toks = documents.select(
      Seq(col("doc_id"),
        nTokens.cast("long").as("n_tokens"),
        md5(col("doc_id").cast("string")).as("ord")) ++ carryCols: _*)
      .filter(col("n_tokens") >= 1)
      .withColumn("grp", conv(substring(col("ord"), 1, 2), 16, 10).cast("int"))
    val w = Window.partitionBy(col("grp")).orderBy(col("ord"))
    val cum = toks.withColumn("cum_in", sum(col("n_tokens")).over(w))
    // 256-row frame: each range's token count, then its exclusive prefix
    // sum = the global offset of the range's first token
    val offsets = toks.groupBy("grp").agg(sum("n_tokens").as("grp_tot"))
      .withColumn("grp_off",
        coalesce(sum(col("grp_tot")).over(
          Window.orderBy(col("grp")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("grp"), col("grp_off"))
    val placed = cum.join(broadcast(offsets), "grp")
      .withColumn("tok_end", col("grp_off") + col("cum_in"))
      .withColumn("tok_start", col("tok_end") - col("n_tokens"))
    val b = lit(seqTokens)
    placed
      .select(Seq(col("doc_id"), col("tok_start"), col("tok_end"),
        explode(sequence(
          floor(col("tok_start") / b),
          floor((col("tok_end") - 1) / b))).as("seq_id")) ++ carryCols: _*)
      .select(Seq(
        col("doc_id"),
        col("seq_id"),
        (greatest(col("tok_start"), col("seq_id") * b) - col("tok_start")).as("doc_off"),
        (greatest(col("tok_start"), col("seq_id") * b) - col("seq_id") * b).as("seq_off"),
        (least(col("tok_end"), (col("seq_id") + 1) * b)
          - greatest(col("tok_start"), col("seq_id") * b)).as("n_toks")) ++ carryCols: _*)
  }

  // ---------------------------------------------------- corpus profiling

  /** Per-language corpus profile card — the one-scan summary every
    * curation run starts and ends with (did the dedup pass move the
    * duplicate ratio? did the mix shift token share?): doc/token
    * volumes, source fan-in, and the exact duplicate ratio
    * (1 − distinct texts / docs). One hash-aggregate over one scan; at
    * 100 TB the grouping key is low-cardinality so the reduce side is
    * trivially small — the scan is the cost, as it should be. All ratio
    * outputs are integer-derived and floor-rounded, so the DuckDB
    * oracle hash-matches bit-for-bit.
    */
  def corpusProfile(documents: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    def r4(c: org.apache.spark.sql.Column) = floor(c * 10000 + 0.5) / 10000
    documents.groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), "\\s+"))).cast("bigint").as("n_tokens"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(col("text")).as("n_distinct"))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        r4(col("n_tokens").cast("double") / col("n_docs").cast("double")).as("avg_tokens"),
        col("n_sources"),
        r4(lit(1.0) - col("n_distinct").cast("double") / col("n_docs").cast("double"))
          .as("dup_ratio"))
  }

  val corpusProfileQuery = QueryDef(
    "report_corpus_profile",
    """SELECT lang, count(*) AS n_docs,
      |       CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT) AS n_tokens,
      |       floor(CAST(sum(len(string_split_regex(text, '\s+'))) AS DOUBLE)
      |             / CAST(count(*) AS DOUBLE) * 10000 + 0.5) / 10000 AS avg_tokens,
      |       count(DISTINCT source) AS n_sources,
      |       floor((1.0 - CAST(count(DISTINCT text) AS DOUBLE)
      |             / CAST(count(*) AS DOUBLE)) * 10000 + 0.5) / 10000 AS dup_ratio
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)(
    (s, d) => corpusProfile(Tables.documents(s, d)).orderBy("lang"))

  // ------------------------------------------------- train/val/test split

  /** Deterministic train/val/test assignment by hash RANGE, not by
    * row_number quota: a document's split is a pure function of its own
    * doc_id (first 8 hex chars of md5 against precomputed thresholds),
    * so it NEVER changes when other documents are added or removed —
    * the property that prevents silent val→train leakage as a 100 TB
    * corpus grows between pipeline runs (any rank- or quota-based
    * assignment reshuffles docs across splits on every ingest).
    * Shuffle-free scan-side compute; split sizes are binomial around the
    * requested fractions (exact-count splits are what
    * [[hashStratifiedSample]] is for). Thresholds are hex-string
    * literals compared lexicographically — both engines compare
    * lowercase hex identically, so the oracle replays bit-for-bit.
    */
  def splitAssign(
      documents: org.apache.spark.sql.DataFrame,
      testFrac: Double = 0.05,
      valFrac: Double = 0.05): org.apache.spark.sql.DataFrame = {
    require(testFrac >= 0 && valFrac >= 0 && testFrac + valFrac <= 1,
      s"fractions must be non-negative and sum to <= 1 (got test=$testFrac val=$valFrac)")
    val h = substring(md5(col("doc_id").cast("string")), 1, 8)
    documents.select(
      col("doc_id"),
      when(h < lit(splitThresholdHex(testFrac)), "test")
        .when(h < lit(splitThresholdHex(testFrac + valFrac)), "val")
        .otherwise("train").as("split"))
  }

  /** floor(frac · 2³²) as 8 lowercase hex chars — the boundary in the
    * md5-prefix space below which a doc falls into the bucket. frac ≥ 1
    * returns "g" (lexicographically above every lowercase hex string, so
    * the comparison admits everything — a 9-char "100000000" would
    * compare BELOW most hex prefixes and silently admit almost nothing).
    */
  private[graft] def splitThresholdHex(frac: Double): String =
    if (frac >= 1.0) "g" else f"${math.floor(frac * 4294967296.0).toLong}%08x"

  /** LEAKAGE-FREE train/val/test split: assignment by near-dup FAMILY,
    * not by document. [[splitAssign]]'s per-doc hash puts two near-
    * duplicate documents on independent coin flips — at typical crawl
    * duplication rates a measurable slice of every test set is a
    * near-copy of a training doc, and the eval silently measures
    * memorization. Here every doc inherits its connected near-dup
    * component's label ([[Dedup.nearDupClusters]] over the caller's
    * pair graph; singletons label themselves), and the hash-range split
    * is taken on the CLUSTER id — an entire family lands on one side or
    * the other, never straddling.
    *
    * Properties: singletons get exactly [[splitAssign]]'s assignment
    * (cluster = doc_id, same md5 arithmetic — suite-pinned), so the
    * guarantee costs nothing where there is nothing to leak. Stability
    * under growth is the one trade: a new doc that MERGES two families
    * must move one side's members (fundamental to the guarantee, not an
    * implementation choice); docs whose family is unchanged keep their
    * split.
    *
    * Scale shape: candidate pairs come from whatever bucketed generator
    * the caller trusts (blocked Jaccard, MinHash-LSH) — never all-pairs
    * here; the label propagation is the bounded-rounds loop
    * cluster_canonical already runs at corpus scale; the split itself
    * is scan-side md5 arithmetic on the joined label.
    */
  def splitAssignGrouped(
      documents: org.apache.spark.sql.DataFrame,
      pairs: org.apache.spark.sql.DataFrame,
      testFrac: Double = 0.05,
      valFrac: Double = 0.05,
      maxIter: Int = 20): org.apache.spark.sql.DataFrame = {
    require(testFrac >= 0 && valFrac >= 0 && testFrac + valFrac <= 1,
      s"fractions must be non-negative and sum to <= 1 (got test=$testFrac val=$valFrac)")
    // maxIter is exposed because the no-straddling guarantee RIDES on
    // convergence: a component whose diameter exceeds the propagation
    // rounds gets truncated labels, and two docs of one family could
    // land on different sides — nearDupClusters warns loudly on
    // truncation; callers with long-chain graphs (incremental
    // paraphrase drift) must raise this, not ignore that warning
    val h = substring(md5(col("cluster").cast("string")), 1, 8)
    documents.select(col("doc_id"))
      .join(graft.ops.Dedup.nearDupClusters(pairs, maxIter), Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
      .select(col("doc_id"), col("cluster"),
        when(h < lit(splitThresholdHex(testFrac)), "test")
          .when(h < lit(splitThresholdHex(testFrac + valFrac)), "val")
          .otherwise("train").as("split"))
  }

  /** Registered over the same oracle-checkable pair graph as
    * dedup_cluster_canonical (blocked Jaccard ≥ 0.6), so DuckDB replays
    * closure + family-level assignment with the same recursive CTE.
    */
  val splitGroupedQuery = QueryDef(
    "mix_split_leakage_free",
    s"""WITH RECURSIVE keyed AS (
       |  SELECT doc_id, substr(text, 1, 50) AS block_key,
       |         list_distinct(string_split_regex(lower(text), '\\s+')) AS words,
       |         count(*) OVER (PARTITION BY substr(text, 1, 50)) AS block_n
       |  FROM documents),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM keyed a JOIN keyed b ON a.block_key = b.block_key AND a.doc_id < b.doc_id
       |  WHERE a.block_n <= 64 AND b.block_n <= 64
       |    AND floor(CAST(len(list_intersect(a.words, b.words)) AS DOUBLE)
       |        / CAST(len(list_distinct(list_concat(a.words, b.words))) AS DOUBLE) * 10000 + 0.5) / 10000 >= 0.6),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs),
       |reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |labels AS (
       |  SELECT src AS doc_id, least(src, min(dst)) AS cluster
       |  FROM reach GROUP BY src),
       |assigned AS (
       |  SELECT d.doc_id, coalesce(l.cluster, d.doc_id) AS cluster
       |  FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id)
       |SELECT doc_id, cluster,
       |  CASE WHEN substr(md5(CAST(cluster AS VARCHAR)), 1, 8) < '${splitThresholdHex(0.05)}' THEN 'test'
       |       WHEN substr(md5(CAST(cluster AS VARCHAR)), 1, 8) < '${splitThresholdHex(0.10)}' THEN 'val'
       |       ELSE 'train' END AS split
       |FROM assigned ORDER BY doc_id""".stripMargin)(
    (s, d) => {
      val docs = Tables.documents(s, d)
      splitAssignGrouped(docs,
        graft.ops.Dedup.prefixBlockedJaccard(docs).filter(col("jaccard") >= 0.6))
        .orderBy("doc_id")
    })

  val splitAssignQuery = QueryDef(
    "mix_split_assign",
    s"""SELECT doc_id,
       |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '${splitThresholdHex(0.05)}' THEN 'test'
       |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '${splitThresholdHex(0.10)}' THEN 'val'
       |       ELSE 'train' END AS split
       |FROM documents ORDER BY doc_id""".stripMargin)(
    (s, d) => splitAssign(Tables.documents(s, d)).orderBy("doc_id"))

  /** B = 512 at the fixture's ~100-token docs: most sequences pack
    * several docs and a steady fraction of docs straddle a boundary, so
    * both the multi-doc and the split path are exercised by the oracle.
    */
  val packSequencesQuery = QueryDef(
    "mix_pack_sequences",
    """WITH toks AS (
      |  SELECT doc_id,
      |         CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens,
      |         md5(CAST(doc_id AS VARCHAR)) AS ord
      |  FROM documents),
      |placed AS (
      |  SELECT doc_id, n_tokens,
      |         CAST(sum(n_tokens) OVER (ORDER BY ord) AS BIGINT) AS tok_end
      |  FROM toks),
      |spans AS (
      |  SELECT doc_id, tok_end - n_tokens AS tok_start, tok_end,
      |         s.seq_id
      |  FROM placed,
      |       LATERAL (SELECT unnest(generate_series(
      |                  (tok_end - n_tokens) // 512,
      |                  (tok_end - 1) // 512)) AS seq_id) s)
      |SELECT doc_id, seq_id,
      |       greatest(tok_start, seq_id * 512) - tok_start AS doc_off,
      |       greatest(tok_start, seq_id * 512) - seq_id * 512 AS seq_off,
      |       least(tok_end, (seq_id + 1) * 512)
      |         - greatest(tok_start, seq_id * 512) AS n_toks
      |FROM spans ORDER BY seq_id, seq_off, doc_id""".stripMargin)(
    (s, d) => packSequences(Tables.documents(s, d), seqTokens = 512L)
      .orderBy("seq_id", "seq_off", "doc_id"))

  /** Sequence packing denominated in REAL subword tokens: identical
    * concat-then-chunk manifest as [[packSequencesQuery]], but
    * `n_tokens` comes from the native BPE encoder
    * (functions/Bpe.scala) instead of whitespace splitting — the
    * manifest a loader feeding an actual LLM tokenizer needs, since
    * whitespace counts under-fill fixed-size sequences by the subword
    * inflation factor. Same scale shape (256-way-parallel prefix
    * windows, broadcast offsets, output-sized explode); the encoder is
    * scan-side compiled compute. The oracle replays the greedy BPE
    * merge loop via recursive CTE, then runs the identical packing SQL
    * over the replayed counts.
    */
  val packSequencesBpeQuery = QueryDef(
    "mix_pack_sequences_bpe",
    s"""WITH RECURSIVE ${graft.functions.Bpe.duckDocTokens},
       |toks AS (
       |  SELECT d.doc_id, t.n_bpe_tokens AS n_tokens,
       |         md5(CAST(d.doc_id AS VARCHAR)) AS ord
       |  FROM documents d JOIN bpe_doc_tokens t USING (doc_id)
       |  WHERE t.n_bpe_tokens >= 1),
       |placed AS (
       |  SELECT doc_id, n_tokens,
       |         CAST(sum(n_tokens) OVER (ORDER BY ord) AS BIGINT) AS tok_end
       |  FROM toks),
       |spans AS (
       |  SELECT doc_id, tok_end - n_tokens AS tok_start, tok_end,
       |         s.seq_id
       |  FROM placed,
       |       LATERAL (SELECT unnest(generate_series(
       |                  (tok_end - n_tokens) // 512,
       |                  (tok_end - 1) // 512)) AS seq_id) s)
       |SELECT doc_id, seq_id,
       |       greatest(tok_start, seq_id * 512) - tok_start AS doc_off,
       |       greatest(tok_start, seq_id * 512) - seq_id * 512 AS seq_off,
       |       least(tok_end, (seq_id + 1) * 512)
       |         - greatest(tok_start, seq_id * 512) AS n_toks
       |FROM spans ORDER BY seq_id, seq_off, doc_id""".stripMargin)(
    (s, d) => packSequences(Tables.documents(s, d), seqTokens = 512L,
      tokenCount = Some(call_function("graft_bpe_count",
        col("text"), lit(graft.functions.Bpe.mergesSpec))))
      .orderBy("seq_id", "seq_off", "doc_id"))

  /** Packing MANIFEST with the actual token-id payloads: the same
    * BPE-denominated concat-then-chunk as [[packSequencesBpeQuery]],
    * plus `token_ids` — the id slice of the document that lands in each
    * sequence (`slice(ids, doc_off+1, n_toks)`), i.e. what the training
    * loader materializes per 512-token sequence. The encoder
    * (graft_bpe_encode) runs ONCE at scan time; n_tokens is derived as
    * size(ids) so count and payload can never disagree, and the id
    * arrays ride the pack's one metadata shuffle via `carry` rather
    * than a second encode scan or a corpus-sized join-back. The oracle
    * replays the id scheme exactly ([[graft.functions.Bpe.duckDocIds]]:
    * codepoint ids + MergedIdOffset + min rank) and slices with
    * list_slice over identical offsets.
    *
    * Scale shape: one scan, one shuffle (now payload-sized — the
    * necessary cost of emitting payloads at all), output proportional
    * to total token volume. At 100 TB this is the terminal
    * materialization pass of the pipeline and is irreducibly
    * corpus-sized; everything upstream of it stays metadata-sized.
    */
  val packManifestBpeQuery = QueryDef(
    "mix_pack_manifest_bpe",
    s"""WITH RECURSIVE ${graft.functions.Bpe.duckDocIds},
       |toks AS (
       |  SELECT doc_id, ids, len(ids) AS n_tokens,
       |         md5(CAST(doc_id AS VARCHAR)) AS ord
       |  FROM bpe_doc_ids WHERE len(ids) >= 1),
       |placed AS (
       |  SELECT doc_id, ids, n_tokens,
       |         CAST(sum(n_tokens) OVER (ORDER BY ord) AS BIGINT) AS tok_end
       |  FROM toks),
       |spans AS (
       |  SELECT doc_id, ids, tok_end - n_tokens AS tok_start, tok_end, s.seq_id
       |  FROM placed,
       |       LATERAL (SELECT unnest(generate_series(
       |                  (tok_end - n_tokens) // 512,
       |                  (tok_end - 1) // 512)) AS seq_id) s)
       |SELECT doc_id, seq_id,
       |       greatest(tok_start, seq_id * 512) - tok_start AS doc_off,
       |       greatest(tok_start, seq_id * 512) - seq_id * 512 AS seq_off,
       |       least(tok_end, (seq_id + 1) * 512)
       |         - greatest(tok_start, seq_id * 512) AS n_toks,
       |       coalesce(array_to_string(list_slice(ids,
       |         greatest(tok_start, seq_id * 512) - tok_start + 1,
       |         least(tok_end, (seq_id + 1) * 512) - tok_start), ' '), '')
       |         AS token_ids
       |FROM spans ORDER BY seq_id, seq_off, doc_id""".stripMargin)(
    (s, d) => {
      val enc = Tables.documents(s, d).select(
        col("doc_id"),
        call_function("graft_bpe_encode",
          col("text"), lit(graft.functions.Bpe.mergesSpec)).as("ids"))
      packSequences(enc, seqTokens = 512L,
        tokenCount = Some(size(col("ids")).cast("long")), carry = Seq("ids"))
        .select(col("doc_id"), col("seq_id"), col("doc_off"), col("seq_off"),
          col("n_toks"),
          // The id payload travels as a canonical space-joined string:
          // the oracle comparator hashes scalar cells, and integer
          // rendering is identical in both engines. n_toks >= 1 by
          // construction, but DuckDB's array_to_string(NULL-on-empty)
          // is coalesced to '' to match array_join's empty-string.
          array_join(slice(col("ids"), (col("doc_off") + 1).cast("int"),
            col("n_toks").cast("int")).cast("array<string>"), " ")
            .as("token_ids"))
        .orderBy("seq_id", "seq_off", "doc_id")
    })

  // ------------------------------------------------------- corpus diff

  /** Version diff between two corpus snapshots: which documents were
    * added, removed, or changed — the audit every dataset release needs
    * ("what moved between v1 and v2, and how much retraining does that
    * imply"). Content equality is by sha256(text), so a re-ingested
    * byte-identical doc is NOT a change.
    *
    * Scale shape: each side reduces to (doc_id, content_hash) at scan
    * time — the full-outer join ships 40 bytes/row, never text. The join
    * shuffles both sides on doc_id; with snapshots bucketed by doc_id
    * (writeBucketed) it needs no exchange at all. Unchanged docs (the
    * overwhelming majority between adjacent releases) are filtered
    * immediately after the join, so downstream work is diff-sized.
    */
  def corpusDiff(oldCorpus: org.apache.spark.sql.DataFrame,
                 newCorpus: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    // Presence comes from a literal marker per side, NOT from the hash
    // being null — sha2(NULL text) is null too, and conflating the two
    // would report a NULL-text doc as added/removed instead of
    // present-but-unhashable. Hashes compare null-safely (<=>) so
    // NULL->'x' and 'x'->NULL text transitions surface as 'changed'.
    oldCorpus.select(col("doc_id"), sha2(col("text"), 256).as("h_old"),
        lit(1).as("p_old"))
      .join(newCorpus.select(col("doc_id"), sha2(col("text"), 256).as("h_new"),
        lit(1).as("p_new")), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("p_old").isNull, lit("added"))
          .when(col("p_new").isNull, lit("removed"))
          .when(!(col("h_old") <=> col("h_new")), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .filter(col("status") =!= "unchanged")

  /** Fixture versions carved from one table: v1 drops doc_id % 10 = 9,
    * v2 drops doc_id % 10 = 0 and rewrites text where doc_id % 7 = 0 —
    * so the diff exercises all three statuses deterministically.
    */
  val corpusDiffQuery = QueryDef(
    "pipeline_corpus_diff",
    """WITH v1 AS (SELECT doc_id, text, 1 AS p_old FROM documents WHERE doc_id % 10 <> 9),
      |v2 AS (SELECT doc_id,
      |              CASE WHEN doc_id % 7 = 0 THEN text || ' [rev2]' ELSE text END AS text,
      |              1 AS p_new
      |       FROM documents WHERE doc_id % 10 <> 0),
      |j AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
      |             sha256(a.text) AS h_old, sha256(b.text) AS h_new,
      |             a.p_old, b.p_new
      |      FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id)
      |SELECT doc_id,
      |       CASE WHEN p_old IS NULL THEN 'added'
      |            WHEN p_new IS NULL THEN 'removed'
      |            WHEN h_old IS DISTINCT FROM h_new THEN 'changed'
      |            ELSE 'unchanged' END AS status
      |FROM j
      |WHERE (CASE WHEN p_old IS NULL THEN 'added'
      |            WHEN p_new IS NULL THEN 'removed'
      |            WHEN h_old IS DISTINCT FROM h_new THEN 'changed'
      |            ELSE 'unchanged' END) <> 'unchanged'
      |ORDER BY doc_id""".stripMargin)(
    (s, d) => {
      val docs = Tables.documents(s, d)
      corpusDiff(
        docs.filter(col("doc_id") % 10 =!= 9).select(col("doc_id"), col("text")),
        docs.filter(col("doc_id") % 10 =!= 0)
          .select(col("doc_id"),
            when(col("doc_id") % 7 === 0, concat(col("text"), lit(" [rev2]")))
              .otherwise(col("text")).as("text")))
        .orderBy("doc_id")
    })

  // ----------------------------------------------- per-source quality gate

  /** Keep the top `keepFrac` of each source's documents by type-token
    * ratio (distinct/total tokens — repetitive spam scores low), ranked
    * WITHIN source so a high-quality source can't crowd out a weaker
    * one entirely: the per-group form of quality pruning that a global
    * threshold gets wrong. percent_rank is (rank−1)/(n−1) in both
    * engines — an exact rational — with doc_id breaking ttr ties, so the
    * keep-set is deterministic under any partitioning. A single-doc
    * source ranks 0 and is always kept (it IS its source's best).
    *
    * Scale shape: one shuffle on source for the rank window; TTR itself
    * is scan-side codegen (split/array_distinct/size). Skewed sources
    * are sort-partition work, which AQE splits.
    */
  def qualityGatePerSource(documents: org.apache.spark.sql.DataFrame,
                           keepFrac: Double = 0.5): org.apache.spark.sql.DataFrame = {
    // keepFrac = 0 is rejected rather than meaning "keep nothing": the
    // first-ranked row of every source has percent_rank 0, so a <= 0
    // filter would still keep one doc per source — a silent surprise for
    // a caller expecting an empty dry-run.
    require(keepFrac > 0 && keepFrac <= 1, s"keepFrac must be in (0,1] (got $keepFrac)")
    val toks = split(lower(col("text")), "\\s+")
    documents
      .select(col("doc_id"), col("source"),
        (size(array_distinct(toks)).cast("double") / size(toks).cast("double")).as("ttr"))
      .withColumn("pr", percent_rank().over(
        Window.partitionBy("source").orderBy(col("ttr").desc, col("doc_id"))))
      .filter(col("pr") <= keepFrac)
  }

  val qualityGateQuery = QueryDef(
    "mix_quality_gate",
    """WITH scored AS (
      |  SELECT doc_id, source,
      |         CAST(len(list_distinct(string_split_regex(lower(text), '\s+'))) AS DOUBLE)
      |           / CAST(len(string_split_regex(lower(text), '\s+')) AS DOUBLE) AS ttr
      |  FROM documents),
      |r AS (SELECT *, percent_rank() OVER
      |               (PARTITION BY source ORDER BY ttr DESC, doc_id) AS pr
      |      FROM scored)
      |SELECT doc_id, source, ttr, pr FROM r
      |WHERE pr <= 0.5 ORDER BY doc_id""".stripMargin)(
    (s, d) => qualityGatePerSource(
      Rebalance.scanWide(Tables.documents(s, d), col("doc_id"))).orderBy("doc_id"))

  // -------------------------------------------- length-bucketed batches

  /** Length-bucketed batch shaping: group documents into inference/
    * training batches of similar token counts so per-batch padding
    * (batch rows padded to the batch max) stays small, and report each
    * batch's padding efficiency = sum(len) / (count · max(len)). The
    * audit answers "what does naive vs length-aware batching cost in
    * wasted pad tokens" — the classic bucketing trick, relationalized.
    *
    * Scale shape: docs bucket by a length RANGE (binWidth tokens), and
    * the within-bin numbering window partitions BY BIN — bounded
    * partitions, never a global single-partition row_number. md5 order
    * inside the bin keeps batch assignment layout-independent
    * ([[tokenBudgetSample]] convention).
    */
  def lengthBucketedBatches(
      documents: org.apache.spark.sql.DataFrame,
      batchSize: Int = 32,
      binWidth: Int = 16): org.apache.spark.sql.DataFrame = {
    require(batchSize > 0 && binWidth > 0,
      s"batchSize and binWidth must be > 0 (got $batchSize, $binWidth)")
    def r4(c: org.apache.spark.sql.Column) = floor(c * 10000 + 0.5) / 10000
    val sized = documents.select(col("doc_id"),
      size(split(lower(col("text")), "\\s+")).cast("long").as("n_toks"))
      .withColumn("bin", floor(col("n_toks") / binWidth).cast("long") * binWidth)
    val numbered = sized.withColumn("rn", row_number().over(
      Window.partitionBy("bin").orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
    numbered
      .withColumn("batch_id", floor((col("rn") - 1) / batchSize).cast("long"))
      .groupBy("bin", "batch_id")
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_toks")).as("max_toks"),
        sum(col("n_toks")).as("sum_toks"))
      .select(col("bin"), col("batch_id"), col("n_docs"), col("max_toks"), col("sum_toks"),
        r4(col("sum_toks").cast("double") /
          (col("n_docs") * col("max_toks")).cast("double")).as("pad_efficiency"))
  }

  val lengthBatchesQuery = QueryDef(
    "mix_length_batches",
    """WITH sized AS (
      |  SELECT doc_id, CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT) AS n_toks
      |  FROM documents),
      |binned AS (SELECT doc_id, n_toks,
      |                  CAST(floor(n_toks / 16.0) AS BIGINT) * 16 AS bin FROM sized),
      |numbered AS (
      |  SELECT *, row_number() OVER
      |            (PARTITION BY bin ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM binned),
      |batched AS (SELECT bin, CAST(floor((rn - 1) / 32.0) AS BIGINT) AS batch_id, n_toks
      |            FROM numbered)
      |SELECT bin, batch_id, count(*) AS n_docs, max(n_toks) AS max_toks,
      |       CAST(sum(n_toks) AS BIGINT) AS sum_toks,
      |       floor(CAST(sum(n_toks) AS DOUBLE) / CAST(count(*) * max(n_toks) AS DOUBLE)
      |             * 10000 + 0.5) / 10000 AS pad_efficiency
      |FROM batched GROUP BY 1, 2 ORDER BY bin, batch_id""".stripMargin)(
    (s, d) => lengthBucketedBatches(Tables.documents(s, d)).orderBy("bin", "batch_id"))

  // ------------------------------------------------- training-order shuffle

  /** DETERMINISTIC GLOBAL SHUFFLE for training order: every document gets
    * a (shard, position) that is a pure function of its doc_id — the
    * "write the corpus to N shard files in shuffled order" step before
    * training. Shard = first hex digit(s) of a salted md5 (the salt
    * decorrelates shuffle order from [[splitAssign]]'s unsalted hash —
    * without it, low-order docs would be exactly the test split);
    * position = rank of the full hash within the shard. Epoch-stable:
    * adding documents never moves an existing doc to a different shard,
    * and within a shard existing relative order is preserved (new docs
    * interleave), so shard-level resume/caching survives corpus growth.
    *
    * Scale shape: shard assignment is scan-side codegen (no shuffle);
    * the rank needs one exchange on shard + an in-partition sort on the
    * 32-char hash. `hexDigits` sets the fan-out — 16 shards per digit;
    * at 100 TB use 3-4 digits (4096-65536 shards) so each shard's sort
    * fits an executor, then write partitioned-by-shard with
    * sortWithinPartitions(ord) and the sink emits training files in
    * final order with no further pass.
    */
  def shuffleShards(
      documents: org.apache.spark.sql.DataFrame,
      hexDigits: Int = 1): org.apache.spark.sql.DataFrame = {
    require(hexDigits >= 1 && hexDigits <= 8,
      s"hexDigits must be in [1, 8] (got $hexDigits)")
    val ord = md5(concat(col("doc_id").cast("string"), lit(":shuffle")))
    val shard = (1 to hexDigits)
      .map(i => (expr(s"instr('0123456789abcdef', substring(ord, $i, 1))") - 1) *
        lit(1L << (4 * (hexDigits - i))))
      .reduce(_ + _)
    // shard stays LONG: at hexDigits = 8 the id range is 16^8 − 1 =
    // 4294967295, past Int.MaxValue — an int cast would throw under
    // ANSI mode for any doc whose leading md5 digit is ≥ 8 (or silently
    // wrap negative with ANSI off)
    documents.select(col("doc_id"), ord.as("ord"))
      .withColumn("shard", shard.cast("long"))
      .withColumn("pos",
        (row_number().over(Window.partitionBy("shard").orderBy("ord", "doc_id")) - 1)
          .cast("long"))
      .select("doc_id", "shard", "pos")
  }

  val shuffleShardsQuery = QueryDef(
    "mix_shuffle_shards",
    """WITH ordd AS (
      |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':shuffle') AS ord
      |  FROM documents
      |), sharded AS (
      |  SELECT doc_id, ord,
      |         CAST(strpos('0123456789abcdef', substr(ord, 1, 1)) - 1 AS BIGINT) AS shard
      |  FROM ordd
      |)
      |SELECT doc_id, shard,
      |       CAST(row_number() OVER (PARTITION BY shard ORDER BY ord, doc_id) - 1 AS BIGINT) AS pos
      |FROM sharded ORDER BY doc_id""".stripMargin)(
    (s, d) => shuffleShards(Tables.documents(s, d)).orderBy("doc_id"))

  // ------------------------------------------------- per-source cap

  /** PER-SOURCE CONTRIBUTION CAP: keep at most `cap` documents from any
    * one source — the anti-dominance gate that stops a single crawled
    * domain from swamping the mixture (the complement of
    * [[qualityGate]]'s top-fraction selection: a hard ceiling, not a
    * ratio). WHICH docs survive is deterministic and admission-stable:
    * ranked by a salted per-doc hash, so the kept set is a uniform
    * sample of the source, a doc's rank never depends on doc ordering,
    * and — same hash-prefix property as [[shuffleShards]] — docs
    * removed upstream never promote a previously-cut doc ABOVE a
    * previously-kept one.
    *
    * Scale shape: one shuffle on source + in-partition rank, the same
    * cost as any per-key window; a skewed mega-source is exactly the
    * case AQE's skew splitting handles, and the rank filter drops its
    * excess before anything downstream.
    */
  def sourceCap(
      documents: org.apache.spark.sql.DataFrame,
      cap: Int = 50): org.apache.spark.sql.DataFrame = {
    require(cap >= 1, s"cap must be >= 1 (got $cap)")
    val w = Window.partitionBy("source")
      .orderBy(md5(concat(col("doc_id").cast("string"), lit(":cap"))), col("doc_id"))
    documents
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cap)
      .select(col("doc_id"), col("source"), col("rk").cast("long").as("rk"))
  }

  val sourceCapQuery = QueryDef(
    "mix_source_cap",
    """WITH ranked AS (
      |  SELECT doc_id, source,
      |         CAST(row_number() OVER (
      |           PARTITION BY source
      |           ORDER BY md5(CAST(doc_id AS VARCHAR) || ':cap'), doc_id) AS BIGINT) AS rk
      |  FROM documents
      |)
      |SELECT doc_id, source, rk FROM ranked WHERE rk <= 15
      |ORDER BY doc_id""".stripMargin)(
    (s, d) => sourceCap(Tables.documents(s, d), cap = 15).orderBy("doc_id"))

  val all: Seq[QueryDef] = Seq(
    t8WideProjection, p123PhysicalOps, s9LocalCollection,
    pivotQuery, setOpsQuery, mixQuery, temperatureMixQuery, tokenBudgetQuery,
    hashStratifiedQuery, temperatureTakeQuery, packSequencesQuery, packSequencesBpeQuery,
    packManifestBpeQuery,
    splitAssignQuery,
    splitGroupedQuery,
    corpusProfileQuery, corpusDiffQuery, qualityGateQuery, lengthBatchesQuery,
    shuffleShardsQuery, sourceCapQuery)
}
