package graft

import org.apache.spark.sql.functions._
import graft.ops.Coverage

/** Pivot/set-op sanity and the stratified-mix contract (deterministic,
  * proportional) that has no cross-engine oracle.
  */
class CoverageSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("stratified mix is deterministic for a fixed seed and roughly proportional") {
    val docs = Tables.documents(spark, sf)
    val fracs = Map("en" -> 0.8, "fr" -> 0.5, "es" -> 0.5, "de" -> 0.2, "zh" -> 0.1)
    val a = Coverage.stratifiedMix(docs, fracs).select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Coverage.stratifiedMix(docs, fracs).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b) // same seed, same partitioning -> identical sample
    val byLang = Coverage.stratifiedMix(docs, fracs)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    fracs.foreach { case (lang, f) =>
      val got = byLang.getOrElse(lang, 0L).toDouble / totals(lang)
      assert(math.abs(got - f) < 0.2, s"$lang: sampled $got of target $f")
    }
  }

  test("temperature mix flattens the source distribution at alpha < 1") {
    val docs = Tables.documents(spark, sf)
    val natural = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // determinism: same seed -> identical sample
    val a = Coverage.temperatureMix(docs).select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Coverage.temperatureMix(docs).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    def skew(m: Map[String, Long]): Double = {
      val vals = natural.keySet.toSeq.map(k => m.getOrElse(k, 0L).toDouble max 1.0)
      vals.max / vals.min
    }
    val mixed = Coverage.temperatureMix(docs, alpha = 0.3, targetRows = 250L)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // alpha < 1 must pull the max/min source ratio toward 1 vs natural
    assert(skew(mixed) < skew(natural),
      s"mixed skew ${skew(mixed)} not flatter than natural ${skew(natural)}")
    // every source keeps a presence (low-resource upweighting, not dropping)
    natural.keys.foreach(k => assert(mixed.getOrElse(k, 0L) > 0, s"source $k dropped"))
  }

  test("temperature mix refuses high-cardinality strata instead of bloating the driver map") {
    val docs = Tables.documents(spark, sf)
    // doc_id-as-string: every row its own stratum — exactly the key
    // shape that must NOT be fed through a driver-side fractions map
    val perDoc = docs.withColumn("k",
      org.apache.spark.sql.functions.col("doc_id").cast("string"))
    val ex = intercept[IllegalArgumentException](
      Coverage.temperatureMix(perDoc, keyCol = "k", maxStrata = 10))
    assert(ex.getMessage.contains("distinct 'k' strata"))
    assert(ex.getMessage.contains("temperatureTakeSample"),
      "error must route the caller to the distributed twin")
    // at-the-cap cardinality still works (5 langs, cap 5)
    assert(Coverage.temperatureMix(docs, maxStrata = 5).select("doc_id").count() > 0)
    val ex2 = intercept[IllegalArgumentException](
      Coverage.temperatureMix(docs, maxStrata = 4))
    assert(ex2.getMessage.contains("more than 4"))
  }

  test("Bernoulli stratified sample concentrates around the _take twin's exact quotas") {
    // The no-oracle mix_stratified_sample is anchored by the
    // hash-verified mix_stratified_take; this closes the anchor into an
    // assertion: per stratum, the Bernoulli count is Binomial(n_k, f_k)
    // and must land within 6 binomial sd (+1 for the quota's rounding)
    // of the take twin's exact quota floor(n_k*f_k+0.5). A seeded
    // sample is deterministic, so this either always passes or flags a
    // real drift between the two forms' target proportions.
    val docs = Tables.documents(spark, sf)
    val fracs = Map("en" -> 0.8, "fr" -> 0.5, "es" -> 0.5, "de" -> 0.2, "zh" -> 0.1)
    val quota = Coverage.hashStratifiedSample(docs, fractions = fracs)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Coverage.stratifiedMix(docs, fracs)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    fracs.foreach { case (lang, f) =>
      val n = totals.getOrElse(lang, 0L)
      assert(n > 0, s"fixture has no '$lang' docs — concentration check vacuous")
      val sd = math.sqrt(n * f * (1 - f))
      val got = sampled.getOrElse(lang, 0L).toDouble
      val q = quota.getOrElse(lang, 0L).toDouble
      assert(math.abs(got - q) <= 6 * sd + 1,
        s"$lang: Bernoulli count $got vs take quota $q exceeds 6sd=${6 * sd} (n=$n, f=$f)")
    }
  }

  test("Bernoulli temperature sample concentrates around the _take twin's exact quotas") {
    // Same closure for mix_temperature_sample vs mix_temperature_take:
    // the Bernoulli per-stratum count is Binomial(n_k, p_k) with
    // p_k = min(1, target*(n_k^a/z)/n_k) — recomputed here with the
    // operator's own formula — and must land within 6 sd (+1) of the
    // take twin's quota.
    val docs = Tables.documents(spark, sf)
    val (alpha, target) = (0.5, 200L)
    val quota = Coverage.temperatureTakeSample(docs, alpha = alpha, targetRows = target)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Coverage.temperatureMix(docs, alpha = alpha, targetRows = target)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.filter(col("lang").isNotNull)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val z = totals.values.map(n => math.pow(n.toDouble, alpha)).sum
    totals.foreach { case (lang, n) =>
      val p = math.min(1.0, target * (math.pow(n.toDouble, alpha) / z) / n.toDouble)
      val sd = math.sqrt(n * p * (1 - p))
      val got = sampled.getOrElse(lang, 0L).toDouble
      val q = quota.getOrElse(lang, 0L).toDouble
      assert(math.abs(got - q) <= 6 * sd + 1,
        s"$lang: Bernoulli count $got vs take quota $q exceeds 6sd=${6 * sd} (n=$n, p=$p)")
    }
  }

  test("token-budget sample: per-key budget respected, selection is layout-independent") {
    val docs = Tables.documents(spark, sf)
    val out = Coverage.tokenBudgetSample(docs, budgetTokens = 2000L)
    // Budget: max cumulative token count per key stays under budget.
    val byLang = out.groupBy("lang").agg(max("cum_tokens").as("mx"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(byLang.nonEmpty && byLang.forall(_._2 <= 2000L))
    // Layout independence: identical selection after an adversarial reshuffle.
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val reshuffled = Coverage.tokenBudgetSample(docs.repartition(7, col("n_chars")), budgetTokens = 2000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == reshuffled)
    // A larger budget strictly extends the selection (prefix property of
    // the hash order — no reshuffling of what was already picked).
    val bigger = Coverage.tokenBudgetSample(docs, budgetTokens = 4000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(bigger) && bigger.size > ids.size)
  }

  test("hash-stratified take: exact quotas, layout-independent, prefix property") {
    val docs = Tables.documents(spark, sf)
    val fracs = Map("en" -> 0.8, "fr" -> 0.5, "zh" -> 0.1)
    val totals = docs.filter(col("lang").isin(fracs.keys.toSeq: _*))
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val byLang = Coverage.hashStratifiedSample(docs, fractions = fracs)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // Quotas are EXACT (floor(n_k * f + 0.5)), not Bernoulli-approximate.
    fracs.foreach { case (lang, f) =>
      assert(byLang.getOrElse(lang, 0L) == math.floor(totals(lang) * f + 0.5).toLong,
        s"$lang: got ${byLang.getOrElse(lang, 0L)} of ${totals(lang)} at $f")
    }
    // Layout independence: identical ids after an adversarial reshuffle.
    val ids = Coverage.hashStratifiedSample(docs, fractions = fracs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val reshuffled = Coverage.hashStratifiedSample(
      docs.repartition(7, col("n_chars")), fractions = fracs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == reshuffled)
    // Raising a fraction only EXTENDS a stratum's selection (same hash
    // order, longer prefix) — re-runs with a bigger budget keep history.
    val bigger = Coverage.hashStratifiedSample(docs, fractions = fracs.updated("zh", 0.5))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(bigger))
    intercept[IllegalArgumentException](
      Coverage.hashStratifiedSample(docs, fractions = Map("en" -> 1.5)))
  }

  test("temperature take: deterministic, quota-exact, flattens the distribution") {
    val docs = Tables.documents(spark, sf)
    val a = Coverage.temperatureTakeSample(docs).select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Coverage.temperatureTakeSample(docs.repartition(5, col("n_chars")))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b) // layout-independent, no seed needed
    val natural = docs.filter(col("lang").isNotNull)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val mixed = Coverage.temperatureTakeSample(docs, alpha = 0.3, targetRows = 250L)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def skew(m: Map[String, Long]): Double = {
      val vals = natural.keySet.toSeq.map(k => m.getOrElse(k, 0L).toDouble max 1.0)
      vals.max / vals.min
    }
    assert(skew(mixed) < skew(natural))
    // Quotas match the driver-free relational math exactly.
    val weights = natural.map { case (k, n) => k -> math.pow(n.toDouble, 0.5) }
    val z = weights.values.sum
    val expected = natural.map { case (k, n) =>
      k -> math.min(n.toDouble, math.floor(200.0 * weights(k) / z + 0.5)).toLong
    }
    val got = Coverage.temperatureTakeSample(docs)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected, s"got $got expected $expected")
  }

  test("temperature mix on an all-null key column returns empty instead of throwing") {
    import spark.implicits._
    val nullKeyed = Seq((1L, "some text", 9L), (2L, "more text", 9L))
      .toDF("doc_id", "text", "n_chars")
      .withColumn("lang", lit(null).cast("string"))
      .withColumn("source", lit("s"))
    assert(Coverage.temperatureMix(nullKeyed).isEmpty)
  }

  test("pivot fills absent (day, type) combinations with zero, not null") {
    val out = Coverage.pivotQuery.fn(spark, sf)
    assert(out.columns.toSeq == Seq("d", "purchase", "view", "click"))
    assert(out.filter(col("purchase").isNull || col("view").isNull || col("click").isNull).isEmpty)
  }

  test("set ops satisfy |either| = |hi_only| + |both| + |lo_only| arithmetic") {
    val m = Coverage.setOpsQuery.fn(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("either") >= m("hi_only") + m("both"))
    assert(m.values.forall(_ >= 0))
  }

  test("sequence packing tiles every sequence exactly, conserves tokens, splits straddlers") {
    val docs = Tables.documents(spark, sf)
    val b = 256L
    val packed = Coverage.packSequences(docs, seqTokens = b)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val totalTokens = docs
      .agg(sum(size(split(col("text"), "\\s+")))).head().getLong(0)
    // conservation: every token of every doc lands in exactly one slice
    assert(packed.map(_._5).sum == totalTokens)
    // per-doc slices are contiguous in doc_off and cover [0, n_tokens)
    packed.groupBy(_._1).foreach { case (_, slices) =>
      val sorted = slices.sortBy(_._3)
      assert(sorted.head._3 == 0L)
      sorted.sliding(2).foreach {
        case Array(a, c) => assert(a._3 + a._5 == c._3 && a._2 + 1 == c._2)
        case _ =>
      }
    }
    // every sequence except the last is tiled [0, b) with no gaps/overlaps
    val lastSeq = packed.map(_._2).max
    packed.groupBy(_._2).foreach { case (seqId, slices) =>
      val sorted = slices.sortBy(_._4)
      assert(sorted.head._4 == 0L, s"seq $seqId starts at ${sorted.head._4}")
      sorted.sliding(2).foreach {
        case Array(a, c) => assert(a._4 + a._5 == c._4, s"gap in seq $seqId")
        case _ =>
      }
      val filled = sorted.last._4 + sorted.last._5
      if (seqId != lastSeq) assert(filled == b, s"seq $seqId holds $filled of $b")
      else assert(filled <= b)
    }
    // fixture docs (~100 tokens) vs b=256: straddlers must exist and be split
    assert(packed.groupBy(_._1).exists(_._2.length > 1))
  }

  test("split assignment is stable under corpus growth and tracks fractions") {
    val docs = Tables.documents(spark, sf)
    val full = Coverage.splitAssign(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // range assignment is a pure per-doc function: any subset corpus
    // assigns identically (no val->train churn as the corpus grows)
    val half = Coverage.splitAssign(docs.filter(col("doc_id") % 2 === 0))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(half.forall { case (id, s) => full(id) == s })
    // binomial sizes around 5%/5%/90% — loose 3-sigma-ish bounds for n=500
    val n = full.size.toDouble
    val counts = full.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts.getOrElse("test", 0) / n - 0.05) < 0.03, counts)
    assert(math.abs(counts.getOrElse("val", 0) / n - 0.05) < 0.03, counts)
    assert(counts("train") / n > 0.84, counts)
    // boundary arithmetic: frac 0 admits nothing, frac 1 everything
    assert(Coverage.splitThresholdHex(0.0) == "00000000")
    assert(Coverage.splitThresholdHex(1.0) == "g") // above every hex prefix
    val allTest = Coverage.splitAssign(docs, testFrac = 1.0, valFrac = 0.0)
      .select("split").distinct().collect().map(_.getString(0)).toSeq
    assert(allTest == Seq("test"))
  }

  test("corpus diff: added/removed/changed by content hash, identical re-ingest silent") {
    import spark.implicits._
    val v1 = Seq((1L, "aaa"), (2L, "bbb"), (3L, "ccc")).toDF("doc_id", "text")
    val v2 = Seq((2L, "bbb"), (3L, "ccc patched"), (4L, "ddd")).toDF("doc_id", "text")
    val out = Coverage.corpusDiff(v1, v2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("per-source quality gate keeps top half per source; singleton sources survive") {
    import spark.implicits._
    val docs = Seq(
      (1L, "one two three four", "en", "a", 1L),      // ttr 1.0   -> pr 0
      (2L, "one one two three", "en", "a", 1L),       // ttr 0.75  -> pr 0.5
      (3L, "one one one two", "en", "a", 1L),         // ttr 0.5   -> pr 1.0 (dropped)
      (4L, "spam spam spam spam", "en", "b", 1L)      // singleton -> pr 0 (kept)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val kept = Coverage.qualityGatePerSource(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(kept.keySet == Set(1L, 2L, 4L))
    assert(kept(1L) == 0.0 && kept(2L) == 0.5 && kept(4L) == 0.0)
  }

  test("length-bucketed batches: same-bin docs batch together, exact padding efficiency") {
    import spark.implicits._
    val docs = Seq(
      (1L, "t t", "en", "s", 1L),            // 2 toks -> bin 0
      (2L, "t t t", "en", "s", 1L),          // 3 toks -> bin 0
      (3L, "t t t t t", "en", "s", 1L)       // 5 toks -> bin 4
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Coverage.lengthBucketedBatches(docs, batchSize = 2, binWidth = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // bin 0: docs 1+2 in one batch -> pad to max 3: eff = 5/(2*3)
    assert(out((0L, 0L)) == ((2L, 3L, 5L, math.floor(5.0 / 6 * 10000 + 0.5) / 10000)))
    // singleton batch pads nothing
    assert(out((4L, 0L)) == ((1L, 5L, 5L, 1.0)))
    // batches never exceed batchSize
    assert(out.values.forall(_._1 <= 2L))
  }

  test("shuffle shards: positions contiguous per shard; growth preserves shard + relative order") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val full = Coverage.shuffleShards(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // every doc placed exactly once; positions are 0..k-1 within a shard
    assert(full.size == docs.count())
    full.values.groupBy(_._1).foreach { case (shard, g) =>
      val ps = g.map(_._2).toSeq.sorted
      assert(ps == (0L until ps.size), s"shard $shard positions not contiguous")
    }
    // epoch stability: on the half corpus every kept doc stays in its
    // shard, and relative order within each shard is unchanged
    val half = Coverage.shuffleShards(docs.filter(col("doc_id") % 2 === 0)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    half.foreach { case (id, (shard, _)) => assert(full(id)._1 == shard, s"doc $id moved shards") }
    half.keys.groupBy(id => half(id)._1).foreach { case (shard, ids) =>
      val byHalf = ids.toSeq.sortBy(half(_)._2)
      val byFull = ids.toSeq.sortBy(full(_)._2)
      assert(byHalf == byFull, s"shard $shard relative order changed")
    }
    // higher fan-out: 2 hex digits -> shards span [0, 256)
    val wide = Coverage.shuffleShards(docs, hexDigits = 2).collect().map(_.getLong(1))
    assert(wide.forall(s => s >= 0 && s < 256))
    assert(wide.distinct.length > 16, "2-digit sharding should exceed 16 shards")
  }

  test("leakage-free split: families never straddle; singletons equal the per-doc split") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val pairs = graft.ops.Dedup.prefixBlockedJaccard(docs).filter(col("jaccard") >= 0.6)
    val pairRows = pairs.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairRows.nonEmpty, "fixture has no >=0.6 near-dup pairs; test is vacuous")
    val grouped = Coverage.splitAssignGrouped(docs, pairs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(grouped.size == docs.count())
    // the guarantee: both ends of every near-dup pair share a split
    pairRows.foreach { case (a, b) =>
      assert(grouped(a)._2 == grouped(b)._2, s"pair ($a,$b) straddles splits")
    }
    // same-cluster docs share a split by construction; clusters use the
    // min-id representative
    grouped.values.groupBy(_._1).foreach { case (cl, members) =>
      assert(members.map(_._2).toSet.size == 1, s"cluster $cl straddles")
    }
    // singletons (cluster == own id, no pair membership) get exactly the
    // per-doc splitAssign answer — the guarantee is free where there is
    // nothing to leak
    val inPairs = pairRows.flatMap(p => Seq(p._1, p._2)).toSet
    val perDoc = Coverage.splitAssign(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    grouped.foreach { case (id, (cl, sp)) =>
      if (!inPairs.contains(id)) {
        assert(cl == id, s"singleton $id has foreign cluster $cl")
        assert(sp == perDoc(id), s"singleton $id split $sp != per-doc ${perDoc(id)}")
      }
    }
  }

  test("source cap: ceiling enforced per source; removals never evict a surviving doc") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val capped = Coverage.sourceCap(docs, cap = 10).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(capped.nonEmpty)
    // at most `cap` survivors per source, ranks 1..k dense
    capped.values.groupBy(_._1).foreach { case (src, g) =>
      val rks = g.map(_._2).toSeq.sorted
      assert(rks.size <= 10 && rks == (1L to rks.size), s"source $src ranks $rks")
    }
    // admission stability: dropping docs only lowers ranks, so a doc
    // kept on the full corpus that survives the drop stays kept
    val smaller = Coverage.sourceCap(docs.filter(col("doc_id") % 3 =!= 0), cap = 10)
      .collect().map(_.getLong(0)).toSet
    capped.keys.filter(_ % 3 != 0).foreach { id =>
      assert(smaller.contains(id), s"doc $id evicted by unrelated removals")
    }
  }
}
