package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Dedup family — exact hashing, MinHash-LSH recall/precision against
  * brute-force Jaccard, SimHash locality.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat sleeps on the warm windowsill every afternoon"
  /** 0-1: exact dups; 2: near-dup of 0 (one word changed); 3-4: unrelated. */
  private def docs: DataFrame = Seq(
    (0L, base, "en", "s", base.length.toLong),
    (1L, base, "en", "s", base.length.toLong),
    (2L, base.replace("warm", "cold"), "en", "s", base.length.toLong),
    (3L, "completely different content about spark partitions and shuffle behavior at massive scale today", "en", "s", 97L),
    (4L, "unrelated short text", "en", "s", 20L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("exact dedup groups identical texts only") {
    val out = Dedup.exact(docs).collect()
    assert(out.length == 4) // 5 docs, one exact-dup pair
    val dupGroup = out.filter(_.getLong(2) == 2L)
    assert(dupGroup.length == 1 && dupGroup.head.getLong(1) == 0L) // keeps min doc_id
  }

  test("minhash-lsh finds exact and near dups, not unrelated docs") {
    val pairs = Dedup.minhashLsh(docs, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // exact dup: jaccard 1.0
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L))) // near dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L || p._1 == 4L || p._2 == 4L))
  }

  test("sha-keyed minhash-lsh finds the same planted dups through the shared spine") {
    // The sha twin swaps only the three hash derivations; on the tiny
    // docs fixture its recall/precision behavior must match the
    // production variant's: exact + near dups found, unrelated docs not.
    val pairs = Dedup.minhashLshShaQuery.fn(spark, "/root/testdata/sf0.001")
    assert(pairs.columns.toSeq == Seq("doc_a", "doc_b", "jaccard"))
    val collected = pairs.collect()
    assert(collected.nonEmpty, "fixture contains planted near-dups; sha-LSH must find some")
    assert(collected.forall(_.getDouble(2) >= 0.4))
    // every high-jaccard blocked pair must be recalled (same guarantee
    // the production variant's fixture test asserts)
    val fixture = Tables.documents(spark, "/root/testdata/sf0.001")
    val blocked = Dedup.prefixBlockedJaccard(fixture)
      .filter(col("jaccard") >= 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = collected.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((blocked -- found).isEmpty, s"sha-LSH missed: ${blocked -- found}")
  }

  test("lsh verified jaccard values are exact (match brute force on the pair)") {
    val j = Dedup.minhashLsh(docs).filter(col("doc_a") === 0 && col("doc_b") === 1)
      .head().getDouble(2)
    assert(j == 1.0)
  }

  test("minhash-lsh on fixture: every reported pair has jaccard >= threshold; near-dup blocks are found") {
    val fixture = Tables.documents(spark, "/root/testdata/sf0.001")
    val lsh = Dedup.minhashLsh(fixture, threshold = 0.4).collect()
    assert(lsh.nonEmpty, "fixture contains planted near-dups; LSH must find some")
    assert(lsh.forall(_.getDouble(2) >= 0.4))
    // Recall vs the oracle-checkable blocked-jaccard pairs (J>=0.6, same
    // prefix block => heavy overlap => minhash banding must catch them).
    val blocked = Dedup.prefixBlockedJaccard(fixture)
      .filter(col("jaccard") >= 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = lsh.map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = blocked -- found
    assert(missed.isEmpty, s"LSH missed high-jaccard blocked pairs: $missed")
  }

  test("simhash: near-dups within hamming 16, unrelated docs far apart") {
    val sh = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sh(a) ^ sh(b))
    assert(ham(0, 1) == 0)  // identical text, identical simhash
    assert(ham(0, 2) <= 16, s"near-dup hamming ${ham(0, 2)}")
    assert(ham(0, 3) > 16, s"unrelated hamming ${ham(0, 3)}")
  }

  test("shingle jaccard is order-sensitive where word jaccard is not") {
    // Same 50-char prefix (one block), then a full word shuffle of the
    // tail: word-SET jaccard scores 1.0, 3-token-shingle jaccard must not.
    val prefix = "shared fifty character prefix padding padding pad " // 50 chars
    assert(prefix.length == 50)
    val tail = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val shuffled = tail.split(" ").reverse.mkString(" ")
    val d = Seq(
      (0L, prefix + tail, "en", "s", 1L),
      (1L, prefix + tail, "en", "s", 1L),
      (2L, prefix + shuffled, "en", "s", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val word = Dedup.prefixBlockedJaccard(d)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val shingle = Dedup.prefixBlockedShingleJaccard(d)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(word((0L, 1L)) == 1.0 && shingle((0L, 1L)) == 1.0) // identical docs agree
    assert(word((0L, 2L)) == 1.0, "word-set jaccard is blind to the shuffle")
    assert(shingle((0L, 2L)) < 0.5, s"shingle jaccard must punish reordering, got ${shingle((0L, 2L))}")
  }

  test("oversized prefix blocks are capped: 1000 boilerplate-prefix docs form no quadratic pair set") {
    val header = "LICENSE HEADER COMMON TO EVERY FILE IN THIS REPO X" // exactly 50 chars
    assert(header.length == 50)
    val boiler = (0 until 1000).map(i =>
      (i.toLong, s"$header unique payload number $i with words ${"w" + i} ${"v" + (i * 7)}",
        "en", "s", 100L))
    val df = { import spark.implicits._; boiler.toDF("doc_id", "text", "lang", "source", "n_chars") }
    // Uncapped this block alone is 1000*999/2 ≈ 500k pairs; capped it is excluded.
    assert(Dedup.prefixBlockedJaccard(df).count() == 0)
    assert(Dedup.simhashNearDups(df).count() == 0)
    // Small blocks below the cap are unaffected.
    assert(Dedup.prefixBlockedJaccard(docs).count() ==
      Dedup.prefixBlockedJaccard(docs, maxBlock = 1000000).count())
  }

  test("boundedNearDups routes oversized blocks to LSH and still finds the planted near-dups") {
    val header = "LICENSE HEADER COMMON TO EVERY FILE IN THIS REPO X"
    // Long distinct tails: the shared header is a small fraction of each
    // doc's shingle set, so filler docs are NOT near-dups of each other
    // (true Jaccard ≈ 8/60 « threshold).
    val filler = (10L until 100L).map { i =>
      val tail = (0 until 25).map(k => s"tok${i}x$k").mkString(" ")
      (i, s"$header $tail", "en", "s", 300L)
    }
    // Two near-identical docs buried inside the oversized block.
    val nearA = (0L, s"$header shared long payload about spark shuffle partitioning behavior at scale", "en", "s", 130L)
    val nearB = (1L, s"$header shared long payload about spark shuffle partitioning semantics at scale", "en", "s", 130L)
    val df = { import spark.implicits._
      (Seq(nearA, nearB) ++ filler).toDF("doc_id", "text", "lang", "source", "n_chars") }
    val pairs = Dedup.boundedNearDups(df, maxBlock = 16, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), s"LSH route must find the planted near-dup pair, got $pairs")
    // Only true near-dups survive the threshold — no quadratic pair set
    // from the shared boilerplate prefix (92 docs → 4186 block pairs).
    assert(pairs.size < 50, s"expected only true near-dups, got ${pairs.size} pairs")
  }

  test("incremental exact: history hashes drop re-ingested docs, batch collapses internally") {
    val history = docs // doc 0-4; contains `base` text
    val batch = Seq(
      (10L, base, "en", "s", base.length.toLong),               // already in history -> dropped
      (11L, "fresh batch document about incremental ingestion pipelines", "en", "s", 58L),
      (12L, "fresh batch document about incremental ingestion pipelines", "en", "s", 58L), // within-batch dup of 11
      (13L, "a second genuinely new document", "en", "s", 31L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Dedup.incrementalExact(batch, Dedup.contentHashes(history)).collect()
    val byKeep = out.map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(byKeep == Map(11L -> 2L, 13L -> 1L),
      s"expected survivors {11 (x2), 13}, got $byKeep")
  }

  test("incremental near-dups: cross-corpus pairs only, exact jaccard on the verified pair") {
    val history = docs
    val batch = Seq(
      // near-dup of history doc 0 (one word changed)
      (10L, base.replace("lazy", "idle"), "en", "s", base.length.toLong),
      // near-dup pair WITHIN the batch, unrelated to history -> must NOT appear
      (11L, "batch internal text about streaming watermark state expiry and recovery semantics", "en", "s", 82L),
      (12L, "batch internal text about streaming watermark state expiry and recovery behavior", "en", "s", 82L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Dedup.incrementalNearDups(batch, history, threshold = 0.4).collect()
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    // doc 10 matches history docs 0, 1 (exact dups of each other) and likely 2.
    assert(pairs.contains((10L, 0L)) && pairs.contains((10L, 1L)), s"missed cross-corpus near-dups: $pairs")
    assert(!pairs.exists(p => p._1 == 11L || p._1 == 12L), s"within-batch pair leaked: $pairs")
    assert(out.forall(_.getDouble(2) >= 0.4))
    // Verified jaccard is exact: same value the symmetric sweep computes.
    val sweep = Dedup.minhashLsh(batch.unionByName(history), threshold = 0.4)
      .filter(col("doc_a") === 0 && col("doc_b") === 10).head().getDouble(2)
    val inc = out.filter(r => r.getLong(0) == 10L && r.getLong(1) == 0L).head.getDouble(2)
    assert(inc == sweep, s"incremental jaccard $inc != sweep jaccard $sweep")
  }

  test("banded simhash: pigeonhole recall covers every blocked-simhash pair, precision exact") {
    val banded = Dedup.simhashBandedNearDups(docs, maxHamming = 15)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val bandedPairs = banded.map(p => (p._1, p._2)).toSet
    assert(bandedPairs.contains((0L, 1L))) // exact dup: hamming 0
    assert(banded.forall(_._3 <= 15))      // verify stage is exact
    // Recall guarantee: everything the prefix-blocked variant finds at the
    // same threshold MUST be found by banding (no blocking-key luck needed).
    val blocked = Dedup.simhashNearDups(docs, maxHamming = 15)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked.subsetOf(bandedPairs), s"banding missed ${blocked -- bandedPairs}")
    // And on the fixture corpus, same guarantee at scale-ish.
    val fixture = Tables.documents(spark, "/root/testdata/sf0.001")
    val fb = Dedup.simhashBandedNearDups(fixture, maxHamming = 15)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fBlocked = Dedup.simhashNearDups(fixture, maxHamming = 15)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fBlocked.subsetOf(fb), s"fixture: banding missed ${fBlocked -- fb}")
    assert(Dedup.simhashBandedNearDups(docs, maxHamming = 7).count() >= 1) // 8-band config runs too
    intercept[IllegalArgumentException](Dedup.simhashBandedNearDups(docs, maxHamming = 16))
  }

  test("sha-keyed simhash: 60-bit token hash parity and brute-force banded equality") {
    // Cross-engine hash contract: the token hash is the first 15 hex
    // chars of sha256, parsed base-16 — pin one known value so a silent
    // change on either side (substring length, conv base, sha variant)
    // fails here, not as an oracle hash mismatch at driver time.
    // sha256("hello") = 2cf24dba5fb0a30e... → 0x2cf24dba5fb0a30 =
    // 202421034056092208.
    val h = Seq("hello").toDF("tok")
      .select(conv(substring(sha2(col("tok"), 256), 1, 15), 16, 10).cast("long"))
      .head().getLong(0)
    assert(h == 202421034056092208L)
    // Bits 60-63 of every sha-keyed simhash are deterministically 0 (the
    // ±1 sums over zero input bits are all-negative), so both engines
    // band identical non-negative values.
    val fixture = Tables.documents(spark, "/root/testdata/sf0.001")
    val sh = Dedup.simhashSha(fixture).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh.values.forall(v => v >= 0 && v < (1L << 60)))
    // The banded result through the shared machinery equals brute-force
    // hamming enumeration over those simhashes (pigeonhole recall at
    // radius 3, exact-precision verify).
    val brute = (for {
      a <- sh.keys; b <- sh.keys if a < b
      d = java.lang.Long.bitCount(sh(a) ^ sh(b)) if d <= 3
    } yield (a, b, d)).toSet
    val banded = Dedup.bandedNearDupsFromSimhash(
      Dedup.simhashSha(fixture), maxHamming = 3, maxBucket = 4096)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute, s"banded-sha != brute force: " +
      s"missing=${brute -- banded} extra=${banded -- brute}")
  }

  test("banded simhash equals brute-force hamming enumeration (full recall, exact precision)") {
    // ~30 template variants: distinct simhashes a few bits apart, so the
    // value-level banding path does real work (buckets, value pairs,
    // doc expansion) and must reproduce brute force EXACTLY.
    val variants = (0 until 30).map { i =>
      (i.toLong, s"$base token$i", "en", "s", 120L)
    }
    val df = variants.toDF("doc_id", "text", "lang", "source", "n_chars")
    val sh = Dedup.simhash(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- sh.keys; b <- sh.keys if a < b
      h = java.lang.Long.bitCount(sh(a) ^ sh(b)) if h <= 7
    } yield (a, b, h)).toSet
    val banded = Dedup.simhashBandedNearDups(df, maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute, s"missing=${brute -- banded} extra=${banded -- brute}")
  }

  test("1000 identical-text docs collapse to ONE distinct simhash value: all true pairs, no candidate blowup") {
    // The round-5 verdict's planted boilerplate case. Value-level banding
    // sees a single simhash value → zero cross-value candidates; every
    // output row comes from the output-sized same-value join.
    val boiler = (0 until 1000).map(i =>
      (i.toLong, base, "en", "s", base.length.toLong))
    val df = boiler.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Dedup.simhashBandedNearDups(df, maxHamming = 3)
    assert(out.count() == 1000L * 999 / 2) // all true pairs at hamming 0
    assert(out.filter(col("hamming") =!= 0).isEmpty)
  }

  test("oversized diverse value-buckets are capped: maxBucket excludes, default keeps") {
    val variants = (0 until 30).map { i =>
      (i.toLong, s"$base token$i", "en", "s", 120L)
    }
    val df = variants.toDF("doc_id", "text", "lang", "source", "n_chars")
    val full = Dedup.simhashBandedNearDups(df, maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.simhashBandedNearDups(df, maxHamming = 7, maxBucket = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Capping only ever REMOVES pairs (recall trade documented in the
    // scaladoc) and with 30 near-identical variants some band bucket
    // must exceed 2 distinct values, so something is actually excluded.
    assert(capped.subsetOf(full))
    assert(capped.size < full.size, "cap=2 on 30 near-identical variants must exclude some bucket")
    intercept[IllegalArgumentException](Dedup.simhashBandedNearDups(df, maxBucket = 1))
  }

  test("incrementalNearDupsSplit (single corpus scan) matches the two-scan form exactly") {
    val fixture = Tables.documents(spark, "/root/testdata/sf0.001")
    val twoScan = Dedup.incrementalNearDups(
      fixture.filter(col("doc_id") % 2 === 1),
      fixture.filter(col("doc_id") % 2 === 0))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val oneScan = Dedup.incrementalNearDupsSplit(fixture, col("doc_id") % 2 === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(oneScan == twoScan,
      s"missing=${twoScan -- oneScan} extra=${oneScan -- twoScan}")
    assert(oneScan.nonEmpty, "fixture has planted cross-parity near-dups")
  }

  test("incremental shingle jaccard: cross-corpus pairs only, order-sensitive measure") {
    val prefix = "shared fifty character prefix padding padding pad " // 50 chars
    val tail = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val d = Seq(
      (0L, prefix + tail, "en", "s", 1L),                                   // history
      (1L, prefix + tail, "en", "s", 1L),                                   // batch: exact dup of 0
      (3L, prefix + tail.replace("echo", "zulu"), "en", "s", 1L),           // batch: near-dup of 0
      (5L, prefix + tail.split(" ").reverse.mkString(" "), "en", "s", 1L),  // batch: shuffled -> low shingle J
      (2L, "some other unrelated history document entirely", "en", "s", 1L) // history, no block mate
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Dedup.incrementalShingleJaccard(d, col("doc_id") % 2 === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 0L)) == 1.0, s"exact dup must score 1.0: $out")
    assert(out.contains((3L, 0L)) && out((3L, 0L)) >= 0.4, s"near-dup must pass threshold: $out")
    assert(!out.contains((5L, 0L)), s"shuffled doc must fail the order-sensitive threshold: $out")
    // no batch-batch or history-history pairs: every key is (odd, even)
    assert(out.keys.forall { case (n, h) => n % 2 == 1 && h % 2 == 0 }, s"side leak: $out")
  }

  test("near-dup clusters: transitive chain collapses to one component, min label wins") {
    // Chain 1-2, 2-3, plus separate pair 7-8; (1,3) deliberately absent.
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.9), (7L, 8L, 0.8))
      .toDF("doc_a", "doc_b", "jaccard")
    val clusters = Dedup.nearDupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))

    val corpus = (1L to 9L).map(i => (i, s"text $i", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val survivors = Dedup.canonicalSurvivors(corpus, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1 survives for {1,2,3}; 7 for {7,8}; 4,5,6,9 are singletons.
    assert(survivors == Map(1L -> 3L, 7L -> 2L, 4L -> 1L, 5L -> 1L, 6L -> 1L, 9L -> 1L))
  }

  test("min-label propagation converges on a long path graph (worst-case diameter)") {
    // Path 0-1-2-...-19: diameter 19 forces many propagation rounds.
    val pairs = (0L until 19L).map(i => (i, i + 1, 1.0)).toDF("doc_a", "doc_b", "jaccard")
    val clusters = Dedup.nearDupClusters(pairs, maxIter = 30)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.size == 20 && clusters.values.forall(_ == 0L))
  }

  test("pointer halving: path-graph ROUND COUNT is O(log diameter), not O(diameter)") {
    // A 256-node path has diameter 255: plain min-propagation moves the
    // component min ONE hop per round (~254 rounds — it could not even
    // converge inside maxIter=40 here). Root relay + the pointer-jump
    // chain from round 3 multiply the label's reach per round: 2 plain
    // rounds + a handful of relayed rounds + the convergence-confirming
    // round (measured 6 at r21). Assert the measured ROUND COUNT, not
    // just the labels — a regression to one-hop propagation would still
    // label correctly on small graphs and only explode in production
    // round counts.
    val n = 256
    val pairs = (0L until (n - 1).toLong).map(i => (i, i + 1, 1.0))
      .toDF("doc_a", "doc_b", "jaccard")
    val (labels, rounds) = Dedup.nearDupClustersCounted(pairs, maxIter = 40)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n && got.values.forall(_ == 0L),
      s"labels wrong: ${got.toSeq.sortBy(_._1).take(10)}...")
    assert(rounds <= 12,
      s"a ${n - 1}-diameter path should converge in ~6 rounds under " +
        s"root relay + pointer jumping; measured $rounds (one-hop " +
        "propagation regression?)")
  }

  test("root relay: star-of-filaments ROUND COUNT stays logarithmic") {
    // The shape that defeats the bare pointer jump (the r21 families
    // measurement): several filaments, each with a LOCAL min at its
    // center, chained so the global min must cross region boundaries.
    // Propagation collapses each filament into a depth-1 star around
    // its local min almost immediately; without the relay the true min
    // then crawls ONE edge hop per round across each boundary (~rounds
    // proportional to region count), with it every region that sees a
    // smaller id relabels wholesale each round.
    // Build: 16 segments of 16 nodes; segment s spans ids
    // [s*16, s*16+15] as a path, and consecutive segments connect at
    // their FAR ends, so each segment's min must traverse the whole
    // next segment to reach its min.
    val seg = 16
    val pairs = (0 until seg).flatMap { s =>
      val base = s * 16L
      val path = (0 until 15).map(i => (base + i, base + i + 1, 1.0))
      val bridge =
        if (s == 0) Nil
        else Seq(((s - 1) * 16L + 15L, base + 15L, 1.0)) // far-end link
      path ++ bridge
    }.toDF("doc_a", "doc_b", "jaccard")
    val (labels, rounds) = Dedup.nearDupClustersCounted(pairs, maxIter = 40)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == seg * 16 && got.values.forall(_ == 0L),
      s"labels wrong: ${got.toSeq.sortBy(_._1).take(10)}...")
    assert(rounds <= 12,
      s"region merging should be logarithmic under the root relay; " +
        s"measured $rounds rounds for $seg chained regions")
  }

  test("shingling handles docs shorter than the shingle size") {
    val tiny = Seq((0L, "one two", "en", "s", 7L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(Dedup.minhashSignatures(tiny).isEmpty) // filtered, not crashed
    assert(Dedup.minhashLsh(tiny.unionByName(docs)).count() ==
      Dedup.minhashLsh(docs).count())
  }

  test("decontamination flags planted benchmark leakage, spares clean docs, caps stop-shingles") {
    val benchText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val bench = Seq(
      (10L, benchText, "en", "bench", 60L),
      // two bench docs sharing a boilerplate prefix — its shingles hit
      // the df cap at maxBenchDf = 1 but survive the default
      (20L, "common header line one two three four five six", "en", "bench", 48L),
      (30L, "common header line nine eight seven six five four", "en", "bench", 49L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val train = Seq(
      // embeds the full benchmark item inside noise: low Jaccard, but
      // 8 shared 3-gram shingles — exactly the leak a ratio would miss
      (1L, s"some long unrelated preamble text goes here $benchText and then more filler trails after",
        "en", "train", 120L),
      (2L, "a perfectly clean training document about something else entirely with many words",
        "en", "train", 80L),
      // shares only the capped boilerplate prefix with bench 20/30
      (3L, "common header line totally different payload words here", "en", "train", 55L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")

    val pairs = Dedup.contaminatedPairs(train, bench, minShared = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 10L)), pairs.toSeq)
    assert(pairs.head._3 == 8L) // all 8 shingles of the embedded item

    val survivors = Dedup.decontaminate(train, bench, minShared = 5L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(2L, 3L))

    // stop-shingle cap: at maxBenchDf = 1 the shared "common header
    // line" shingles are boilerplate (df 2) and identify nothing; at
    // the default cap they count, and doc 3 shares only 1 < minShared
    val capped = Dedup.contaminatedPairs(train, bench, minShared = 1L, maxBenchDf = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!capped.exists(_._1 == 3L), capped.toSeq)
    val uncapped = Dedup.contaminatedPairs(train, bench, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((3L, 20L)) && uncapped.contains((3L, 30L)), uncapped)

    // Bloom path: no false negatives — the planted leak (doc 1) MUST be
    // dropped; survivors are a subset of the exact gate's.
    val bloomSurvivors = Dedup.decontaminateBloom(train, bench, minShared = 5L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!bloomSurvivors.contains(1L), s"bloom missed the planted leak: $bloomSurvivors")
    assert(bloomSurvivors.subsetOf(survivors),
      s"bloom kept docs the exact gate dropped (false negatives!): " +
        s"${bloomSurvivors -- survivors}")
  }

  test("bloom decontamination on fixture: survivors ⊆ union-twin survivors, fpp-bounded over-drop") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val bench = docs.filter(col("doc_id") % 10 === 0)
    // the bloom gate's EXACT twin is the union-count form, not the
    // pair-attribution form (which drops strictly less on template
    // corpora — see decontaminateUnion scaladoc)
    val union = Dedup.decontaminateUnion(train, bench)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val bloom = Dedup.decontaminateBloom(train, bench)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(bloom.subsetOf(union),
      s"false negatives — bloom kept ${bloom -- union} which the exact union gate dropped")
    // over-drop is pure false-positive rate now (identical semantics);
    // with the 1 MiB default filter on the fixture's shingle volume the
    // expected value is well under 1 doc — allow a small sliver
    val overDrop = union -- bloom
    assert(overDrop.size <= math.max(1, union.size / 50),
      s"bloom over-dropped ${overDrop.size} of ${union.size} union-gate survivors")
    // and the union gate itself is a sub-gate of the pair-level one
    val pairLevel = Dedup.decontaminate(train, bench)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(union.subsetOf(pairLevel))
  }

  test("span decontamination strips quoted benchmark passages, keeps the clean remainder") {
    val benchText = "which planet is known as the red planet in our solar system" // 12 tokens
    val bench = Seq((100L, benchText, "en", "b", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val train = Seq(
      // quotes the item verbatim inside clean prose: pair-level
      // decontaminate would drop the WHOLE doc; the span form must strip
      // only the quoted 12 tokens and keep everything else
      (1L, s"opening context here then $benchText and a useful clean tail follows", "en", "t", 1L),
      (2L, "entirely clean training text with no quoted material at all present", "en", "t", 1L),
      // repeats ITS OWN phrase but shares no 8-gram with the benchmark
      (3L, "self repeat block one two three four five self repeat block one two three four five", "en", "t", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Dedup.spanDecontaminate(train, bench, k = 8).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // doc 1: exactly the 12 benchmark tokens removed, prose intact
    assert(out(1L)._2 == 12L, s"expected 12 removed, got ${out(1L)}")
    assert(out(1L)._1 == "opening context here then and a useful clean tail follows")
    // docs 2 and 3 untouched (own-repetition is not contamination)
    assert(out(2L)._2 == 0L && out(3L)._2 == 0L)
    assert(out(3L)._1.startsWith("self repeat block"))
    // hashed gram keys (the 100 TB narrow-shuffle path) ≡ string grams
    val hashed = Dedup.spanDecontaminate(train, bench, k = 8, hashGrams = true).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(hashed == out)
  }

  test("span dedup strips shared passages, keeps unique remainders, hashed ≡ unhashed") {
    val boiler = "terms of service apply to all content on this site always" // 11 tokens
    val d = Seq(
      // first post-boilerplate token DIFFERS, so no 8-gram spans the seam
      (0L, s"$boiler alpha story one with its own distinct narrative thread", "en", "s", 1L),
      (1L, s"$boiler bravo account two telling an entirely separate tale here", "en", "s", 1L),
      (2L, "no shared passage lives in this document at all just original words", "en", "s", 1L),
      // repeats ITS OWN 8-gram twice but shares nothing cross-doc
      (3L, "self repeat block one two three four five self repeat block one two three four five", "en", "s", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Dedup.spanDedup(d, k = 8).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // the 11-token boilerplate is fully covered by its 8-grams in both docs
    assert(out(0L)._1 == "alpha story one with its own distinct narrative thread", out(0L))
    assert(out(0L)._2 == 11L)
    assert(out(1L)._1 == "bravo account two telling an entirely separate tale here")
    // untouched docs come back verbatim with zero removals
    assert(out(2L)._2 == 0L && out(2L)._1.startsWith("no shared passage"))
    // within-doc repetition alone is NOT cross-document boilerplate
    assert(out(3L)._2 == 0L, out(3L))
    // hashed gram keys are a pure shuffle-width optimization
    val hashed = Dedup.spanDedup(d, k = 8, hashGrams = true).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(hashed == out)
    // a doc made ENTIRELY of shared text collapses to the empty string
    val allShared = Seq(
      (0L, boiler, "en", "s", 1L), (1L, boiler, "en", "s", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val empt = Dedup.spanDedup(allShared, k = 8).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(empt(0L) == (("", 11L)) && empt(1L) == (("", 11L)))
  }

  test("edit-distance pairs: exact + char-level near dups in-block, norm exact") {
    val out = Dedup.editDistancePairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // 0-1 identical; 0-2 / 1-2 differ by the 4-substitution warm->cold edit
    assert(out((0L, 1L)) == ((0L, 0.0)))
    val (lev, norm) = out((0L, 2L))
    assert(lev == 4L)
    assert(norm == math.floor(4.0 / base.length * 10000 + 0.5) / 10000)
    assert(out.contains((1L, 2L)))
    // 3 and 4 share no 50-char prefix block with anything
    assert(!out.keys.exists(p => Set(p._1, p._2).intersect(Set(3L, 4L)).nonEmpty))
  }

  test("edit-distance length prefilter prunes same-block pairs before the kernel") {
    // doc 5 shares doc 0's block key but is ~3x longer: |la-lb| exceeds
    // maxNorm * max(len), so the pair must be pruned (and would fail the
    // norm gate anyway — the prefilter just does it without running
    // levenshtein). doc 6 is a small suffix tweak and must survive.
    val docs6 = docs.union(Seq(
      (5L, base + (" padding" * 30), "en", "s", 1L),
      (6L, base + " tonight", "en", "s", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val pairs = Dedup.editDistancePairs(docs6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
    assert(pairs.contains((0L, 6L)))
  }
}
