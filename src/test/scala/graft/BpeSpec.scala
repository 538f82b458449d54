package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Bpe

/** Known-answer and semantics tests for the native BPE encoder
  * (functions/Bpe.scala). The greedy-merge spec is normative (the
  * DuckDB oracle replays it), so every rule gets a direct pin here:
  * lowest-rank-first, all-occurrences-left-to-right, pre-token
  * isolation, and the committed-table segmentations the trainer
  * reported.
  */
class BpeSpec extends SparkSpec {

  private def count(text: String, spec: String): Any = {
    import spark.implicits._
    Seq(text).toDF("t")
      .select(call_function("graft_bpe_count", col("t"), lit(spec)))
      .collect()(0).get(0)
  }

  // --- spec semantics on a hand-built merges table ---

  test("greedy merge: all non-overlapping occurrences, left to right") {
    // merges: rank0 (a,a). "aaa" -> [aa, a] (the first pair consumes
    // both a's; the survivor cannot re-pair leftward), "aaaa" -> [aa, aa]
    assert(count("aaa", "a a") === 2)
    assert(count("aaaa", "a a") === 2)
    assert(count("aaaaa", "a a") === 3)
  }

  test("lowest rank wins even when a later merge is also present") {
    // "tht": rank0 (h,t) fires first -> [t, ht]; rank1 (t,h) can then
    // never fire. Rank order, not text order, decides.
    assert(count("tht", "h t,t h") === 2)
    // flipped table: (t,h) first -> [th, t], then nothing
    assert(count("tht", "t h,h t") === 2)
    // chain: (t,h) then (th,e) -> "the" is one token
    assert(count("the", "t h,th e") === 1)
  }

  test("merges never cross pre-token boundaries") {
    // (o,w) would merge inside a word, but "o w" is two pre-tokens
    assert(count("ow", "o w") === 1)
    assert(count("o w", "o w") === 2)
    // punctuation splits the alnum run: "a,b" -> [a][,][b]
    assert(count("a,b", "a b") === 3)
  }

  test("punctuation pre-tokens count one each; whitespace counts zero") {
    // [hello][,][world][!] with no applicable merges = 5+1+5+1
    assert(count("hello, world!", "x y") === 12)
    assert(count("   \t\n  ", "x y") === 0)
    assert(count("", "x y") === 0)
  }

  test("NULL text -> NULL") {
    import spark.implicits._
    val r = Seq[Option[String]](None).toDF("t")
      .select(call_function("graft_bpe_count", col("t"), lit("x y")))
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("malformed merges spec fails at analysis time") {
    import spark.implicits._
    val df = Seq("a").toDF("t")
    for (bad <- Seq("", "ab", "a b c", " b", "a ")) {
      val e = intercept[Exception] {
        df.select(call_function("graft_bpe_count", col("t"), lit(bad))).collect()
      }
      assert(e.getMessage.contains("graft_bpe_count"), s"spec '$bad': ${e.getMessage}")
    }
  }

  // --- the committed table ---

  test("committed merges: alphanumeric symbols, unique ranked pairs") {
    assert(Bpe.merges.nonEmpty)
    assert(Bpe.merges.distinct === Bpe.merges)
    for ((l, r) <- Bpe.merges) {
      assert(l.nonEmpty && r.nonEmpty)
      assert((l + r).forall(_.isLetterOrDigit), s"non-alnum merge ($l,$r)")
    }
  }

  test("committed table reproduces the trainer's reported segmentations") {
    // Pinned from the BpeTrain run that produced the committed table:
    // fully-merged words, mid-merge words, and an unmerged one.
    val expect = Map(
      "customer" -> 1, "batch" -> 1, "vector" -> 1, "order" -> 1,
      "part" -> 2, "the" -> 3, "query" -> 4, "group" -> 5, "table" -> 5)
    for ((w, n) <- expect)
      assert(count(w, Bpe.mergesSpec) === n, s"word '$w'")
    // sentence = sum of word counts; whitespace contributes nothing
    assert(count("the customer table", Bpe.mergesSpec) === 3 + 1 + 5)
  }

  test("subword count is bounded: words <= bpe tokens <= codepoints") {
    val texts = Seq("the quick brown fox", "customer order query",
      "a", "hash join merge sort scan")
    val coder = new Bpe.Coder(Bpe.mergesSpec)
    for (t <- texts) {
      val n = coder.countTokens(UTF8String.fromString(t))
      val words = t.split("\\s+").count(_.nonEmpty)
      assert(n >= words, s"'$t': $n < $words words")
      assert(n <= t.count(!_.isWhitespace), s"'$t': $n > codepoints")
    }
  }

  // --- graft_bpe_encode (token ids) ---

  private def encode(text: String, spec: String): Seq[Int] = {
    import spark.implicits._
    Seq(text).toDF("t")
      .select(call_function("graft_bpe_encode", col("t"), lit(spec)))
      .collect()(0).getSeq[Int](0)
  }

  test("encode: ids are codepoints for singles, MergedIdOffset+rank for merges") {
    // committed table: ("o","w") is rank 2, ("custo","mer") is rank 29
    assert(Bpe.merges(2) === ("o", "w"))
    assert(Bpe.merges(29) === ("custo", "mer"))
    assert(encode("a ow customer", Bpe.mergesSpec) ===
      Seq('a'.toInt, Bpe.MergedIdOffset + 2, Bpe.MergedIdOffset + 29))
    // unmerged word: plain codepoint sequence
    assert(encode("xyz", "q q") === Seq('x'.toInt, 'y'.toInt, 'z'.toInt))
    assert(encode("", Bpe.mergesSpec) === Seq.empty)
  }

  test("encode size == count for every fixture document (ids<->count consistency)") {
    import spark.implicits._
    val rows = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(
        call_function("graft_bpe_count", col("text"), lit(Bpe.mergesSpec)).as("n"),
        call_function("graft_bpe_encode", col("text"), lit(Bpe.mergesSpec)).as("ids"))
      .select(col("n"), size(col("ids")).as("sz"),
        // every id is a valid codepoint or a valid merge rank slot
        forall(col("ids"), id =>
          (id >= 0 && id < lit(0x110000)) ||
            (id >= lit(Bpe.MergedIdOffset) &&
              id < lit(Bpe.MergedIdOffset + Bpe.merges.length))).as("ok"))
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getInt(0) === r.getInt(1))
      assert(r.getBoolean(2))
    }
  }

  test("decode inverts encode up to whitespace; unknown ids fail loudly") {
    import spark.implicits._
    def decode(ids: Seq[Int], spec: String) =
      Seq(ids).toDF("ids")
        .select(call_function("graft_bpe_decode", col("ids"), lit(spec)))
        .collect()(0).getString(0)
    // merged ids expand to their flat l+r; codepoint ids to codepoints
    assert(decode(Seq('a'.toInt, Bpe.MergedIdOffset + 2, Bpe.MergedIdOffset + 29),
      Bpe.mergesSpec) === "aowcustomer")
    assert(decode(Seq.empty, Bpe.mergesSpec) === "")
    // roundtrip on fixture docs: decode(encode(t)) == pretokens joined
    val spec = lit(Bpe.mergesSpec)
    val rows = Tables.documents(spark, "/root/testdata/sf0.001").limit(100)
      .select(col("text"),
        call_function("graft_bpe_decode",
          call_function("graft_bpe_encode", col("text"), spec), spec).as("rt"))
      .collect()
    val pretok = java.util.regex.Pattern.compile(Bpe.PretokenPattern)
    rows.foreach { r =>
      val m = pretok.matcher(r.getString(0))
      val sb = new StringBuilder
      while (m.find()) sb.append(m.group())
      assert(r.getString(1) === sb.toString)
    }
    // unknown merged id, negative id, and SURROGATE-range codepoints
    // (0xD800-0xDFFF — unreachable from any well-formed encode, so
    // exactly the corrupted-stream case) all fail loudly
    for (bad <- Seq(Bpe.MergedIdOffset + Bpe.merges.length, -1, 0xD800, 0xDFFF))
      assert(intercept[Exception] {
        decode(Seq(bad), Bpe.mergesSpec)
      }.getMessage != null, s"id $bad should fail")
  }

  test("encode: NULL text -> NULL") {
    import spark.implicits._
    val r = Seq[Option[String]](None).toDF("t")
      .select(call_function("graft_bpe_encode", col("t"), lit("x y")))
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("duplicate merge pair in the spec fails at analysis time") {
    import spark.implicits._
    val df = Seq("a").toDF("t")
    for (fn <- Seq("graft_bpe_count", "graft_bpe_encode")) {
      val e = intercept[Exception] {
        df.select(call_function(fn, col("t"), lit("a b,c d,a b"))).collect()
      }
      assert(e.getMessage.contains("duplicate merge pair"), e.getMessage)
    }
  }

  // --- oracle replay semantics (the DuckDB replace-step caveat) ---

  /** Faithful Scala replay of the oracle's per-step semantics
    * (Bpe.duckWordTokens): state = US-joined symbols, one step = pick
    * the lowest-rank pair PRESENT, then `replace` ALL its
    * non-overlapping occurrences (Java String.replace == DuckDB
    * replace: left-to-right, scanning resumes past each replacement, so
    * ADJACENT occurrences sharing a separator merge across SEVERAL
    * steps — the staggering the scaladoc documents).
    */
  private def duckReplayCount(word: String, merges: Vector[(String, String)]): Int = {
    val US = "\u001f"
    var st = US + word.map(c => s"$c$US").mkString
    var done = false
    while (!done) {
      merges.find { case (l, r) => st.contains(s"$US$l$US$r$US") } match {
        case None => done = true
        case Some((l, r)) => st = st.replace(s"$US$l$US$r$US", s"$US$l$r$US")
      }
    }
    st.split(US).count(_.nonEmpty)
  }

  test("pinned adjacent-occurrence words: oracle replay converges to the expression") {
    // Words whose merge occurrences ABUT (share a separator) — the
    // replace-step staggering cases; final counts must still agree
    // under the committed table and under the minimal table that
    // triggers the pathology directly.
    val adjacent = Seq("erer", "ererer", "erererer", "arar", "ararar",
      "stst", "owow", "inin", "aaaa", "aaaaaa")
    val coder = new Bpe.Coder(Bpe.mergesSpec)
    for (w <- adjacent) {
      val expr = coder.countTokens(UTF8String.fromString(w))
      val duck = duckReplayCount(w, Bpe.merges)
      assert(expr === duck, s"word '$w': expression $expr vs oracle-replay $duck")
    }
    // the minimal (a,a) table from the spec-semantics tests above:
    // runs of 2,3,4,5,7 converge (any stranded single left ADJACENT to
    // another single re-pairs on a later step)
    val aa = new Bpe.Coder("a a")
    for (w <- Seq("aa", "aaa", "aaaa", "aaaaa", "aaaaaaa"))
      assert(aa.countTokens(UTF8String.fromString(w)) ===
        duckReplayCount(w, Vector(("a", "a"))), s"word '$w' under (a,a)")
    // KNOWN DIVERGENCE, pinned: runs of 6 and 8 under a SELF-pair.
    // replace merges occurrences 1-2, 4-5(, 7-8), stranding singles at
    // positions 3 and 6 APART from each other so (a,a) never re-forms
    // -> one extra token; the expression pairs greedily left-to-right.
    // The committed table contains no self-pair (asserted below), so no
    // registered row can hit this; the expression is normative, the
    // oracle CTE is the replay.
    assert(aa.countTokens(UTF8String.fromString("aaaaaa")) === 3)
    assert(duckReplayCount("aaaaaa", Vector(("a", "a"))) === 4)
    assert(aa.countTokens(UTF8String.fromString("aaaaaaaa")) === 4)
    assert(duckReplayCount("aaaaaaaa", Vector(("a", "a"))) === 5)
    // the structural guard that keeps the divergence unreachable for
    // every oracle-checked row: no committed merge can chain with
    // itself (r never begins with the merged symbol's prefix l+r ...
    // concretely: no l == r, and no pair whose merged symbol overlaps
    // a neighboring occurrence of the same pair)
    assert(Bpe.merges.forall { case (l, r) => l != r })
  }

  test("coder matches expression result (interpreted vs codegen path)") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val viaExpr = docs.select(col("doc_id"),
        call_function("graft_bpe_count", col("text"), lit(Bpe.mergesSpec)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val coder = new Bpe.Coder(Bpe.mergesSpec)
    val direct = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> coder.countTokens(UTF8String.fromString(r.getString(1))))
      .toMap
    assert(viaExpr === direct)
    assert(viaExpr.nonEmpty)
  }
}
