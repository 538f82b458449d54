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
