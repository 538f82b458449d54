package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real subword (BPE) tokenization as a native expression —
  * `graft_bpe_count(text, mergesSpec)` returns the number of BPE tokens
  * the text encodes to under a fixed, committed merges table.
  *
  * Everything token-denominated in the registry (token budgets,
  * sequence packing, length batching) previously counted WHITESPACE
  * tokens, which misestimates LLM token budgets by 1.3-1.7× on real
  * text; this runs the actual greedy-merge encoder (Sennrich et al.
  * 2016 — the public BPE algorithm every GPT/LLaMA-family tokenizer
  * uses) as a compiled loop inside whole-stage codegen, so the count is
  * still scan-side shuffle-free compute.
  *
  * Encoding spec (the DuckDB oracle replays it verbatim, so it is
  * normative):
  *  1. pre-tokenize with [[Bpe.PretokenPattern]] (word chunks +
  *     standalone punctuation — the split every BPE runs first);
  *  2. per pre-token, start from Unicode-codepoint symbols, then
  *     repeat: find the LOWEST-RANK merge pair present among adjacent
  *     symbols; merge ALL its non-overlapping occurrences
  *     left-to-right; stop when no table pair is present;
  *  3. token count = surviving symbols summed over pre-tokens.
  * Ranks are unique (table position), so every step is deterministic.
  *
  * The merges table is DATA, not code: committed in [[Bpe.merges]]
  * (learned from the documents fixture by `graft.tools.BpeTrain` —
  * rerunnable, deterministic) and shipped to the expression as a
  * foldable spec string, so a production deployment swaps vocabularies
  * by swapping the literal, not the jar. The DuckDB oracle replays the
  * greedy loop over the same table via a recursive CTE
  * ([[Bpe.duckWordTokens]]), making the whole encoder hash-verifiable.
  *
  * Scale shape: per-row compiled compute, no shuffle, no UDF
  * serialization boundary — at 100 TB this runs at parquet scan speed
  * like the rest of the text family. A bounded per-thread word→count
  * cache exploits natural-language redundancy (Zipf: a few thousand
  * distinct words dominate any corpus), the same memoization every
  * production BPE encoder ships.
  */
object Bpe {

  /** Pre-tokenizer: maximal alphanumeric runs + standalone punctuation
    * codepoints — the identical committed pattern `text_token_stats`
    * counts as `n_bpe_pieces`. Whitespace never reaches the encoder.
    */
  val PretokenPattern = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"

  /** Id-space split for [[BpeEncode]]: single-codepoint symbols use the
    * codepoint itself (< 0x110000, the Unicode ceiling), merged symbols
    * use MergedIdOffset + merge rank — disjoint by construction, and
    * trivially replayable by the oracle (`unicode(sym)` vs
    * `1114112 + min(rank)`).
    */
  val MergedIdOffset = 0x110000

  /** Committed merges table; rank = vector position. Learned from the
    * sf0.01 documents fixture by `graft.tools.BpeTrain` (48 merges —
    * deliberately mid-merge for the fixture's vocabulary, so some words
    * encode to one token and others stay split; see the tool's
    * scaladoc). Symbols are alphanumeric by construction (punctuation
    * pre-tokens are single codepoints and never pair), which keeps the
    * spec string and the oracle's VALUES list escaping-free.
    */
  val merges: Vector[(String, String)] = Vector(
    ("e", "r"),
    ("i", "n"),
    ("o", "w"),
    ("o", "r"),
    ("s", "t"),
    ("m", "er"),
    ("a", "t"),
    ("l", "u"),
    ("a", "r"),
    ("p", "ar"),
    ("j", "o"),
    ("jo", "in"),
    ("a", "s"),
    ("as", "h"),
    ("h", "ash"),
    ("r", "ow"),
    ("at", "c"),
    ("atc", "h"),
    ("b", "atch"),
    ("a", "n"),
    ("c", "an"),
    ("s", "can"),
    ("c", "o"),
    ("c", "u"),
    ("co", "lu"),
    ("colu", "m"),
    ("colum", "n"),
    ("cu", "st"),
    ("cust", "o"),
    ("custo", "mer"),
    ("f", "i"),
    ("fi", "l"),
    ("fil", "t"),
    ("filt", "er"),
    ("a", "l"),
    ("al", "l"),
    ("m", "all"),
    ("s", "mall"),
    ("g", "e"),
    ("l", "ow"),
    ("mer", "ge"),
    ("s", "low"),
    ("c", "t"),
    ("ct", "or"),
    ("d", "er"),
    ("e", "ctor"),
    ("or", "der"),
    ("v", "ector"))

  /** The merges table serialized for the expression's foldable second
    * argument: "l r" pairs comma-joined in rank order.
    */
  val mergesSpec: String = merges.map { case (l, r) => s"$l $r" }.mkString(",")

  /** The merges table as a DuckDB `(rank, l, r)` VALUES list. */
  def duckMergesValues: String =
    merges.zipWithIndex.map { case ((l, r), i) => s"($i, '$l', '$r')" }.mkString(", ")

  /** DuckDB CTE block replaying the greedy encoder per DISTINCT word of
    * `documents` (template/natural corpora repeat words heavily — the
    * same Zipf argument as the Scala-side cache; per-doc counts come
    * from joining back on the word).
    *
    * State per word is the symbol sequence joined with chr(31) (US —
    * cannot appear in a symbol: symbols are alphanumeric), with leading
    * and trailing separators so a pair pattern `US l US r US` is
    * anchored on symbol boundaries. One recursive step = one greedy
    * merge application: the lateral subquery picks the lowest-rank pair
    * PRESENT in the state, and `replace` merges its non-overlapping
    * occurrences left-to-right. Caveat: ADJACENT occurrences share a
    * separator (e.g. 'erer' under merge (e,r): `US e US r US e US r
    * US` — the first match consumes the shared US), so one `replace`
    * merges only the odd-positioned occurrences; the evens merge on a
    * LATER recursion step because the pair is still present and is
    * re-selected until exhausted. The per-step trace is therefore not
    * bit-identical to the expression's all-occurrences-at-once step —
    * the staggering could interleave with a lower-rank pair created by
    * the partial merge — but for the committed table the FINAL counts
    * coincide (hash-verified every round, plus the pinned
    * adjacent-occurrence cases in BpeSpec replaying this replace-step
    * semantics in Scala). The divergence is REAL for SELF-pair tables:
    * under (a,a), runs of 6 or 8 strand two singles apart (BpeSpec pins
    * 3-vs-4 and 4-vs-5); the committed table contains no self-pair
    * (asserted in BpeSpec), so no oracle-checked row can reach it — the
    * expression is normative, this CTE is the replay.
    * The recursion is UNION (distinct): a terminal state reproduces
    * itself via the LEFT JOIN's NULL arm, the duplicate is eliminated,
    * and that word stops iterating — while states still shrink (every
    * merge removes a separator) so no cycles exist. `final` then keeps
    * exactly the states with no applicable merge.
    *
    * Names `bpe_merges`/`bpe_words`/`bpe_steps`/`bpe_final` are
    * namespaced so callers can compose the block with their own CTEs.
    */
  def duckWordTokens: String =
    s"""bpe_merges(rank, l, r) AS (
       |  SELECT * FROM (VALUES $duckMergesValues) t),
       |bpe_words(word) AS (
       |  SELECT DISTINCT unnest(regexp_extract_all(text, '$PretokenPattern'))
       |  FROM documents),
       |bpe_steps AS (
       |  SELECT word, chr(31) || array_to_string(string_split(word, ''), chr(31)) || chr(31) AS st
       |  FROM bpe_words
       |  UNION
       |  SELECT s.word,
       |         CASE WHEN m.l IS NULL THEN s.st
       |              ELSE replace(s.st, chr(31)||m.l||chr(31)||m.r||chr(31),
       |                                 chr(31)||m.l||m.r||chr(31)) END AS st
       |  FROM bpe_steps s
       |  LEFT JOIN LATERAL (
       |    SELECT l, r FROM bpe_merges
       |    WHERE contains(s.st, chr(31)||l||chr(31)||r||chr(31))
       |    ORDER BY rank LIMIT 1) m ON true),
       |bpe_final AS (
       |  SELECT word, st, len(string_split(st, chr(31))) - 2 AS n_toks
       |  FROM bpe_steps s
       |  WHERE NOT EXISTS (
       |    SELECT 1 FROM bpe_merges
       |    WHERE contains(s.st, chr(31)||l||chr(31)||r||chr(31))))""".stripMargin

  /** DuckDB CTE block mapping every document to its BPE token count
    * (`bpe_doc_tokens(doc_id, n_bpe_tokens)`); builds on
    * [[duckWordTokens]]. LEFT JOIN from `documents`, so a document
    * whose text yields zero pre-tokens still appears with count 0
    * (mirroring the expression, which returns 0 when the matcher finds
    * nothing).
    */
  def duckDocTokens: String =
    s"""$duckWordTokens,
       |bpe_doc_words AS (
       |  SELECT doc_id, unnest(regexp_extract_all(text, '$PretokenPattern')) AS word
       |  FROM documents),
       |bpe_doc_tokens AS (
       |  SELECT d.doc_id,
       |         CAST(coalesce(sum(f.n_toks), 0) AS BIGINT) AS n_bpe_tokens
       |  FROM documents d
       |  LEFT JOIN (SELECT w.doc_id, fin.n_toks
       |             FROM bpe_doc_words w JOIN bpe_final fin USING (word)) f
       |    ON d.doc_id = f.doc_id
       |  GROUP BY d.doc_id)""".stripMargin

  /** DuckDB CTE block mapping every document to its BPE token-ID
    * sequence (`bpe_doc_ids(doc_id, ids)` — INTEGER list, pretoken
    * order preserved); builds on [[duckWordTokens]]. Ids replay
    * [[Coder.symbolId]] exactly: a single-codepoint surviving symbol is
    * `unicode(sym)`, a merged symbol is [[MergedIdOffset]] + the LOWEST
    * rank whose l||r equals it (min(rank) = the putIfAbsent rule).
    * Documents with zero pretokens do not appear (callers LEFT JOIN or
    * filter, exactly like [[duckDocTokens]]'s n >= 1 consumers).
    *
    * Order preservation is explicit on both axes: within a word via the
    * symbol position subscript, across a document via the pretoken
    * position subscript — never relying on unnest ordering through a
    * GROUP BY.
    */
  def duckDocIds: String =
    s"""$duckWordTokens,
       |bpe_vocab AS (
       |  SELECT l || r AS sym, $MergedIdOffset + min(rank) AS id
       |  FROM bpe_merges GROUP BY 1),
       |bpe_word_syms AS (
       |  SELECT word, t.i AS pos,
       |         list_filter(string_split(st, chr(31)), s -> s <> '')[t.i] AS sym
       |  FROM bpe_final, LATERAL (SELECT unnest(generate_series(1, n_toks)) AS i) t),
       |bpe_word_ids AS (
       |  SELECT s.word,
       |         list(CASE WHEN length(s.sym) = 1 THEN unicode(s.sym) ELSE v.id END
       |              ORDER BY s.pos) AS ids
       |  FROM bpe_word_syms s LEFT JOIN bpe_vocab v ON v.sym = s.sym
       |  GROUP BY s.word),
       |bpe_doc_seq AS (
       |  SELECT doc_id, t.i AS pos, ws[t.i] AS word
       |  FROM (SELECT doc_id, regexp_extract_all(text, '$PretokenPattern') AS ws
       |        FROM documents) d,
       |       LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i) t),
       |bpe_doc_ids AS (
       |  SELECT s.doc_id, flatten(list(w.ids ORDER BY s.pos)) AS ids
       |  FROM bpe_doc_seq s JOIN bpe_word_ids w ON w.word = s.word
       |  GROUP BY s.doc_id)""".stripMargin

  /** The compiled greedy encoder over one parsed merges table. One
    * instance per expression (shipped via `addReferenceObj`), shared by
    * interpreted and generated code.
    */
  final class Coder(spec: String) extends Serializable {
    private val pairs: Array[(String, String)] =
      spec.split(",", -1).map { seg =>
        val ix = seg.indexOf(' ')
        (seg.substring(0, ix), seg.substring(ix + 1))
      }

    // "l<NUL>r" -> rank; NUL never appears in a symbol
    @transient private lazy val rank: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](pairs.length * 2)
      var i = 0
      while (i < pairs.length) {
        // putIfAbsent: lowest rank wins if a duplicate ever slips past
        // the analysis-time uniqueness check (defense in depth).
        m.putIfAbsent(pairs(i)._1 + "\u0000" + pairs(i)._2, i)
        i += 1
      }
      m
    }

    @transient private lazy val pretok: Pattern = Pattern.compile(PretokenPattern)

    // Bounded per-thread memo (word -> token count). Per-THREAD, not
    // shared: no locking in the hot loop; each executor thread warms its
    // own map. Cleared when full — corpus vocabularies are Zipfian, so
    // 64Ki residents cover essentially all hits.
    @transient private lazy val memo: ThreadLocal[java.util.HashMap[String, Integer]] =
      ThreadLocal.withInitial(() => new java.util.HashMap[String, Integer](1 << 10))
    private val MemoCap = 1 << 16

    def countTokens(text: UTF8String): Int = {
      val m = pretok.matcher(text.toString)
      val cache = memo.get()
      var total = 0
      while (m.find()) {
        val w = m.group()
        var c = cache.get(w)
        if (c == null) {
          c = countWord(w)
          if (cache.size() >= MemoCap) cache.clear()
          cache.put(w, c)
        }
        total += c.intValue()
      }
      total
    }

    /** Greedy merge loop for one pre-token (spec step 2); returns the
      * surviving symbol array trimmed to its final length. The copy is
      * per DISTINCT word only (both memos cache the derived result).
      */
    private def mergeWord(w: String): Array[String] = {
      val n = w.codePointCount(0, w.length)
      val syms = new Array[String](n)
      var i = 0
      var j = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        syms(j) = new String(Character.toChars(cp))
        j += 1
        i += Character.charCount(cp)
      }
      if (n <= 1) return syms
      var len = n
      while (true) {
        var bestRank = Int.MaxValue
        i = 0
        while (i < len - 1) {
          val r = rank.get(syms(i) + "\u0000" + syms(i + 1))
          if (r != null && r.intValue() < bestRank) bestRank = r.intValue()
          i += 1
        }
        if (bestRank == Int.MaxValue)
          return if (len == n) syms else java.util.Arrays.copyOf(syms, len)
        val bl = pairs(bestRank)._1
        val br = pairs(bestRank)._2
        var out = 0
        i = 0
        while (i < len) {
          if (i + 1 < len && syms(i) == bl && syms(i + 1) == br) {
            syms(out) = bl + br
            i += 2
          } else {
            syms(out) = syms(i)
            i += 1
          }
          out += 1
        }
        len = out
      }
      syms // unreachable
    }

    private def countWord(w: String): Int = mergeWord(w).length

    // merged-symbol (l+r concatenation) -> id. putIfAbsent: when two
    // merges produce the same concatenation (e.g. (a,bc) and (ab,c)),
    // the LOWEST rank names the symbol — the deterministic rule the
    // DuckDB replay mirrors with min(rank).
    @transient private lazy val mergedId: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](pairs.length * 2)
      var i = 0
      while (i < pairs.length) {
        m.putIfAbsent(pairs(i)._1 + pairs(i)._2, MergedIdOffset + i)
        i += 1
      }
      m
    }

    /** Id of one surviving symbol: single codepoint -> the codepoint
      * itself; merged symbol -> [[Bpe.MergedIdOffset]] + the lowest
      * rank whose l+r equals it. Total and collision-free: codepoints
      * are < MergedIdOffset, merged symbols have >= 2 codepoints, and
      * every encoder-produced multi-codepoint symbol is some table
      * merge's l+r by construction.
      */
    private def symbolId(s: String): Int =
      if (s.codePointCount(0, s.length) == 1) s.codePointAt(0)
      else {
        val id = mergedId.get(s)
        if (id == null) // unreachable for encoder-produced symbols
          throw new IllegalStateException(s"graft_bpe: no merge produces symbol '$s'")
        id.intValue()
      }

    private def idsWord(w: String): Array[Int] = {
      val syms = mergeWord(w)
      val out = new Array[Int](syms.length)
      var i = 0
      while (i < syms.length) {
        out(i) = symbolId(syms(i))
        i += 1
      }
      out
    }

    // word -> id array memo, same per-thread bounded discipline as the
    // count memo (the arrays are shared read-only once cached).
    @transient private lazy val memoIds: ThreadLocal[java.util.HashMap[String, Array[Int]]] =
      ThreadLocal.withInitial(() => new java.util.HashMap[String, Array[Int]](1 << 10))

    /** Token-id sequence of `text` — the same pre-tokenize + greedy
      * merge as [[countTokens]], emitting ids instead of a count;
      * `encodeTokens(t).numElements == countTokens(t)` for every input
      * (pinned by BpeSpec). Returns packed primitive ints (no boxing).
      */
    def encodeTokens(text: UTF8String): ArrayData = {
      val m = pretok.matcher(text.toString)
      val cache = memoIds.get()
      var buf = new Array[Int](64)
      var n = 0
      while (m.find()) {
        val w = m.group()
        var ids = cache.get(w)
        if (ids == null) {
          ids = idsWord(w)
          if (cache.size() >= MemoCap) cache.clear()
          cache.put(w, ids)
        }
        if (n + ids.length > buf.length) {
          var cap = buf.length << 1
          while (cap < n + ids.length) cap <<= 1
          buf = java.util.Arrays.copyOf(buf, cap)
        }
        System.arraycopy(ids, 0, buf, n, ids.length)
        n += ids.length
      }
      UnsafeArrayData.fromPrimitiveArray(
        if (n == buf.length) buf else java.util.Arrays.copyOf(buf, n))
    }

    /** Inverse of [[encodeTokens]] on the id side: ids back to text.
      * Merged ids concatenate their merge's l+r (symbols in the table
      * are stored FLAT, so one append fully expands); codepoint ids
      * append the codepoint. What comes back is the pretoken
      * concatenation — whitespace never reaches the encoder, so
      * `decode(encode(t))` equals t's pretokens joined by '' (the
      * text_bpe_roundtrip oracle states exactly that invariant).
      * Unknown or NULL ids fail LOUDLY: a loader decoding a corrupted
      * id stream must stop, not emit silently wrong text.
      */
    def decodeTokens(ids: ArrayData): UTF8String = {
      val sb = new java.lang.StringBuilder(ids.numElements() * 2)
      var i = 0
      while (i < ids.numElements()) {
        if (ids.isNullAt(i))
          throw new IllegalArgumentException(
            s"graft_bpe_decode: NULL id at position $i")
        val id = ids.getInt(i)
        if (id >= MergedIdOffset) {
          val r = id - MergedIdOffset
          if (r >= pairs.length)
            throw new IllegalArgumentException(
              s"graft_bpe_decode: merged id $id exceeds the table " +
                s"(${pairs.length} merges)")
          sb.append(pairs(r)._1).append(pairs(r)._2)
        } else if (id >= 0 && Character.isValidCodePoint(id) &&
            !(id >= Character.MIN_SURROGATE.toInt && id <= Character.MAX_SURROGATE.toInt)) {
          // surrogate range is rejected: the encoder can never emit it
          // (codepoints come from well-formed strings), so such an id is
          // exactly the corrupted-stream case — appendCodePoint would
          // silently produce mangled bytes instead of stopping
          sb.appendCodePoint(id)
        } else {
          throw new IllegalArgumentException(
            s"graft_bpe_decode: invalid id $id at position $i")
        }
        i += 1
      }
      UTF8String.fromString(sb.toString)
    }
  }
}

/** Shared (text, foldable merges-spec) contract of the BPE expressions:
  * analysis-time spec validation (shape + pair uniqueness) and the
  * once-per-expression [[Bpe.Coder]]. NULL text → NULL for both.
  */
trait BpeExpressionBase extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, StringType) if right.foldable =>
      right.eval() match {
        case null => TypeCheckResult.TypeCheckFailure(s"$prettyName: merges spec must not be null")
        case s: UTF8String =>
          val segs = s.toString.split(",", -1)
          val bad = segs.find { seg =>
            val ix = seg.indexOf(' ')
            ix <= 0 || ix != seg.lastIndexOf(' ') || ix == seg.length - 1
          }
          lazy val dup = segs.diff(segs.distinct).headOption
          if (segs.isEmpty || bad.isDefined)
            TypeCheckResult.TypeCheckFailure(
              s"$prettyName: each merge must be 'left right' (one space, both non-empty); " +
                s"bad segment: '${bad.getOrElse("")}'")
          else if (dup.isDefined)
            TypeCheckResult.TypeCheckFailure(
              s"$prettyName: duplicate merge pair '${dup.get}' — ranks must be unique " +
                "(lowest rank wins would be ambiguous)")
          else TypeCheckResult.TypeCheckSuccess
        case s => TypeCheckResult.TypeCheckFailure(s"$prettyName: unexpected merges spec $s")
      }
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, foldable string) inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  @transient protected lazy val coder: Bpe.Coder =
    new Bpe.Coder(right.eval().asInstanceOf[UTF8String].toString)

  protected def coderRef(ctx: CodegenContext): String =
    ctx.addReferenceObj("graftBpeCoder", coder, classOf[Bpe.Coder].getName)
}

/** graft_bpe_count(text, 'l r,l r,...') — BPE token count of `text`
  * under the foldable merges spec (rank order, "l r" pairs
  * comma-joined — [[Bpe.mergesSpec]] for the committed table). The spec
  * is validated at ANALYSIS time and parsed ONCE per expression; the
  * per-row work is the compiled greedy loop, called from generated
  * code. NULL text → NULL.
  */
case class BpeCount(left: Expression, right: Expression) extends BpeExpressionBase {
  override def prettyName: String = "graft_bpe_count"
  override def dataType: DataType = IntegerType

  override def nullSafeEval(t: Any, s: Any): Any =
    coder.countTokens(t.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = coderRef(ctx)
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = $ref.countTokens($t);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** graft_bpe_encode(text, 'l r,l r,...') — the token-ID sequence
  * (`array<int>`) of `text` under the same committed merges table as
  * [[BpeCount]]; `size(graft_bpe_encode(t, m)) ==
  * graft_bpe_count(t, m)` by construction (same merge loop, shared
  * per-thread memos). Id scheme: surviving single-codepoint symbols are
  * their codepoint; merged symbols are [[Bpe.MergedIdOffset]] + the
  * lowest producing rank — a pure function of the symbol string, so the
  * DuckDB oracle ([[Bpe.duckDocIds]]) replays ids exactly. This is the
  * column a training-data loader actually ships: packing manifests
  * carry the real id slices, not just counts.
  */
/** graft_bpe_decode(ids, 'l r,l r,...') — token ids back to text under
  * the same committed merges table: the loader-side detokenizer (and
  * the debugging lens for packed manifests). Inverse of
  * [[BpeEncode]] up to whitespace: `graft_bpe_decode(graft_bpe_encode(
  * t, m), m)` equals t's pretokens concatenated (whitespace is never
  * encoded), which is exactly what the text_bpe_roundtrip oracle
  * asserts independently via regexp_extract_all. NULL ids array →
  * NULL; an unknown id inside the array fails loudly.
  */
case class BpeDecode(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "graft_bpe_decode"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), StringType) if right.foldable =>
      // same spec validation as the encoder side, via a throwaway probe
      BpeCount(org.apache.spark.sql.catalyst.expressions.Literal("x"), right)
        .checkInputDataTypes() match {
        case TypeCheckResult.TypeCheckSuccess => TypeCheckResult.TypeCheckSuccess
        case f: TypeCheckResult.TypeCheckFailure =>
          TypeCheckResult.TypeCheckFailure(
            f.message.replace("graft_bpe_count", prettyName))
        case other => other
      }
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<int>, foldable string) inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  @transient private lazy val coder: Bpe.Coder =
    new Bpe.Coder(right.eval().asInstanceOf[UTF8String].toString)

  override def nullSafeEval(ids: Any, s: Any): Any =
    coder.decodeTokens(ids.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBpeCoder", coder, classOf[Bpe.Coder].getName)
    nullSafeCodeGen(ctx, ev, (ids, _) =>
      s"${ev.value} = $ref.decodeTokens($ids);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class BpeEncode(left: Expression, right: Expression) extends BpeExpressionBase {
  override def prettyName: String = "graft_bpe_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(t: Any, s: Any): Any =
    coder.encodeTokens(t.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = coderRef(ctx)
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = $ref.encodeTokens($t);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
