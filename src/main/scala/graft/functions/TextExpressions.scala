package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the text-fingerprint hot path (same tier-(b)
  * graduation as [[DotProduct]]): the HOF formulation
  * (`transform(split(text,''), ascii)` → `aggregate` fold → per-position
  * `transform(sequence(...))` gram sums) is interpreted end-to-end and
  * measured 7.6 s on the bench corpus; these run the identical math as a
  * compiled codepoint loop called from generated code, keeping the
  * operator inside whole-stage codegen.
  *
  * Bit-compatibility contract (the DuckDB oracle depends on it):
  *  - characters are Unicode CODEPOINTS, exactly what
  *    `split(text, '')` + `ascii(c)` produces (Java's zero-width split
  *    never breaks surrogate pairs);
  *  - doc hash: acc = (acc·31 + cp) mod P per codepoint, acc₀ = 0 —
  *    per-step mod, P = 1e9+7;
  *  - gram hash: Σₖ cp[i+k] · (31^(n-1-k) mod P), ONE mod of the sum
  *    (each term ≤ (P-1)·0x10FFFF ≈ 1.1e15, n terms stay inside int64);
  *  - min-gram is NULL when the text has fewer than n codepoints.
  */
object TextHash {
  val P = 1000000007L

  /** Rabin-Karp polynomial hash of the whole text, per-step mod. */
  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    val len = str.length
    var acc = 0L
    var i = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  /** Minimum n-gram window hash (winnowing primitive); -1 encodes
    * "fewer than n codepoints" (the caller maps it to SQL NULL).
    */
  def minGram(s: UTF8String, n: Int): Long = {
    val str = s.toString
    val strLen = str.length
    val numCp = str.codePointCount(0, strLen)
    if (numCp < n) return -1L
    val cps = new Array[Int](numCp)
    var i = 0
    var j = 0
    while (i < strLen) {
      val cp = str.codePointAt(i)
      cps(j) = cp
      j += 1
      i += Character.charCount(cp)
    }
    val pows = new Array[Long](n) // 31^(n-1) .. 31^0, each mod P
    pows(n - 1) = 1L
    var k = n - 2
    while (k >= 0) { pows(k) = pows(k + 1) * 31 % P; k -= 1 }
    var best = Long.MaxValue
    i = 0
    while (i + n <= numCp) {
      var sum = 0L
      k = 0
      while (k < n) { sum += cps(i + k) * pows(k); k += 1 }
      val g = sum % P
      if (g < best) best = g
      i += 1
    }
    best
  }
}

/** graft_polyhash(text) — whole-document rolling hash. */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_polyhash"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.catalogString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    TextHash.polyHash(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.polyHash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** graft_mingram(text, n) — minimum n-gram window hash; n must be a
  * foldable integer in [1, 1024]. NULL when the text has < n codepoints.
  *
  * The bound is checked at ANALYSIS time (n is foldable, so it is known
  * before any row is touched): n=0 would index pows(-1), negative n would
  * allocate a negative-size array — either way an opaque generated-code
  * crash on an executor for a user-callable SQL function. The 1024 cap
  * also keeps the un-modded gram sum inside int64 with huge headroom
  * (each term ≤ (P-1)·0x10FFFF ≈ 1.1e15; the sum only stays in range for
  * n ≲ 8000, and no winnowing scheme uses grams anywhere near that).
  */
case class MinGramHash(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "graft_mingram"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, IntegerType) if right.foldable =>
      right.eval() match {
        case null => TypeCheckResult.TypeCheckFailure(s"$prettyName: n must not be null")
        case n: Int if n >= 1 && n <= 1024 => TypeCheckResult.TypeCheckSuccess
        case n => TypeCheckResult.TypeCheckFailure(
          s"$prettyName: n must be in [1, 1024], got $n")
      }
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, foldable int) inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(t: Any, n: Any): Any = {
    val g = TextHash.minGram(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])
    if (g < 0) null else g
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"""
         |long ${ev.value}_g = graft.functions.TextHash.minGram($t, $n);
         |if (${ev.value}_g < 0) { ${ev.isNull} = true; } else { ${ev.value} = ${ev.value}_g; }
       """.stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Compiled token-membership counting — see [[HitsIn]]. */
object TokenSet {
  /** Count of array elements that equal any of `words` (byte-equality on
    * UTF8String — no String conversion, no per-element allocation).
    * NULL elements never match, mirroring `w IN (...)` evaluating to
    * NULL (not kept) inside a higher-order filter.
    */
  def hitsIn(
      arr: org.apache.spark.sql.catalyst.util.ArrayData,
      words: Array[UTF8String]): Int = {
    var c = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        var j = 0
        var hit = false
        while (j < words.length && !hit) {
          if (words(j).equals(t)) hit = true
          j += 1
        }
        if (hit) c += 1
      }
      i += 1
    }
    c
  }
}

/** graft_hits_in(arr, 'w1,w2,...') — the number of elements of the
  * string array `arr` that are members of the comma-separated word set:
  * exactly what `size(filter(arr, w -> w IN ('w1','w2',...)))` computes,
  * but as a compiled loop inside whole-stage codegen. The higher-order
  * spelling is interpreted per ELEMENT (lambda eval per token, per
  * language) and sat in the curation scorer's hottest path — five
  * stop-hit counts per document (quality + four lang-ID counts). The
  * word set is foldable, validated at ANALYSIS time, and held as
  * UTF8String[] so membership is raw byte comparison — no String
  * materialization per token. NULL array → NULL; NULL elements never
  * match (IN over NULL is not kept by filter).
  */
case class HitsIn(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "graft_hits_in"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), StringType) if right.foldable =>
      right.eval() match {
        case null => TypeCheckResult.TypeCheckFailure(s"$prettyName: word set must not be null")
        case w: UTF8String =>
          val ws = w.toString.split(",", -1)
          if (ws.isEmpty || ws.exists(_.isEmpty))
            TypeCheckResult.TypeCheckFailure(
              s"$prettyName: word set must be non-empty comma-separated words, got '$w'")
          else TypeCheckResult.TypeCheckSuccess
        case w => TypeCheckResult.TypeCheckFailure(s"$prettyName: unexpected word set $w")
      }
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, foldable string) inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  @transient private lazy val words: Array[UTF8String] =
    right.eval().asInstanceOf[UTF8String].toString.split(",", -1)
      .map(UTF8String.fromString)

  override def nullSafeEval(arr: Any, w: Any): Any =
    TokenSet.hitsIn(arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], words)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wordsRef = ctx.addReferenceObj("graftHitWords", words,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, (arr, _) =>
      s"${ev.value} = graft.functions.TokenSet.hitsIn($arr, $wordsRef);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** graft_regex_count(text, pattern) — the number of non-overlapping
  * matches of `pattern` in `text`: exactly what
  * `size(regexp_extract_all(text, pattern, 0))` computes, without
  * materializing a UTF8String array entry per match just to take its
  * length (that spelling allocates every matched substring — pure GC
  * pressure on counting paths like punctuation/CJK ratios, which run
  * once per corpus document in the quality scorer). `pattern` must be a
  * foldable string, checked to compile at ANALYSIS time (a bad pattern
  * fails the query up front, not per-task on executors) and compiled
  * ONCE per expression instance, not per row. Same java.util.regex
  * engine and find() semantics as regexp_extract_all, so counts are
  * bit-identical; NULL text → NULL, mirroring
  * size(regexp_extract_all(NULL)) under the default sizeOfNull=false.
  */
case class RegexCount(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "graft_regex_count"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, StringType) if right.foldable =>
      right.eval() match {
        case null => TypeCheckResult.TypeCheckFailure(s"$prettyName: pattern must not be null")
        case p: UTF8String =>
          try { java.util.regex.Pattern.compile(p.toString); TypeCheckResult.TypeCheckSuccess }
          catch {
            case e: java.util.regex.PatternSyntaxException =>
              TypeCheckResult.TypeCheckFailure(s"$prettyName: bad pattern: ${e.getMessage}")
          }
        case p => TypeCheckResult.TypeCheckFailure(s"$prettyName: unexpected pattern $p")
      }
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, foldable string) inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  @transient private lazy val compiled: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(right.eval().asInstanceOf[UTF8String].toString)

  override def nullSafeEval(t: Any, p: Any): Any = {
    val m = compiled.matcher(t.asInstanceOf[UTF8String].toString)
    var c = 0
    while (m.find()) c += 1
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patternRef = ctx.addReferenceObj("graftRegexPattern", compiled,
      "java.util.regex.Pattern")
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"""
         |java.util.regex.Matcher ${ev.value}_m = $patternRef.matcher($t.toString());
         |int ${ev.value}_c = 0;
         |while (${ev.value}_m.find()) ${ev.value}_c++;
         |${ev.value} = ${ev.value}_c;
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
