package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path — the tier-(b)
  * custom-operator option from the build plan (SURVEY.md §7.5): when the
  * builtin route (higher-order functions) measures too slow, a scalar
  * function graduates to a typed `Expression` with real `doGenCode`.
  *
  * Why: `zip_with`/`aggregate` lambdas are interpreted — no whole-stage
  * codegen — so a 64-dim dot product pays per-element virtual dispatch.
  * These expressions compile to a tight primitive loop inside the
  * generated code (~10× on pair-heavy similarity plans), while keeping
  * BIT-IDENTICAL results to the lambda formulation: the accumulators run
  * the same sequential left-to-right double adds, so the DuckDB oracles
  * that mirror that fold order keep hash-matching.
  *
  * Semantics notes (both expressions):
  *  - element count = min(len(a), len(b)) — like zip_with's null-padding
  *    truncated to the shared prefix;
  *  - null ELEMENTS contribute nothing (skipped pairwise);
  *  - a null ARRAY input yields null (BinaryExpression null-intolerance).
  */
trait VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  protected def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  /** Java source for element `i` of `arr` as a double. `i` must be a
    * ctx.freshName — a fixed loop-variable name gets rejected by janino
    * ("Redefinition of local variable") whenever the block nests inside a
    * generated scope that already declared it, and the WHOLE stage then
    * falls back to interpreted mode.
    */
  protected def getElem(arr: String, i: String, e: Expression): String =
    if (elemIsFloat(e)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"

  protected def elemAt(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
}

/** graft_dot(a, b) — sequential-fold dot product. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val (af, bf) = (elemIsFloat(left), elemIsFloat(right))
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) acc += elemAt(a, i, af) * elemAt(b, i, bf)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val i = ctx.freshName("i")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int ${ev.value}_n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}_acc = 0.0;
         |for (int $i = 0; $i < ${ev.value}_n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    ${ev.value}_acc += ${getElem(a, i, left)} * ${getElem(b, i, right)};
         |  }
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** graft_cosine(a, b) — single-pass cosine similarity (dot and both
  * norms accumulate in one loop; each accumulator's add order matches
  * the separate-fold formulation bit-for-bit). NULL when either norm is
  * zero.
  */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "graft_cosine"
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val (af, bf) = (elemIsFloat(left), elemIsFloat(right))
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = elemAt(a, i, af); val y = elemAt(b, i, bf)
        dot += x * y; na += x * x; nb += y * y
      }
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val i = ctx.freshName("i")
    val x = ctx.freshName("x")
    val y = ctx.freshName("y")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int ${ev.value}_n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}_dot = 0.0, ${ev.value}_na = 0.0, ${ev.value}_nb = 0.0;
         |for (int $i = 0; $i < ${ev.value}_n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    double $x = ${getElem(a, i, left)};
         |    double $y = ${getElem(b, i, right)};
         |    ${ev.value}_dot += $x * $y;
         |    ${ev.value}_na += $x * $x;
         |    ${ev.value}_nb += $y * $y;
         |  }
         |}
         |if (${ev.value}_na == 0.0 || ${ev.value}_nb == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_dot / (java.lang.Math.sqrt(${ev.value}_na) * java.lang.Math.sqrt(${ev.value}_nb));
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Shared shape for unary vector reducers (same element-access and
  * type-check contract as [[VectorBinaryExpression]], one input array).
  * Null ELEMENTS are skipped; a null ARRAY yields null.
  */
trait VectorUnaryExpression extends UnaryExpression {
  override def dataType: DataType = DoubleType

  protected def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input, got ${other.catalogString}")
  }

  protected def getElem(arr: String, i: String): String =
    if (elemIsFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"

  protected def elemAt(a: ArrayData, i: Int): Double =
    if (elemIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
}

/** graft_absmax(a) — max |aᵢ| over non-null elements; NULL on an empty
  * or all-null array, exactly like DuckDB's
  * `list_max(list_transform(a, x -> abs(x)))` (list_max of no non-null
  * values is NULL, not 0). Order-independent, so non-null results equal
  * the oracle bit-for-bit — the scale input of symmetric int8
  * quantization (scale = absmax / 127).
  */
case class AbsMax(child: Expression) extends VectorUnaryExpression {
  override def prettyName: String = "graft_absmax"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var m = 0.0
    var found = false
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        found = true
        val v = math.abs(elemAt(a, i)); if (v > m) m = v
      }
      i += 1
    }
    if (found) m else null
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val i = ctx.freshName("i")
    val v = ctx.freshName("v")
    val found = ctx.freshName("found")
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |int ${ev.value}_n = $a.numElements();
         |double ${ev.value}_m = 0.0;
         |boolean $found = false;
         |for (int $i = 0; $i < ${ev.value}_n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $found = true;
         |    double $v = java.lang.Math.abs(${getElem(a, i)});
         |    if ($v > ${ev.value}_m) ${ev.value}_m = $v;
         |  }
         |}
         |if ($found) { ${ev.value} = ${ev.value}_m; } else { ${ev.isNull} = true; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** graft_int8_mse(a) — mean squared reconstruction error of symmetric
  * per-vector int8 quantization: scale = absmax/127, qᵢ = ⌊aᵢ/scale +
  * 0.5⌋ (round-half-up-toward-+∞ — `floor(x + 0.5)` on BOTH engines, the
  * repo's engine-independent rounding convention), error = aᵢ −
  * qᵢ·scale, averaged over non-null elements. 0.0 for a zero vector;
  * NULL for an empty or all-null array (no absmax exists — mirrors
  * [[AbsMax]]/list_max). Denominator note: the mean divides by the
  * NON-NULL element count, while the sim_quantize_int8 oracle divides
  * by `len(embedding)` — identical whenever no element is null (the
  * fixture and any sane embedding store guarantee this; arrays with
  * SOME null elements would diverge and are outside the oracle
  * contract). Two sequential passes (absmax, then error fold) whose
  * double arithmetic the DuckDB list_transform/list_sum oracle mirrors
  * op-for-op, so results hash-match bit-for-bit.
  */
case class Int8QuantMse(child: Expression) extends VectorUnaryExpression {
  override def prettyName: String = "graft_int8_mse"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var m = 0.0
    var any = false
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        any = true
        val v = math.abs(elemAt(a, i)); if (v > m) m = v
      }
      i += 1
    }
    if (!any) null
    else if (m == 0.0) 0.0
    else {
      val scale = m / 127.0
      var acc = 0.0
      var cnt = 0
      i = 0
      while (i < n) {
        if (!a.isNullAt(i)) {
          val x = elemAt(a, i)
          val err = x - math.floor(x / scale + 0.5) * scale
          acc += err * err
          cnt += 1
        }
        i += 1
      }
      if (cnt == 0) 0.0 else acc / cnt
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val i = ctx.freshName("i")
    val v = ctx.freshName("v")
    val x = ctx.freshName("x")
    val err = ctx.freshName("err")
    val scale = ctx.freshName("scale")
    val any = ctx.freshName("any")
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |int ${ev.value}_n = $a.numElements();
         |double ${ev.value}_m = 0.0;
         |boolean $any = false;
         |for (int $i = 0; $i < ${ev.value}_n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $any = true;
         |    double $v = java.lang.Math.abs(${getElem(a, i)});
         |    if ($v > ${ev.value}_m) ${ev.value}_m = $v;
         |  }
         |}
         |${ev.value} = 0.0;
         |if (!$any) {
         |  ${ev.isNull} = true;
         |} else if (${ev.value}_m != 0.0) {
         |  double $scale = ${ev.value}_m / 127.0;
         |  double ${ev.value}_acc = 0.0;
         |  int ${ev.value}_cnt = 0;
         |  for (int $i = 0; $i < ${ev.value}_n; $i++) {
         |    if (!$a.isNullAt($i)) {
         |      double $x = ${getElem(a, i)};
         |      double $err = $x - java.lang.Math.floor($x / $scale + 0.5) * $scale;
         |      ${ev.value}_acc += $err * $err;
         |      ${ev.value}_cnt++;
         |    }
         |  }
         |  if (${ev.value}_cnt != 0) ${ev.value} = ${ev.value}_acc / ${ev.value}_cnt;
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Function registry plumbing. Sessions opt in either via
  * `spark.sql.extensions=graft.functions.GraftExtensions` (cluster
  * config) or `.withExtensions(new GraftExtensions)` (builder) — both
  * the public, supported injection paths.
  */
object GraftFunctions {
  type Builder = Seq[Expression] => Expression

  private def two(name: String, mk: (Expression, Expression) => Expression): Builder = {
    case Seq(a, b) => mk(a, b)
    case args => throw new IllegalArgumentException(
      s"$name expects exactly 2 arguments, got ${args.length}")
  }

  private def one(name: String, mk: Expression => Expression): Builder = {
    case Seq(a) => mk(a)
    case args => throw new IllegalArgumentException(
      s"$name expects exactly 1 argument, got ${args.length}")
  }

  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      two("graft_dot", DotProduct)),
    (FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      two("graft_cosine", CosineSimilarity)),
    (FunctionIdentifier("graft_absmax"),
      new ExpressionInfo(classOf[AbsMax].getName, "graft_absmax"),
      one("graft_absmax", AbsMax)),
    (FunctionIdentifier("graft_int8_mse"),
      new ExpressionInfo(classOf[Int8QuantMse].getName, "graft_int8_mse"),
      one("graft_int8_mse", Int8QuantMse)),
    (FunctionIdentifier("graft_polyhash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_polyhash"),
      one("graft_polyhash", PolyHash)),
    (FunctionIdentifier("graft_mingram"),
      new ExpressionInfo(classOf[MinGramHash].getName, "graft_mingram"),
      two("graft_mingram", MinGramHash)),
    (FunctionIdentifier("graft_regex_count"),
      new ExpressionInfo(classOf[RegexCount].getName, "graft_regex_count"),
      two("graft_regex_count", RegexCount)),
    (FunctionIdentifier("graft_hits_in"),
      new ExpressionInfo(classOf[HitsIn].getName, "graft_hits_in"),
      two("graft_hits_in", HitsIn)),
    (FunctionIdentifier("graft_bpe_count"),
      new ExpressionInfo(classOf[BpeCount].getName, "graft_bpe_count"),
      two("graft_bpe_count", BpeCount)),
    (FunctionIdentifier("graft_bpe_encode"),
      new ExpressionInfo(classOf[BpeEncode].getName, "graft_bpe_encode"),
      two("graft_bpe_encode", BpeEncode)),
    (FunctionIdentifier("graft_bpe_decode"),
      new ExpressionInfo(classOf[BpeDecode].getName, "graft_bpe_decode"),
      two("graft_bpe_decode", BpeDecode)),
    (FunctionIdentifier("graft_quality_margin"),
      new ExpressionInfo(classOf[QualityMargin].getName, "graft_quality_margin"),
      two("graft_quality_margin", QualityMargin)),
    (FunctionIdentifier("graft_pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "graft_pq_encode"),
      two("graft_pq_encode", PqEncode)),
    (FunctionIdentifier("graft_pq_recon_mse"),
      new ExpressionInfo(classOf[PqReconMse].getName, "graft_pq_recon_mse"),
      two("graft_pq_recon_mse", PqReconMse)),
    (FunctionIdentifier("graft_pq_pack"),
      new ExpressionInfo(classOf[PqPack].getName, "graft_pq_pack"),
      two("graft_pq_pack", PqPack)),
    (FunctionIdentifier("graft_pq_unpack"),
      new ExpressionInfo(classOf[PqUnpack].getName, "graft_pq_unpack"),
      two("graft_pq_unpack", PqUnpack)),
    (FunctionIdentifier("graft_pq_adc"),
      new ExpressionInfo(classOf[PqAdcScore].getName, "graft_pq_adc"),
      two("graft_pq_adc", PqAdcScore)),
    (FunctionIdentifier("graft_pq_adc_pair"),
      new ExpressionInfo(classOf[PqAdcPair].getName, "graft_pq_adc_pair"),
      four("graft_pq_adc_pair", PqAdcPair)),
    (FunctionIdentifier("graft_hyperplane_buckets"),
      new ExpressionInfo(classOf[HyperplaneBuckets].getName, "graft_hyperplane_buckets"),
      three("graft_hyperplane_buckets", HyperplaneBuckets)),
    (FunctionIdentifier("graft_nearest_cell"),
      new ExpressionInfo(classOf[NearestCell].getName, "graft_nearest_cell"),
      four("graft_nearest_cell", NearestCell)),
    (FunctionIdentifier("graft_nearest_cells"),
      new ExpressionInfo(classOf[NearestCells].getName, "graft_nearest_cells"),
      five("graft_nearest_cells", NearestCells)),
    (FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimhashAgg].getName, "graft_simhash"),
      one("graft_simhash", e => SimhashAgg(e).toAggregateExpression())),
    // Spark ships BloomFilterAggregate/BloomFilterMightContain as
    // catalyst expressions (the engine of its own runtime row-group
    // filtering, SPARK-32268) but does not expose them in the public
    // FunctionRegistry; surface them under graft names for the
    // decontamination scale path (Dedup.decontaminateBloom).
    // graft_bloom_agg(hash, estimatedItems, numBits) -> binary filter;
    // graft_might_contain(filter, hash) -> boolean (filter must be a
    // constant or scalar subquery — Spark's own contract).
    (FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      three("graft_bloom_agg", (c, n, b) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, n, b)
          .toAggregateExpression())),
    (FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      two("graft_might_contain", (f, v) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(f, v))))

  private def three(name: String, mk: (Expression, Expression, Expression) => Expression): Builder = {
    case Seq(a, b, c) => mk(a, b, c)
    case args => throw new IllegalArgumentException(
      s"$name expects exactly 3 arguments, got ${args.length}")
  }

  private def four(
      name: String,
      mk: (Expression, Expression, Expression, Expression) => Expression): Builder = {
    case Seq(a, b, c, d) => mk(a, b, c, d)
    case args => throw new IllegalArgumentException(
      s"$name expects exactly 4 arguments, got ${args.length}")
  }

  private def five(
      name: String,
      mk: (Expression, Expression, Expression, Expression, Expression) => Expression): Builder = {
    case Seq(a, b, c, d, e) => mk(a, b, c, d, e)
    case args => throw new IllegalArgumentException(
      s"$name expects exactly 5 arguments, got ${args.length}")
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.descriptors.foreach(ext.injectFunction)
}
