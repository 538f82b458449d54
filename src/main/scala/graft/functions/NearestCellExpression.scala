package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** graft_nearest_cell(vec, cents, start, len) — the coarse-quantizer
  * assignment kernel: the ABSOLUTE index j in [start, start+len) of the
  * centroid minimizing ||v − c_j||², computed as c_j·c_j − 2·v·c_j (the
  * row-constant v·v cannot move an argmin) with centroid self-dots
  * precomputed once per expression instance. Strict `<` keeps the
  * LOWEST index on ties — the deterministic tie-break every committed
  * assignment here uses.
  *
  * Why an expression: the committed-table argmin (`least(struct(...))`,
  * Similarity.domainCandidates) inlines one dot loop per centroid and
  * falls off HotSpot's JIT bytecode cliff past ~32 cells (the
  * HyperplaneBuckets lesson), while the relational spelling
  * (K-way centroid join + window-min, Similarity.nearestCellAssignment)
  * pays a K× row blowup and a by-row shuffle. This kernel makes
  * assignment scan-side at ANY cell count: one compact nested loop over
  * a referenced double[][], zero exchanges, zero blowup. With `start`/
  * `len` as runtime columns it also evaluates the SECOND level of a
  * hierarchical quantizer — probe only the winning top cell's slice of
  * the flat sub-centroid matrix — which is what keeps fitted-table
  * assignment O(√nlist) per row when nlist grows with the corpus
  * (Similarity.fitQuantizerTwoLevel).
  *
  * `cents` must be a FOLDABLE array<array<double>> (the centroid table
  * rides the plan as one literal, converted to double[][] once); vec is
  * array<float|double> with null elements skipped (graft_dot's
  * contract); a null vec/start/len yields null.
  */
case class NearestCell(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def prettyName: String = "graft_nearest_cell"
  override def dataType: DataType = IntegerType

  private def elemIsFloat: Boolean =
    first.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = first.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      second.dataType match {
        case ArrayType(ArrayType(DoubleType, _), _) if second.foldable =>
          (third.dataType, fourth.dataType) match {
            case (IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
            case _ => TypeCheckResult.TypeCheckFailure(
              s"$prettyName: start and len must be INT")
          }
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName: cents must be a foldable array<array<double>> literal")
      }
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> vec, got ${t.catalogString}")
  }

  @transient private lazy val cents: Array[Array[Double]] = {
    val ad = second.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
  }
  @transient private lazy val centNorm2: Array[Double] = cents.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    s
  }

  private def argmin(a: ArrayData, start: Int, len: Int, isF: Boolean): Int = {
    require(start >= 0 && len >= 1 && start + len <= cents.length,
      s"$prettyName: slice [$start, ${start + len}) outside the " +
        s"${cents.length}-cell table")
    var best = -1
    var bestScore = Double.PositiveInfinity
    var j = start
    while (j < start + len) {
      val c = cents(j)
      val n = math.min(c.length, a.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i))
          acc += c(i) * (if (isF) a.getFloat(i).toDouble else a.getDouble(i))
        i += 1
      }
      val score = centNorm2(j) - 2.0 * acc
      if (score < bestScore) { bestScore = score; best = j }
      j += 1
    }
    best
  }

  override def nullSafeEval(vec: Any, c: Any, s: Any, l: Any): Any =
    argmin(vec.asInstanceOf[ArrayData], s.asInstanceOf[Int],
      l.asInstanceOf[Int], elemIsFloat)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val normRef = ctx.addReferenceObj("centNorm2", centNorm2, "double[]")
    val getE = if (elemIsFloat) "getFloat" else "getDouble"
    val (best, bestScore, j, c, n, acc, i, score) = (ctx.freshName("best"),
      ctx.freshName("bestScore"), ctx.freshName("j"), ctx.freshName("c"),
      ctx.freshName("n"), ctx.freshName("acc"), ctx.freshName("i"),
      ctx.freshName("score"))
    nullSafeCodeGen(ctx, ev, (vec, _, start, len) =>
      s"""
         |if ($start < 0 || $len < 1 || $start + $len > $centsRef.length) {
         |  throw new IllegalArgumentException("graft_nearest_cell: slice [" +
         |    $start + ", " + ($start + $len) + ") outside the " +
         |    $centsRef.length + "-cell table");
         |}
         |int $best = -1;
         |double $bestScore = Double.POSITIVE_INFINITY;
         |for (int $j = $start; $j < $start + $len; $j++) {
         |  double[] $c = $centsRef[$j];
         |  int $n = java.lang.Math.min($c.length, $vec.numElements());
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$vec.isNullAt($i)) $acc += $c[$i] * (double) $vec.$getE($i);
         |  }
         |  double $score = $normRef[$j] - 2.0 * $acc;
         |  if ($score < $bestScore) { $bestScore = $score; $best = $j; }
         |}
         |${ev.value} = $best;
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}
