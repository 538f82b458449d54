package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, QuinaryExpression, UnaryExpression}
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

/** graft_nearest_cells(vec, cents, start, len, p) — [[NearestCell]]'s
  * top-p generalization, the scan-side PROBE-RANKING kernel: the
  * min(p, len) ABSOLUTE indices in [start, start+len) of the centroids
  * nearest to `vec` (same c_j·c_j − 2·v·c_j argmin score — the
  * row-constant v·v cannot reorder distances), ascending by distance
  * with ties broken toward the LOWEST index — exactly the
  * `ORDER BY cell_d2, list_id` rule the relational probe ranking
  * (crossJoin(centroids) + per-query row_number window) used, minus
  * its two scale hazards: the |rows|×nlist intermediate and the
  * row-keyed window shuffle. Ranking becomes one bounded insertion
  * pass per row inside whole-stage codegen — zero exchanges, zero
  * blowup — which is what lets a batched k-NN join take a CORPUS as
  * its query table (the knn-graph build) without paying a
  * |corpus|×nlist stage.
  *
  * Tie handling matches the window rule by construction: candidates
  * are visited in ascending index order, insertion shifts only on a
  * STRICT score improvement, and a full buffer admits only a strictly
  * better score — so among equal scores the lowest index always ranks
  * first and survives last.
  *
  * `cents` must be a FOLDABLE array<array<double>> (converted to
  * double[][] once per expression instance); `p` must be a foldable
  * positive INT (it sizes the per-row selection buffer once); `start`/
  * `len` are runtime columns so the kernel also ranks WITHIN a
  * hierarchical quantizer's sub-slice (the [[NearestCell]] two-probe
  * scheme, generalized to nprobe cells). Null vec/start/len → null;
  * null vec ELEMENTS are skipped (graft_dot's contract).
  */
case class NearestCells(first: Expression, second: Expression,
    third: Expression, fourth: Expression, fifth: Expression)
    extends QuinaryExpression {
  override def prettyName: String = "graft_nearest_cells"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def children: Seq[Expression] =
    Seq(first, second, third, fourth, fifth)

  private def elemIsFloat: Boolean =
    first.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = first.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      second.dataType match {
        case ArrayType(ArrayType(DoubleType, _), _) if second.foldable =>
          (third.dataType, fourth.dataType, fifth.dataType) match {
            case (IntegerType, IntegerType, IntegerType) if fifth.foldable =>
              TypeCheckResult.TypeCheckSuccess
            case (IntegerType, IntegerType, IntegerType) =>
              TypeCheckResult.TypeCheckFailure(
                s"$prettyName: p must be a foldable INT literal")
            case _ => TypeCheckResult.TypeCheckFailure(
              s"$prettyName: start, len and p must be INT")
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
  @transient private lazy val pVal: Int = {
    val p = fifth.eval(null).asInstanceOf[Int]
    require(p >= 1, s"$prettyName: p=$p must be >= 1")
    p
  }

  private def topP(a: ArrayData, start: Int, len: Int, isF: Boolean): ArrayData = {
    require(start >= 0 && len >= 1 && start + len <= cents.length,
      s"$prettyName: slice [$start, ${start + len}) outside the " +
        s"${cents.length}-cell table")
    val m = math.min(pVal, len)
    val bestScore = new Array[Double](m)
    val bestIdx = new Array[Int](m)
    var filled = 0
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
      if (filled < m || score < bestScore(m - 1)) {
        var pos = math.min(filled, m - 1)
        while (pos > 0 && bestScore(pos - 1) > score) {
          bestScore(pos) = bestScore(pos - 1)
          bestIdx(pos) = bestIdx(pos - 1)
          pos -= 1
        }
        bestScore(pos) = score
        bestIdx(pos) = j
        if (filled < m) filled += 1
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(bestIdx)
  }

  override def nullSafeEval(vec: Any, c: Any, s: Any, l: Any, p: Any): Any =
    topP(vec.asInstanceOf[ArrayData], s.asInstanceOf[Int],
      l.asInstanceOf[Int], elemIsFloat)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val normRef = ctx.addReferenceObj("centNorm2", centNorm2, "double[]")
    val getE = if (elemIsFloat) "getFloat" else "getDouble"
    val p = pVal
    val (m, bs, bi, filled, j, c, n, acc, i, score, pos) =
      (ctx.freshName("m"), ctx.freshName("bs"), ctx.freshName("bi"),
        ctx.freshName("filled"), ctx.freshName("j"), ctx.freshName("c"),
        ctx.freshName("n"), ctx.freshName("acc"), ctx.freshName("i"),
        ctx.freshName("score"), ctx.freshName("pos"))
    nullSafeCodeGen(ctx, ev, (vec, _, start, len, _) =>
      s"""
         |if ($start < 0 || $len < 1 || $start + $len > $centsRef.length) {
         |  throw new IllegalArgumentException("graft_nearest_cells: slice [" +
         |    $start + ", " + ($start + $len) + ") outside the " +
         |    $centsRef.length + "-cell table");
         |}
         |int $m = java.lang.Math.min($p, $len);
         |double[] $bs = new double[$m];
         |int[] $bi = new int[$m];
         |int $filled = 0;
         |for (int $j = $start; $j < $start + $len; $j++) {
         |  double[] $c = $centsRef[$j];
         |  int $n = java.lang.Math.min($c.length, $vec.numElements());
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$vec.isNullAt($i)) $acc += $c[$i] * (double) $vec.$getE($i);
         |  }
         |  double $score = $normRef[$j] - 2.0 * $acc;
         |  if ($filled < $m || $score < $bs[$m - 1]) {
         |    int $pos = java.lang.Math.min($filled, $m - 1);
         |    while ($pos > 0 && $bs[$pos - 1] > $score) {
         |      $bs[$pos] = $bs[$pos - 1];
         |      $bi[$pos] = $bi[$pos - 1];
         |      $pos--;
         |    }
         |    $bs[$pos] = $score;
         |    $bi[$pos] = $j;
         |    if ($filled < $m) $filled++;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($bi);
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(first = newChildren(0), second = newChildren(1),
      third = newChildren(2), fourth = newChildren(3), fifth = newChildren(4))
}

// --------------------------------------------------------------------
// Broadcast-backed (OFF-PLAN) kernel variants
// --------------------------------------------------------------------
//
// The literal kernels above take the centroid table as a foldable
// array<array<double>> child, which means the FULL matrix rides the
// query plan: it is walked by every analyzer/optimizer pass, printed by
// explain, and — because codegen pins it into the references array —
// re-serialized into the task binary of EVERY stage of EVERY query (and
// every streaming micro-batch) that touches it. For the COMMITTED
// tables (domain centroids, PQ codebook, LSH hyperplanes) that payload
// is a fixed constant and the literal transport is fine. For a FITTED
// index the matrix is nlist x dim and nlist grows with the corpus
// (SCALING.md sizing rule: nlist ~ n/250), so at 10^9 vectors the plan
// would carry a multi-GB literal — the same hazard class as the
// collected `isin` (killed r19) and the element_at(typedLit(matrix))
// the IVFADC path already avoids with a broadcast join.
//
// These variants carry the matrices in a `Broadcast` handle CONSTRUCTOR
// FIELD instead of a child: the plan (and the task binary's references
// array) serializes only the handle, executors pull the blocks once per
// executor via the torrent protocol and cache them in the BlockManager
// across stages AND across streaming micro-batches. Math, slice
// semantics, and tie-breaks are IDENTICAL to the literal kernels —
// interpreted and codegen paths share one implementation
// ([[CellKernel]]), spec-pinned equal to the literal twins.

/** Centroid matrix + its precomputed self-dots (c·c), the off-plan
  * payload of the broadcast kernels. Norms are computed ONCE on the
  * driver at broadcast time so executors never redo the O(nlist·dim)
  * pass per task.
  */
final case class CellMatrix(cents: Array[Array[Double]], norm2: Array[Double])
    extends Serializable

object CellMatrix {
  def apply(cents: Array[Array[Double]]): CellMatrix =
    CellMatrix(cents, cents.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    })
}

/** A fitted two-level quantizer's matrices + slice table, off-plan:
  * `top` the kTop coarse cells, `sub` the flat nlist sub-centroid
  * matrix, `offsets`/`counts` each top cell's slice of it — the
  * TwoLevelQuantizer layout, broadcast-shaped.
  */
final case class QuantMatrix(top: CellMatrix, sub: CellMatrix,
    offsets: Array[Int], counts: Array[Int]) extends Serializable

/** The ONE shared inner-loop implementation behind the broadcast
  * kernels — same argmin/top-p math, slice bounds, and strict-<
  * lowest-index tie-breaks as the literal kernels' generated code
  * (GraftProperties pins those against a model; OffPlanKernelSpec pins
  * these bit-equal to the literal twins). Interpreted eval and codegen
  * both call these methods, so the two execution paths cannot drift.
  */
private[graft] object CellKernel {
  def argmin(a: ArrayData, isF: Boolean, m: CellMatrix, start: Int, len: Int): Int = {
    val cents = m.cents
    require(start >= 0 && len >= 1 && start + len <= cents.length,
      s"graft_nearest_cell_bcast: slice [$start, ${start + len}) outside " +
        s"the ${cents.length}-cell table")
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
      val score = m.norm2(j) - 2.0 * acc
      if (score < bestScore) { bestScore = score; best = j }
      j += 1
    }
    best
  }

  def topP(a: ArrayData, isF: Boolean, m: CellMatrix,
      start: Int, len: Int, p: Int): ArrayData = {
    val cents = m.cents
    require(start >= 0 && len >= 1 && start + len <= cents.length,
      s"graft_nearest_cells_bcast: slice [$start, ${start + len}) outside " +
        s"the ${cents.length}-cell table")
    val mSel = math.min(p, len)
    val bestScore = new Array[Double](mSel)
    val bestIdx = new Array[Int](mSel)
    var filled = 0
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
      val score = m.norm2(j) - 2.0 * acc
      if (filled < mSel || score < bestScore(mSel - 1)) {
        var pos = math.min(filled, mSel - 1)
        while (pos > 0 && bestScore(pos - 1) > score) {
          bestScore(pos) = bestScore(pos - 1)
          bestIdx(pos) = bestIdx(pos - 1)
          pos -= 1
        }
        bestScore(pos) = score
        bestIdx(pos) = j
        if (filled < mSel) filled += 1
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(bestIdx)
  }
}

private[functions] trait OffPlanVecExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> vec, got ${t.catalogString}")
  }
  @transient protected lazy val elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
}

/** [[NearestCell]] over the FULL matrix with the table off-plan — the
  * flat fitted-index assignment kernel (ingest, flat builds above the
  * registered fixture sizes).
  */
case class NearestCellOffPlan(child: Expression, mat: Broadcast[CellMatrix])
    extends OffPlanVecExpression {
  override def prettyName: String = "graft_nearest_cell_bcast"
  override def dataType: DataType = IntegerType
  @transient private lazy val m: CellMatrix = mat.value
  def evalCell(a: ArrayData): Int =
    CellKernel.argmin(a, elemIsFloat, m, 0, m.cents.length)
  override def nullSafeEval(vec: Any): Any = evalCell(vec.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCellOffPlan", this,
      classOf[NearestCellOffPlan].getName)
    nullSafeCodeGen(ctx, ev, vec => s"${ev.value} = $ref.evalCell($vec);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[NearestCells]] over the FULL matrix with the table off-plan — the
  * flat fitted-index probe-ranking kernel.
  */
case class NearestCellsOffPlan(child: Expression, mat: Broadcast[CellMatrix],
    p: Int) extends OffPlanVecExpression {
  require(p >= 1, s"$prettyName: p=$p must be >= 1")
  override def prettyName: String = "graft_nearest_cells_bcast"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  @transient private lazy val m: CellMatrix = mat.value
  def evalCells(a: ArrayData): ArrayData =
    CellKernel.topP(a, elemIsFloat, m, 0, m.cents.length, p)
  override def nullSafeEval(vec: Any): Any = evalCells(vec.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCellsOffPlan", this,
      classOf[NearestCellsOffPlan].getName)
    nullSafeCodeGen(ctx, ev, vec => s"${ev.value} = $ref.evalCells($vec);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Two-probe assignment under a fitted [[QuantMatrix]], off-plan: the
  * nearest TOP cell, then the argmin within that cell's slice of the
  * flat sub matrix — Similarity.assignTwoLevel's exact composed
  * semantics (top argmin, slice argmin, lowest-index ties) in ONE
  * expression, so neither level's matrix nor the offsets/counts tables
  * ride the plan.
  */
case class TwoLevelNearestCell(child: Expression, quant: Broadcast[QuantMatrix])
    extends OffPlanVecExpression {
  override def prettyName: String = "graft_two_level_cell_bcast"
  override def dataType: DataType = IntegerType
  @transient private lazy val q: QuantMatrix = quant.value
  def evalCell(a: ArrayData): Int = {
    val t = CellKernel.argmin(a, elemIsFloat, q.top, 0, q.top.cents.length)
    CellKernel.argmin(a, elemIsFloat, q.sub, q.offsets(t), q.counts(t))
  }
  override def nullSafeEval(vec: Any): Any = evalCell(vec.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("twoLevelNearestCell", this,
      classOf[TwoLevelNearestCell].getName)
    nullSafeCodeGen(ctx, ev, vec => s"${ev.value} = $ref.evalCell($vec);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Two-probe TOP-P ranking under a fitted [[QuantMatrix]], off-plan —
  * Similarity.rankProbes' two-level branch in one expression: rank the
  * winning top cell's sub-slice when it can seat the full p budget,
  * SPILL to ranking the whole sub matrix when the slice is undersized
  * (the per-row CASE of the relational spelling, evaluated per row here
  * for the same reason: only the affected rows pay the O(nlist) arm,
  * and the probe budget is never silently truncated).
  */
case class TwoLevelNearestCells(child: Expression,
    quant: Broadcast[QuantMatrix], p: Int) extends OffPlanVecExpression {
  require(p >= 1, s"$prettyName: p=$p must be >= 1")
  override def prettyName: String = "graft_two_level_cells_bcast"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  @transient private lazy val q: QuantMatrix = quant.value
  def evalCells(a: ArrayData): ArrayData = {
    val t = CellKernel.argmin(a, elemIsFloat, q.top, 0, q.top.cents.length)
    if (q.counts(t) >= p)
      CellKernel.topP(a, elemIsFloat, q.sub, q.offsets(t), q.counts(t), p)
    else
      CellKernel.topP(a, elemIsFloat, q.sub, 0, q.sub.cents.length, p)
  }
  override def nullSafeEval(vec: Any): Any = evalCells(vec.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("twoLevelNearestCells", this,
      classOf[TwoLevelNearestCells].getName)
    nullSafeCodeGen(ctx, ev, vec => s"${ev.value} = $ref.evalCells($vec);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column constructors for the off-plan kernels — the one place the
  * [[org.apache.spark.sql.graftshim.ColumnShim]] bridge is used (these
  * expressions carry Broadcast handles, so they cannot go through the
  * FunctionRegistry like the literal kernels).
  */
object OffPlanKernels {
  import org.apache.spark.sql.graftshim.ColumnShim
  def nearestCell(vec: Column, m: Broadcast[CellMatrix]): Column =
    ColumnShim.column(NearestCellOffPlan(ColumnShim.expression(vec), m))
  def nearestCells(vec: Column, m: Broadcast[CellMatrix], p: Int): Column =
    ColumnShim.column(NearestCellsOffPlan(ColumnShim.expression(vec), m, p))
  def twoLevelCell(vec: Column, q: Broadcast[QuantMatrix]): Column =
    ColumnShim.column(TwoLevelNearestCell(ColumnShim.expression(vec), q))
  def twoLevelCells(vec: Column, q: Broadcast[QuantMatrix], p: Int): Column =
    ColumnShim.column(TwoLevelNearestCells(ColumnShim.expression(vec), q, p))
}
