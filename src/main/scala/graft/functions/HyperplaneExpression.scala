package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Deterministic random-hyperplane matrix shared by the Scala planner
  * side and the native expression — one splitmix64 stream, so bucket
  * keys are reproducible across sessions and match the original
  * folded-literal formulation bit-for-bit (seed stride fixed at 64, the
  * embedding dimensionality of the fixture corpus).
  */
object Hyperplanes {
  private def splitmix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** numPlanes × dims matrix of components uniform in [-0.5, 0.5). */
  def planes(numPlanes: Int, dims: Int = 64): Array[Array[Double]] =
    Array.tabulate(numPlanes, dims) { (p, i) =>
      (java.lang.Math.floorMod(splitmix(p.toLong * 64 + i), 1000003L).toDouble / 1000003.0) - 0.5
    }
}

/** graft_hyperplane_buckets(vec, tables, bits) — ALL of a vector's LSH
  * bucket keys in one expression: `tables` longs, key t packing the
  * sign bits of the dots against planes [t·bits, (t+1)·bits).
  *
  * Why an expression and not `tables × bits` folded-literal graft_dot
  * columns (the first formulation): 128 inlined 64-step dot loops put
  * the generated stage method past HotSpot's JIT bytecode threshold, so
  * the whole projection ran INTERPRETED bytecode — measured ~2.3 s for
  * 2k vectors where the arithmetic is ~16M flops (a cliff appears going
  * from 32 to 64 inline dots; see Similarity.lshBuckets). Here the same
  * arithmetic is one compact nested loop over a referenced double[][] —
  * a few hundred bytecodes that JIT happily compiles — and the plane
  * matrix is built once per expression instance, not folded into the
  * plan as 8 KB of literal tree.
  *
  * Dot semantics match graft_dot exactly (sequential fold over the
  * shared prefix, null elements skipped), so bucket keys are unchanged
  * from the folded-literal formulation (pinned in VectorExpressionsSpec).
  */
case class HyperplaneBuckets(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def prettyName: String = "graft_hyperplane_buckets"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def elemIsFloat: Boolean =
    first.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def foldedInt(e: Expression): Option[Int] =
    if (e.foldable) Option(e.eval(null)).map(_.asInstanceOf[Int]) else None

  override def checkInputDataTypes(): TypeCheckResult = first.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      (second.dataType, third.dataType) match {
        case (IntegerType, IntegerType) =>
          (foldedInt(second), foldedInt(third)) match {
            case (Some(t), Some(b)) if t >= 1 && t <= 64 && b >= 1 && b <= 62 =>
              TypeCheckResult.TypeCheckSuccess
            case (Some(t), Some(b)) => TypeCheckResult.TypeCheckFailure(
              s"$prettyName: need 1 <= tables <= 64 and 1 <= bits <= 62, got ($t, $b)")
            case _ => TypeCheckResult.TypeCheckFailure(
              s"$prettyName: tables and bits must be foldable non-null INT literals")
          }
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName: tables and bits must be INT")
      }
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> vec, got ${t.catalogString}")
  }

  private lazy val tables: Int = foldedInt(second).get
  private lazy val bits: Int = foldedInt(third).get
  @transient private lazy val planes: Array[Array[Double]] =
    Hyperplanes.planes(tables * bits)

  override def nullSafeEval(vec: Any, t: Any, b: Any): Any = {
    val a = vec.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    val keys = new Array[Long](tables)
    var ti = 0
    while (ti < tables) {
      var key = 0L
      var bi = 0
      while (bi < bits) {
        val p = planes(ti * bits + bi)
        val n = math.min(p.length, a.numElements())
        var acc = 0.0
        var i = 0
        while (i < n) {
          if (!a.isNullAt(i)) acc += p(i) * (if (isF) a.getFloat(i).toDouble else a.getDouble(i))
          i += 1
        }
        if (acc > 0) key |= 1L << bi
        bi += 1
      }
      keys(ti) = key
      ti += 1
    }
    new GenericArrayData(keys)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    val getE = if (elemIsFloat) "getFloat" else "getDouble"
    val (keys, t, b, p, n, acc, i) = (ctx.freshName("keys"), ctx.freshName("t"),
      ctx.freshName("b"), ctx.freshName("p"), ctx.freshName("n"),
      ctx.freshName("acc"), ctx.freshName("i"))
    nullSafeCodeGen(ctx, ev, (vec, _, _) =>
      s"""
         |long[] $keys = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long ${keys}_k = 0L;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    double[] $p = $planesRef[$t * $bits + $b];
         |    int $n = java.lang.Math.min($p.length, $vec.numElements());
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      if (!$vec.isNullAt($i)) $acc += $p[$i] * (double) $vec.$getE($i);
         |    }
         |    if ($acc > 0) ${keys}_k |= 1L << $b;
         |  }
         |  $keys[$t] = ${keys}_k;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}
