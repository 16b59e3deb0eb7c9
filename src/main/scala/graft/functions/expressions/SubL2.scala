package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Squared L2 distance between a `len`-dim window of two float vectors —
  * `Σ (a[aOff+i] - b[bOff+i])²` for i in 0..len-1 (offsets 0-based),
  * accumulated LEFT-TO-RIGHT in double: bit-identical to the unrolled
  * Column chain
  * `((a₁-b₁)² + (a₂-b₂)²) + …` built from `element_at(..).cast(double)`
  * terms (equivalence-pinned in ExpressionSpec) and to the oracle's
  * identical term-chain SQL, so every ADC/encode distance hashes the
  * same in any engine.
  *
  * Why a native expression (SURVEY.md §7.6 escalation rule, the
  * [[VecDot]] precedent): PQ encode/ADC plans instantiate this window
  * per SUBSPACE — m=8 distance columns of dsub=8 unrolled terms each,
  * and the subspace-dispatched variants multiply that by an m-branch
  * CASE — so a single trained-IVF-PQ query carried thousands of Catalyst
  * nodes through analysis, optimization, and Janino for what is a
  * 3-instruction loop body. The kernel collapses each distance column to
  * ONE node with runtime offsets (the m-branch CASE dissolves into
  * `sub·dsub` arithmetic), shrinking plan size, generated-code size, and
  * compile time across the whole ANN family while keeping the arithmetic
  * inside whole-stage codegen.
  *
  * Null semantics mirror the composed chain: NULL if either array is
  * NULL, any offset/len input is NULL, or any ACCESSED element slot is
  * NULL. A window reaching beyond either array's length yields NULL
  * (the composed chain's `element_at` would raise under ANSI instead —
  * unreachable by construction: every caller derives offsets from the
  * vector's own m·dsub geometry; the total variant is safer under
  * speculative/reordered evaluation).
  */
object SubL2 {
  /** Boxed so a null element can yield null (the [[VecDot.dotOrNull]]
    * convention); JIT-scalarized in the hot loop. */
  def l2OrNull(a: ArrayData, b: ArrayData, aOff: Int, bOff: Int,
      len: Int): java.lang.Double = {
    // Long-widened bounds: sub_l2 is registered session-wide, so hostile
    // SQL offsets near Int.MaxValue must not wrap the sum negative and
    // slip past the guard into unchecked UnsafeArrayData reads.
    if (aOff < 0 || bOff < 0 || len < 0 ||
      aOff.toLong + len > a.numElements() || bOff.toLong + len > b.numElements()) return null
    var i = 0; var acc = 0.0
    while (i < len) {
      if (a.isNullAt(aOff + i) || b.isNullAt(bOff + i)) return null
      val d = a.getFloat(aOff + i).toDouble - b.getFloat(bOff + i).toDouble
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

case class SubL2Expr(children: Seq[Expression]) extends Expression {

  private def a = children(0)
  private def b = children(1)

  override def checkInputDataTypes(): TypeCheckResult =
    (a.dataType, b.dataType, children.drop(2).map(_.dataType)) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _),
        Seq(IntegerType, IntegerType, IntegerType)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "sub_l2 requires (array<float>, array<float>, int aOff, int bOff, int len), " +
          s"got ${children.map(_.dataType).mkString(", ")}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sub_l2"
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) null
    else SubL2.l2OrNull(
      vals(0).asInstanceOf[ArrayData], vals(1).asInstanceOf[ArrayData],
      vals(2).asInstanceOf[Int], vals(3).asInstanceOf[Int],
      vals(4).asInstanceOf[Int])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val boxed = ctx.freshName("subL2")
    val anyNull = evals.map(_.isNull).mkString(" || ")
    ev.copy(code = code"""
      ${evals.map(_.code).reduce(_ + _)}
      boolean ${ev.isNull} = true;
      double ${ev.value} = -1.0;
      if (!($anyNull)) {
        java.lang.Double $boxed = graft.functions.expressions.SubL2.l2OrNull(
          ${evals(0).value}, ${evals(1).value},
          ${evals(2).value}, ${evals(3).value}, ${evals(4).value});
        if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.doubleValue(); }
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SubL2Expr =
    copy(children = newChildren)
}
