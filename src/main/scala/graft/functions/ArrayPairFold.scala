package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.BinaryExpression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Shared scaffold for the fused element-wise folds over two
  * numeric-array columns ([[DotProduct]], [[SquaredL2]]) — subclasses
  * supply ONLY the per-element contribution (interpreted and generated
  * forms). The pinned numeric/NULL contract lives here exactly once:
  *
  *  - elements widened to double, contributions accumulated LEFT TO
  *    RIGHT from 0.0 (IEEE addition is order-sensitive; the order is
  *    part of the contract);
  *  - unequal lengths → NULL (zip_with pads the shorter side with null,
  *    which nulls the whole fold);
  *  - any null element → NULL.
  *
  * This is the contract [[RewriteDotProduct]] assumes interchangeable
  * with the `aggregate(zip_with(...))` composition it rewrites — it
  * used to live in two line-for-line copies, where a fix to the length
  * or null handling applied to one file would silently fork the
  * semantics the rewrite depends on.
  */
abstract class ArrayPairFold extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Interpreted per-element contribution (added to the accumulator). */
  protected def combine(x: Double, y: Double): Double

  /** Generated statement(s) adding the contribution of double-typed
    * expressions `x`/`y` to local `acc`; `ctx` for fresh local names. */
  protected def genCombine(ctx: CodegenContext, acc: String, x: String, y: String): String

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      e.dataType match {
        case ArrayType(FloatType | DoubleType, _) => true
        case _                                    => false
      }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double> inputs, " +
        s"got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  // element flavor resolved ONCE (post-analysis, first use), not via a
  // DataType pattern match per element per row on the interpreted path
  @transient private lazy val leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (leftIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightIsFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += combine(x, y)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def getter(arr: String, isFloat: Boolean): String =
        if (isFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    ${genCombine(ctx, acc, s"(${getter(a, leftIsFloat)})", s"(${getter(b, rightIsFloat)})")}
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })
}
