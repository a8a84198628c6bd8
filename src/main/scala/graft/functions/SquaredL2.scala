package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext
import org.apache.spark.sql.catalyst.expressions.Expression

/** Native fused squared-L2 distance over two numeric-array columns — the
  * target of [[RewriteDotProduct]]'s squared-difference case, which
  * rewrites the built-in composition
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), 0.0,
  *               (acc, v) => acc + v) }}}
  *
  * into this expression. This is the hot loop of the PQ/ADC serving
  * path (subspace sub-distances, coarse cell assignment): higher-order
  * functions evaluate their lambdas interpreted per element, so at
  * 100 TB the distance math would dominate the scan — the fused loop
  * runs inside codegen like any arithmetic.
  *
  * Numeric/NULL contract is IDENTICAL to the composition (the rewrite
  * is invisible to results and to the DuckDB oracles) and lives in the
  * shared [[ArrayPairFold]] scaffold; this class supplies only the
  * per-element `(x - y)²`.
  */
case class SquaredL2(left: Expression, right: Expression)
    extends ArrayPairFold {

  override def prettyName: String = "squared_l2"

  override protected def combine(x: Double, y: Double): Double = {
    val d = x - y
    d * d
  }

  override protected def genCombine(
      ctx: CodegenContext, acc: String, x: String, y: String): String = {
    val d = ctx.freshName("d")
    s"""final double $d = $x - $y;
       |    $acc += $d * $d;""".stripMargin
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredL2 =
    copy(left = newLeft, right = newRight)
}
