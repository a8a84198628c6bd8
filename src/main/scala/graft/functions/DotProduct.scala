package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext
import org.apache.spark.sql.catalyst.expressions.Expression

/** Native fused dot product over two numeric-array columns — the target
  * of [[RewriteDotProduct]], which rewrites the built-in composition
  * `aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, v) => acc + v)`
  * into this expression.
  *
  * Numeric/NULL contract is IDENTICAL to that composition (so the
  * optimizer rewrite is invisible to results and to the DuckDB oracles)
  * and lives in the shared [[ArrayPairFold]] scaffold; this class
  * supplies only the per-element `x * y`.
  */
case class DotProduct(left: Expression, right: Expression)
    extends ArrayPairFold {

  override def prettyName: String = "dot_product"

  override protected def combine(x: Double, y: Double): Double = x * y

  override protected def genCombine(
      ctx: CodegenContext, acc: String, x: String, y: String): String =
    s"$acc += $x * $y;"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
