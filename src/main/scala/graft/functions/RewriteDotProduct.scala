package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: fuse the built-in fold-over-zip compositions
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, v) => acc + v) }}}
  * {{{ aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), 0.0,
  *               (acc, v) => acc + v) }}}
  *
  * into the native [[DotProduct]] / [[SquaredL2]] expressions. The
  * compositions are the public surface (`SimilarityQueries.cosine`,
  * `lshBucket`, the PQ/ADC distance fragments, and any SQL user writing
  * the same idiom); the rewrite removes the per-element interpreted
  * lambda calls and the materialized zipped array while preserving the
  * numeric contract exactly — same left-to-right fold from 0.0, same
  * NULL semantics — so it is invisible to results (the DuckDB oracle
  * gate runs with the rule active and still hash-matches).
  *
  * Deliberately conservative: anything that doesn't match the exact
  * shape (casts to double around the lambda variables are allowed on
  * either side) is left untouched. Registered via
  * `SparkSessionExtensions.injectOptimizerRule`
  * ([[graft.GraftSparkExtensions]]).
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def stripDoubleCast(e: Expression): Expression = e match {
    case c: Cast if c.dataType == DoubleType => stripDoubleCast(c.child)
    case other                               => other
  }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _                       => false
  }

  private def isFloatingArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _                                    => false
  }

  /** Both multiply operands are the SAME `x - y` subtraction (modulo
    * widening casts ON THE VARIABLES): the squared-difference zip
    * lambda. Requiring the same orientation on both factors keeps the
    * match trivially value-exact (and `(y-x)*(y-x)` matches via the
    * reversed case). The Subtract itself must already be double-typed —
    * a cast AROUND a float subtraction (`cast(x - y as double)`) rounds
    * the difference to float first, which SquaredL2's widen-then-
    * subtract would silently change; that shape is left unfused. */
  private def isSqDiff(mul: Multiply, x: NamedLambdaVariable,
      y: NamedLambdaVariable): Boolean = {
    def sub(e: Expression): Option[(Expression, Expression)] = e match {
      case s: Subtract if s.dataType == DoubleType =>
        Some((stripDoubleCast(s.left), stripDoubleCast(s.right)))
      case _ => None
    }
    (sub(mul.left), sub(mul.right)) match {
      case (Some((l1, r1)), Some((l2, r2))) =>
        (isVar(l1, x) && isVar(r1, y) && isVar(l2, x) && isVar(r2, y)) ||
        (isVar(l1, y) && isVar(r1, x) && isVar(l2, y) && isVar(r2, x))
      case _ => false
    }
  }

  /** The fold-over-zip scaffold: `aggregate(zip_with(a, b, λ), 0.0, +)`
    * with an identity finish — returns (a, b, zip lambda) when the
    * scaffold matches, leaving only the zip lambda's shape to decide
    * which native expression to emit. */
  private object FoldOverZip {
    def unapply(e: Expression): Option[(Expression, Expression, Multiply,
        NamedLambdaVariable, NamedLambdaVariable)] = e match {
      case ArrayAggregate(
            ZipWith(l, r,
              LambdaFunction(mul: Multiply,
                Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(zero, DoubleType),
            LambdaFunction(add: Add,
              Seq(acc: NamedLambdaVariable, elem: NamedLambdaVariable), _),
            LambdaFunction(finish, Seq(facc: NamedLambdaVariable), _))
          // raw-bits +0.0 only: Scala's numeric == also matches -0.0,
          // but the native loops seed their accumulator at +0.0, so
          // fusing a -0.0-seeded fold would flip the sign of a zero
          // result (e.g. empty arrays) — visible to the value-hashing
          // oracle gate, breaking the "invisible to results" contract
          if zero != null &&
            java.lang.Double.doubleToRawLongBits(
              zero.asInstanceOf[Double]) == 0L &&
            ((isVar(add.left, acc) && isVar(add.right, elem)) ||
             (isVar(add.left, elem) && isVar(add.right, acc))) &&
            isVar(finish, facc) &&
            isFloatingArray(l) && isFloatingArray(r) =>
        Some((l, r, mul, x, y))
      case _ => None
    }
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case FoldOverZip(l, r, mul, x, y) if isSqDiff(mul, x, y) =>
      SquaredL2(l, r)
    case FoldOverZip(l, r, mul, x, y)
        if (isVar(stripDoubleCast(mul.left), x) && isVar(stripDoubleCast(mul.right), y)) ||
           (isVar(stripDoubleCast(mul.left), y) && isVar(stripDoubleCast(mul.right), x)) =>
      DotProduct(l, r)
  }
}
