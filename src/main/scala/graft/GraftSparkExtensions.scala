package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSim, RewriteDotProduct}

/** Engine extension point — install with
  * `.config("spark.sql.extensions", "graft.GraftSparkExtensions")` (done
  * by `graft.Verify`, `graft.Bench`, and the test base). Registers the
  * engine's native Catalyst expressions in the session function registry
  * (so they resolve from SQL text and `call_function` alike) and the
  * [[RewriteDotProduct]] optimizer rule that fuses the public
  * `aggregate(zip_with(...))` dot-product and squared-difference idioms
  * into the native [[graft.functions.DotProduct]] /
  * [[graft.functions.SquaredL2]] loops.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_sim expects exactly 2 arguments")
        CosineSim(args.head, args(1))
      }))
    ext.injectOptimizerRule(_ => RewriteDotProduct)
  }
}
