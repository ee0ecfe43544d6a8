package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{MinHashSigExpr, SimHash64Expr}
import graft.plans.TopOneWindowToMaxBy

/** Session extensions: register the native expressions as SQL functions and
  * install the latest-state optimizer rule. Enable with
  * `spark.sql.extensions=graft.GraftExtensions` at session build, or
  * per-session via `spark.experimental.extraOptimizations`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => TopOneWindowToMaxBy)
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64Expr].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64Expr(args.head)))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "minhash_sig"),
      (args: Seq[Expression]) => args match {
        case Seq(c, Literal(k: Int, _)) => MinHashSigExpr(c, k)
        case _ => throw new IllegalArgumentException("minhash_sig(arr, k-literal)")
      }))
  }
}
