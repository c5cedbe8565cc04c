package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.ops.SimHashExpr
import graft.text.LemmatizeExpr

/** Session-extension entry point: registers the engine's native
  * Catalyst expressions as SQL functions at session build time, so a
  * deployment can enable them cluster-wide with
  * `spark.sql.extensions=graft.engine.GraftExtensions` (no per-session
  * registry calls needed).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_lemmatize"),
      new ExpressionInfo(classOf[LemmatizeExpr].getName, "graft_lemmatize"),
      (exprs: Seq[Expression]) => LemmatizeExpr(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashExpr].getName, "graft_simhash"),
      (exprs: Seq[Expression]) => SimHashExpr(exprs.head)))
    // Rewrites naive point-in-interval inequality joins (which Spark
    // plans as BroadcastNestedLoopJoin) into bucketized equi-joins;
    // no-op until spark.graft.rangeJoin.bucketWidth is set.
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRule())
  }
}
