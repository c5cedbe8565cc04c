package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.ops.{BloomContainsExpr, DotExpr, MisraGriesAgg, SimHashExpr, SqDistExpr, TopKAgg, ZOrderExpr}
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
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotExpr].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotExpr(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_zorder"),
      new ExpressionInfo(classOf[ZOrderExpr].getName, "graft_zorder"),
      (exprs: Seq[Expression]) => ZOrderExpr(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_sqdist"),
      new ExpressionInfo(classOf[SqDistExpr].getName, "graft_sqdist"),
      (exprs: Seq[Expression]) => SqDistExpr(exprs(0), exprs(1))))
    // aggregate: graft_top_k(ord, id, k[, largest]) — bounded-heap
    // per-group top-k; k (and largest) must be literals
    e.injectFunction((
      FunctionIdentifier("graft_top_k"),
      new ExpressionInfo(classOf[TopKAgg].getName, "graft_top_k"),
      (exprs: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
        import org.apache.spark.sql.types.{DoubleType, LongType}
        val k = exprs(2) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_top_k: k must be an integer literal, got $other")
        }
        val largest = exprs.lift(3) match {
          case None                          => true
          case Some(Literal(b: Boolean, _))  => b
          case Some(other) => throw new IllegalArgumentException(
            s"graft_top_k: largest must be a boolean literal, got $other")
        }
        TopKAgg(Cast(exprs(0), DoubleType), Cast(exprs(1), LongType), k, largest)
      }))
    // graft_bloom_contains(bloom_blob, hash) — probe a BloomAgg blob
    // (the blob is self-describing, so SQL callers can't misconfigure
    // the probe side)
    e.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomContainsExpr].getName, "graft_bloom_contains"),
      (exprs: Seq[Expression]) => BloomContainsExpr(exprs(0), exprs(1))))
    // aggregate: graft_frequent_items(token, k) — Misra-Gries candidate
    // set (≤ k tokens); k must be a literal. Candidates, not counts:
    // recount exactly before trusting (see HeavyHitters.exact).
    e.injectFunction((
      FunctionIdentifier("graft_frequent_items"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "graft_frequent_items"),
      (exprs: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        val k = exprs(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_frequent_items: k must be an integer literal, got $other")
        }
        MisraGriesAgg(exprs.head, k)
      }))
    // Rewrites naive point-in-interval inequality joins (which Spark
    // plans as BroadcastNestedLoopJoin) into bucketized equi-joins;
    // no-op until spark.graft.rangeJoin.bucketWidth is set.
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRule())
  }
}
