package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.ml.Implicit

class ImplicitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("interactions aggregate events into user-item strengths") {
    val inter = Implicit.interactions(Tables.events(spark, "/root/testdata/sf0.001"))
    assert(inter.count() > 0)
    assert(inter.columns.toSeq === Seq("user_id", "item_id", "strength"))
    assert(inter.filter(col("strength") < 0).count() === 0L)
    // no duplicate pairs after aggregation
    assert(inter.groupBy("user_id", "item_id").count()
      .filter(col("count") > 1).count() === 0L)
  }

  test("ALS recovers planted block structure in synthetic interactions") {
    // users 0-9 interact strongly with items 0-4; users 10-19 with 5-9
    val rows = for {
      u <- 0 until 20
      i <- 0 until 10
      strength = if ((u < 10) == (i < 5)) 10.0 else 0.0
      if strength > 0
    } yield (u, i, strength)
    val inter = rows.toDF("user_id", "item_id", "strength")
    val model = Implicit.fit(inter, rank = 4, maxIter = 10)
    val recs = Implicit.recommendForAllUsers(model, 3)
    // every user's top-3 must come from their own block
    val wrong = recs.filter(
      (col("user_id") < 10 && col("item_id") >= 5) ||
        (col("user_id") >= 10 && col("item_id") < 5)).count()
    assert(wrong === 0L, "recommendations must stay within the planted block")
    assert(recs.groupBy("user_id").count().filter(col("count") =!= 3).count() === 0L)
  }
  test("ALS approaches the exact rank-2 solution on a 2x2 identity system") {
    // preference matrix = I is exactly representable at rank 2, so with
    // near-zero regularization the implicit-ALS global optimum is an
    // exact fit: predictions ~1 on the observed diagonal, ~0 off it.
    // This checks the solver against the known optimum, not just
    // structure recovery.
    val inter = Seq((0, 0, 5.0), (1, 1, 5.0)).toDF("user_id", "item_id", "strength")
    val model = Implicit.fit(inter, rank = 2, maxIter = 15,
      regParam = 1e-3, alpha = 40.0)
    val all = Seq((0, 0), (0, 1), (1, 0), (1, 1)).toDF("user_id", "item_id")
    val preds = model.transform(all)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getFloat(2).toDouble).toMap
    assert(math.abs(preds((0, 0)) - 1.0) < 0.05, s"diag: $preds")
    assert(math.abs(preds((1, 1)) - 1.0) < 0.05, s"diag: $preds")
    assert(math.abs(preds((0, 1))) < 0.05, s"offdiag: $preds")
    assert(math.abs(preds((1, 0))) < 0.05, s"offdiag: $preds")
  }
}
