package graft.ml

import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType, IntegerType}

/** Collaborative filtering over implicit feedback (the north star's
  * "potential MLlib collaborative filtering" capability): ALS on
  * (user, item, strength) triples derived from the events stream.
  *
  * Scale notes: ALS is the blocked alternating least squares of MLlib
  * — factor matrices are partitioned by user/item block, each
  * iteration is two block-joins; `setNumBlocks` tracks cluster
  * parallelism. Results are seeded but, like any float iterative
  * solver, not bit-stable across different partitionings — so this
  * ships as a library API with property specs, not an oracle query.
  */
object Implicit {

  /** events → (user_id, item_id, strength): the JSON props "k" field
    * acts as the item catalog; strength aggregates per-pair value. */
  def interactions(events: DataFrame): DataFrame =
    events
      .withColumn("item_id",
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast(IntegerType))
      .groupBy(col("user_id").cast(IntegerType).as("user_id"), col("item_id"))
      .agg(sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("strength"))

  def fit(interactions: DataFrame, rank: Int = 8, maxIter: Int = 8,
      regParam: Double = 0.1, alpha: Double = 1.0, seed: Long = 42L): ALSModel =
    new ALS()
      .setUserCol("user_id").setItemCol("item_id").setRatingCol("strength")
      .setImplicitPrefs(true)
      .setRank(rank).setMaxIter(maxIter).setRegParam(regParam).setAlpha(alpha)
      .setSeed(seed)
      .setColdStartStrategy("drop")
      .fit(interactions)

  /** Top-k item recommendations per user: (user_id, item_id, score, rk). */
  def recommendForAllUsers(model: ALSModel, k: Int): DataFrame =
    model.recommendForAllUsers(k)
      .select(col("user_id"), posexplode(col("recommendations")).as(Seq("pos", "rec")))
      .select(col("user_id"), col("rec.item_id"),
        col("rec.rating").cast(FloatType).as("score"),
        (col("pos") + 1).as("rk"))
}
