package graft.ml

import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, BucketedRandomProjectionLSHModel}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage 5 + query side of the reference pipeline: LSH ANN index and
  * the flagship `get_recommendations` query (reference
  * transform/execute.py:260-270 and notebook cell 73; SURVEY.md §2.8
  * M4, Q1-Q3, §3.2).
  *
  * Unlike the reference we always set a seed (SURVEY.md §7.4 risk 2):
  * hyperplanes are drawn once on the driver and broadcast, so a fixed
  * seed makes results reproducible across runs and cluster sizes.
  */
object Recommender {

  final case class Config(
      bucketLength: Double = 1.95,
      numHashTables: Int = 14,
      seed: Long = 42L,
      inputCol: String = "norm_features")

  def fit(df: DataFrame, cfg: Config = Config()): BucketedRandomProjectionLSHModel =
    new BucketedRandomProjectionLSH()
      .setInputCol(cfg.inputCol).setOutputCol("hashes")
      .setBucketLength(cfg.bucketLength)
      .setNumHashTables(cfg.numHashTables)
      .setSeed(cfg.seed)
      .fit(df)

  /** Q1: point lookup of the query vector by id. Returns None when the
    * id is absent (reference notebook cell 73 returns []). */
  def lookupVector(df: DataFrame, idCol: String, id: Long,
      vecCol: String = "norm_features"): Option[Vector] =
    df.filter(col(idCol) === id).select(vecCol).limit(1)
      .collect().headOption.map(_.getAs[Vector](0))

  /** Q2+Q3: k+1 approximate nearest neighbors, excluding the query id.
    * Hash-bucket candidate pruning → exact distance → top-k
    * (TakeOrderedAndProject), so the sort is bounded regardless of
    * data size. */
  def neighbors(model: BucketedRandomProjectionLSHModel, df: DataFrame,
      idCol: String, id: Long, topK: Int): DataFrame =
    lookupVector(df, idCol, id) match {
      case None => df.sparkSession.emptyDataFrame
      case Some(vec) =>
        model.approxNearestNeighbors(df, vec, topK + 1).toDF()
          .filter(col(idCol) =!= id)
          .select(col(idCol), col("distCol").as("distance"))
          .limit(topK)
    }

  /** Driver-side convenience identical to the reference's return shape. */
  def recommend(model: BucketedRandomProjectionLSHModel, df: DataFrame,
      idCol: String, id: Long, topK: Int = 5): Seq[Long] =
    neighbors(model, df, idCol, id, topK) match {
      case e if e.schema.isEmpty => Seq.empty
      case n => n.select(col(idCol).cast("long")).collect().map(_.getLong(0)).toSeq
    }

  def save(model: BucketedRandomProjectionLSHModel, path: String): Unit =
    model.write.overwrite().save(path)

  def load(path: String): BucketedRandomProjectionLSHModel =
    BucketedRandomProjectionLSHModel.load(path)
}
