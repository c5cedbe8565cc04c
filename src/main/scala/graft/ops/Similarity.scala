package graft.ops

import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, BucketedRandomProjectionLSHModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Similarity search over embedding columns (`array<float>`).
  *
  * All scalar math is Catalyst higher-order functions (zip_with /
  * aggregate) in double precision — codegen'd, no UDFs, map-only.
  * Two search paths:
  *   - [[bruteForceKnn]]: exact cosine top-k via TakeOrderedAndProject —
  *     O(n·d) scan, the correctness baseline; still the right choice
  *     when the query set is tiny (one broadcastable vector).
  *   - [[fitLsh]]/[[lshKnn]]: BucketedRandomProjectionLSH — at 100 TB
  *     the scan cost dominates, so candidate pruning via hash buckets
  *     turns full scans into bucket lookups (the IVF-style scale path).
  */
object Similarity {

  /** Σ aᵢ·bᵢ as double — sequential left fold, deterministic. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Exact top-k by cosine against one query vector. Emits
    * (rank, vec_id, cosine); the plan is scan → project → top-k, no
    * shuffle beyond the final k-row ordered take. */
  def bruteForceKnn(embeddings: DataFrame, queryVec: Seq[Double], k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = typedLit(queryVec)
    embeddings
      .withColumn("cosine", cosine(col(vecCol), q))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cosine").desc, col(idCol))))
      .select("rank", idCol, "cosine")
  }

  /** Seeded Euclidean LSH index over an array<float> column (vectors
    * are converted with ml.functions.array_to_vector, no UDF). */
  def fitLsh(embeddings: DataFrame, vecCol: String = "embedding",
      bucketLength: Double = 2.0, numHashTables: Int = 8,
      seed: Long = 42L): (DataFrame, BucketedRandomProjectionLSHModel) = {
    val withVec = embeddings.withColumn("vec", array_to_vector(col(vecCol)))
    val model = new BucketedRandomProjectionLSH()
      .setInputCol("vec").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setSeed(seed)
      .fit(withVec)
    (withVec, model)
  }

  /** ANN via LSH bucket pruning: neighbors of the vector with the given
    * id. Falls back to wider scans only when buckets are under-full
    * (MLlib semantics). */
  def lshKnn(embeddings: DataFrame, model: BucketedRandomProjectionLSHModel,
      id: Long, k: Int, idCol: String = "vec_id"): DataFrame = {
    val row = embeddings.filter(col(idCol) === id).select("vec").limit(1).collect()
    require(row.nonEmpty, s"no vector with $idCol=$id")
    val key = row.head.getAs[org.apache.spark.ml.linalg.Vector](0)
    model.approxNearestNeighbors(embeddings, key, k + 1).toDF()
      .filter(col(idCol) =!= id)
      .select(col(idCol), col("distCol").as("distance"))
      .orderBy("distance", idCol)
      .limit(k)
  }
}
