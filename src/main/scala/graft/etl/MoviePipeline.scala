package graft.etl

import org.apache.spark.ml.feature.BucketedRandomProjectionLSHModel
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.ml.{Recommender, Vectorize}
import graft.text.TextPrep

/** End-to-end reference pipeline: CSV → clean → featurize → NLP →
  * TF-IDF → LSH → staged parquet (reference transform/execute.py
  * entry point, SURVEY.md §3.1).
  */
object MoviePipeline {

  final case class Result(
      movies: DataFrame,
      lshModel: BucketedRandomProjectionLSHModel)

  /** CSV scan with the reference's exact option set (S3, reference
    * transform/execute.py:48-57). `multiLine` disables input splits —
    * at scale prefer the explicit-schema path + pre-split files, so
    * schema inference (a full extra pass) is opt-in. */
  def readCsv(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val base = spark.read
      .option("header", true)
      .option("quote", "\"")
      .option("escape", "\"")
      .option("multiLine", true)
      .option("ignoreLeadingWhiteSpace", true)
      .option("ignoreTrailingWhiteSpace", true)
    schema match {
      case Some(s) => base.schema(s).csv(path)
      case None    => base.option("inferSchema", true).csv(path)
    }
  }

  /** clean → featurize → text-prep → TF-IDF+normalize → LSH fit. */
  def run(spark: SparkSession, raw: DataFrame,
      vectorizeCfg: Vectorize.Config = Vectorize.Config(),
      lshCfg: Recommender.Config = Recommender.Config()): Result = {
    val cleaned = MovieClean.clean(raw)
    val featured = MovieFeatures.featurize(cleaned)
    val prepped = TextPrep.prepare(spark, featured)
    val (_, vectorized) = Vectorize(prepped, vectorizeCfg)
    val model = Recommender.fit(vectorized, lshCfg)
    Result(vectorized, model)
  }

  /** Staged sinks (S4/S5, reference transform/execute.py:273-298). */
  def save(result: Result, outputDir: String): Unit = {
    val df = result.movies
    df.select("id", "title", "poster_path", "release_year")
      .write.mode(SaveMode.Overwrite).parquet(s"$outputDir/stage1/movie_metadata")
    Recommender.save(result.lshModel, s"$outputDir/stage2/lsh_model")
    df.select("id", "title", "poster_path", "revenue", "budget",
        "release_year", "genres_list")
      .write.mode(SaveMode.Overwrite).parquet(s"$outputDir/stage3/master_table")
    df.select("id", "norm_features")
      .write.mode(SaveMode.Overwrite).parquet(s"$outputDir/stage4/vector")
  }
}
