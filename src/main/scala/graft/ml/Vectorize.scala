package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.feature.{CountVectorizer, HashingTF, IDF, Normalizer}
import org.apache.spark.sql.DataFrame

/** Stage 4 of the reference pipeline: TF-IDF + L2 normalization
  * (reference transform/execute.py:239-257; SURVEY.md §2.8 M1-M3).
  *
  * CountVectorizer(minDF=3) → IDF(minDocFreq=3) → Normalizer(p=2).
  * The two `fit`s are the only wide stages (vocabulary and
  * document-frequency aggregations — map-side combined tree
  * aggregations in MLlib); transform is map-only. L2 normalization
  * makes Euclidean LSH distance a monotone proxy for cosine
  * similarity (reference notebook cell 59).
  */
object Vectorize {

  final case class Config(
      minDF: Double = 3.0,
      minDocFreq: Int = 3,
      vocabSize: Int = 1 << 18)

  def pipeline(cfg: Config = Config()): Pipeline = {
    val cv = new CountVectorizer()
      .setInputCol("tags_lemmatized").setOutputCol("raw_features")
      .setMinDF(cfg.minDF).setVocabSize(cfg.vocabSize)
    val idf = new IDF()
      .setInputCol("raw_features").setOutputCol("features")
      .setMinDocFreq(cfg.minDocFreq)
    val norm = new Normalizer()
      .setInputCol("features").setOutputCol("norm_features").setP(2.0)
    new Pipeline().setStages(Array(cv, idf, norm))
  }

  /** Fit + transform, dropping consumed intermediates like the
    * reference (transform/execute.py:255). The input is cached first:
    * CountVectorizer.fit, IDF.fit and the final transform each
    * re-evaluate their input plan, so without the cache the whole
    * upstream text-prep chain runs three times. */
  def apply(df: DataFrame, cfg: Config = Config()): (PipelineModel, DataFrame) = {
    val cached = df.cache()
    val model = pipeline(cfg).fit(cached)
    val out = model.transform(cached).drop("tags", "tags_str", "tags_lemmatized", "features")
    (model, out)
  }

  /** Scale-path twin of [[apply]]: HashingTF keeps the term→index map
    * implicit (a hash), so there is NO driver-materialized vocabulary.
    * CountVectorizer.fit collects the vocab array to the driver — the
    * one non-distributed artifact of the reference pipeline, and the
    * first thing to break at 100 TB corpus vocabulary sizes. This path
    * has one wide stage (IDF's doc-frequency tree aggregation) instead
    * of two. Trade: hash collisions fold terms together (rare at the
    * 2^18 default) and there's no minDF vocabulary pruning — IDF's
    * minDocFreq still zeroes ultra-rare terms' weights. */
  def hashingTfIdf(df: DataFrame, inputCol: String = "tags_lemmatized",
      numFeatures: Int = 1 << 18, minDocFreq: Int = 3): (PipelineModel, DataFrame) = {
    val tf = new HashingTF()
      .setInputCol(inputCol).setOutputCol("raw_features")
      .setNumFeatures(numFeatures)
    val idf = new IDF()
      .setInputCol("raw_features").setOutputCol("features")
      .setMinDocFreq(minDocFreq)
    val norm = new Normalizer()
      .setInputCol("features").setOutputCol("norm_features").setP(2.0)
    val cached = df.cache()
    val model = new Pipeline().setStages(Array(tf, idf, norm)).fit(cached)
    (model, model.transform(cached).drop("raw_features", "features"))
  }
}
