package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{DataQuality, MovieClean, MovieFeatures, MoviePipeline}
import graft.ml.{Recommender, Vectorize}
import graft.text.TextPrep

class MoviePipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val tmp = Files.createTempDirectory("graft-movie")
  private lazy val csvPath = MovieFixture.write(tmp)
  private lazy val raw = MoviePipeline.readCsv(spark, csvPath)

  test("CSV scan handles multiline, quoted commas, whitespace trim, inferSchema") {
    assert(raw.columns.length === 16)
    val multi = raw.filter(col("id") === 98).collect()
    assert(multi.length === 1)
    assert(multi.head.getAs[String]("title") === "Multiline Movie")
    assert(multi.head.getAs[String]("overview").contains("second line"))
  }

  test("explicit-schema CSV path skips inference and agrees with inferSchema") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("title", StringType),
      StructField("revenue", LongType), StructField("budget", IntegerType),
      StructField("overview", StringType), StructField("poster_path", StringType),
      StructField("production_companies", StringType),
      StructField("release_year", DoubleType), StructField("Director", StringType),
      StructField("Star1", StringType), StructField("Star2", StringType),
      StructField("Star3", StringType), StructField("genres_list", StringType),
      StructField("all_combined_keywords", StringType),
      StructField("extra_col_a", StringType), StructField("extra_col_b", StringType)))
    val explicit = MoviePipeline.readCsv(spark, csvPath, Some(schema))
    assert(explicit.schema === schema)
    assert(explicit.count() === raw.count())
    assert(MovieClean.clean(explicit).count() === MovieFixture.expectedAfterClean)
  }

  test("clean: projection, cast, dedup, null-drop, []-filter, sentinel fill") {
    val cleaned = MovieClean.clean(raw)
    assert(cleaned.columns.toSeq === MovieClean.keepColumns)
    assert(cleaned.schema("release_year").dataType.typeName === "integer")
    assert(cleaned.count() === MovieFixture.expectedAfterClean)
    // duplicate id collapsed
    assert(cleaned.filter(col("id") === 671).count() === 1)
    // sentinel fill: row 97 has "a" in companies and stars
    val sent = cleaned.filter(col("id") === 97).collect().head
    assert(sent.getAs[String]("production_companies") === "a")
    assert(sent.getAs[String]("Star1") === "a")
  }

  test("null probe counts missing values per column in one pass") {
    val probe = DataQuality.nullProbe(raw,
      Seq("title", "overview", "poster_path", "all_combined_keywords")).collect().head
    assert(probe.getAs[Long]("title") === 1L)
    assert(probe.getAs[Long]("overview") === 1L)
    assert(probe.getAs[Long]("poster_path") === 1L)
    assert(probe.getAs[Long]("all_combined_keywords") === 1L)
  }

  test("featurize: json parse second-phase drop, arrays combined into tags") {
    val featured = MovieFeatures.featurize(MovieClean.clean(raw))
    assert(featured.count() === MovieFixture.expectedAfterFeaturize)
    val wiz = featured.filter(col("id") === 671).collect().head
    val tags = wiz.getSeq[String](wiz.fieldIndex("tags"))
    // title, whitespace-stripped keywords/genres/crews, overview phrases
    assert(tags.contains("Wizard School Chapter 1"))
    assert(tags.contains("wizardschool"))
    assert(tags.contains("Fantasy"))
    assert(tags.contains("ChrisColumbus"))
    assert(tags.exists(_.contains("young wizard")))
  }

  test("text prep: tokenize, normalize, lemmatize, stop-word removal") {
    val prepped = TextPrep.prepare(spark,
      MovieFeatures.featurize(MovieClean.clean(raw)))
    val wiz = prepped.filter(col("id") === 671).collect().head
    val toks = wiz.getSeq[String](wiz.fieldIndex("tags_lemmatized"))
    assert(toks.nonEmpty)
    assert(toks.forall(t => t.matches("[a-z0-9]+")), s"non-normalized token in $toks")
    assert(!toks.contains("the") && !toks.contains("a"), "stopwords must be removed")
    // "discovers" → lemma "discover"
    assert(toks.contains("discover"))
  }

  test("end-to-end: seeded LSH recommends franchise siblings") {
    val result = MoviePipeline.run(spark, raw,
      vectorizeCfg = Vectorize.Config(minDF = 2.0, minDocFreq = 2))
    val recs = Recommender.recommend(result.lshModel, result.movies, "id", 671, 3)
    assert(recs.toSet === Set(672L, 673L, 674L),
      s"expected wizard franchise neighbors, got $recs")
    // absent id → empty result (reference cell 73 contract)
    assert(Recommender.recommend(result.lshModel, result.movies, "id", 999999, 3).isEmpty)
  }

  test("staged save + LSH model round-trip") {
    val result = MoviePipeline.run(spark, raw,
      vectorizeCfg = Vectorize.Config(minDF = 2.0, minDocFreq = 2))
    val out = tmp.resolve("stages").toString
    MoviePipeline.save(result, out)
    val meta = spark.read.parquet(s"$out/stage1/movie_metadata")
    assert(meta.columns.toSeq === Seq("id", "title", "poster_path", "release_year"))
    val master = spark.read.parquet(s"$out/stage3/master_table")
    assert(master.columns.toSeq === Seq("id", "title", "poster_path", "revenue",
      "budget", "release_year", "genres_list"))
    val vec = spark.read.parquet(s"$out/stage4/vector")
    assert(vec.columns.toSeq === Seq("id", "norm_features"))
    assert(vec.count() === MovieFixture.expectedAfterFeaturize)
    val reloaded = Recommender.load(s"$out/stage2/lsh_model")
    val recs = Recommender.recommend(reloaded, result.movies, "id", 671, 3)
    assert(recs.toSet === Set(672L, 673L, 674L))
  }
}
