package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Stage 2 of the reference pipeline: feature-column combination
  * (reference transform/execute.py:99-172; SURVEY.md §2.7 F1-F5).
  *
  * Everything is a Catalyst expression (from_json, split, array,
  * concat, higher-order transform) — one whole-stage-codegen'd
  * projection, zero UDFs, zero shuffles.
  */
object MovieFeatures {

  private val arr = ArrayType(StringType)

  /** Strip all whitespace inside each array element ("Tom Hanks" →
    * "TomHanks") — ArrayTransform + LambdaFunction, not a UDF
    * (reference transform/execute.py:144-156). */
  private def stripSpaces(c: String): org.apache.spark.sql.Column =
    transform(col(c), x => regexp_replace(x, "\\s+", ""))

  /** Parse JSON-ish array strings; malformed → null, dropped right
    * after (two-phase null-drop, SURVEY.md §7.4 risk 5). */
  def parseJsonArrays(df: DataFrame): DataFrame =
    df.withColumn("genres_list", from_json(col("genres_list"), arr))
      .withColumn("all_combined_keywords", from_json(col("all_combined_keywords"), arr))
      .na.drop(Seq("all_combined_keywords"))

  /** String → array conversions (split / 1-element wrap). */
  def toArrays(df: DataFrame): DataFrame =
    df.withColumn("Director", split(col("Director"), ","))
      .withColumn("production_companies", split(col("production_companies"), ","))
      .withColumn("overview", split(col("overview"), ","))
      .withColumn("Star1", array(col("Star1")))
      .withColumn("Star2", array(col("Star2")))
      .withColumn("Star3", array(col("Star3")))
      .withColumn("title_array", array(col("title")))

  /** crews = Star1 ++ Star2 ++ Star3 ++ Director ++ production_companies;
    * then whitespace-strip crews/keywords/genres;
    * tags = title ++ keywords ++ genres ++ overview ++ crews. */
  def combine(df: DataFrame): DataFrame =
    df.withColumn("crews", concat(
        col("Star1"), col("Star2"), col("Star3"),
        col("Director"), col("production_companies")))
      .drop("Star1", "Star2", "Star3", "Director", "production_companies")
      .withColumn("crews", stripSpaces("crews"))
      .withColumn("all_combined_keywords", stripSpaces("all_combined_keywords"))
      .withColumn("genres_list", stripSpaces("genres_list"))
      .withColumn("tags", concat(
        col("title_array"), col("all_combined_keywords"),
        col("genres_list"), col("overview"), col("crews")))
      .drop("all_combined_keywords", "overview", "crews", "title_array")

  def featurize(df: DataFrame): DataFrame =
    combine(toArrays(parseJsonArrays(df)))
}
