package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Stage 1 of the reference pipeline: projection + cleaning
  * (reference transform/execute.py:59-94; SURVEY.md §2.2 P1-P6).
  *
  * Each step is a composable `DataFrame => DataFrame`; `clean` chains
  * them. All steps are declarative so Catalyst collapses the whole
  * chain into one scan + filter + one dedup exchange — the only
  * shuffle here is the `dropDuplicates` hash exchange on `id`, which
  * at 100 TB is an unavoidable key-repartition and benefits from AQE
  * coalescing.
  */
object MovieClean {

  /** The 14 surviving columns (manual semantic pruning — Catalyst
    * would prune anyway, but the early select defines the contract). */
  val keepColumns: Seq[String] = Seq(
    "id", "title", "revenue", "budget", "overview", "poster_path",
    "production_companies", "release_year", "Director",
    "Star1", "Star2", "Star3", "genres_list", "all_combined_keywords")

  /** Null-drop subset (reference transform/execute.py:81-89). */
  val requiredColumns: Seq[String] =
    Seq("title", "release_year", "overview", "all_combined_keywords", "poster_path")

  /** Sentinel-filled columns; "a" dies later as a 1-char stopword-ish
    * token (reference transform/execute.py:92-94, SURVEY.md §7.4). */
  val sentinelColumns: Seq[String] =
    Seq("production_companies", "Star1", "Star2", "Star3")

  def project(df: DataFrame): DataFrame =
    df.select(keepColumns.map(col): _*)

  def castReleaseYear(df: DataFrame): DataFrame =
    df.withColumn("release_year", col("release_year").cast(IntegerType))

  def dedupById(df: DataFrame): DataFrame =
    df.dropDuplicates("id")

  def dropRequiredNulls(df: DataFrame): DataFrame =
    df.na.drop(requiredColumns)

  def dropEmptyKeywords(df: DataFrame): DataFrame =
    df.filter(!(col("all_combined_keywords") === "[]"))

  def fillSentinels(df: DataFrame): DataFrame =
    df.na.fill("a", sentinelColumns)

  /** Full cleaning stage in reference order. */
  def clean(df: DataFrame): DataFrame =
    Seq[DataFrame => DataFrame](
      project, castReleaseYear, dedupById, dropRequiredNulls,
      dropEmptyKeywords, fillSentinels
    ).reduceLeft(_ andThen _)(df)
}
