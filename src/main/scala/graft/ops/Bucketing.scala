package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout: pre-shuffle a table ONCE at write time so
  * every later join/aggregation on the bucket key runs with no
  * exchange at all.
  *
  * `df.write.bucketBy(n, key).sortBy(key)` hash-partitions rows into
  * `n` bucket files per partition and records the layout in the
  * catalog; when two tables share the same bucket count and key,
  * Catalyst plans their join as a sort-merge over matching bucket
  * files — `.explain` shows no ShuffleExchange on either side
  * (BucketedJoinSpec asserts exactly that). At 100 TB this is the
  * difference between re-shuffling a fact table for every query and
  * shuffling it once at ingest: the classic dim⋈fact layout is the
  * fact table bucketed by the join key and the query paying only the
  * per-bucket merge.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted parquet table named `name` rooted
    * at `dir/name` (external path — nothing lands in the session
    * warehouse), replacing any previous definition. */
  def writeBucketed(df: DataFrame, name: String, bucketCol: String,
      buckets: Int, dir: String): Unit = {
    val spark = df.sparkSession
    // the catalog entry may point at a stale path from an earlier run —
    // drop it so option("path") below re-registers cleanly
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    df.write.format("parquet").mode("overwrite")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .option("path", s"$dir/$name")
      .saveAsTable(name)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
