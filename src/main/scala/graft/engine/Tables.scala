package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the harness tables (TESTDATA.md): one parquet file per
  * table under a scale-factor directory. Reads are plain
  * `spark.read.parquet` so Catalyst gets full pushdown/pruning into the
  * vectorized parquet reader — at 100 TB these would be partitioned
  * directories, and the same call sites work unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "region")
  /** `events.parquet`'s `ts` physical type has changed across testdata
    * generations: TIMESTAMP(NANOS) through round 11 (which Spark's
    * vectorized reader rejects — read nanos as long via the legacy
    * conf, then rebuild a microsecond TimestampType with exact integer
    * division: `div`, not `/`, since double division loses precision
    * above 2^53), TIMESTAMP(MICROS) from round 12 (reads directly;
    * only normalize NTZ → session-UTC TimestampType so downstream
    * plans and parquet dumps keep the exact types the oracles expect).
    * Dispatch on the READ schema, so either generation works.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
