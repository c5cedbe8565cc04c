package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured Streaming over the events table — the streaming twin of
  * the batch q12 hourly aggregation. The reference has no streaming
  * surface (SURVEY.md §2.10); this is the engine extension for
  * continuous ingest at scale: file-source micro-batches, event-time
  * windows bounded by a watermark so state stores stay finite no
  * matter how long the stream runs.
  */
object EventsStream {

  /** events.parquet's `ts` physical type varies across testdata
    * generations (TIMESTAMP(NANOS) through round 11 — which the
    * vectorized reader only accepts as raw long nanos via the legacy
    * conf — TIMESTAMP(MICROS) after). A file stream needs its schema
    * UP FRONT, so probe the landing zone's current footer with a batch
    * read (driver-side metadata only) and rebuild a session-UTC µs
    * timestamp either way — same dispatch as the batch loader
    * (graft.engine.Tables.events). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def readEvents(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The probe is driver-side footer metadata only — but an EMPTY
    // landing zone has no footers and the batch read throws ("Unable
    // to infer schema"). A file stream must be able to start BEFORE
    // the first file arrives (round-12 advice), so fall back to the
    // nanos-as-long rawSchema — the long-lived testdata layout — and
    // let a later restart re-probe once files exist.
    val tsType = scala.util.Try(spark.read.parquet(path).schema("ts").dataType)
      .getOrElse(LongType)
    tsType match {
      case LongType =>
        spark.readStream
          .schema(rawSchema)
          .parquet(path)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        val schema = StructType(rawSchema.map(f =>
          if (f.name == "ts") StructField("ts", tsType) else f))
        spark.readStream
          .schema(schema)
          .parquet(path)
          .withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** Tumbling 1-hour event-time aggregation with a watermark: late
    * rows beyond 1 hour are dropped and window state is evicted —
    * bounded memory on an unbounded stream. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Per-user session windows (30-minute inactivity gap) — the
    * stateful sessionization shape for clickstream-style data. */
  def userSessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Stream-stream interval join: purchases within one hour after a
    * signup by the same user. Both sides carry watermarks and the join
    * condition bounds event-time distance, so per-key join state is
    * evicted once the watermark passes the interval — bounded state on
    * two unbounded streams. */
  def signupToPurchase(events: DataFrame): DataFrame = {
    val signups = events
      .filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("signup_ts"))
      .withWatermark("signup_ts", "1 hour")
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", "1 hour")
    signups.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("signup_ts") &&
        col("purchase_ts") <= col("signup_ts") + expr("INTERVAL 1 HOUR"))
      .select("user_id", "signup_ts", "purchase_ts", "value")
  }

  /** Streaming exact dedup with bounded state: duplicate event_ids
    * arriving within the watermark window are dropped; state for ids
    * older than the watermark is evicted (unbounded-stream-safe
    * version of dropDuplicates). */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Continuous ingest into a JDBC table: each micro-batch appends
    * through [[graft.io.JdbcSink]] via foreachBatch — the
    * streaming twin of the reference's batch JDBC load. Exactly-once
    * is the usual foreachBatch contract: the checkpoint tracks which
    * batch ids committed, and a replayed batch re-appends — dedupe
    * upstream (dropDuplicatesWithinWatermark) or use a keyed upsert
    * table when the target must be idempotent. `numPartitions` caps
    * concurrent connections per micro-batch at cluster scale. */
  def streamToJdbc(df: DataFrame, url: String, table: String,
      props: java.util.Properties, checkpointDir: String,
      numPartitions: Option[Int] = None): StreamingQuery =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.io.JdbcSink.write(batch.toDF(), url, table, props,
          org.apache.spark.sql.SaveMode.Append, numPartitions)
      }
      .start()

  /** Drive a streaming frame into an in-memory table and run all
    * available micro-batches (local smoke harness; a cluster deploy
    * swaps the sink for kafka/delta and drops processAllAvailable). */
  def runToMemory(df: DataFrame, queryName: String,
      outputMode: String = "append"): StreamingQuery = {
    val q = df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .start()
    q.processAllAvailable()
    q
  }
}
