package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming arrival path for the incremental dedup funnel: new
  * documents land as files, each micro-batch is deduplicated against
  * the static survivor corpus, and only the ADMITTED rows reach the
  * sink. The dedup itself is
  * [[graft.ops.Dedup.incrementalDeduplicate]] invoked verbatim inside
  * `foreachBatch` — the idiomatic Structured Streaming shape for a
  * batch-defined operator: stream and batch admissions are identical
  * BY CONSTRUCTION (the spec still asserts it), the corpus side stays
  * a static, storable frame, and checkpointing gives exactly-once
  * file processing across restarts.
  *
  * Scope: the corpus is static for the lifetime of one query — the
  * production loop runs one `AvailableNow` pass per increment, appends
  * the admitted docs to the corpus, and restarts. Within one
  * micro-batch, intra-batch near-dups collapse to min-id survivors
  * (layer 3 of the funnel); across micro-batches of the SAME run the
  * corpus does not grow — size increments so one run is one batch, or
  * accept late within-run collisions until the next corpus refresh.
  */
object DocsStream {

  /** Read a documents landing directory as a stream, using `schemaFrom`
    * (a static frame over the same layout) for the schema the file
    * source requires. */
  def readDocs(spark: SparkSession, landingDir: String,
      schemaFrom: DataFrame): DataFrame =
    spark.readStream.schema(schemaFrom.schema).parquet(s"$landingDir/*")

  /** Dedup each arriving micro-batch against `corpus` and hand the
    * admitted rows to `sink` (tests: an in-memory collector; prod: a
    * parquet/JDBC append). Runs with `AvailableNow` so one call
    * processes one increment and terminates. */
  def incrementalDedupStream(docs: DataFrame, corpus: DataFrame,
      checkpointDir: String, sink: DataFrame => Unit,
      shingleSize: Int = 3, maxJaccardDist: Double = 0.3): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        sink(graft.ops.Dedup.incrementalDeduplicate(batch.toDF(), corpus,
          shingleSize = shingleSize, maxJaccardDist = maxJaccardDist))
      }
      .start()
}
