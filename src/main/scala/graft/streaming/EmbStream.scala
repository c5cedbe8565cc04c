package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ARRIVAL path for the residual ANN index — the
  * [[DocsStream]] stance applied to the retrieval tier: new vectors
  * land as files, and each micro-batch is appended to a stored
  * residual index ([[graft.ops.Similarity.appendResidualIndex]])
  * WITHOUT refitting — coarse-assigned against the frozen centroids,
  * encoded against the frozen Lloyd books, parquet-appended into the
  * existing cell partitions. The append is the batch operator invoked
  * verbatim inside `foreachBatch`, so stream-grown and batch-grown
  * indexes are identical BY CONSTRUCTION (the self-check still
  * asserts it end to end against the q226 oracle-checked dump).
  *
  * Exactly-once is what makes this SAFE where a bare retried batch
  * append is not: `appendResidualIndex`'s unique-id contract says a
  * replayed increment would double a vector's code rows and silently
  * double its served ADC sums — the Structured Streaming checkpoint
  * guarantees each landed file is appended exactly once across
  * restarts (the recovery spec kills the stream between files and
  * proves the resumed run neither drops nor re-appends).
  */
object EmbStream {

  /** Read an embeddings landing directory as a stream, using
    * `schemaFrom` (a static frame over the same layout) for the schema
    * the file source requires. `maxFilesPerTrigger` bounds each
    * micro-batch (AvailableNow honors it, so one drop of N files
    * becomes N batches). */
  def readVecs(spark: SparkSession, landingDir: String,
      schemaFrom: DataFrame, maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(schemaFrom.schema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.parquet(s"$landingDir/*")
  }

  /** Append each arriving micro-batch of vectors to the stored
    * residual index at `indexDir`. Runs with `AvailableNow`, so one
    * call drains the landing zone and terminates — the production
    * cadence is one pass per increment window, serving continues from
    * the frozen frames throughout ([[graft.ops.Similarity
    * .serveResidualIndex]] reads only `cents`/`books` plus the probed
    * cell partitions, and parquet append never rewrites existing
    * files). Cache hygiene: the append path persists nothing, so a
    * multi-batch run holds no RDDs between batches. */
  def appendResidualStream(vecs: DataFrame, indexDir: String,
      checkpointDir: String, idCol: String = "vec_id",
      vecCol: String = "embedding",
      quantScale: Double = 1e4): StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        // an empty replayed batch (restart recovery) must not touch
        // the store — appendResidualIndex probes the batch's dim from
        // its first row and an empty frame has none
        if (!batch.isEmpty)
          graft.ops.Similarity.appendResidualIndex(batch.sparkSession,
            batch.toDF(), indexDir, idCol, vecCol, quantScale)
      }
      .start()
}
