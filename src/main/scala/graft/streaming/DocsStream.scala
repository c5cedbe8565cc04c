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
    * processes one increment and terminates.
    *
    * The corpus index is built ONCE here and shared by every
    * micro-batch; the caller-managed overload below takes a prebuilt
    * [[graft.ops.Dedup.CorpusDedupIndex]] when the index should
    * outlive (or predate) the stream. Cache hygiene: each foreachBatch
    * invocation sweeps every RDD it persisted (the funnel's
    * batch-scoped caches and the CC round checkpoints), so a
    * multi-batch run holds only the index's three cached frames — a
    * stream processing N micro-batches no longer accumulates N
    * funnels' worth of cached RDDs. */
  def incrementalDedupStream(docs: DataFrame, corpus: DataFrame,
      checkpointDir: String, sink: DataFrame => Unit,
      shingleSize: Int = 3, maxJaccardDist: Double = 0.3): StreamingQuery =
    incrementalDedupStream(docs,
      graft.ops.Dedup.indexCorpus(corpus, shingleSize = shingleSize),
      checkpointDir, sink, shingleSize, maxJaccardDist)

  /** [[incrementalDedupStream]] against a caller-managed corpus index
    * (release it with `index.unpersistAll()` when the run is done). */
  def incrementalDedupStream(docs: DataFrame,
      index: graft.ops.Dedup.CorpusDedupIndex,
      checkpointDir: String, sink: DataFrame => Unit,
      shingleSize: Int, maxJaccardDist: Double): StreamingQuery = {
    // materialize the shared index BEFORE the first micro-batch: its
    // cached RDDs then register now and the per-batch sweep below
    // (which releases only RDDs persisted DURING an invocation) can
    // never touch them
    index.shingles.count(); index.bandRows.count(); index.texts.count()
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val sc = batch.sparkSession.sparkContext
        val before = sc.getPersistentRDDs.keySet
        sink(graft.ops.Dedup.incrementalDeduplicateIndexed(batch.toDF(), index,
          shingleSize = shingleSize, maxJaccardDist = maxJaccardDist))
        // the sink has materialized the admitted rows; every RDD this
        // invocation persisted (funnel caches, CC checkpoints) is now
        // batch garbage
        sc.getPersistentRDDs
          .filterNot { case (id, _) => before.contains(id) }
          .values.foreach(_.unpersist(blocking = false))
      }
      .start()
  }
}
