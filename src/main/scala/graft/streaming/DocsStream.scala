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
  * Scope: by default the corpus is static for the lifetime of one
  * query — the production loop runs one `AvailableNow` pass per
  * increment, appends the admitted docs to the corpus, and restarts.
  * Within one micro-batch, intra-batch near-dups collapse to min-id
  * survivors (layer 3 of the funnel). With `growIndex = true` the
  * working index also grows WITHIN the run: each micro-batch's
  * admissions are checkpointed and appended
  * ([[graft.ops.Dedup.appendToIndex]]), so later micro-batches dedup
  * against everything admitted before them and no within-run
  * collision is ever missed.
  */
object DocsStream {

  /** Read a documents landing directory as a stream, using `schemaFrom`
    * (a static frame over the same layout) for the schema the file
    * source requires. `maxFilesPerTrigger` bounds each micro-batch
    * (AvailableNow honors it, so one drop of N files becomes N
    * batches — how the growing-corpus spec forces multi-batch runs). */
  def readDocs(spark: SparkSession, landingDir: String,
      schemaFrom: DataFrame, maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(schemaFrom.schema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.parquet(s"$landingDir/*")
  }

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
      checkpointDir, sink, shingleSize, maxJaccardDist, growIndex = false)

  /** [[incrementalDedupStream]] against a caller-managed corpus index
    * (release it with `index.unpersistAll()` when the run is done).
    *
    * `growIndex = true` closes the increment loop WITHIN a run: after
    * each micro-batch's admissions reach the sink, they are
    * localCheckpointed and appended to the working index
    * ([[graft.ops.Dedup.appendToIndex]]), so batch N+1 dedups against
    * corpus + everything admitted in batches 1..N — a near-dup
    * arriving twice across micro-batches is admitted exactly once.
    * With the default `false`, the corpus stays static for the run
    * (the one-increment-per-run cadence). */
  def incrementalDedupStream(docs: DataFrame,
      index: graft.ops.Dedup.CorpusDedupIndex,
      checkpointDir: String, sink: DataFrame => Unit,
      shingleSize: Int, maxJaccardDist: Double,
      growIndex: Boolean): StreamingQuery = {
    // materialize the shared index BEFORE the first micro-batch: its
    // cached RDDs then register now and the per-batch sweep below
    // (which releases only RDDs persisted DURING an invocation) can
    // never touch them
    index.shingles.count(); index.bandRows.count(); index.texts.count()
    // the working index grows across SEQUENTIAL foreachBatch calls
    // (micro-batches of one query never overlap)
    val idxRef = new java.util.concurrent.atomic.AtomicReference(index)
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val sc = batch.sparkSession.sparkContext
        val before = sc.getPersistentRDDs.keySet
        val admitted = graft.ops.Dedup.incrementalDeduplicateIndexed(
          batch.toDF(), idxRef.get(), shingleSize = shingleSize,
          maxJaccardDist = maxJaccardDist)
        val keepIds: scala.collection.Set[Int] =
          if (!growIndex) { sink(admitted); scala.collection.Set.empty }
          else {
            // checkpoint the admissions so the appended index frames
            // read materialized blocks, not the swept funnel caches
            val preChk = sc.getPersistentRDDs.keySet
            val admChk = admitted.localCheckpoint(true)
            val chkIds = sc.getPersistentRDDs.keySet -- preChk
            sink(admChk)
            idxRef.set(graft.ops.Dedup.appendToIndex(idxRef.get(), admChk,
              shingleSize = shingleSize))
            chkIds
          }
        // the sink has materialized the admitted rows; every RDD this
        // invocation persisted (funnel caches, CC checkpoints) is now
        // batch garbage — except the admissions checkpoint the grown
        // index now references
        sc.getPersistentRDDs
          .filterNot { case (id, _) => before.contains(id) || keepIds.contains(id) }
          .values.foreach(_.unpersist(blocking = false))
      }
      .start()
  }
}
