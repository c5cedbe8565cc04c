package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: concatenate the
  * corpus token stream in a deterministic order (doc id) and cut it
  * every `budget` tokens — the standard packing step that turns
  * variable-length documents into fixed-length training sequences
  * with zero padding waste. Output is the doc→sequence span map
  * (seq_id, doc_id, doc_off, seq_off, len): enough to assemble any
  * training sequence by slicing its member documents, without ever
  * materializing the concatenated stream itself.
  *
  * Scale design — the whole operator is the global prefix sum, and a
  * naive `sum().over(Window.orderBy(id))` moves the CORPUS into one
  * partition (Spark plans an empty-partition window as a single
  * task). Instead, a two-phase prefix sum:
  *   1. bucket docs by `id div bucketSpan`; per-bucket token totals
  *      are one map-side-combinable aggregate (tiny: one row per
  *      bucket);
  *   2. the running offset OVER BUCKETS uses the single-partition
  *      window only on that tiny frame (maxId/bucketSpan rows — at
  *      1e12 ids and the default span, ~1e6 rows of two longs);
  *   3. each doc's global start = its bucket's offset + a running sum
  *      WITHIN its bucket (Window.partitionBy(bucket) — distributed).
  * Every stage shuffles (id, count) longs only; nothing depends on
  * physical partitioning, so the packing is bit-reproducible on any
  * cluster layout.
  *
  * A document crossing a cut boundary contributes one span row per
  * sequence it touches (explode over its sequence range) — downstream
  * can mask or drop boundary fragments as training policy dictates.
  */
object Packing {

  /** @param budget     tokens per packed training sequence
    * @param bucketSpan id range per prefix-sum bucket (phase-1 width)
    */
  def packSequences(docs: DataFrame, budget: Long,
      idCol: String = "doc_id", textCol: String = "text",
      bucketSpan: Long = 1L << 20): DataFrame = {
    require(budget > 0 && bucketSpan > 0)
    val counted = docs.select(
      col(idCol).cast("long").as("doc_id"),
      TextStats.tokenCount(col(textCol)).as("n_tok"))
    // `div` = exact integer division (a double-based floor(a/b) would
    // drift above 2^53 ids/tokens)
    val bucketed = counted.withColumn("bucket", expr(s"doc_id div $bucketSpan"))
    val bucketTotals = bucketed.groupBy("bucket")
      .agg(sum(col("n_tok")).as("btotal"))
    val overBuckets = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketTotals
      .withColumn("boffset", coalesce(sum(col("btotal")).over(overBuckets), lit(0L)))
      .select("bucket", "boffset")
    val inBucket = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val placed = bucketed.join(broadcast(offsets), "bucket")
      .withColumn("start",
        col("boffset") + coalesce(sum(col("n_tok")).over(inBucket), lit(0L)))
    placed
      .filter(col("n_tok") > 0)
      .withColumn("seq_id", explode(sequence(
        expr(s"start div $budget"),
        expr(s"(start + n_tok - 1) div $budget"))))
      .select(
        col("seq_id"),
        col("doc_id"),
        (greatest(col("start"), col("seq_id") * budget) - col("start")).as("doc_off"),
        (greatest(col("start"), col("seq_id") * budget) - col("seq_id") * budget).as("seq_off"),
        (least(col("start") + col("n_tok"), (col("seq_id") + 1) * budget)
          - greatest(col("start"), col("seq_id") * budget)).as("len"))
  }
}
