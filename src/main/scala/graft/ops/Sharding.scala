package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic training-shard writer: the step after packing that
  * training jobs actually consume — size-targeted shards with a
  * verifiable manifest (doc counts, token sums, content hashes).
  *
  * Shard assignment is a pure function of the (id, token-count) set:
  * concatenate the corpus in id order and open shard k at token offset
  * k·budget — a document belongs to the shard where it STARTS (docs
  * are atomic: a shard slightly overruns its budget rather than
  * splitting a file's document across shards; the overrun is bounded
  * by one document). Unlike greedy next-fit — which is inherently
  * sequential (each placement depends on the running remainder) —
  * this boundary rule is a prefix-sum function, so it distributes:
  * the global offset comes from [[Packing]]'s two-phase prefix sum
  * (nothing corpus-sized ever hits one task, everything shuffled is
  * (id, long) pairs), and the result is bit-reproducible on any
  * cluster layout — re-running the writer on the same corpus yields
  * byte-identical shard membership and manifest, which is what makes
  * the manifest a usable integrity check.
  *
  * The manifest's content hash is an order-INDEPENDENT combine
  * (Σ per-doc rolling fingerprint mod p): partitioning cannot change
  * it, and any dropped/duplicated/mutated document changes it — the
  * cheap end-to-end "did every byte arrive" check a 100 TB copy
  * needs. Every column is exact integer arithmetic, replayable by a
  * SQL oracle (prefix sum + the q19 fingerprint replay).
  */
object Sharding {

  /** Per-document shard assignment: (doc_id, n_tok, start, shard_id,
    * doc_fp). Zero-token docs are excluded (they contribute nothing
    * to any shard). `budget` is capped so the manifest's Σ-fingerprint
    * stays overflow-free in 64-bit: ≤ budget docs can start within one
    * shard's token window (consecutive starts differ by ≥ 1), so the
    * hash sum is < budget·p < 2⁶³ for budget ≤ 2³³ — ~8.6 G tokens
    * per shard, far above any real shard size.
    *
    * @param countExpr token-count override (defaults to whitespace
    *                  [[TextStats.tokenCount]]); pass a subword count
    *                  (q104/q113) to shard in model-token units.
    * @param startOffset token offset the stream starts at — 0 for a
    *                  fresh corpus; [[appendShards]] passes the
    *                  existing manifest's token total so an increment
    *                  continues the shard sequence instead of
    *                  restarting it. */
  def assignShards(docs: DataFrame, budget: Long,
      idCol: String = "doc_id", textCol: String = "text",
      bucketSpan: Long = 1L << 20,
      countExpr: Option[Column] = None,
      startOffset: Long = 0L): DataFrame = {
    require(budget > 0 && budget <= (1L << 33), "0 < budget <= 2^33")
    require(bucketSpan > 0 && startOffset >= 0)
    val counted = docs.select(
      col(idCol).cast("long").as("doc_id"),
      countExpr.getOrElse(TextStats.tokenCount(col(textCol))).as("n_tok"),
      TextStats.rollingFingerprint(col(textCol)).as("doc_fp"))
    // two-phase prefix sum — Packing.packSequences' scale shape: the
    // single-partition window runs only over the tiny per-bucket
    // totals frame, never the corpus
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
    bucketed.join(broadcast(offsets), "bucket")
      .withColumn("start",
        lit(startOffset) + col("boffset") +
          coalesce(sum(col("n_tok")).over(inBucket), lit(0L)))
      .filter(col("n_tok") > 0)
      .select(col("doc_id"), col("n_tok"), col("start"),
        expr(s"start div $budget").as("shard_id"), col("doc_fp"))
  }

  /** Append an increment to an existing shard MANIFEST without
    * rewriting any existing shard — the writer-side increment loop
    * that mirrors q112's index append: the new batch's token stream
    * continues at the manifest's total-token offset, so it first
    * tops up the last (partial) shard and then opens fresh ones,
    * and existing shard files are never touched. Returns the merged
    * manifest: per-shard counts and token sums add, the
    * order-independent content hashes combine as (h₁+h₂) mod p —
    * exactly the hash a from-scratch rollup of the union at these
    * start offsets would produce, so the merged manifest stays a
    * byte-integrity check for the grown corpus.
    *
    * Scale shape: one bounded driver scalar (the manifest's token
    * total — the manifest is shards-count-sized by construction),
    * the increment's own prefix sum (batch-sized), and a shard-keyed
    * merge aggregation over manifest ∪ increment-rollup rows. */
  def appendShards(manifest: DataFrame, newDocs: DataFrame, budget: Long,
      idCol: String = "doc_id", textCol: String = "text",
      countExpr: Option[Column] = None): DataFrame = {
    val offset = manifest.agg(coalesce(sum(col("n_tokens")), lit(0L)))
      .head.getLong(0)
    val newRoll = shardManifest(assignShards(newDocs, budget, idCol, textCol,
      countExpr = countExpr, startOffset = offset))
    manifest.unionByName(newRoll)
      .groupBy("shard_id").agg(
        sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        pmod(sum(col("content_hash")), lit(1000000007L)).as("content_hash"),
        min(col("first_doc")).as("first_doc"),
        max(col("last_doc")).as("last_doc"))
  }

  /** Manifest rollup over an [[assignShards]] frame: one row per shard
    * with doc count, token sum, order-independent content hash, and
    * the id range — a map-side-combined aggregate, no window. */
  def shardManifest(assigned: DataFrame): DataFrame =
    assigned.groupBy("shard_id").agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tok")).as("n_tokens"),
      pmod(sum(col("doc_fp")), lit(1000000007L)).as("content_hash"),
      min(col("doc_id")).as("first_doc"),
      max(col("doc_id")).as("last_doc"))

  /** Write the corpus as size-targeted shards plus its manifest:
    * `dir/shards/shard_id=K/` holds shard K's documents (partitioned
    * parquet — one directory per shard, prunable by shard_id),
    * `dir/manifest` the rollup. Returns the manifest frame (reading
    * the written file, so callers verify what landed on storage, not
    * the plan that produced it). */
  def writeShards(docs: DataFrame, dir: String, budget: Long,
      idCol: String = "doc_id", textCol: String = "text",
      countExpr: Option[Column] = None): DataFrame = {
    val assigned = assignShards(docs, budget, idCol, textCol,
      countExpr = countExpr)
    docs.join(assigned.select(col("doc_id").as(idCol), col("shard_id")), idCol)
      .write.mode("overwrite").partitionBy("shard_id").parquet(s"$dir/shards")
    shardManifest(assigned)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/manifest")
    docs.sparkSession.read.parquet(s"$dir/manifest")
  }
}
