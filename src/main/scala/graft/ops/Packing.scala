package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
    * @param countExpr  per-document token-count expression; defaults
    *                   to the whitespace [[TextStats.tokenCount]].
    *                   Real budgets are SUBWORD counts — pass e.g. the
    *                   n_pieces element of [[graft.text.Subword]]'s
    *                   stats to pack in model-token units (q107); any
    *                   deterministic long expression keeps the packing
    *                   bit-reproducible.
    */
  def packSequences(docs: DataFrame, budget: Long,
      idCol: String = "doc_id", textCol: String = "text",
      bucketSpan: Long = 1L << 20,
      countExpr: Option[Column] = None): DataFrame = {
    require(budget > 0 && bucketSpan > 0)
    val counted = docs.select(
      col(idCol).cast("long").as("doc_id"),
      countExpr.getOrElse(TextStats.tokenCount(col(textCol))).as("n_tok"))
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

  /** [[packSequences]] over a deterministic PSEUDO-SHUFFLED document
    * order: concatenate in (knuth-hash(id), id) order instead of id
    * order, then cut every `budget` tokens. Real training pipelines
    * shuffle before packing — id order is crawl/ingest order, and
    * packing it verbatim gives every training sequence documents
    * that arrived together (same site, same day), a batch-correlation
    * the optimizer then sees as non-iid data. The Knuth multiply
    * ([[Splits.hashBucketN]], full 32-bit range) is the engine's
    * standing replayable permutation: the shuffle is a pure function
    * of the id set (bit-reproducible on any cluster layout, unlike a
    * `rand()` sort), and the oracle replays it in HUGEINT.
    *
    * Scale shape is IDENTICAL to [[packSequences]] — the two-phase
    * prefix sum just runs over hash-value buckets instead of id
    * buckets (hv div bucketSpan is monotone in hv, so bucket offsets
    * + in-bucket (hv, id) windows compose to the global (hv, id)
    * order); nothing corpus-sized ever hits one task, and ties are
    * broken by id so colliding hashes stay deterministic. */
  def packShuffled(docs: DataFrame, budget: Long,
      idCol: String = "doc_id", textCol: String = "text",
      bucketSpan: Long = 1L << 20,
      countExpr: Option[Column] = None): DataFrame = {
    require(budget > 0 && bucketSpan > 0)
    val counted = docs.select(
      col(idCol).cast("long").as("doc_id"),
      Splits.hashBucketN(col(idCol), 1L << 32).as("hv"),
      countExpr.getOrElse(TextStats.tokenCount(col(textCol))).as("n_tok"))
    val bucketed = counted.withColumn("bucket", expr(s"hv div $bucketSpan"))
    val bucketTotals = bucketed.groupBy("bucket")
      .agg(sum(col("n_tok")).as("btotal"))
    val overBuckets = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketTotals
      .withColumn("boffset", coalesce(sum(col("btotal")).over(overBuckets), lit(0L)))
      .select("bucket", "boffset")
    val inBucket = Window.partitionBy("bucket").orderBy("hv", "doc_id")
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

  /** No-split packing by grouped first-fit-decreasing: each document
    * lands whole in exactly one `budget`-capacity bin (the opposite
    * trade to [[packSequences]], which has zero padding waste but cuts
    * documents at sequence boundaries — FFD never splits a document
    * and pays bounded padding instead). Docs longer than `budget` are
    * unpackable without splitting and are dropped; route them through
    * [[packSequences]] in a real pipeline.
    *
    * Determinism + scale: classic FFD is inherently sequential (bin
    * state threads through every placement), so it is run EXACTLY but
    * only within fixed `groupSize` slices of the global
    * (n_tok desc, doc_id) rank order; bins never cross slices. The
    * result is a pure function of the (id, n_tok) set — no dependence
    * on partitioning — and each slice is an independent in-memory FFD
    * over ≤ groupSize (id, count) pairs, so the packing phase is
    * embarrassingly parallel. Because the global order is decreasing,
    * a slice holds near-uniform sizes, and the waste stays close to
    * unsliced FFD (first-fit ≈ best-fit on a decreasing stream).
    *
    * The global rank itself is the operator's only coordination and is
    * computed in three levels so no corpus-sized frame ever hits one
    * task: (1) per-length totals (≤ budget rows — the ONLY single-task
    * window input); (2) per-(length, id-bucket) cumulative counts
    * (window partitioned by length); (3) row_number within a
    * (length, bucket) cell (bounded by bucketSpan). Everything
    * shuffled is (id, count) longs.
    */
  /** INFERENCE-BATCH padding-waste audit: fixed-size batches of
    * `batchSize` sequences are padded to each batch's longest member
    * (the static-batching serving model); this measures, in exact
    * integers, what fraction of the compute rectangle is padding
    * under two batching policies over the SAME corpus —
    *  - `hash`: the q114 pseudo-shuffle order (arrival-order
    *    stand-in: batches mix lengths, every batch pays the longest
    *    straggler), and
    *  - `sorted_desc`: length-descending order (the vLLM/fairseq
    *    length-bucketing trick: neighbors have near-equal lengths,
    *    padding collapses) —
    * the measurement that justifies (or kills) a batch-sorting stage
    * before an embedding/scoring backfill over 100 TB.
    *
    * Both global orders are EXACT two-phase radix ranks (the
    * [[packShuffled]] / [[Splits.orderMixingAudit]] decomposition):
    * `hash` buckets on `hv div 2²⁰` (≤ 2¹² value-domain rows),
    * `sorted_desc` buckets on the token count itself (value-domain =
    * distinct lengths; in-bucket rank is by id among equal lengths) —
    * nothing corpus-sized ever meets one window partition. Batch
    * rollups are map-side-combinable aggregates on `(rank−1) div B`.
    *
    * `waste_ppm = padding·10⁶ div (padding + tokens)` — the padded
    * share of the Σ batch_rows·batch_max compute rectangle (the last,
    * possibly short, batch pads only to its own row count).
    *
    * Returns one row per policy: (policy, n_seqs, n_batches,
    * total_tokens, padded_tokens, waste_ppm), ordered by policy. */
  def batchWasteAudit(docs: DataFrame, batchSize: Int = 8,
      idCol: String = "doc_id", textCol: String = "text",
      bucketSpan: Long = 1L << 20,
      countExpr: Option[Column] = None): DataFrame = {
    require(batchSize >= 1)
    val counted = docs.select(
      col(idCol).cast("long").as("__id"),
      Splits.hashBucketN(col(idCol), 1L << 32).as("__hv"),
      countExpr.getOrElse(TextStats.tokenCount(col(textCol))).as("__n"))
      .filter(col("__n") > 0)
      .cache()
    counted.count() // eager: both policy rankings read it

    // exact global rank via bucket offsets + in-bucket row_number
    def rank(bucket: Column, ord: Seq[Column]): DataFrame = {
      val b = counted.withColumn("__bk", bucket)
      val cnts = b.groupBy("__bk").agg(count(lit(1)).as("__c"))
      val overB = Window.orderBy(col("__bk"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = cnts
        .withColumn("__off", coalesce(sum(col("__c")).over(overB), lit(0L)))
        .select(col("__bk"), col("__off"))
      val wIn = Window.partitionBy("__bk").orderBy(ord: _*)
      b.join(broadcast(offs), Seq("__bk"))
        .withColumn("__r", col("__off") + row_number().over(wIn))
        .select(col("__id"), col("__n"), col("__r"))
    }
    // hash policy: (hv asc, id asc). sorted_desc: (len desc, id asc) —
    // bucket on the NEGATED length so bucket order asc == length desc
    val byHash = rank(expr(s"__hv div $bucketSpan"),
      Seq(col("__hv"), col("__id")))
    val bySorted = rank(-col("__n"), Seq(col("__n").desc, col("__id")))

    def rollup(ranked: DataFrame, policy: String): DataFrame =
      ranked
        .withColumn("__batch", expr(s"(__r - 1) div $batchSize"))
        .groupBy("__batch")
        .agg(count(lit(1)).as("__rows"), max(col("__n")).as("__mx"),
          sum(col("__n")).as("__tok"))
        .agg(count(lit(1)).as("n_batches"),
          sum(col("__rows")).as("n_seqs"),
          sum(col("__tok")).as("total_tokens"),
          sum(col("__rows") * col("__mx") - col("__tok")).as("padded_tokens"))
        .select(lit(policy).as("policy"), col("n_seqs"), col("n_batches"),
          col("total_tokens"), col("padded_tokens"),
          expr("""(padded_tokens * 1000000)
                  div (padded_tokens + total_tokens)""").as("waste_ppm"))

    rollup(byHash, "hash").unionAll(rollup(bySorted, "sorted_desc"))
      .orderBy("policy")
  }

  def packBestFit(docs: DataFrame, budget: Long,
      idCol: String = "doc_id", textCol: String = "text",
      groupSize: Int = 4096, bucketSpan: Long = 1L << 20): DataFrame = {
    require(budget > 0 && groupSize > 0 && bucketSpan > 0)
    val counted = docs.select(
      col(idCol).cast("long").as("doc_id"),
      TextStats.tokenCount(col(textCol)).as("n_tok"))
      .filter(col("n_tok") > 0 && col("n_tok") <= budget)
    val bucketed = counted.withColumn("bucket", expr(s"doc_id div $bucketSpan"))
    // level 1: docs per length class — at most `budget` rows, so the
    // unpartitioned running-sum window is trivially single-task-safe
    val classTotals = counted.groupBy("n_tok").agg(count(lit(1)).as("ctotal"))
    val overClasses = Window.orderBy(col("n_tok").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val classOffsets = classTotals
      .withColumn("coff", coalesce(sum(col("ctotal")).over(overClasses), lit(0L)))
      .select("n_tok", "coff")
    // level 2: cumulative cell counts across id-buckets WITHIN a class
    // (window partitioned by n_tok: one partition per class, #buckets
    // rows each — distributed across classes)
    val cellCounts = bucketed.groupBy("n_tok", "bucket").agg(count(lit(1)).as("cnt"))
    val overBuckets = Window.partitionBy("n_tok").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cellOffsets = cellCounts
      .withColumn("boff", coalesce(sum(col("cnt")).over(overBuckets), lit(0L)))
      .select("n_tok", "bucket", "boff")
    // level 3: rank inside a (class, bucket) cell — bounded partitions
    val inCell = Window.partitionBy("n_tok", "bucket").orderBy("doc_id")
    val ranked = bucketed
      .join(cellOffsets, Seq("n_tok", "bucket"))
      .join(broadcast(classOffsets), Seq("n_tok"))
      .withColumn("r", col("coff") + col("boff") + row_number().over(inCell) - 1)

    val gs = groupSize.toLong
    val spark = docs.sparkSession
    import spark.implicits._
    ranked
      .select(expr(s"r div $gs").as("g"), col("r"), col("doc_id"), col("n_tok"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (g: Long, it: Iterator[(Long, Long, Long, Long)]) =>
        // ≤ groupSize items; first-fit over the open-bin fill array —
        // the linear scan is O(bins) per item (worst 16M ops at the
        // 4096 default; a segment tree over fills would make it
        // O(log bins) if groupSize were ever raised 100×)
        val items = it.toArray.sortBy(_._2)
        val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
        items.iterator.map { case (_, _, docId, nTok) =>
          var j = 0
          while (j < fills.length && fills(j) + nTok > budget) j += 1
          if (j == fills.length) fills += nTok else fills(j) = fills(j) + nTok
          (g * gs + j, docId, nTok)
        }
      }
      .toDF("bin_id", "doc_id", "n_tok")
  }
}
