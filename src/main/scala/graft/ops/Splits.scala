package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset splitting for training pipelines.
  *
  * [[assignSplit]] is the production path: a pure arithmetic hash of
  * the record id maps every row to a stable bucket, so the same row
  * lands in the same split on any cluster, any partitioning, any day —
  * re-runs and incremental appends stay consistent (unlike
  * `randomSplit`, whose assignment depends on partitioning).
  */
object Splits {

  /** Knuth multiplicative hash → bucket in [0, 100).
    *
    * The multiply is computed on 16-bit halves of the id's low 32 bits
    * so it can never overflow a long: a naive `id * 2654435761` throws
    * ARITHMETIC_OVERFLOW under ANSI mode once ids pass ~3.5e9, which
    * breaks the "stable on any cluster, any day" contract exactly when
    * the corpus gets big. Matches the exact mathematical formula
    * ((id mod 2^32)·K mod 2^32) mod buckets — the one the SQL oracles
    * compute — for every NON-NEGATIVE id, because
    * lo·K + ((hi·K mod 2^16) << 16) ≡ (lo + hi·2^16)·K  (mod 2^32).
    * For negative ids the two sides diverge: this code hashes the
    * unsigned low 32 bits into [0, 2^32), while DuckDB's `%` keeps the
    * dividend's sign, so a negative id's oracle cell goes negative.
    * Document ids are non-negative in every supported source; callers
    * minting synthetic ids must keep them ≥ 0 for split stability.
    * (The previous naive-multiply code could never have produced
    * persisted splits for ids ≥ ~3.5e9: ANSI mode made it throw.) */
  def hashBucket(id: Column): Column = hashBucketN(id, 100L)

  /** Stable named split from cumulative percentage cuts, e.g.
    * train/val/test at 80/10/10 → cuts (80, 90). */
  def assignSplit(id: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    require(trainPct + valPct < 100)
    val b = hashBucket(id)
    when(b < trainPct, lit("train"))
      .when(b < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }

  /** Stratified sample with per-stratum fractions (seeded MLlib path;
    * partitioning-dependent — use for exploration, not lineage). */
  def stratifiedSample(df: DataFrame, strataCol: String,
      fractions: Map[String, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(strataCol, fractions, seed)

  /** [[hashBucket]] generalized to `buckets` cells (same overflow-safe
    * split multiply). */
  def hashBucketN(id: Column, buckets: Long): Column = {
    val base = id.cast("long").bitwiseAND(lit(0xFFFFFFFFL))
    val lo = base.bitwiseAND(lit(0xFFFFL))
    val hi = shiftrightunsigned(base, 16)
    val k = lit(2654435761L)
    val prod = pmod(lo * k + shiftleft(pmod(hi * k, lit(65536L)), 16),
      lit(4294967296L))
    pmod(prod, lit(buckets))
  }

  /** Deterministic mixture sampling: keep a row iff its id's hash cell
    * (out of 10,000) falls under the source's weight — the
    * reproducible way to blend sources into a training mixture.
    * Unlike `sample()`/`sampleBy()`, membership is a pure function of
    * the id: stable across clusters, partitionings and reruns, and an
    * appended source re-samples consistently. Weights are taken in
    * 1/10000ths (basis points) of each source's rows; unknown sources
    * are dropped (weight 0). */
  def mixtureSample(df: DataFrame, weights: Map[String, Double],
      sourceCol: String = "lang", idCol: String = "doc_id"): DataFrame = {
    require(weights.values.forall(w => w >= 0.0 && w <= 1.0),
      "weights must be fractions in [0, 1]")
    val cell = hashBucketN(col(idCol), 10000L)
    val keep = weights.foldLeft(lit(false)) { case (acc, (src, w)) =>
      acc || (col(sourceCol) === src && cell < math.round(w * 10000).toInt)
    }
    df.filter(keep)
  }

  /** Temperature-weighted mixture resampling: the multinomial
    * source-reweighting LLM training blends use (sample source s with
    * probability ∝ n_s^α, α < 1 flattening the natural distribution so
    * small sources punch above their raw share). Given a document
    * budget, each source's keep-fraction becomes
    * min(1, budget·w_s / Σw / n_s) with w_s = n_s^α, and membership is
    * the same pure-function-of-the-id hash-cell rule as
    * [[mixtureSample]] — stable across clusters, reruns and appends.
    * Unlike [[mixtureSample]], the weights are COMPUTED from corpus
    * statistics, not hand-specced.
    *
    * Determinism contract (what makes this oracle-replayable): source
    * weights fold left-to-right in SOURCE-NAME order driver-side
    * (sources are few — the collect is bounded like a centroid fit);
    * α = 0.5 uses `sqrt` (correctly rounded IEEE, so any engine
    * reproduces it bit-for-bit — `pow`'s rounding is libm-dependent,
    * documented caveat for other α); the per-source threshold is
    * floor(frac·2³²) compared against the full-32-bit Knuth id hash.
    * Scale shape: one tiny groupBy for counts, a broadcast
    * (source → threshold) join, then a map-only filter. */
  def temperatureMixtureSample(df: DataFrame, budgetDocs: Long,
      alpha: Double = 0.5, sourceCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    require(budgetDocs >= 0 && alpha > 0.0 && alpha <= 1.0)
    val spark = df.sparkSession
    // fail fast on null sources: getString(0) would yield a null key
    // whose sortBy comparison NPEs opaquely, and the inner threshold
    // join below would silently drop any non-null rows of an unseen
    // source — make the contract explicit instead
    val rawCounts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("__n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    require(rawCounts.forall(_._1 != null),
      s"temperatureMixtureSample: null $sourceCol values are unsupported — " +
        "filter them out or fill a sentinel source first")
    val counts = rawCounts.sortBy(_._1)
    def w(n: Long): Double =
      if (alpha == 0.5) math.sqrt(n.toDouble) else math.pow(n.toDouble, alpha)
    val sumW = counts.foldLeft(0.0) { case (acc, (_, n)) => acc + w(n) }
    val thresholds = counts.map { case (s, n) =>
      val frac = math.min(1.0, ((budgetDocs.toDouble * w(n)) / sumW) / n.toDouble)
      (s, math.floor(frac * 4294967296.0).toLong)
    }
    val thDf = spark.createDataFrame(thresholds.toIndexedSeq)
      .toDF(sourceCol, "__th")
    df.join(org.apache.spark.sql.functions.broadcast(thDf), sourceCol)
      .filter(hashBucketN(col(idCol), 1L << 32) < col("__th"))
      .drop("__th")
  }

  /** Token-budget sampling: admit each group's documents in
    * deterministic hash order (hv asc, id asc — the same stable
    * pseudorandom order as [[sampleKPerGroup]]) while the running
    * token total stays under `budget` — how training mixtures are
    * actually specced ("2B tokens of lang X"), as opposed to
    * row-count fractions. A doc is admitted iff the tokens BEFORE it
    * total < budget, so the admitted set overshoots by at most one
    * document and is a pure function of the (id, n_tok) set: stable
    * across clusters, reruns and appends.
    *
    * Scale path: the per-group ordered cumsum is the same two-phase
    * prefix sum as [[Packing.packSequences]] — per-(group, hv-bucket)
    * totals (map-side combinable), a bucket-offset window whose
    * partitions hold ≤ 2^32/bucketSpan rows, then the doc-level
    * window only WITHIN a bucket. Buckets whose offset already
    * exceeds the budget are pruned by the inner join BEFORE the
    * doc-level window runs, so corpus-sized groups only do doc-level
    * work for the admitted prefix plus one boundary bucket.
    *
    * Returns (group, id, hv, n_tok, start) — `start` (tokens before
    * this doc in admission order) makes the selection replayable by a
    * SQL window oracle. */
  def tokenBudgetSample(df: DataFrame, budget: Long,
      groupCol: String = "lang", idCol: String = "doc_id",
      textCol: String = "text", bucketSpan: Long = 1L << 24): DataFrame = {
    require(budget > 0 && bucketSpan > 0)
    val hv = hashBucketN(col(idCol), 1L << 32)
    val counted = df.select(col(groupCol), col(idCol), hv.as("hv"),
      TextStats.tokenCount(col(textCol)).as("n_tok"))
    // bucket = hv div span is monotone in hv, so bucket-major order +
    // (hv, id) inside a bucket IS the global (hv, id) order
    val bucketed = counted.withColumn("bucket", expr(s"hv div $bucketSpan"))
    val bucketTotals = bucketed.groupBy(groupCol, "bucket")
      .agg(sum(col("n_tok")).as("btotal"))
    val overBuckets = Window.partitionBy(groupCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketTotals
      .withColumn("boffset", coalesce(sum(col("btotal")).over(overBuckets), lit(0L)))
      .filter(col("boffset") < budget)
      .select(groupCol, "bucket", "boffset")
    val inBucket = Window.partitionBy(groupCol, "bucket").orderBy("hv", idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(offsets, Seq(groupCol, "bucket"))
      .withColumn("start",
        col("boffset") + coalesce(sum(col("n_tok")).over(inBucket), lit(0L)))
      .filter(col("start") < budget)
      .select(col(groupCol), col(idCol), col("hv"), col("n_tok"), col("start"))
  }

  /** Per-domain admission cap: keep at most `k` rows per group, chosen
    * in deterministic hash order ([[sampleKPerGroup]]'s
    * smallest-id-hash-wins draw) — the "at most k documents per
    * registered domain" rule real curation runs BEFORE content dedup,
    * so one crawl-heavy domain can't dominate the mixture. Unlike a
    * quota fed by arrival order, admission is a pure function of the
    * (group, id) set: stable across clusters, reruns, and appends
    * (a new id displaces the current rank-k row only if it hashes
    * lower).
    *
    * Skew story: hot domains are EXACTLY the skew case — a domain with
    * 10^9 docs meets one with 10^2 — and the selection inherits
    * [[TopKAgg]]'s bounded-heap shape: map-side partial heaps cap the
    * shuffle at groups × k entries no matter how hot a domain is, the
    * same clique-to-star stance as the dedup band cap. The admit join
    * back to full rows is (group, id)-keyed and sized by the admitted
    * set (≤ groups × k), which AQE broadcasts when small.
    *
    * Returns the input rows of admitted documents plus (rk, hv) for
    * oracle replay. */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String,
      k: Int): DataFrame =
    df.join(
      sampleKPerGroup(df, groupCol, idCol, k)
        .select(col(groupCol), col(idCol), col("rk"), col("hv")),
      Seq(groupCol, idCol))

  /** Deterministic k-per-group sample: within each group, keep the k
    * rows with the SMALLEST id hash (full 32-bit Knuth multiply; ties
    * by ascending id) — the stable way to draw a fixed-size eval/probe
    * set per stratum. Membership is a pure function of the id set, so
    * appends only displace entries when a new id hashes below a kept
    * one, and reruns are bit-identical on any cluster layout.
    *
    * Scale path: the per-group selection runs as the bounded-heap
    * [[TopKAgg]] aggregate, NOT a per-group window — map-side partial
    * heaps mean shuffle volume is groups × k entries regardless of
    * corpus size, and one giant stratum never lands in one sort task.
    * The 32-bit hash values are exact in double (< 2^53), so the heap
    * ordering equals integer ordering.
    *
    * Returns (group, rk, id, hv): rank 1..k by ascending hash, the
    * hash value kept for oracle replay. */
  def sampleKPerGroup(df: DataFrame, groupCol: String, idCol: String,
      k: Int): DataFrame = {
    val hv = hashBucketN(col(idCol), 1L << 32)
    df.select(col(groupCol), col(idCol), hv.as("hv"))
      .groupBy(groupCol)
      .agg(TopKAgg.topK(col("hv"), col(idCol), k, largest = false).as("tk"))
      .select(col(groupCol), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col(groupCol), (col("pos") + 1).cast("int").as("rk"),
        col("e.id").as(idCol), col("e.ord").cast("long").as("hv"))
  }

  /** Mixture EPOCH/REPEAT plan: the upsampling counterpart of
    * [[temperatureMixtureSample]]. Given a global token budget and a
    * temperature α, each source's token target is
    * `budget · n_s^α / Σ n^α` (tokens, not docs — mixtures are specced
    * in tokens), and `epochs_x1000 = target·1000 div n_s` says how
    * many times the source repeats per training run — >1000 means the
    * small curated source is seen more than once per epoch, the
    * DoReMi/LLaMA-style repeat table q66/q99 (which only DOWN-sample)
    * cannot express. Fixed-point BIGINTs end to end: the only doubles
    * are the α-weights, folded in source-name order on the driver
    * (bounded by the number of sources) exactly as the SQL oracle
    * replays them with an ordered `list_reduce`.
    *
    * Scale shape: one map-side-combinable groupBy over the corpus for
    * (docs, tokens) per source, then O(S) driver arithmetic — the
    * plan is an S-row artifact, not a per-document pass. */
  def epochPlan(df: DataFrame, budgetTokens: Long, alpha: Double = 0.5,
      sourceCol: String = "source", textCol: String = "text"): DataFrame = {
    require(budgetTokens >= 0 && alpha > 0.0 && alpha <= 1.0)
    val spark = df.sparkSession
    val raw = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("__docs"),
        sum(TextStats.tokenCount(col(textCol))).as("__toks"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    require(raw.forall(_._1 != null),
      s"epochPlan: null $sourceCol values are unsupported — " +
        "filter them out or fill a sentinel source first")
    val stats = raw.sortBy(_._1)
    def w(n: Long): Double =
      if (alpha == 0.5) math.sqrt(n.toDouble) else math.pow(n.toDouble, alpha)
    val sumW = stats.foldLeft(0.0) { case (acc, (_, _, t)) => acc + w(t) }
    val rows = stats.map { case (s, d, t) =>
      // sumW == 0 ⇔ every source has 0 tokens: there is nothing to
      // allocate, so every target is 0 (instead of floor(NaN) = 0 by
      // accident — made explicit so a guard change can't regress it)
      val target =
        if (sumW == 0.0) 0L
        else math.floor((budgetTokens.toDouble * w(t)) / sumW).toLong
      // ×1000 fixed-point through BigInt: target·1000 overflows Long
      // for budgets above ~9.2e15 tokens (within range for a 100 TB
      // corpus plan), and this is O(S) driver arithmetic, so the
      // arbitrary-precision hop costs nothing
      val epochsX1000 =
        if (t == 0) 0L else ((BigInt(target) * 1000) / t).toLong
      (s, d, t, target, epochsX1000)
    }
    spark.createDataFrame(rows.toIndexedSeq)
      .toDF(sourceCol, "n_docs", "n_tokens", "target_tokens", "epochs_x1000")
  }

  /** EXACT stratified split: per stratum (any column combination),
    * exactly ⌊n·num/den⌋ rows are held out, chosen in the
    * deterministic (knuth-hash, id) order every sampler here uses —
    * the eval-set construction that guarantees every (source, lang,
    * …) cell is represented at its exact quota, where [[assignSplit]]
    * only hits fractions in expectation (a small stratum can land
    * entirely in train by hash luck). The verdict is an integer
    * cross-multiply (`rank·den ≤ n·num`) — no float quota to round
    * differently anywhere.
    *
    * Scale shape: ranking within strata uses [[Ranks.exactGroupRank]]
    * (radix order statistics — every window partition ≤ 4096 rows,
    * never a stratum-sized sort partition, the q88/q109 contract);
    * stratum sizes are an S-row broadcast. The hash-order value fed
    * to the ranker is `(2³² − hv)/2³²` — exact in binary (power-of-
    * two divisor), strictly decreasing in hv, so rank-by-value-desc
    * IS hash-ascending order. */
  def stratifiedSplit(df: DataFrame, strataCols: Seq[String],
      heldNum: Long, heldDen: Long,
      idCol: String = "doc_id"): DataFrame = {
    require(strataCols.nonEmpty && heldDen > 0 &&
      heldNum >= 0 && heldNum <= heldDen)
    // INJECTIVE stratum key: each component is length-prefixed
    // ("V<len>:<value>", nulls -> "N"), so the encoding parses
    // unambiguously left-to-right and distinct tuples can never
    // collide -- concat_ws (any delimiter) SKIPS nulls, merging
    // (null,"x") and ("x",null) into one stratum with a single
    // combined quota, and a delimiter character appearing inside a
    // value would do the same; either silently diverges from the
    // per-tuple PARTITION BY the oracle runs
    val stratum = concat(strataCols.map { c =>
      val sc = col(c).cast("string")
      when(sc.isNull, lit("N"))
        .otherwise(concat(lit("V"), length(sc), lit(":"), sc))
    }: _*)
    val base = df.select(
      (col(idCol) +: strataCols.map(col)) :+
        stratum.as("__stratum") :+
        hashBucketN(col(idCol), 1L << 32).as("hv"): _*)
    val value = (lit(4294967296.0) - col("hv").cast("double")) /
      lit(4294967296.0)
    val ranked = Ranks.exactGroupRank(
      base.withColumn("__v0", value), "__stratum", idCol, col("__v0"))
      .select(col(idCol), col("rnk"))
    val sizes = base.groupBy(col("__stratum"))
      .agg(count(lit(1)).as("n_stratum"))
    base.join(ranked, Seq(idCol))
      .join(broadcast(sizes), Seq("__stratum"))
      .withColumn("split",
        when(col("rnk") * lit(heldDen) <= col("n_stratum") * lit(heldNum),
          lit("held")).otherwise(lit("train")))
      .drop("__stratum")
  }

  /** EXACT weighted systematic sample: draw `k` picks with
    * probability proportional to an integer `weight` (e.g. token
    * count), WITHOUT any transcendental priority math. The corpus is
    * laid on a line in deterministic (knuth-hash, id) order, each row
    * occupying an interval of its weight; the k midpoint targets
    * `t_j = ⌊(2j+1)·W ∕ 2k⌋` (W = total weight, j = 0..k−1) are
    * systematic-resampling pointers, and a row is picked once per
    * target falling inside its interval — the particle-filter /
    * mixture-loader "systematic resampling" scheme, where a row
    * heavier than W∕k is legitimately picked MULTIPLE times
    * (`n_picks` carries the multiplicity, Σ n_picks = k always).
    * Everything is integer arithmetic — the per-row verdict counts
    * odd multiples m with `2k·cum ≤ m·W < 2k·(cum+w)` via ceil-
    * division bounds — so the oracle replays it bit-for-bit; the
    * Efraimidis–Spirakis `u^(1∕w)` alternative would hang the result
    * on `ln`∕`pow` ulps that differ across runtimes.
    *
    * Scale shape: the global prefix sum is the [[Packing]] two-phase
    * scheme keyed by hash-range buckets — per-bucket totals are one
    * map-side-combinable aggregate, the running offset over buckets
    * windows only that tiny frame, and in-bucket offsets window
    * hash-range partitions (uniform by construction). The per-row
    * verdict is a broadcast of the 1-row total plus DECIMAL(38,0)
    * products (2k·cum reaches ~4e28 at 100 TB-scale W and large k —
    * past BIGINT, nowhere near decimal38). No corpus-sized sort
    * partition anywhere. */
  def systematicWeightedSample(df: DataFrame, k: Int, weight: Column,
      idCol: String = "doc_id", bucketSpan: Long = 1L << 22): DataFrame = {
    require(k > 0 && bucketSpan > 0)
    // assert_true folds the ≥0 contract into the weight column itself
    // (a standalone check column would be pruned away unevaluated)
    val base = df.select(
      col(idCol),
      coalesce(assert_true(weight.cast("long") >= 0,
          lit(s"systematicWeightedSample: negative weight")).cast("long"),
        weight.cast("long")).as("__w"),
      hashBucketN(col(idCol), 1L << 32).as("hv"))
    val bucketed = base.withColumn("__bucket", expr(s"hv div $bucketSpan"))
    // localCheckpoint: the (≤ buckets)-row phase-1 frame feeds BOTH
    // the offsets window and the grand total, and Spark plans no
    // exchange reuse across the two subtrees — uncheckpointed, the
    // corpus aggregation would run twice (verified in the plan)
    val bucketTotals = bucketed.groupBy("__bucket")
      .agg(sum(col("__w")).as("__btotal"))
      .localCheckpoint(true)
    val overBuckets = Window.orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketTotals
      .withColumn("__boff",
        coalesce(sum(col("__btotal")).over(overBuckets), lit(0L)))
      .select("__bucket", "__boff")
    val inBucket = Window.partitionBy("__bucket").orderBy("hv", idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val placed = bucketed.join(broadcast(offsets), "__bucket")
      .withColumn("__cum",
        col("__boff") + coalesce(sum(col("__w")).over(inBucket), lit(0L)))
    // total from the (≤ buckets)-row phase-1 frame, NOT a second
    // corpus aggregate: Spark plans no exchange reuse across the
    // self-referencing subtrees, so base.agg here would scan and
    // shuffle the corpus twice (verified in the physical plan)
    val total = bucketTotals.agg(sum(col("__btotal")).as("__total"))
    val dec = "decimal(38,0)"
    val withT = placed.crossJoin(broadcast(total))
      .withColumn("__a",
        (lit(2L * k).cast(dec) * col("__cum").cast(dec)))
      .withColumn("__b",
        (lit(2L * k).cast(dec) * (col("__cum") + col("__w")).cast(dec)))
      .withColumn("__t", col("__total").cast(dec))
    // lo = ⌈A∕W⌉, hi = ⌈B∕W⌉ − 1: the odd multiples of 1 in [lo, hi]
    // are exactly the targets inside [cum, cum+w); count of odd ints
    // in [lo, hi] = ⌊(hi+1)∕2⌋ − ⌊lo∕2⌋ (all values non-negative)
    val counted = withT
      .withColumn("__lo", expr("(__a + __t - 1) div __t"))
      .withColumn("__hi", expr("(__b + __t - 1) div __t") - 1)
      .withColumn("n_picks",
        when(col("__total") === 0 || col("__hi") < col("__lo"), lit(0L))
          .otherwise(expr("(__hi + 1) div 2") - expr("__lo div 2")))
    counted.filter(col("n_picks") > 0)
      .select(col(idCol), col("__w").as("weight"), col("n_picks"))
  }

  /** [[systematicWeightedSample]] PER GROUP: k weight-proportional
    * picks within every `groupCol` value independently — the
    * stratified mixture draw ("k token-weighted picks per source")
    * that builds a balanced subcorpus in one pass, where the global
    * sampler would let a giant source swallow every slot. Same exact
    * integer arithmetic, same Σ n_picks = k invariant, now per group.
    *
    * Scale shape: the prefix sum runs per (group, hash-bucket) — the
    * bucket-offset window partitions by GROUP (≤ buckets rows each,
    * never corpus-sized), in-bucket windows partition by (group,
    * bucket), and per-group totals are an S-row aggregate joined
    * back. The offsets frame is S × buckets rows — joined on (group,
    * bucket) without a broadcast hint so AQE can pick sides at real
    * scale. */
  def systematicWeightedSamplePerGroup(df: DataFrame, k: Int,
      weight: Column, groupCol: String, idCol: String = "doc_id",
      bucketSpan: Long = 1L << 22): DataFrame = {
    require(k > 0 && bucketSpan > 0)
    val base = df.select(
      col(groupCol),
      col(idCol),
      coalesce(assert_true(weight.cast("long") >= 0,
          lit(s"systematicWeightedSamplePerGroup: negative weight")).cast("long"),
        weight.cast("long")).as("__w"),
      hashBucketN(col(idCol), 1L << 32).as("hv"))
    val bucketed = base.withColumn("__bucket", expr(s"hv div $bucketSpan"))
    // localCheckpoint: shared by the offsets window and the per-group
    // totals (see the ungrouped variant)
    val bucketTotals = bucketed.groupBy(groupCol, "__bucket")
      .agg(sum(col("__w")).as("__btotal"))
      .localCheckpoint(true)
    val overBuckets = Window.partitionBy(groupCol).orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketTotals
      .withColumn("__boff",
        coalesce(sum(col("__btotal")).over(overBuckets), lit(0L)))
      .select(col(groupCol), col("__bucket"), col("__boff"))
    val inBucket = Window.partitionBy(groupCol, "__bucket").orderBy("hv", idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val placed = bucketed.join(offsets, Seq(groupCol, "__bucket"))
      .withColumn("__cum",
        col("__boff") + coalesce(sum(col("__w")).over(inBucket), lit(0L)))
    // per-group totals from the S × buckets phase-1 frame (see the
    // ungrouped variant: a second corpus aggregate would not be
    // exchange-reused)
    val totals = bucketTotals.groupBy(groupCol)
      .agg(sum(col("__btotal")).as("__total"))
    val dec = "decimal(38,0)"
    val withT = placed.join(broadcast(totals), Seq(groupCol))
      .withColumn("__a",
        (lit(2L * k).cast(dec) * col("__cum").cast(dec)))
      .withColumn("__b",
        (lit(2L * k).cast(dec) * (col("__cum") + col("__w")).cast(dec)))
      .withColumn("__t", col("__total").cast(dec))
    val counted = withT
      .withColumn("__lo", expr("(__a + __t - 1) div __t"))
      .withColumn("__hi", expr("(__b + __t - 1) div __t") - 1)
      .withColumn("n_picks",
        when(col("__total") === 0 || col("__hi") < col("__lo"), lit(0L))
          .otherwise(expr("(__hi + 1) div 2") - expr("__lo div 2")))
    counted.filter(col("n_picks") > 0)
      .select(col(groupCol), col(idCol), col("__w").as("weight"),
        col("n_picks"))
  }

  /** TRAINING-ORDER MIXING audit: per source, how often adjacent
    * documents in the engine's standing pseudo-shuffle order
    * ([[Packing.packShuffled]]'s (knuth-hash, id) permutation — the
    * order real packing consumes) come from the SAME source, against
    * the independence expectation. Ingest order is site/day-
    * clustered; if the shuffle left residual clustering, consecutive
    * training sequences over-sample one source and the optimizer
    * sees non-iid batches — this is the health check that the
    * permutation actually mixed. Exact integers throughout:
    * `adj_same_ppm` = same-source adjacent pairs ·10⁶ div (n−1);
    * `expected_ppm` = cₛ(cₛ−1)·10⁶ div n(n−1) (the probability both
    * ends of a random adjacent slot are source s), DECIMAL(38,0)
    * cross-multiplied so 10⁹-doc sources cannot overflow the
    * numerator. A healthy shuffle has adj_same_ppm ≈ expected_ppm
    * per source; excess is residual clustering in ppm.
    *
    * Shape at scale: the global (hv, id) rank is the two-phase
    * bucket decomposition [[Packing.packSequences]] uses — bucket
    * counts (≤ 2³²/bucketSpan rows) get a value-domain cumulative
    * window, in-bucket ranks a partitioned window, so nothing
    * corpus-sized hits one task; adjacency is one self-join on
    * rank+1 (shuffle-keyed), and the rollup is source-bounded.
    *
    * Returns (source, n_docs, adj_same, adj_same_ppm, expected_ppm)
    * ordered by source. */
  def orderMixingAudit(docs: DataFrame, groupCol: String = "source",
      idCol: String = "doc_id", bucketSpan: Long = 1L << 20): DataFrame = {
    require(bucketSpan > 0)
    val b = docs.select(col(idCol).cast("long").as("__id"),
        col(groupCol).as("__g"),
        hashBucketN(col(idCol), 1L << 32).as("__hv"))
      .withColumn("__bk", expr(s"__hv div $bucketSpan"))
    val cnts = b.groupBy("__bk").agg(count(lit(1)).as("__n"))
    // value-domain window: one row per occupied bucket, ≤ 2^32/span
    val overB = Window.orderBy(col("__bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = cnts
      .withColumn("__off", coalesce(sum(col("__n")).over(overB), lit(0L)))
      .select(col("__bk"), col("__off"))
    val wIn = Window.partitionBy("__bk").orderBy(col("__hv"), col("__id"))
    val ranked = b.join(offs, Seq("__bk"))
      .withColumn("__r", col("__off") + row_number().over(wIn))
    val adj = ranked.select(col("__r").as("__ra"), col("__g").as("__ga"))
      .join(ranked.select((col("__r") - 1).as("__ra"), col("__g").as("__gb")),
        Seq("__ra"))
    val perSrc = b.groupBy(col("__g").as("source"))
      .agg(count(lit(1)).as("n_docs"))
    val sameAdj = adj.filter(col("__ga") === col("__gb"))
      .groupBy(col("__ga").as("source")).agg(count(lit(1)).as("adj_same"))
    val nTot = b.agg(count(lit(1)).as("__N"))
    perSrc.join(sameAdj, Seq("source"), "left")
      .na.fill(0L, Seq("adj_same"))
      .crossJoin(broadcast(nTot))
      .select(col("source"), col("n_docs"), col("adj_same"),
        expr("(adj_same * 1000000) div (__N - 1)").as("adj_same_ppm"),
        expr("""cast((cast(n_docs as decimal(38,0)) * (n_docs - 1) * 1000000)
                div (cast(__N as decimal(38,0)) * (__N - 1)) as bigint)""")
          .as("expected_ppm"))
      .orderBy("source")
  }
}
