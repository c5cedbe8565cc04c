package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Co-occurrence mining, in two granularities a training/analytics
  * pipeline both needs: SET co-occurrence (two items seen by the same
  * user — the co-visitation matrix behind "users who viewed X also
  * viewed Y" and behind building an item graph to feed
  * [[PageRank]]), and ADJACENCY co-occurrence (two tokens next to
  * each other more often than their frequencies predict — collocation
  * / phrase mining, the corpus-statistics view of what a BPE trainer
  * ends up merging). Both are exact integer computations end to end.
  */
object CoOccurrence {

  /** Top-k co-visitation pairs: items co-occurring in the most
    * distinct user sets. Returns (item_a, item_b, n_users) with
    * item_a < item_b, ranked by (n_users desc, item_a, item_b) —
    * a deterministic total order, so top-k is stable.
    *
    * Shape at scale: the distinct (user, item) projection is one
    * map-side-combined aggregation; the pair join is user-keyed and
    * co-partitioned (both sides ARE the same frame — one exchange,
    * reused), producing Σ_u m_u² rows for per-user activity m_u. That
    * quadratic is in USER ACTIVITY, not corpus size — bounded data
    * (sessions) keeps it linear-ish; for power users/bots cap
    * activity first ([[Splits.capPerGroup]] on the user key — the
    * same guard the dedup funnel applies to hot band buckets). The
    * final top-k is a TakeOrdered, never a full sort. */
  def coVisitation(interactions: DataFrame, k: Int = 15,
      userCol: String = "user_id", itemCol: String = "item"): DataFrame = {
    require(k > 0)
    val ui = interactions.select(col(userCol).as("__u"), col(itemCol).as("__i"))
      .distinct()
    val a = ui.alias("a"); val b = ui.alias("b")
    a.join(b, col("a.__u") === col("b.__u") && col("a.__i") < col("b.__i"))
      .groupBy(col("a.__i").as("item_a"), col("b.__i").as("item_b"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("item_a"), col("item_b"))
      .limit(k)
  }

  /** Ordered adjacent-pair counts over the raw token stream — the
    * shared substrate under [[collocations]] (directional phrase
    * stats) and the undirected co-occurrence GRAPH ([[Triangles]]
    * closure analysis; canonicalize with least/greatest and sum the
    * two directions first). Map-only pair extraction (transform +
    * explode, no positional self-join), one pair-keyed aggregation
    * with map-side combine. Returns (w1, w2, n_pair). */
  def adjacentPairCounts(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = filter(split(col(textCol), "\\s+"), x => length(x) > lit(0))
    docs.select(toks.as("__t"))
      .filter(size(col("__t")) >= 2)
      // explode_OUTER for the InferFiltersFromGenerate reason
      // documented in [[collocations]]
      .select(explode_outer(transform(sequence(lit(0), size(col("__t")) - 2),
        i => struct(element_at(col("__t"), i + 1).as("w1"),
          element_at(col("__t"), i + 2).as("w2")))).as("__p"))
      .select(col("__p.w1").as("w1"), col("__p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
  }

  /** Top-k collocations: adjacent token pairs occurring at least
    * `minCount` times, ranked by raw pair count, each carrying an
    * exact integer LIFT in ppm — `n_pair · N · 1e6 ∕∕ (n_w1 · n_w2)`,
    * the cross-multiplied "observed over expected-if-independent"
    * ratio (1e6 ≈ independent; ≫ 1e6 ≈ a phrase). A log-PMI spelling
    * would rank identically per count tier but cost ln() ulps and the
    * oracle replay; the ppm integer is exact in both engines.
    * Occurrence counts are over the RAW token stream (not distinct
    * per doc) — collocation strength is a property of the stream.
    *
    * Shape at scale: pair extraction is a map-only transform+explode
    * (no self-join on position), then one pair-keyed aggregation with
    * map-side combine; unigram counts are a second aggregation and
    * join back onto the (already much smaller, `minCount`-filtered)
    * pair frame by each word — AQE broadcasts when the vocabulary
    * fits. Products run in DECIMAL(38,0): `n_pair · N · 1e6` stays
    * exact to N ≈ 10¹⁴ tokens against BIGINT's 9.2e18 ceiling on the
    * middle term alone.
    *
    * Returns (w1, w2, n_pair, n_w1, n_w2, lift_ppm). */
  def collocations(docs: DataFrame, k: Int = 20, minCount: Long = 5L,
      textCol: String = "text"): DataFrame = {
    require(k > 0 && minCount >= 1)
    val toks = filter(split(col(textCol), "\\s+"), x => length(x) > lit(0))
    val tokenStream = docs.select(toks.as("__t"))
    val uni = tokenStream.select(explode(col("__t")).as("__w"))
    val counts = uni.groupBy("__w").agg(count(lit(1)).as("__n"))
    val total = uni.agg(count(lit(1)).cast(DecimalType(38, 0)).as("__nt"))
    // explode_OUTER inside adjacentPairCounts: an inner explode would
    // make InferFiltersFromGenerate re-substitute two full copies of
    // the pair-building HOF below the filter (the ngramNovelty
    // lesson); outer is equivalent because size ≥ 2 guarantees ≥ 1 pair
    val pairs = adjacentPairCounts(docs, textCol)
      .withColumnRenamed("n_pair", "__np")
      .filter(col("__np") >= minCount)
    pairs
      .join(counts.select(col("__w").as("__wa"), col("__n").as("__na")),
        col("w1") === col("__wa"))
      .join(counts.select(col("__w").as("__wb"), col("__n").as("__nb")),
        col("w2") === col("__wb"))
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"),
        col("__np").as("n_pair"),
        col("__na").as("n_w1"),
        col("__nb").as("n_w2"),
        // IntegralDivide (`div`) on DECIMAL(38,0) operands is an exact
        // integer quotient — `.divide` would re-scale and could ROUND
        // at precision 38, silently breaking oracle parity
        expr("""CAST((CAST(__np AS DECIMAL(38,0)) * __nt * 1000000)
                 div (CAST(__na AS DECIMAL(38,0)) * CAST(__nb AS DECIMAL(38,0)))
               AS BIGINT)""").as("lift_ppm"))
      .orderBy(col("n_pair").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** NEXT-TOKEN table: for every prefix token seen at least
    * `minPrefix` times, its top-`k` successors by transition count —
    * the materialized bigram LM head. This is the artifact an
    * autocomplete, a speculative-decoding draft table, or a
    * "fluency vs corpus statistics" eval reads; [[TextStats
    * .bigramSurprisal]] scores documents against exactly these
    * transition counts, this view exposes the model itself.
    * `cond_ppm = n_pair·1e6 div n_prefix` is the exact integer
    * conditional probability P(w2|w1) in ppm.
    *
    * Shape at scale: one map-only pair extraction collapsed by
    * (w1, w2) with map-side combine ([[adjacentPairCounts]]) — the
    * window then ranks FOLLOWER SETS (per-prefix distinct successors,
    * vocabulary-bounded), never the corpus row stream; the
    * `minPrefix` gate drops the hapax-prefix long tail before the
    * shuffle into the window. Ties rank (count desc, w2 asc) — a
    * total order, so the emitted table is deterministic.
    *
    * Returns (w1, rank, w2, n_pair, n_prefix, cond_ppm). */
  def nextTokenTopK(docs: DataFrame, k: Int = 3, minPrefix: Long = 20L,
      textCol: String = "text"): DataFrame = {
    require(k >= 1 && minPrefix >= 1)
    val pairs = adjacentPairCounts(docs, textCol)
    val pref = pairs.groupBy(col("w1").as("__w1"))
      .agg(sum(col("n_pair")).as("n_prefix"))
      .filter(col("n_prefix") >= minPrefix)
    val w = Window.partitionBy(col("w1"))
      .orderBy(col("n_pair").desc, col("w2"))
    pairs.join(pref, col("w1") === col("__w1"))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("w1"), col("rank"), col("w2"), col("n_pair"),
        col("n_prefix"),
        expr("(n_pair * 1000000L) div n_prefix").as("cond_ppm"))
      .orderBy(col("w1"), col("rank"))
  }

  /** SKIP-GRAM co-occurrence counts: unordered token pairs within
    * `window` positions of each other (the word2vec/GloVe context
    * substrate — [[adjacentPairCounts]] is the window=1 directional
    * special case). Pairs are canonicalized (least, greatest) so each
    * unordered co-occurrence counts once per position pair; the top-k
    * by (count desc, w_a, w_b) is a deterministic total order.
    *
    * Shape at scale: pair extraction is ONE map-only nested
    * transform+flatten (≤ window·len pairs per doc, no positional
    * self-join), collapsed by pair with map-side combine; the
    * `minCount` gate drops the hapax tail before the final
    * TakeOrdered (never a full sort). Returns (w_a, w_b, n_cooc). */
  def skipgramCounts(docs: DataFrame, window: Int = 3, minCount: Long = 2L,
      k: Int = 30, textCol: String = "text"): DataFrame = {
    require(window >= 1 && minCount >= 1 && k >= 1)
    val toks = filter(split(col(textCol), "\\s+"), x => length(x) > lit(0))
    docs.select(toks.as("__t"))
      .filter(size(col("__t")) >= 2)
      // j ranges 1..min(window, n-1-i): never empty for i ≤ n-2, so
      // sequence() cannot flip into its descending mode
      .select(explode_outer(flatten(transform(
        sequence(lit(0), size(col("__t")) - 2),
        i => transform(
          sequence(lit(1), least(lit(window), size(col("__t")) - 1 - i)),
          j => struct(
            least(element_at(col("__t"), i + 1),
              element_at(col("__t"), i + j + 1)).as("wa"),
            greatest(element_at(col("__t"), i + 1),
              element_at(col("__t"), i + j + 1)).as("wb"))))))
        .as("__p"))
      .groupBy(col("__p.wa").as("w_a"), col("__p.wb").as("w_b"))
      .agg(count(lit(1)).as("n_cooc"))
      .filter(col("n_cooc") >= minCount)
      .orderBy(col("n_cooc").desc, col("w_a"), col("w_b"))
      .limit(k)
  }
}
