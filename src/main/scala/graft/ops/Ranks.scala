package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed order statistics for a BOUNDED score: the
  * per-group rank of every row by (value desc, id asc), computed
  * without ever sorting a whole group in one task — the missing piece
  * between a bounded-heap top-k ([[TopKAgg]]: k rows, not ranks) and
  * approximate percentiles (q35: estimates, not positions). Use it
  * for exact quality-percentile gates ("keep the top 30% per
  * language") where the approx path's rank error is not acceptable.
  *
  * The idiomatic window spelling — `row_number() over (partition by g
  * order by v desc)` — shuffles every row of a group into ONE task
  * and sorts the whole group there; at corpus scale a single language
  * is billions of rows. Instead, radix ranking on the value's
  * [0, 1] range: quantize v into two nested cell levels (c1 =
  * ⌊v·cells⌋, c2 on the remainder), count rows per cell
  * (map-side-combinable), turn counts into DESCENDING cumulative
  * offsets with two windows whose partitions hold ≤ `cells` rows
  * each (never corpus-sized), and row_number only WITHIN a
  * (group, c1, c2) cell. rank = off1 + off2 + in-cell row_number —
  * exact, deterministic, partitioning-independent, because the cell
  * decomposition is order-consistent with v (u = v·cells is monotone
  * and (c1 desc, c2 desc, v desc, id) is the global (v desc, id)
  * order).
  *
  * The only skew exposure is a cell holding many IDENTICAL values
  * (e.g. a constant-score corpus): those rows share (c1, c2) and meet
  * in one in-cell window partition. With cells=4096 the two levels
  * separate any values differing by ≥ 1/16M; exact duplicates are
  * ranked by id and can be sub-bucketed by a third id-range level if
  * a degenerate corpus ever needs it.
  *
  * `value` must be in [0, 1] (clamped cells guard the v = 1.0 edge);
  * rank is 1-based.
  */
object Ranks {

  def exactGroupRank(df: DataFrame, groupCol: String, idCol: String,
      value: Column, cells: Int = 4096): DataFrame = {
    require(cells > 1)
    val u = value * lit(cells.toDouble)
    val c1 = least(floor(u), lit((cells - 1).toDouble)).cast("long")
    val c2 = least(floor((u - c1) * lit(cells.toDouble)),
      lit((cells - 1).toDouble)).cast("long")
    val frame = df.select(col(groupCol), col(idCol), value.as("__v"),
      c1.as("__c1"), c2.as("__c2"))
    // level 1: rows per coarse cell; cumulative over cells DESC within
    // the group — ≤ `cells` rows per window partition
    val cnt1 = frame.groupBy(groupCol, "__c1").agg(count(lit(1)).as("n1"))
    val over1 = Window.partitionBy(groupCol).orderBy(col("__c1").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val off1 = cnt1
      .withColumn("__off1", coalesce(sum(col("n1")).over(over1), lit(0L)))
      .select(col(groupCol), col("__c1"), col("__off1"))
    // level 2: rows per fine cell; cumulative over fine cells DESC
    // within (group, coarse cell) — again ≤ `cells` rows per partition
    val cnt2 = frame.groupBy(groupCol, "__c1", "__c2").agg(count(lit(1)).as("n2"))
    val over2 = Window.partitionBy(groupCol, "__c1").orderBy(col("__c2").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val off2 = cnt2
      .withColumn("__off2", coalesce(sum(col("n2")).over(over2), lit(0L)))
      .select(col(groupCol), col("__c1"), col("__c2"), col("__off2"))
    // in-cell rank: partitions are single fine cells
    val inCell = Window.partitionBy(groupCol, "__c1", "__c2")
      .orderBy(col("__v").desc, col(idCol))
    frame
      .join(off1, Seq(groupCol, "__c1"))
      .join(off2, Seq(groupCol, "__c1", "__c2"))
      .withColumn("rnk",
        col("__off1") + col("__off2") + row_number().over(inCell).cast("long"))
      .select(col(groupCol), col(idCol), col("__v").as("value"), col("rnk"))
  }

  /** MERGEABLE-HISTOGRAM median with an exact audit — the order
    * statistic a 100 TB pipeline actually ships (cell-wise-additive
    * histograms, no corpus-sized sort) next to the exact answer that
    * grades it. Two walks per group over a positive integer value:
    *
    *  - `exact_p50`: per-(group, value) counts, cumulative over value
    *    ASC, smallest value whose cumulative count reaches rank
    *    ⌊(n+1)/2⌋ (the lower median). The window partitions are
    *    VALUE-DOMAIN-sized (distinct values per group), never
    *    group-row-sized — for a bounded-domain value like document
    *    length this is exact AND scale-safe, unlike
    *    `row_number() over (partition by g order by v)`.
    *  - `est_p50`: the same walk over ⌊log2(v)⌋ buckets (the
    *    `length(bin(·))−1` trick — no floating log), estimate = the
    *    integer midpoint `(2^b + 2^(b+1) − 1) div 2` of the winning
    *    bucket. This is the sketch a sharded ingest merges by adding
    *    cells; `err_ppm = |est − exact|·1e6 div exact` is the
    *    capacity-plan number: log2 buckets guarantee est within 2×
    *    (err_ppm ≤ 1e6), finer grids shrink it.
    *
    * Values must be ≥ 1 (a document length; `bin` of 0/negatives
    * would bucket nonsensically). Returns
    * (group, n, exact_p50, est_p50, err_ppm). */
  def histogramMedianAudit(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val vc = df
      .groupBy(col(groupCol), col(valueCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__n"))
    val sizes = vc.groupBy(groupCol).agg(sum(col("__n")).as("n"))
    val wv = Window.partitionBy(groupCol).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exact = vc
      .withColumn("__cum", sum(col("__n")).over(wv))
      .join(broadcast(sizes), groupCol)
      .filter(col("__cum") >= expr("(n + 1) div 2"))
      .groupBy(groupCol).agg(min(col("__v")).as("exact_p50"))
    val wb = Window.partitionBy(groupCol).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val est = vc
      .withColumn("__b", (length(bin(col("__v"))) - 1).cast("long"))
      .groupBy(col(groupCol), col("__b")).agg(sum(col("__n")).as("__nb"))
      .withColumn("__cum", sum(col("__nb")).over(wb))
      .join(broadcast(sizes), groupCol)
      .filter(col("__cum") >= expr("(n + 1) div 2"))
      .groupBy(groupCol).agg(min(col("__b")).as("__mb"))
      .withColumn("est_p50",
        expr("""(shiftleft(CAST(1 AS BIGINT), CAST(__mb AS INT))
                + shiftleft(CAST(1 AS BIGINT), CAST(__mb AS INT) + 1) - 1)
               div 2"""))
      .select(col(groupCol), col("est_p50"))
    sizes.join(exact, groupCol).join(est, groupCol)
      .withColumn("err_ppm",
        expr("(abs(est_p50 - exact_p50) * 1000000L) div exact_p50"))
  }

  /** [[histogramMedianAudit]] generalized to a SET of percentiles —
    * the full capacity-plan read (p25/p50/p75/p95 of document length,
    * say) from ONE pass over the same two walks: per-(group, value)
    * counts cumulated over the value domain (exact), and per-(group,
    * log2-bucket) counts cumulated over ≤ 64 buckets (the mergeable
    * sketch), each probed at every target rank
    * `⌊(n−1)·pct/100⌋ + 1` via a broadcast percentile list. Window
    * partitions stay VALUE-DOMAIN-sized; the percentile fan-out
    * multiplies only the tiny post-aggregation frames. Values must be
    * ≥ 1. Returns (group, pct, n, exact_v, est_v, err_ppm) ordered by
    * (group, pct). */
  def histogramQuantileAudit(df: DataFrame, groupCol: String,
      valueCol: String, pcts: Seq[Int] = Seq(25, 50, 75, 95)): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100))
    val pctDf = df.sparkSession.range(1)
      .select(explode(typedLit(pcts.map(_.toLong))).as("pct"))
    val vc = df
      .groupBy(col(groupCol), col(valueCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__n"))
    val sizes = vc.groupBy(groupCol).agg(sum(col("__n")).as("n"))
    val wv = Window.partitionBy(groupCol).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exact = vc
      .withColumn("__cum", sum(col("__n")).over(wv))
      .join(broadcast(sizes), groupCol)
      .crossJoin(broadcast(pctDf))
      .filter(col("__cum") >= expr("((n - 1) * pct) div 100 + 1"))
      .groupBy(groupCol, "pct").agg(min(col("__v")).as("exact_v"))
    val wb = Window.partitionBy(groupCol).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val est = vc
      .withColumn("__b", (length(bin(col("__v"))) - 1).cast("long"))
      .groupBy(col(groupCol), col("__b")).agg(sum(col("__n")).as("__nb"))
      .withColumn("__cum", sum(col("__nb")).over(wb))
      .join(broadcast(sizes), groupCol)
      .crossJoin(broadcast(pctDf))
      .filter(col("__cum") >= expr("((n - 1) * pct) div 100 + 1"))
      .groupBy(groupCol, "pct").agg(min(col("__b")).as("__mb"))
      .withColumn("est_v",
        expr("""(shiftleft(CAST(1 AS BIGINT), CAST(__mb AS INT))
                + shiftleft(CAST(1 AS BIGINT), CAST(__mb AS INT) + 1) - 1)
               div 2"""))
      .select(col(groupCol), col("pct"), col("est_v"))
    exact.join(est, Seq(groupCol, "pct"))
      .join(broadcast(sizes), groupCol)
      .select(col(groupCol), col("pct"), col("n"), col("exact_v"),
        col("est_v"),
        expr("(abs(est_v - exact_v) * 1000000L) div exact_v").as("err_ppm"))
      .orderBy(col(groupCol), col("pct"))
  }

  /** Attach the quantile bucket (0-based, `buckets` of them) each
    * ranked row falls in: bucket = ⌊buckets·(rank−1)/n_group⌋ — the
    * exact-percentile gate ("decile ≤ 2" = top 30%). Group sizes are
    * a tiny broadcast aggregate. */
  def withQuantileBucket(ranked: DataFrame, groupCol: String,
      buckets: Int): DataFrame = {
    require(buckets > 0)
    val sizes = ranked.groupBy(groupCol).agg(count(lit(1)).as("__ng"))
    ranked.join(broadcast(sizes), groupCol)
      .withColumn("bucket", expr(s"($buckets * (rnk - 1)) div __ng"))
      .drop("__ng")
  }

  /** RECIPROCAL-RANK-FUSION of several quality signals: every row is
    * ranked under each signal independently (descending, id
    * tie-break — the exact radix rank, no corpus-sized window), and
    * the fused score is `Σ_s 1e6 div (k0 + rank_s)` — the standard
    * RRF formula (Cormack et al., SIGIR'09) in exact integer
    * arithmetic. Rank fusion is how a curation pipeline combines
    * incommensurable signals (a classifier score, an LM-fluency
    * proxy, a length prior) without learning weights or normalizing
    * distributions: only the ORDER under each signal matters, so one
    * signal's scale can't drown another, and a document must rank
    * well under several lenses to surface.
    *
    * `signals` are (name, integer column) pairs. Each is mapped into
    * [0, 1) for [[exactGroupRank]] by `(s − min) / 2^bits(max−min)`
    * with the OBSERVED min/max (a broadcast one-row aggregate, no
    * driver action): subtracting the integer min is exact, and
    * dividing by a power of two is exact in Double while the shifted
    * value is < 2⁵² — so the map is STRICTLY monotone (never
    * collapses distinct signals into a rounding tie) and spreads the
    * real signal range across the radix cells instead of squashing a
    * bounded signal into one corpus-sized fine cell. Ranges ≥ 2⁵²
    * raise rather than silently break monotonicity. Ranks therefore
    * equal the direct (signal desc, id asc) order — what a SQL replay
    * spells with ROW_NUMBER.
    *
    * Shape at scale: one radix rank per signal (map-side-combined
    * cell counts, cell-bounded windows) joined back on the id — S
    * bounded joins, no global sort anywhere. Returns
    * (id, rank_<name>..., rrf_score) with rrf_score descending
    * (id tie-break). */
  def rrfFusion(df: DataFrame, idCol: String,
      signals: Seq[(String, Column)], k0: Int = 60): DataFrame = {
    require(signals.nonEmpty && k0 >= 1)
    // each signal's rank depends ONLY on the signal frame, so the
    // frame is cached once and every rank derives from it — the
    // original fold joined rank columns into the accumulator and let
    // the NEXT signal's stats/rank/join re-evaluate the whole
    // upstream (classifier score + familiarity join in q169) per
    // consumer: ~10 upstream re-evaluations, measured 37.9 s → 7.7 s
    // on the sf0.1 battery slot. Storage follows the
    // [[graft.ops.Dedup.containmentPairs]] contract (released by
    // Bench's post-query sweep / session teardown).
    val base = df.select(col(idCol) +: signals.map { case (n, c) =>
      c.cast("long").as(s"__s_$n") }: _*).cache()
    base.count() // eager: 2 consumers per signal + final assembly
    val rankFrames = signals.map { case (n, _) =>
      val s = col(s"__s_$n")
      val stats = base.agg(min(s).as("__mn"), (max(s) - min(s)).as("__rg"))
        .select(col("__mn"),
          when(col("__rg") >= lit(1L << 52),
            raise_error(lit(s"rrfFusion: signal $n range >= 2^52 — " +
              "Double map would stop being exact"))).otherwise(
            expr("shiftleft(CAST(1 AS BIGINT), CAST(length(bin(__rg)) AS INT))"))
            .as("__pw"))
      exactGroupRank(
        base.crossJoin(broadcast(stats))
          .select(lit(0).as("__g"), col(idCol),
            ((s - col("__mn")).cast("double") / col("__pw").cast("double"))
              .as("__v0")),
        "__g", idCol, col("__v0"))
        .select(col(idCol).as(s"__rid_$n"), col("rnk").as(s"rank_$n"))
    }
    val ranked = signals.zip(rankFrames).foldLeft(base) {
      case (acc, ((n, _), r)) =>
        acc.join(r, col(idCol) === col(s"__rid_$n")).drop(s"__rid_$n")
    }
    val fused = signals.map { case (n, _) =>
      expr(s"1000000L div (${k0}L + rank_$n)") }
      .reduce(_ + _)
    ranked
      .select(col(idCol) +: signals.map { case (n, _) => col(s"rank_$n") } :+
        fused.as("rrf_score"): _*)
      .orderBy(col("rrf_score").desc, col(idCol))
  }
}
