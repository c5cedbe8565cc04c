package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Privacy audits over document METADATA — the release-gate
  * counterpart of the content-level PII masking in [[Chunking]]:
  * masking scrubs what the text says, this measures what the
  * metadata row itself gives away. The model is k-ANONYMITY
  * (Sweeney '02): a record is re-identifiable when its combination
  * of quasi-identifiers — attributes that are individually harmless
  * but jointly near-unique, here (lang, source, length bucket) —
  * matches fewer than k corpus rows, because an adversary who knows
  * those attributes of a target can pin the record down. The classic
  * mitigation ladder GENERALIZES the identifier until the cohort
  * reaches k; this operator reports, per document, how far up that
  * ladder it has to climb.
  */
object Privacy {

  /** Per-document k-anonymity GENERALIZATION level over the
    * quasi-identifier ladder
    *   level 0: (lang, source, n_chars div lenBucket)
    *   level 1: (lang, source)
    *   level 2: (lang)
    *   level 3: whole corpus
    * `anon_level` is the FIRST level whose cohort (count of docs
    * sharing the generalized identifier) reaches `k`;
    * `cohort_size` is that cohort's count. Level-0 docs are safe to
    * release with full metadata; higher levels name exactly which
    * attribute must be coarsened/suppressed before release — the
    * actionable output of a Mondrian-style audit without moving any
    * document content. Deterministic: the ladder is fixed, counts
    * are exact, no suppression randomness to replay.
    *
    * Shape at scale: three combo-bounded count aggregations (≤
    * languages × sources × length-buckets rows), each broadcast back
    * onto the corpus — the per-doc pass is map-only; no window, no
    * self-join. A corpus smaller than k reports level 3 with the
    * corpus size (the audit degrades loudly, not wrongly).
    *
    * Returns (doc_id, anon_level, cohort_size) ordered by doc_id. */
  def kAnonymityLevels(docs: DataFrame, k: Long = 3L,
      lenBucket: Long = 100L, idCol: String = "doc_id",
      langCol: String = "lang", sourceCol: String = "source",
      lenCol: String = "n_chars"): DataFrame = {
    require(k >= 1L && lenBucket >= 1L)
    val base = docs.select(col(idCol).as("doc_id"),
      col(langCol).as("__lang"), col(sourceCol).as("__src"),
      expr(s"$lenCol div $lenBucket").as("__lb"))
    val c0 = base.groupBy("__lang", "__src", "__lb")
      .agg(count(lit(1)).as("__n0"))
    val c1 = base.groupBy("__lang", "__src").agg(count(lit(1)).as("__n1"))
    val c2 = base.groupBy("__lang").agg(count(lit(1)).as("__n2"))
    val c3 = base.agg(count(lit(1)).as("__n3"))
    base
      .join(broadcast(c0), Seq("__lang", "__src", "__lb"))
      .join(broadcast(c1), Seq("__lang", "__src"))
      .join(broadcast(c2), Seq("__lang"))
      .crossJoin(broadcast(c3))
      .select(col("doc_id"),
        when(col("__n0") >= k, lit(0L))
          .when(col("__n1") >= k, lit(1L))
          .when(col("__n2") >= k, lit(2L))
          .otherwise(lit(3L)).as("anon_level"),
        when(col("__n0") >= k, col("__n0"))
          .when(col("__n1") >= k, col("__n1"))
          .when(col("__n2") >= k, col("__n2"))
          .otherwise(col("__n3")).as("cohort_size"))
      .orderBy("doc_id")
  }

  /** L-DIVERSITY audit (Machanavajjhala '07) — the attack
    * k-anonymity alone misses: a cohort of k identical rows still
    * leaks its SENSITIVE attribute when all k share one value (the
    * homogeneity attack). Quasi-identifiers here are
    * (source, length bucket); the sensitive attribute is `lang`
    * (the stand-in for whatever column release policy deems
    * sensitive — the operator is column-generic). Per cohort:
    * member count, distinct sensitive values, the dominant value
    * with its exact ppm share (the homogeneity measure), and the
    * 0/1 verdict `n_sensitive ≥ l`. The dominant value is the
    * determinized argmax — max → filter → min, never max_by (the
    * q180 spelling), so ties break by ascending value in both
    * engines.
    *
    * Shape at scale: one (cohort × sensitive) count with map-side
    * combine, then cohort-bounded rollups — rows are bounded by the
    * attribute combination count, never the corpus; no window, no
    * self-join.
    *
    * Returns (source, len_bucket, n_docs, n_sensitive, top_value,
    * top_share_ppm, l_diverse) ordered by (source, len_bucket). */
  def lDiversity(docs: DataFrame, l: Long = 2L, lenBucket: Long = 100L,
      sensitiveCol: String = "lang", sourceCol: String = "source",
      lenCol: String = "n_chars"): DataFrame = {
    require(l >= 1L && lenBucket >= 1L)
    val base = docs.select(col(sourceCol).as("source"),
      expr(s"$lenCol div $lenBucket").as("len_bucket"),
      col(sensitiveCol).as("__sv"))
    val bySv = base.groupBy("source", "len_bucket", "__sv")
      .agg(count(lit(1)).as("__c"))
    val cohorts = bySv.groupBy("source", "len_bucket")
      .agg(sum(col("__c")).as("n_docs"),
        count(lit(1)).as("n_sensitive"),
        max(col("__c")).as("__mc"))
    bySv.join(cohorts, Seq("source", "len_bucket"))
      .filter(col("__c") === col("__mc"))
      .groupBy("source", "len_bucket", "n_docs", "n_sensitive", "__mc")
      .agg(min(col("__sv")).as("top_value"))
      .select(col("source"), col("len_bucket"), col("n_docs"),
        col("n_sensitive"), col("top_value"),
        expr("(__mc * 1000000) div n_docs").as("top_share_ppm"),
        when(col("n_sensitive") >= l, 1L).otherwise(0L).as("l_diverse"))
      .orderBy("source", "len_bucket")
  }

  /** T-CLOSENESS audit (Li '07) — the rung above l-diversity: a
    * cohort can hold l distinct sensitive values and STILL leak when
    * its value MIX diverges from the corpus baseline (a cohort that
    * is 95 % one language in a 50/50 corpus tells an adversary the
    * target's language with near certainty even though both values
    * appear). Per (source, length-bucket) cohort this measures the
    * total-variation distance between the cohort's sensitive-value
    * distribution P and the corpus-wide distribution Q —
    * TVD = ½·Σᵥ|P(v) − Q(v)| — and verdicts `TVD ≤ t`. TVD is Li
    * '07's recommended instance for CATEGORICAL sensitive attributes
    * (equal ground distance makes the EMD collapse to TVD), and it
    * is exactly replayable: with cohort counts cᵥ/n and corpus
    * counts Cᵥ/N,
    *   tvd_ppm = ⌊ Σᵥ|cᵥ·N − Cᵥ·n| · 10⁶ / (2·n·N) ⌋
    * — pure integer arithmetic, no floats to drift between engines.
    * The sum runs over the CORPUS value set, so values the cohort
    * lacks contribute |0 − Cᵥ·n| (absence from a cohort is itself
    * divergence — the term a cohort-only rollup would silently drop).
    *
    * Overflow bound: each |cᵥ·N − Cᵥ·n| ≤ N²; summed over V corpus
    * values and scaled by 10⁶ the worst case is V·N²·10⁶ — at
    * N = 10¹² docs and V = 100 languages that is 10³², inside
    * DECIMAL(38,0); the DuckDB oracle mirrors with HUGEINT.
    *
    * Shape at scale: one (cohort × sensitive) count with map-side
    * combine, a cohort rollup, a value-bounded corpus rollup, then a
    * (cohort × corpus-value) grid LEFT-joined back onto the cohort
    * counts — grid rows are bounded by cohorts × values, never the
    * corpus; the corpus-value and total frames are broadcast. No
    * window, no self-join.
    *
    * Returns (source, len_bucket, n_docs, n_sensitive, tvd_ppm,
    * t_close) ordered by (source, len_bucket); `n_sensitive` is the
    * cohort's distinct-value count (the l-diversity reading, carried
    * so one frame answers both rungs), `t_close` the 0/1 verdict
    * `tvd_ppm ≤ tPpm`. */
  def tCloseness(docs: DataFrame, tPpm: Long = 300000L,
      lenBucket: Long = 100L, sensitiveCol: String = "lang",
      sourceCol: String = "source", lenCol: String = "n_chars"): DataFrame = {
    require(tPpm >= 0L && tPpm <= 1000000L,
      s"tPpm must be a ppm fraction in [0, 1000000], got $tPpm")
    require(lenBucket >= 1L)
    val dec = DecimalType(38, 0)
    val base = docs.select(col(sourceCol).as("source"),
      expr(s"$lenCol div $lenBucket").as("len_bucket"),
      col(sensitiveCol).as("__sv"))
    val bySv = base.groupBy("source", "len_bucket", "__sv")
      .agg(count(lit(1)).as("__c"))
    val cohorts = bySv.groupBy("source", "len_bucket")
      .agg(sum(col("__c")).as("__n"))
    val corpus = base.groupBy("__sv").agg(count(lit(1)).as("__cv"))
    val total = base.agg(count(lit(1)).as("__nn"))
    // NULL is an ORDINARY sensitive category (r18 ADVICE): groupBy
    // forms a null group on both the cohort and corpus sides, so the
    // grid join must be null-safe on every key — a plain equi-join
    // never matches NULL, which would coalesce a cohort's own null
    // mass to c = 0 while the corpus cv still counts it, inflating
    // that cohort's TVD. The oracle joins with IS NOT DISTINCT FROM.
    val bySvR = bySv.select(col("source").as("__js"),
      col("len_bucket").as("__jl"), col("__sv").as("__jv"), col("__c"))
    cohorts
      .crossJoin(broadcast(corpus))
      .join(bySvR, col("source") <=> col("__js")
        && col("len_bucket") <=> col("__jl")
        && col("__sv") <=> col("__jv"), "left")
      .drop("__js", "__jl", "__jv")
      .crossJoin(broadcast(total))
      .select(col("source"), col("len_bucket"), col("__n"), col("__nn"),
        coalesce(col("__c"), lit(0L)).as("__c"), col("__cv"))
      .groupBy("source", "len_bucket", "__n", "__nn")
      .agg(
        sum(when(col("__c") > 0L, 1L).otherwise(0L)).as("n_sensitive"),
        sum(abs(col("__c").cast(dec) * col("__nn").cast(dec)
          - col("__cv").cast(dec) * col("__n").cast(dec))).as("__s"))
      .select(col("source"), col("len_bucket"),
        col("__n").cast("long").as("n_docs"), col("n_sensitive"),
        // 2·n·N in DECIMAL(38,0): long·long would overflow past
        // n·N ≈ 9.2e18, i.e. already at a 3e9-doc corpus
        expr("(__s * 1000000) div (2 * CAST(__n AS DECIMAL(38,0)) * __nn)")
          .as("tvd_ppm"))
      .withColumn("t_close",
        when(col("tvd_ppm") <= tPpm, 1L).otherwise(0L))
      .orderBy("source", "len_bucket")
  }

  /** ORDERED t-closeness (Li '07 §4.2) — the EMD instance for an
    * ORDINAL sensitive attribute, here the document-length bucket:
    * TVD treats every value swap identically, but for an ordered
    * attribute a cohort concentrated at an EXTREME of the range
    * leaks more than one concentrated in the middle (the adversary's
    * estimate is off by the DISTANCE, not just the miss). With unit
    * ground distance between adjacent values the EMD has the closed
    * form
    *   EMD = (1/(V−1)) · Σᵢ |Σ_{j≤i} (P_j − Q_j)|
    * (cumulative shortfalls, i over the value order) — and in the
    * exact integer frame, with cohort counts cⱼ/n, corpus counts
    * Cⱼ/N and V corpus values,
    *   emd_ppm = ⌊ Σᵢ |Sᵢ| · 10⁶ / ((V−1)·n·N) ⌋,
    *   Sᵢ = Σ_{j≤i} (cⱼ·N − Cⱼ·n).
    * The final cumulative sum S_V is zero by construction (both
    * distributions total 1), so summing |Sᵢ| over ALL i equals the
    * i < V sum — no off-by-one to replay. The companion property the
    * spec pins: two cohorts with IDENTICAL TVD (one extreme-loaded,
    * one middle-loaded) get different EMDs, the ordering the TVD
    * rung cannot see. A single-value corpus (V = 1) reports 0 —
    * every distribution equals the baseline trivially.
    *
    * Quasi-identifiers here are (source, lang); the sensitive
    * ordinal is `n_chars div lenBucket`. Overflow bound: as
    * [[tCloseness]] (each |Sᵢ| ≤ N², V·N²·10⁶ ≤ 10³² at N = 10¹²,
    * V = 100 — inside DECIMAL(38,0); HUGEINT in the oracle).
    *
    * Shape at scale: the [[tCloseness]] grid plus ONE cohort-bounded
    * window (the cumulative sum runs over cohorts × values rows,
    * never the corpus).
    *
    * Returns (source, lang, n_docs, n_sensitive, emd_ppm, t_close)
    * ordered by (source, lang). */
  def tClosenessOrdered(docs: DataFrame, tPpm: Long = 300000L,
      lenBucket: Long = 100L, sourceCol: String = "source",
      langCol: String = "lang", lenCol: String = "n_chars"): DataFrame = {
    require(tPpm >= 0L && tPpm <= 1000000L,
      s"tPpm must be a ppm fraction in [0, 1000000], got $tPpm")
    require(lenBucket >= 1L)
    val dec = DecimalType(38, 0)
    // a NULL ordinal has NO position on the value axis — ground
    // distance to every other value is undefined, so null-length
    // docs are excluded from the EMD up front (documented stance;
    // the CATEGORICAL rung keeps null as an ordinary value because
    // TVD needs no ground distance). Cohort KEYS stay null-safe:
    // a null source/lang is an ordinary cohort.
    val base = docs.select(col(sourceCol).as("source"),
        col(langCol).as("lang"), expr(s"$lenCol div $lenBucket").as("__sv"))
      .filter(col("__sv").isNotNull)
    val bySv = base.groupBy("source", "lang", "__sv")
      .agg(count(lit(1)).as("__c"))
    val cohorts = bySv.groupBy("source", "lang")
      .agg(sum(col("__c")).as("__n"))
    val corpus = base.groupBy("__sv").agg(count(lit(1)).as("__cv"))
    val total = base.agg(count(lit(1)).as("__nn"),
      countDistinct(col("__sv")).as("__v"))
    val cumW = org.apache.spark.sql.expressions.Window
      .partitionBy("source", "lang").orderBy("__sv")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val bySvR = bySv.select(col("source").as("__js"),
      col("lang").as("__jl"), col("__sv").as("__jv"), col("__c"))
    cohorts
      .crossJoin(broadcast(corpus))
      .join(bySvR, col("source") <=> col("__js")
        && col("lang") <=> col("__jl")
        && col("__sv") <=> col("__jv"), "left")
      .drop("__js", "__jl", "__jv")
      .crossJoin(broadcast(total))
      .select(col("source"), col("lang"), col("__sv"), col("__n"),
        col("__nn"), col("__v"),
        coalesce(col("__c"), lit(0L)).as("__c"), col("__cv"))
      .withColumn("__cum",
        sum(col("__c").cast(dec) * col("__nn").cast(dec)
          - col("__cv").cast(dec) * col("__n").cast(dec)).over(cumW))
      .groupBy("source", "lang", "__n", "__nn", "__v")
      .agg(
        sum(when(col("__c") > 0L, 1L).otherwise(0L)).as("n_sensitive"),
        sum(abs(col("__cum"))).as("__s"))
      .select(col("source"), col("lang"),
        col("__n").cast("long").as("n_docs"), col("n_sensitive"),
        when(col("__v") <= 1L, lit(0L)).otherwise(
          expr("(__s * 1000000) div " +
            "((__v - 1) * CAST(__n AS DECIMAL(38,0)) * __nn)"))
          .as("emd_ppm"))
      .withColumn("t_close",
        when(col("emd_ppm") <= tPpm, 1L).otherwise(0L))
      .orderBy("source", "lang")
  }
}
