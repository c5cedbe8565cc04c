package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
