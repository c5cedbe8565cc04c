package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Curation-funnel LINEAGE: one disposition row per input document,
  * recording WHICH stage of the admission funnel dropped it (or that
  * it survived). Production corpus builds are audited exactly this
  * way — "why did doc X not make the training set?" and "how much did
  * each stage remove, per source?" both need a per-document drop
  * reason, not just stage-level counts; the reason table is also what
  * incident reviews join against when a benchmark leak or a junk
  * cluster is found in a shipped corpus.
  *
  * Stage precedence mirrors the [[graft.TrainDataBench]] pipeline
  * order (each stage only sees the previous stage's survivors, so the
  * reasons are mutually exclusive by construction):
  *   1. `capped`      — not admitted by the per-group cap
  *                      ([[Splits.capPerGroup]], deterministic hash
  *                      order);
  *   2. `exact_dup`   — byte-identical text to an admitted doc with a
  *                      smaller id ([[Dedup.dropExact]]);
  *   3. `near_dup`    — MinHash-cluster loser among exact survivors
  *                      ([[Dedup.minhashPairs]] +
  *                      [[Dedup.connectedComponents]], min-id
  *                      survivor);
  *   4. `low_quality` — classifier score below threshold
  *                      ([[Classifier.hashedLinearScore]]);
  *   5. `kept`        — admitted to the corpus.
  *
  * Scale shape: each stage reuses its operator's own scale path (the
  * bounded-heap cap, fingerprint-led exact window, banded MinHash —
  * never all-pairs — and the map-only score), and the disposition
  * frames compose by left-anti joins on id sets that shrink
  * monotonically; the final table is one union of id→reason frames,
  * no corpus-sized window or driver collection anywhere. The admitted
  * set (≤ groups × capK rows) is cached once and feeds stages 2-5.
  */
object Lineage {

  def funnelLineage(docs: DataFrame, capK: Int = 20,
      shingleSize: Int = 3, maxJaccardDist: Double = 0.4,
      scoreThreshold: Long = 0L, scoreDim: Long = 64L,
      groupCol: String = "source", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(capK > 0)
    def ids(df: DataFrame): DataFrame = df.select(col(idCol))
    def stage(df: DataFrame, name: String): DataFrame =
      df.select(col(idCol), lit(name).as("stage"))

    // 1. per-group admission cap (bounded-heap hash order; the
    //    admitted frame is ≤ groups × capK and is reused by every
    //    later stage, so cache it once)
    val admitted = Splits.capPerGroup(docs, groupCol, idCol, capK)
      .drop("rk", "hv").cache()
    val capped = stage(
      docs.join(ids(admitted), Seq(idCol), "left_anti"), "capped")

    // 2. exact dedup among admitted (fingerprint-led window)
    val exact = Dedup.dropExact(admitted, textCol, idCol).cache()
    val exactDup = stage(
      admitted.join(ids(exact), Seq(idCol), "left_anti"), "exact_dup")

    // 3. near-dup clusters among exact survivors: cluster label = the
    //    component's min id, so losers are exactly id =!= cluster
    val pairs = Dedup.minhashPairs(exact, idCol, textCol,
      shingleSize = shingleSize, maxJaccardDist = maxJaccardDist)
    val losers = Dedup.connectedComponents(pairs)
      .filter(col("id") =!= col("cluster"))
      .select(col("id").as(idCol))
    val nearDup = stage(exact.join(losers, Seq(idCol), "left_semi"),
      "near_dup")
    val survivors = exact.join(losers, Seq(idCol), "left_anti")

    // 4. quality gate on survivors; 5. the rest are kept
    val scored = survivors.withColumn("__s",
      Classifier.hashedLinearScore(col(textCol), scoreDim))
    val lowQ = stage(scored.filter(col("__s") < scoreThreshold),
      "low_quality")
    val kept = stage(scored.filter(col("__s") >= scoreThreshold), "kept")

    capped.unionByName(exactDup).unionByName(nearDup)
      .unionByName(lowQ).unionByName(kept)
  }

  /** Stage-level rollup of [[funnelLineage]] per group: how much each
    * funnel stage removed from each source — the corpus-build report
    * table. One extra map-side-combinable aggregate over the lineage
    * frame. */
  def funnelReport(docs: DataFrame, lineage: DataFrame,
      groupCol: String = "source", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), col(groupCol))
      .join(lineage, Seq(idCol))
      .groupBy(col(groupCol), col("stage"))
      .agg(count(lit(1)).as("n_docs"))
}
