package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch over the corpus token stream, with an exact-count
  * audit — the mergeable fixed-size frequency summary for "how often
  * does X occur" questions that a streaming ingest answers without
  * keeping the vocabulary ([[HeavyHitters]]' Misra-Gries bounds the
  * top set; CMS answers point queries for ANY key, at the cost of
  * one-sided overcount). Everything is deterministic integer
  * arithmetic: row hashes are affine maps of the replayable
  * [[Classifier.tokenHash]] codepoint fold, so a SQL oracle rebuilds
  * the exact counter table and the exact estimates — including the
  * overcounts, which a seeded-murmur sketch could never expose to a
  * bit-exact check.
  *
  * Scale shape (why CMS at 100 TB): the counter build is ONE pass
  * over the exploded token stream into a (row, bucket)-keyed
  * aggregation with map-side combine — the exchange is bounded by
  * d·w cells per partition regardless of corpus size, and counter
  * tables from different corpus shards MERGE by cell-wise addition
  * (how distributed sketching composes). Point estimates then probe
  * the d·w-cell table (broadcast — it is a few KB) with no second
  * corpus pass.
  */
object CountMinSketch {

  /** Fixed affine row-hash coefficients `h_i(t) = ((a·H(t) + b) mod p)
    * mod w` — literals, not seeds, so both engines enumerate the same
    * rows. p = [[Classifier.HashPrime]]; a ≤ 509 keeps a·H < 5·10¹¹,
    * far from Long overflow. */
  private val Coefs: Seq[(Long, Long)] = Seq(
    (3L, 7L), (5L, 11L), (13L, 17L), (31L, 19L),
    (61L, 23L), (127L, 29L), (251L, 31L), (509L, 37L))

  /** The d rows' buckets for one token-hash column, as an array. */
  private def buckets(h: Column, d: Int, w: Int): Column =
    array(Coefs.take(d).map { case (a, b) =>
      ((h * a + b) % Classifier.HashPrime) % w
    }: _*)

  /** Audit frame: the exact top-`topN` tokens (count desc, token —
    * total order) with their exact counts AND their CMS estimates
    * from a d×w counter table. `n_cms ≥ n_exact` always (CMS
    * overcounts, never undercounts); `overcount` quantifies the
    * collision pressure for this (d, w) against this corpus — the
    * number a capacity plan reads. Returns
    * (token, n_exact, n_cms, overcount). */
  def cmsTopVocabAudit(docs: DataFrame, topN: Int = 20, d: Int = 4,
      w: Int = 1024, textCol: String = "text"): DataFrame = {
    require(d >= 1 && d <= Coefs.length && w >= 2 && topN >= 1)
    val uni = docs
      .select(explode(filter(split(col(textCol), "\\s+"),
        x => length(x) > lit(0))).as("__tok"))
    val hashed = uni.select(col("__tok"),
      Classifier.tokenHash(col("__tok")).as("__h"))
    // counter table: d·w cells, map-side combined
    val counters = hashed
      .select(posexplode(buckets(col("__h"), d, w)).as(Seq("__i", "__b")))
      .groupBy("__i", "__b").agg(count(lit(1)).as("__c"))
    // exact top-N under a total order (TakeOrdered, no full sort)
    val top = uni.groupBy(col("__tok"))
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("__tok"))
      .limit(topN)
    // probe: N·d rows joined against the broadcast d·w-cell table
    top
      .select(col("__tok"), col("n_exact"),
        posexplode(buckets(Classifier.tokenHash(col("__tok")), d, w))
          .as(Seq("__qi", "__qb")))
      .join(broadcast(counters),
        col("__qi") === col("__i") && col("__qb") === col("__b"))
      .groupBy(col("__tok").as("token"), col("n_exact"))
      .agg(min(col("__c")).as("n_cms"))
      .withColumn("overcount", col("n_cms") - col("n_exact"))
      .orderBy(col("n_exact").desc, col("token"))
  }
}
