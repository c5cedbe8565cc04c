package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Model-based quality gating: a hashed linear classifier over unigram
  * features — the C4/fastText-shaped step in curation pipelines
  * ("does this document look like the reference class?"), reduced to
  * its integer-exact skeleton so the gate is bit-replayable by a SQL
  * oracle at any partitioning:
  *
  *  - feature: each non-empty whitespace token hashes to one of `dim`
  *    buckets via a polynomial codepoint hash mod a large prime
  *    (the [[TextStats.rollingFingerprint]] family — every engine
  *    computes it identically, no murmur/xxhash dialect drift);
  *  - weights: a fixed pseudo-random integer vector derived from the
  *    bucket index by the 32-bit Knuth multiply ([[Splits.hashBucketN]]
  *    lineage), mapped into [-500, 500] — the stand-in for trained
  *    coefficients;
  *  - score: Σ over token occurrences of the bucket weight (BIGINT —
  *    no float-sum ordering hazards); keep iff score ≥ threshold.
  *
  * Swapping the weight formula for a broadcast (bucket → weight)
  * lookup loaded from a trained model changes nothing structural —
  * the point being demonstrated is the SHAPE: classifier inference is
  * a single codegen'd map-only pass (nested higher-order functions,
  * zero UDFs, zero shuffles), so at 100 TB it is scan-bound and
  * embarrassingly parallel, exactly like [[TextStats.qualityScore]].
  */
object Classifier {

  val HashPrime = 1000000007L

  /** Polynomial codepoint hash of one token: fold over characters of
    * `(acc·131 + code) mod p`. Empty tokens are excluded upstream
    * (sequence(1,0) would run DESCENDING and poison the fold). */
  def tokenHash(tok: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(tok)),
        i => ascii(tok.substr(i, lit(1))).cast(LongType)),
      lit(0L),
      (acc, c) => (acc * lit(131L) + c) % lit(HashPrime))

  /** Deterministic weight for a feature bucket: Knuth 32-bit multiply
    * mapped into [-500, 500]. bucket < dim ≤ 2^20 keeps the product
    * far from long overflow (ANSI-mode safe). */
  def bucketWeight(bucket: Column): Column =
    (bucket * lit(2654435761L)) % lit(4294967296L) % lit(1001L) - lit(500L)

  /** Per-document classifier score over hashed unigram features. */
  def hashedLinearScore(text: Column, dim: Long = 64L): Column = {
    require(dim > 0 && dim <= (1L << 20))
    val toks = filter(split(text, "\\s+"), t => length(t) > lit(0))
    aggregate(
      transform(toks, t => bucketWeight(tokenHash(t) % lit(dim))),
      lit(0L), (acc, w) => acc + w)
  }

  /** (id, n_tok, score, kept) — the gate verdict per document. */
  def scoreDocs(docs: DataFrame, dim: Long = 64L, threshold: Long = 0L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol),
      size(filter(split(t, "\\s+"), x => length(x) > lit(0))).cast(LongType).as("n_tok"),
      hashedLinearScore(t, dim).as("score"))
      .withColumn("kept", col("score") >= lit(threshold))
  }
}
