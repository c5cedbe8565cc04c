package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

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

  /** Polynomial CODEPOINT hash of one token: fold over Unicode code
    * points of `(acc·131 + cp) mod p`.
    *
    * A native expression rather than an `ascii(substr(...))` HOF fold
    * because Spark's `ascii()` returns the first UTF-8 BYTE of its
    * argument (negative for multibyte lead bytes) while the DuckDB
    * oracle's `unicode()` returns the true code point — an
    * `ascii`-based fold diverges engine-vs-oracle on ANY non-ASCII
    * token, and a negative byte flips `%` negative downstream
    * (round-12 advice). Iterating `String.codePointAt` makes the hash
    * the same non-negative value in every engine for all of Unicode,
    * and stays inside whole-stage codegen. */
  def tokenHash(tok: Column): Column =
    GraftBridge.ofExpr(CodepointHashExpr(GraftBridge.exprOf(tok)))

  /** First CODE POINT of a string (0 for empty) — the hash of its
    * 1-character prefix, since `(0·131 + cp) mod p = cp` for every
    * code point. The cross-engine replacement for Spark's byte-wise
    * `ascii()` wherever an oracle replays with DuckDB's
    * codepoint-wise `ascii()`/`unicode()` ([[TextStats]]
    * fingerprints). */
  def firstCodepoint(s: Column): Column =
    tokenHash(s.substr(lit(1), lit(1)))

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

  /** DSIR-flavored target-affinity scoring (Xie et al., "Data
    * Selection for Language Models via Importance Resampling",
    * reduced to its integer-exact skeleton): hash a SMALL target set
    * (the distribution you want more of — curated reference docs,
    * a benchmark's domain) into `dim` unigram buckets, then score
    * every raw-pool document by Σ over its token occurrences of the
    * target's bucket count. Documents whose vocabulary concentrates
    * where the target's does score high; `rate` length-normalizes as
    * `affinity·10⁶ div n_tok` (integer division — no float-sum
    * ordering hazards, bit-replayable at any partitioning). A real
    * DSIR deployment divides by raw-pool bucket frequencies in log
    * space; the integer numerator here keeps the oracle exact while
    * demonstrating the identical plan shape (the denominator is one
    * more broadcast lookup in the same map pass).
    *
    * Scale shape: the target aggregation is dim-bounded (≤ 2^20) and
    * collected ONCE into a literal lookup array, so the corpus pass
    * is a single codegen'd map stage — no join, no shuffle, scan-bound
    * at 100 TB exactly like [[hashedLinearScore]]. */
  def targetAffinityScores(docs: DataFrame, target: DataFrame,
      dim: Long = 64L, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(dim > 0 && dim <= (1L << 20))
    def toks(t: Column) = filter(split(t, "\\s+"), x => length(x) > lit(0))
    // dim-bounded driver collect (the "broadcast the small dim" rule):
    // the literal array keeps the scoring expression inside
    // whole-stage codegen, where a map-side join would add a build
    // relation for a 64-entry table
    val counts = target
      .select(explode(toks(col(textCol))).as("__tok"))
      .select((tokenHash(col("__tok")) % lit(dim)).as("__b"))
      .groupBy(col("__b")).agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lut = typedlit(Array.tabulate(dim.toInt)(i =>
      counts.getOrElse(i.toLong, 0L)).toSeq)
    val t = col(textCol)
    val affinity = aggregate(
      transform(toks(t), x =>
        element_at(lut, (tokenHash(x) % lit(dim)).cast("int") + 1)),
      lit(0L), (acc, c) => acc + c)
    docs.select(
      col(idCol),
      size(toks(t)).cast(LongType).as("n_tok"),
      affinity.as("affinity"))
      .withColumn("rate",
        when(col("n_tok") === 0L, lit(0L))
          .otherwise(expr("affinity * 1000000 DIV n_tok")))
  }
}

/** `string → bigint`: Σ-fold `(acc·131 + codePoint) mod 1000000007`
  * over the string's Unicode code points, left to right. Non-negative
  * for every input (code points are ≥ 0), identical across engines
  * (DuckDB replays it with `unicode(substr(...))`), and codegen'd —
  * the same zero-UDF stance as [[graft.text.SubwordStatsExpr]]. The
  * empty string hashes to 0 (callers filter empty tokens upstream so
  * bucket 0 is not systematically over-weighted by split artifacts). */
case class CodepointHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_codepoint_hash"

  override def nullSafeEval(input: Any): Any =
    CodepointHashExpr.hash(input.asInstanceOf[UTF8String].toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.CodepointHashExpr.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): CodepointHashExpr =
    copy(child = newChild)
}

object CodepointHashExpr {
  /** Static so generated code calls it directly — no reference object
    * needed for a pure function. */
  def hash(s: String): Long = {
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      acc = (acc * 131L + cp) % Classifier.HashPrime
    }
    acc
  }
}
