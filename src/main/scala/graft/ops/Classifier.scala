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

  /** CALIBRATION (reliability-diagram) audit of any integer quality
    * score against any boolean reference label: rank every document
    * by (score desc, id), cut the ranking into `buckets` equal-count
    * bins, and report each bin's exact observed positive rate — the
    * table a reliability diagram plots, and the measurement that
    * decides whether a cheap gate's threshold transfers to a new
    * corpus slice ("the top decile is 92 % good, the 6th is 31 % —
    * gate at decile 3"). Score and label are caller-supplied columns,
    * so the same audit runs over the stopword-rate heuristic, the
    * q108 hashed classifier, or the q109 percentile gate unchanged.
    *
    * The global rank is the exact two-phase radix decomposition
    * (bucket on `score div rankSpan` — value-domain rows only — then
    * an in-bucket window): no corpus-sized sort lands on one task,
    * the [[Ranks.exactGroupRank]] argument. Bin = ((rank−1)·buckets)
    * div n — equal-count bins exact to ±1 row, deterministic under
    * any partitioning. All outputs exact integers:
    * `pos_ppm = n_pos·10⁶ div n_docs` per bin.
    *
    * `score` may be any long: `div` truncates toward zero, so the
    * bucket cell for scores in (−rankSpan, rankSpan) straddles both
    * signs, but bucket-ascending order stays score-descending (cells
    * never interleave) and the in-bucket window re-orders exactly.
    * Returns
    * (bucket, n_docs, score_min, score_max, n_pos, pos_ppm)
    * ordered by bucket (0 = highest scores). */
  def calibrationAudit(docs: DataFrame, score: Column, label: Column,
      buckets: Int = 10, rankSpan: Long = 1024L,
      idCol: String = "doc_id"): DataFrame = {
    require(buckets >= 1 && rankSpan >= 1)
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col(idCol).cast("long").as("__id"),
        score.cast(LongType).as("__s"),
        when(label, 1L).otherwise(0L).as("__pos"))
      .cache()
    base.count() // eager: rank offsets + total both read it
    // rank by (score DESC, id): bucket on the negated span cell so
    // bucket-ascending order is score-descending
    val b = base.withColumn("__bk", expr(s"-(__s div $rankSpan)"))
    val cnts = b.groupBy("__bk").agg(count(lit(1)).as("__c"))
    val overB = Window.orderBy(col("__bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = cnts
      .withColumn("__off", coalesce(sum(col("__c")).over(overB), lit(0L)))
      .select(col("__bk"), col("__off"))
    val wIn = Window.partitionBy("__bk").orderBy(col("__s").desc, col("__id"))
    val n = base.agg(count(lit(1)).as("__n"))
    b.join(broadcast(offs), Seq("__bk"))
      .withColumn("__r", col("__off") + row_number().over(wIn))
      .crossJoin(broadcast(n))
      .withColumn("bucket", expr(s"((__r - 1) * $buckets) div __n"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        min(col("__s")).as("score_min"), max(col("__s")).as("score_max"),
        sum(col("__pos")).as("n_pos"))
      .withColumn("pos_ppm", expr("(n_pos * 1000000) div n_docs"))
      .orderBy("bucket")
  }
}

/** `bigint → bigint`: FNV-1a over the input long's 8 little-endian
  * bytes — the REPLAYABLE 64-bit avalanche. The prime-field hashes
  * this engine replays in SQL live below 2³⁰, which breaks
  * Kirsch–Mitzenmacher double hashing against a power-of-two bit
  * array: every position mod 2^b is then a function of the input's
  * low b bits alone, so distinct keys sharing low bits collide on
  * ALL probe positions ([[BloomAudit]] measured the resulting FPR at
  * 38× the fill-ratio model before this expression existed). FNV-1a
  * spreads those 30 bits across all 64; DuckDB replays it exactly in
  * HUGEINT mod-2⁶⁴ arithmetic (the q32 FNV-over-codepoints
  * precedent — xor only ever touches the low byte, which the
  * `h − h mod 256 + xor(h mod 256, byte)` spelling reproduces).
  * Input must be ≥ 0 (callers feed prime-field hashes). */
case class Fnv64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fnv64"

  override def nullSafeEval(input: Any): Any =
    Fnv64Expr.hash(input.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.Fnv64Expr.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Fnv64Expr =
    copy(child = newChild)
}

object Fnv64Expr {
  def hash(v: Long): Long = {
    var h = 0xcbf29ce484222325L // FNV-1a 64-bit offset basis
    var b = 0
    while (b < 8) {
      h = (h ^ ((v >>> (8 * b)) & 0xffL)) * 0x100000001b3L
      b += 1
    }
    h
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
