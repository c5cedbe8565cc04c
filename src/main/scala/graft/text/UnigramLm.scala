package graft.text

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style) subword tokenization: VITERBI
  * minimum-cost segmentation over a fixed piece inventory — the third
  * production tokenizer family beside greedy WordPiece
  * ([[Subword]], q104) and trained BPE ([[Bpe]], q113). Real unigram
  * LM training is EM (Kudo '18, arXiv:1804.10959) and not
  * SQL-replayable; what IS replayable — and what production inference
  * actually runs per word — is the Viterbi DP under a fixed
  * per-piece cost, so this operator fixes a deterministic integer
  * cost model and replays the full DP in the oracle:
  *
  *  - Piece inventory: the top-N corpus word vocabulary
  *    ([[graft.ops.TextStats.vocabTopN]] semantics: count DESC, token
  *    ASC) plus every distinct character of those vocab tokens (the
  *    char-fallback alphabet, same construction as [[SubwordVocab]]).
  *  - Piece count: a vocab token's corpus word frequency; a char's
  *    corpus character-stream frequency (Σ count(tok)·occurrences —
  *    computed on the distinct-token frame, never rescanning the
  *    corpus). A piece that is both (single-char vocab token) takes
  *    the MAX of the two (= its char count, which dominates).
  *  - Integer surprisal cost: `surp(p) = floor(log2(TOTAL div cnt_p))
  *    + 1` with TOTAL = Σ count(tok)·len(tok), the corpus character
  *    total — the q157 `length(bin(x))` bit-trick family, so both
  *    engines agree exactly and every piece costs ≥ 1 bit (a
  *    zero-cost piece would make every segmentation tie).
  *
  * Viterbi DP per word with the LEXICOGRAPHIC (cost, pieces) packing:
  * `best[i] = min over pieces p = w[j..i) of best[j] + surp(p)·2²⁰
  * + 1`. Both components are additive, so the packed integer min IS
  * the lexicographic min: minimum total cost, then fewest pieces —
  * deterministic under any tie. A word with no segmentation (a char
  * outside the vocab alphabet) is `[UNK]`: 1 piece, 0 cost, counted
  * in n_unk_words (the q104 contract). Empty split artifacts count
  * as words with zero pieces.
  *
  * Scale shape: the fit is one shuffled word count (map-side
  * combined) feeding three BOUNDED collects — top-N vocab, the ≤
  * |alphabet| char counts, one scalar total — the centroid-fit
  * stance; application is a single codegen'd map-only pass, the
  * piece table rides the serialized plan, each word costs
  * O(len · maxPieceLen) probes, no shuffle touches the token stream.
  * At 100 TB the operator is scan-bound, identical to q104's shape.
  */
final class UnigramVocab private (
    piecesByLen: Array[java.util.HashMap[String, java.lang.Long]],
    val maxLen: Int) extends Serializable {

  import UnigramVocab.Big

  /** The DP fill: best(i) = packed (cost, pieces) minimum over all
    * segmentations of w[0..i), −1 where unreachable. Shared by
    * [[word]] (stats) and [[segment]] (backtrack). */
  private def fill(w: String): Array[Long] = {
    val len = w.length
    val best = new Array[Long](len + 1)
    java.util.Arrays.fill(best, -1L)
    best(0) = 0L
    var i = 1
    while (i <= len) {
      var b = -1L
      var l = math.min(maxLen, i)
      while (l >= 1) {
        val j = i - l
        if (best(j) >= 0L) {
          val m = piecesByLen(l)
          if (m != null) {
            val s = m.get(w.substring(j, i))
            if (s != null) {
              val cand = best(j) + s.longValue() * Big + 1L
              if (b < 0L || cand < b) b = cand
            }
          }
        }
        l -= 1
      }
      best(i) = b
      i += 1
    }
    best
  }

  /** Viterbi for one word: [pieces, costBits, isUnk(0/1)]. */
  private def word(w: String): (Long, Long, Boolean) = {
    if (w.isEmpty) return (0L, 0L, false)
    val p = fill(w)(w.length)
    if (p < 0L) (1L, 0L, true) else (p % Big, p / Big, false)
  }

  /** The OPTIMAL segmentation itself — the backtrack [[word]] skips
    * (stats need only the packed value). Deterministic under ties
    * twice over: the packed DP already fixes (cost, pieces), and
    * among predecessors ACHIEVING best(i) the backtrack takes the
    * minimal start j — the longest piece ending at i — which is the
    * one extra rule needed when two distinct optimal paths share the
    * packed optimum (the oracle replays it as MIN(jpos)). Empty words
    * and UNK words return an empty array (they contribute no piece
    * occurrences to an E-step count). */
  def segment(w: String): Array[String] = {
    val len = w.length
    if (len == 0) return Array.empty
    val best = fill(w)
    if (best(len) < 0L) return Array.empty
    val out = new Array[String]((best(len) % Big).toInt)
    var slot = out.length - 1
    var i = len
    while (i > 0) {
      var chosen = -1
      var l = math.min(maxLen, i) // scan longest-first ⇒ first hit = min j
      while (l >= 1 && chosen < 0) {
        val j = i - l
        if (best(j) >= 0L) {
          val m = piecesByLen(l)
          if (m != null) {
            val s = m.get(w.substring(j, i))
            if (s != null && best(j) + s.longValue() * Big + 1L == best(i))
              chosen = j
          }
        }
        l -= 1
      }
      out(slot) = w.substring(chosen, i)
      slot -= 1
      i = chosen
    }
    out
  }

  /** The (piece, surprisal) table — the artifact [[UnigramLm
    * .saveVocab]] persists; [[UnigramVocab.fromCosts]] is its exact
    * inverse. */
  def entries: Seq[(String, Long)] = {
    val b = Seq.newBuilder[(String, Long)]
    piecesByLen.foreach { m =>
      if (m != null) m.forEach((p, s) => b += ((p, s.longValue())))
    }
    b.result().sortBy(_._1)
  }

  /** Whole-text stats: [n_words, n_pieces, n_unk_words, cost_bits].
    * Split semantics are Spark SQL `split(text, '\s+', -1)` — empty
    * tokens from leading separators included, as in [[SubwordVocab
    * .stats]]. */
  def stats(text: String): Array[Long] = {
    var words = 0L
    var pieces = 0L
    var unk = 0L
    var cost = 0L
    val toks = text.split("\\s+", -1)
    var i = 0
    while (i < toks.length) {
      words += 1L
      val (np, c, isUnk) = word(toks(i))
      pieces += np
      cost += c
      if (isUnk) unk += 1L
      i += 1
    }
    Array(words, pieces, unk, cost)
  }
}

object UnigramVocab {
  /** Packing radix for (cost, pieces): pieces < 2²⁰ per word. */
  val Big: Long = 1L << 20

  /** floor(log2(x)) + 1 for x ≥ 1 — DuckDB `length(bin(x))`. */
  private def bits(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)

  /** Build from (piece → corpus count) with the max-dedupe already
    * applied, plus the corpus character total. */
  def build(pieceCounts: Seq[(String, Long)], total: Long): UnigramVocab = {
    require(pieceCounts.nonEmpty, "unigram vocab needs at least one piece")
    fromCosts(pieceCounts.map { case (p, cnt) =>
      require(cnt >= 1L && cnt <= total,
        s"piece '$p' count $cnt out of range for total $total")
      (p, bits(total / cnt))
    })
  }

  /** Rebuild from a stored (piece, surprisal) table — the exact
    * inverse of [[UnigramVocab.entries]]. */
  def fromCosts(pieceCosts: Seq[(String, Long)]): UnigramVocab = {
    require(pieceCosts.nonEmpty, "unigram vocab needs at least one piece")
    val maxLen = pieceCosts.iterator.map(_._1.length).max
    val arr =
      new Array[java.util.HashMap[String, java.lang.Long]](maxLen + 1)
    pieceCosts.foreach { case (p, surp) =>
      require(p.nonEmpty && surp >= 1L, s"piece '$p' needs surprisal ≥ 1")
      val l = p.length
      if (arr(l) == null) arr(l) = new java.util.HashMap[String, java.lang.Long]()
      arr(l).put(p, java.lang.Long.valueOf(surp))
    }
    new UnigramVocab(arr, maxLen)
  }
}

/** Native Catalyst expression: text → [n_words, n_pieces,
  * n_unk_words, cost_bits]. Codegen'd; the vocab rides along as a
  * plan reference object (the [[SubwordStatsExpr]] stance). */
case class UnigramStatsExpr(child: Expression, vocab: UnigramVocab)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_unigram_stats"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(vocab.stats(input.asInstanceOf[UTF8String].toString))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramVocab", vocab,
      classOf[UnigramVocab].getName)
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"$ref.stats($c.toString()))")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramStatsExpr =
    copy(child = newChild)
}

/** Native Catalyst expression: word → array<string> of its optimal
  * Viterbi pieces ([[UnigramVocab.segment]] semantics: min-j
  * backtrack, empty for UNK/empty words). The E-step primitive of
  * [[UnigramLm.emRound]] — applied to the DISTINCT-token frame, never
  * the corpus stream. Codegen'd like [[UnigramStatsExpr]]. */
case class UnigramSegmentExpr(child: Expression, vocab: UnigramVocab)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "graft_unigram_segment"

  override def nullSafeEval(input: Any): Any =
    UnigramSegmentExpr.pack(vocab, input.asInstanceOf[UTF8String].toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramVocab", vocab,
      classOf[UnigramVocab].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.text.UnigramSegmentExpr.pack($ref, $c.toString())")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramSegmentExpr =
    copy(child = newChild)
}

object UnigramSegmentExpr {
  /** Shared by eval and generated code: segment + UTF8String boxing. */
  def pack(v: UnigramVocab, w: String): GenericArrayData = {
    val parts = v.segment(w)
    val arr = new Array[Any](parts.length)
    var i = 0
    while (i < parts.length) {
      arr(i) = UTF8String.fromString(parts(i))
      i += 1
    }
    new GenericArrayData(arr)
  }
}

object UnigramLm {
  def statsCol(text: Column, vocab: UnigramVocab): Column =
    GraftBridge.ofExpr(UnigramStatsExpr(GraftBridge.exprOf(text), vocab))

  def segmentCol(word: Column, vocab: UnigramVocab): Column =
    GraftBridge.ofExpr(UnigramSegmentExpr(GraftBridge.exprOf(word), vocab))

  /** Fit the deterministic piece inventory + costs from the corpus.
    * One shuffled word count; three bounded collects off it. */
  def fit(docs: DataFrame, vocabN: Int = 10,
      textCol: String = "text"): UnigramVocab = {
    val toks = filter(split(col(textCol), "\\s+"), t => length(t) > lit(0))
    val counts = docs.select(explode(toks).as("__tok"))
      .groupBy("__tok").agg(count(lit(1)).as("__cnt"))
      .cache()
    try {
      val vocab = counts.orderBy(col("__cnt").desc, col("__tok"))
        .limit(vocabN).collect()
        .map(r => (r.getString(0), r.getLong(1))).toIndexedSeq
      require(vocab.nonEmpty, "empty corpus vocabulary")
      val total = counts
        .agg(sum(col("__cnt") * length(col("__tok"))).as("__t"))
        .collect()(0).getLong(0)
      val alphabet = vocab.flatMap(_._1.map(_.toString)).distinct.toSet
      // char-stream counts from the DISTINCT-token frame, weighted by
      // word count — the corpus is never rescanned
      val charCounts = counts
        .select(col("__cnt"),
          explode(transform(sequence(lit(0), length(col("__tok")) - 1),
            i => col("__tok").substr(i + lit(1), lit(1)))).as("__ch"))
        .filter(col("__ch").isin(alphabet.toSeq: _*))
        .groupBy("__ch").agg(sum(col("__cnt")).as("__ccnt"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      // max-dedupe: a single-char vocab token's char count dominates
      val pieceCounts = (vocab ++ charCounts)
        .groupBy(_._1).map { case (p, cs) => (p, cs.map(_._2).max) }.toSeq
      UnigramVocab.build(pieceCounts, total)
    } finally counts.unpersist()
  }

  /** Persist a fitted vocab as its (piece, surprisal) table — the
    * [[graft.text.Bpe.saveMerges]] stance for the unigram family:
    * train once per corpus refresh, every downstream job loads the
    * artifact. Bounded rows by contract (top-N + alphabet). */
  def saveVocab(v: UnigramVocab, dir: String,
      spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    v.entries.toDF("piece", "surprisal")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Reload a vocab written by [[saveVocab]]. */
  def loadVocab(spark: org.apache.spark.sql.SparkSession,
      dir: String): UnigramVocab =
    UnigramVocab.fromCosts(
      spark.read.parquet(dir).select("piece", "surprisal")
        .collect().map(r => (r.getString(0), r.getLong(1))).toIndexedSeq)

  private def statsFrame(docs: DataFrame, v: UnigramVocab,
      idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), statsCol(col(textCol), v).as("__s"))
      .select(col(idCol),
        element_at(col("__s"), 1).as("n_words"),
        element_at(col("__s"), 2).as("n_pieces"),
        element_at(col("__s"), 3).as("n_unk_words"),
        element_at(col("__s"), 4).as("cost_bits"))

  /** Per-document Viterbi stats against a top-`vocabN` inventory:
    * (id, n_words, n_pieces, n_unk_words, cost_bits). */
  def unigramStats(docs: DataFrame, vocabN: Int = 10,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    statsFrame(docs, fit(docs, vocabN, textCol), idCol, textCol)

  /** [[unigramStats]] against a PRE-FITTED (typically [[loadVocab]]ed)
    * vocab — the downstream-job path. */
  def unigramStatsWith(docs: DataFrame, v: UnigramVocab,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    statsFrame(docs, v, idCol, textCol)

  /** One Viterbi-HARD EM round (Kudo '18 §3.2's training loop with
    * the hard-E simplification): real SentencePiece interleaves an
    * E-step of EXPECTED piece counts (forward–backward over all
    * segmentations — fractional, not integer-replayable) with an
    * M-step re-estimating piece probabilities. The hard variant
    * counts pieces under the CURRENT Viterbi segmentation instead —
    * every count an integer, so the whole round replays in SQL (the
    * q148 bounded-round stance), and it is the same fixed-point
    * family (hard EM = Viterbi training, the k-means-vs-GMM
    * relationship).
    *
    *  - E: segment every distinct word under `v`
    *    ([[UnigramSegmentExpr]], min-j backtrack), count each piece
    *    occurrence weighted by the word's corpus frequency. UNK words
    *    contribute nothing.
    *  - M: keep the multi-char pieces that were USED (count ≥ 1);
    *    keep ALL single-char pieces of the previous inventory at
    *    count max(used, 1) — SentencePiece's character-coverage rule,
    *    which guarantees a word segmentable in round r stays
    *    segmentable in round r+1 (pruning a fallback char would turn
    *    it UNK). New costs: `surp'(p) = floor(log2(TOTAL' div cnt'))
    *    + 1` with TOTAL' = Σ retained counts — the piece-OCCURRENCE
    *    total, the natural unigram-LM normalizer once counts are
    *    piece occurrences rather than characters.
    *
    * Scale shape: one shuffled word count, one map-only segmentation
    * pass over the DISTINCT-token frame (never the corpus stream),
    * one bounded collect (≤ |inventory| pieces). Each extra round
    * costs the same — rounds are a constant, data passes linear. */
  def emRound(docs: DataFrame, v: UnigramVocab,
      textCol: String = "text"): UnigramVocab = {
    val toks = filter(split(col(textCol), "\\s+"), t => length(t) > lit(0))
    val counts = docs.select(explode(toks).as("__tok"))
      .groupBy("__tok").agg(count(lit(1)).as("__cnt"))
    val pieceCounts = counts
      .select(col("__cnt"), explode(segmentCol(col("__tok"), v)).as("__p"))
      .groupBy("__p").agg(sum(col("__cnt")).as("__pc"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val usedSingles = pieceCounts.filter(_._1.length == 1).toMap
    val usedMulti = pieceCounts.filter(_._1.length > 1).toSeq
    val prevChars = v.entries.map(_._1).filter(_.length == 1)
    val retained = usedMulti ++
      prevChars.map(c => (c, math.max(usedSingles.getOrElse(c, 0L), 1L)))
    require(retained.nonEmpty,
      "emRound: empty refit — the vocab has no single-char pieces and " +
        "no piece was used by any segmentation")
    UnigramVocab.build(retained, retained.map(_._2).sum)
  }

  /** [[unigramStats]] after `emRounds` Viterbi-hard EM refinements of
    * the fitted inventory — fit from raw counts (q200), then
    * re-count-under-segmentation / re-cost `emRounds` times, then
    * segment. The q210 battery entry runs one round. */
  def unigramStatsEm(docs: DataFrame, vocabN: Int = 10, emRounds: Int = 1,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(emRounds >= 0)
    var v = fit(docs, vocabN, textCol)
    var r = 0
    while (r < emRounds) { v = emRound(docs, v, textCol); r += 1 }
    statsFrame(docs, v, idCol, textCol)
  }
}
