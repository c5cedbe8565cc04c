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

  /** Viterbi for one word: [pieces, costBits, isUnk(0/1)]. */
  private def word(w: String): (Long, Long, Boolean) = {
    val len = w.length
    if (len == 0) return (0L, 0L, false)
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
    val p = best(len)
    if (p < 0L) (1L, 0L, true) else (p % Big, p / Big, false)
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

object UnigramLm {
  def statsCol(text: Column, vocab: UnigramVocab): Column =
    GraftBridge.ofExpr(UnigramStatsExpr(GraftBridge.exprOf(text), vocab))

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
}
