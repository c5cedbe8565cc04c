package graft.text

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece-style greedy longest-match subword tokenization.
  *
  * Real pipelines budget and pack in SUBWORD tokens, not whitespace
  * words (reference scope: none — this is part of the engine's
  * LLM-pipeline extension; whitespace counts are the stand-in used by
  * q64/q82/q86/q99). The piece vocabulary here is derived
  * deterministically from a frequency-cutoff word vocabulary
  * ([[graft.ops.TextStats.vocabTopN]]) instead of a trained merges
  * file, so the whole operator is a pure function of the corpus and
  * replayable by a SQL oracle:
  *
  *  - START pieces: the top-N vocab tokens, plus every distinct
  *    character occurring in them (the char-fallback alphabet).
  *  - CONTINUATION pieces: every distinct proper suffix of the vocab
  *    tokens, plus the same character alphabet. (Real WordPiece marks
  *    these `##`; here position implies it.)
  *
  * Matching is standard WordPiece greedy longest-match: at position 0
  * take the longest START piece that prefixes the word, afterwards the
  * longest CONTINUATION piece, and if no piece matches the word is a
  * single `[UNK]` (counted as one piece). Empty words (split artifacts)
  * count as words with zero pieces. Ties are impossible — equal-length
  * matches are the same string.
  *
  * Scale shape: the vocab fit is one map-side-combined count + top-N
  * (bounded driver collect, same stance as centroid fits); application
  * is a single codegen'd map-only pass — the piece sets ship with the
  * plan as a reference object (broadcast-equivalent), each word costs
  * O(len · maxPieceLen) hash probes, and no shuffle touches the token
  * stream. At 100 TB the whole operator is scan-bound.
  */
final class SubwordVocab private (
    startsByLen: Array[java.util.HashSet[String]],
    contsByLen: Array[java.util.HashSet[String]]) extends Serializable {

  private val maxLen = startsByLen.length - 1

  /** Greedy piece count for one word: (pieces, isUnk). */
  private def word(w: String): (Long, Boolean) = {
    val len = w.length
    var pos = 0
    var np = 0L
    while (pos < len) {
      val byLen = if (pos == 0) startsByLen else contsByLen
      var l = math.min(maxLen, len - pos)
      var found = 0
      while (l >= 1 && found == 0) {
        val set = byLen(l)
        if (set != null && set.contains(w.substring(pos, pos + l))) found = l
        l -= 1
      }
      if (found == 0) return (1L, true)
      np += 1
      pos += found
    }
    (np, false)
  }

  /** Whole-text stats: [n_words, n_pieces, n_unk_words]. Tokenizes on
    * `\s+` with limit -1 — the exact semantics of Spark SQL `split`
    * (and of the oracle's regexp_split_to_array), including empty
    * tokens from leading separators. */
  def stats(text: String): Array[Long] = {
    var words = 0L
    var pieces = 0L
    var unk = 0L
    val toks = text.split("\\s+", -1)
    var i = 0
    while (i < toks.length) {
      words += 1
      val (np, isUnk) = word(toks(i))
      if (isUnk) { pieces += 1L; unk += 1L } else pieces += np
      i += 1
    }
    Array(words, pieces, unk)
  }
}

object SubwordVocab {
  /** Derive the piece sets from a word vocabulary (order-insensitive —
    * the sets are what matter). */
  def build(vocabTokens: Seq[String]): SubwordVocab = {
    val chars = vocabTokens.flatMap(_.map(_.toString)).distinct
    val starts = (vocabTokens ++ chars).distinct.filter(_.nonEmpty)
    val suffixes = vocabTokens.filter(_.length >= 2)
      .flatMap(t => (1 until t.length).map(t.substring(_)))
    val conts = (suffixes ++ chars).distinct.filter(_.nonEmpty)
    val maxLen = (starts.iterator ++ conts.iterator).map(_.length).max
    def byLen(ps: Seq[String]): Array[java.util.HashSet[String]] = {
      val arr = new Array[java.util.HashSet[String]](maxLen + 1)
      ps.foreach { p =>
        if (arr(p.length) == null) arr(p.length) = new java.util.HashSet[String]()
        arr(p.length).add(p)
      }
      arr
    }
    new SubwordVocab(byLen(starts), byLen(conts))
  }
}

/** Native Catalyst expression: text → [n_words, n_pieces,
  * n_unk_words]. Same zero-UDF stance as [[LemmatizeExpr]] —
  * participates in whole-stage codegen; the vocab rides along as a
  * codegen reference object, which Spark ships with the serialized
  * plan to every executor (no static-registry tricks that would break
  * off the driver JVM). */
case class SubwordStatsExpr(child: Expression, vocab: SubwordVocab)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_subword_stats"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(vocab.stats(input.asInstanceOf[UTF8String].toString))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("subwordVocab", vocab,
      classOf[SubwordVocab].getName)
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"$ref.stats($c.toString()))")
  }

  override protected def withNewChildInternal(newChild: Expression): SubwordStatsExpr =
    copy(child = newChild)
}

object Subword {
  def statsCol(text: Column, vocab: SubwordVocab): Column =
    GraftBridge.ofExpr(SubwordStatsExpr(GraftBridge.exprOf(text), vocab))

  /** Per-document subword stats against a top-`vocabN` corpus vocab:
    * (id, n_words, n_pieces, n_unk_words). */
  def subwordStats(docs: DataFrame, vocabN: Int = 10,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val vocabTokens = graft.ops.TextStats.vocabTopN(docs, vocabN, textCol)
      .orderBy("rank").collect().map(_.getString(1)).toIndexedSeq
    val v = SubwordVocab.build(vocabTokens)
    docs.select(col(idCol), statsCol(col(textCol), v).as("__s"))
      .select(col(idCol),
        element_at(col("__s"), 1).as("n_words"),
        element_at(col("__s"), 2).as("n_pieces"),
        element_at(col("__s"), 3).as("n_unk_words"))
  }
}
