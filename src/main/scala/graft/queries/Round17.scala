package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Round-17 battery additions: the unigram-LM Viterbi tokenizer
  * completing the WordPiece/BPE family (q200), the three-detector
  * cross-signal dedup (q201), the stored-PQ-codebook increment path
  * (q202), the dataset-card release diff (q203), and the
  * three-tokenizer fertility comparison (q204). All
  * reference-scope-none LLM-pipeline extensions (SURVEY §8).
  */
object Round17 {

  // ---------------------------------------------------------------- q200
  /** Unigram-LM VITERBI segmentation ([[graft.text.UnigramLm]]):
    * minimum-cost subword segmentation under integer surprisal piece
    * costs (the q157 `length(bin(x))` bit-trick family), packed
    * lexicographic (cost, pieces) DP so ties are deterministic —
    * the SentencePiece inference step, third tokenizer family beside
    * greedy WordPiece (q104) and trained BPE (q113). The oracle
    * replays the FULL pipeline: vocab + char-fallback inventory,
    * char-stream counts off the distinct-token frame, the surprisal
    * table, and the per-word DP as a level-per-position recursive CTE
    * carrying the best[] vector (MIN over predecessors via a
    * correlated aggregate over the non-recursive span-match table —
    * the q184 fold stance, never `list_reduce`). */
  private def q200(s: SparkSession, dir: String): DataFrame =
    graft.text.UnigramLm.unigramStats(Tables.documents(s, dir), vocabN = 10)
      .orderBy("doc_id")

  /** Shared CTE block (q200/q204): piece inventory + surprisal costs
    * + per-word Viterbi replay ending in `uperword(tok, packed)`
    * (packed = cost·2²⁰ + pieces; NULL = UNK) plus the
    * `uwords(doc_id, tok)` stream. */
  private[queries] val unigramPerwordCtes =
    """ucounts AS (
      |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS tok FROM documents)
      |  WHERE length(tok) > 0 GROUP BY tok
      |),
      |uvocab AS (
      |  SELECT tok AS piece, cnt FROM ucounts ORDER BY cnt DESC, tok LIMIT 10
      |),
      |utot AS (SELECT CAST(SUM(cnt * length(tok)) AS BIGINT) AS n FROM ucounts),
      |uchars AS (
      |  SELECT DISTINCT unnest(list_transform(range(length(piece)),
      |    i -> substr(piece, CAST(i AS INT) + 1, 1))) AS piece FROM uvocab
      |),
      |uccnt AS (
      |  SELECT c.ch AS piece, CAST(SUM(c.cnt) AS BIGINT) AS cnt FROM (
      |    SELECT substr(t.tok, CAST(u.i AS INT) + 1, 1) AS ch, t.cnt
      |    FROM ucounts t, UNNEST(range(length(t.tok))) AS u(i)) c
      |  JOIN uchars v ON v.piece = c.ch
      |  GROUP BY c.ch
      |),
      |upieces AS (
      |  SELECT piece, MAX(cnt) AS cnt FROM (
      |    SELECT piece, cnt FROM uvocab UNION ALL SELECT piece, cnt FROM uccnt)
      |  GROUP BY piece
      |),
      |ucost AS (
      |  SELECT p.piece, CAST(length(bin(t.n // p.cnt)) AS BIGINT) AS surp
      |  FROM upieces p CROSS JOIN utot t
      |),
      |uwords AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS tok
      |  FROM documents
      |),
      |udwords AS (SELECT DISTINCT tok FROM uwords),
      |upm AS (
      |  SELECT d.tok, CAST(u.j AS BIGINT) AS jpos,
      |    CAST(u.j AS BIGINT) + length(p.piece) AS ipos,
      |    p.surp * 1048576 + 1 AS addp
      |  FROM udwords d, UNNEST(range(length(d.tok))) AS u(j), ucost p
      |  WHERE length(p.piece) <= length(d.tok) - CAST(u.j AS BIGINT)
      |    AND substr(d.tok, CAST(u.j AS INT) + 1, length(p.piece)) = p.piece
      |),
      |uwalk AS (
      |  SELECT tok, CAST(0 AS BIGINT) AS i, [CAST(0 AS BIGINT)] AS best
      |  FROM udwords
      |  UNION ALL
      |  SELECT w.tok, w.i + 1,
      |    list_append(w.best,
      |      (SELECT MIN(w.best[CAST(p.jpos AS INT) + 1] + p.addp)
      |       FROM upm p WHERE p.tok = w.tok AND p.ipos = w.i + 1))
      |  FROM uwalk w WHERE w.i < length(w.tok)
      |),
      |uperword AS (
      |  SELECT tok, best[CAST(length(tok) AS INT) + 1] AS packed
      |  FROM uwalk WHERE i = length(tok)
      |)""".stripMargin

  private val q200Sql =
    s"""WITH RECURSIVE
       |$unigramPerwordCtes
       |SELECT w.doc_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(CASE WHEN p.packed IS NULL THEN 1
       |                ELSE p.packed % 1048576 END) AS BIGINT) AS n_pieces,
       |  CAST(SUM(CASE WHEN p.packed IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_unk_words,
       |  CAST(SUM(CASE WHEN p.packed IS NULL THEN 0
       |                ELSE p.packed // 1048576 END) AS BIGINT) AS cost_bits
       |FROM uwords w JOIN uperword p USING (tok)
       |GROUP BY w.doc_id
       |ORDER BY w.doc_id""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q200_unigram_lm", q200, Some(q200Sql)))
}
