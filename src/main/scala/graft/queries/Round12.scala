package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Round-12 battery additions: subword tokenization (q104), the
  * hashed-linear-classifier quality gate (q105), and per-domain
  * admission caps (q106). All reference-scope-none LLM-pipeline
  * extensions (SURVEY §8). */
object Round12 {

  // ---------------------------------------------------------------- q104
  /** WordPiece-style greedy longest-match subword stats
    * ([[graft.text.Subword]]): per document, whitespace-word count,
    * subword-piece count against a top-10 corpus vocabulary (pieces =
    * vocab tokens + their proper suffixes + char fallback), and UNK
    * word count. The 31-token synthetic corpus against a 10-token
    * vocab exercises every path: whole-token match, multi-char suffix
    * continuations, char fallback, and UNK (words containing letters
    * absent from the vocab alphabet).
    *
    * Engine: bounded driver-side vocab fit + one codegen'd map-only
    * pass (the piece sets ride the plan as a reference object). The
    * oracle replays the greedy loop as a list_reduce fold over word
    * positions — state packed into one BIGINT (unk·10¹² + pieces·10⁶
    * + pos) because DuckDB's fold accumulator must match the element
    * type. */
  private def q104(s: SparkSession, dir: String): DataFrame =
    graft.text.Subword.subwordStats(Tables.documents(s, dir), vocabN = 10)
      .orderBy("doc_id")

  /** Shared CTE block (q104/q107): vocab → piece sets → per-word
    * greedy replay, ending in `perword(tok, np, unk)` plus the
    * `words(doc_id, tok)` stream.
    *
    * Round-13 rewrite: the original replay folded a packed state
    * through `list_reduce` with a NESTED `list_transform` whose
    * lambda referenced outer columns — at sf0.1 DuckDB 1.0's
    * vectorized evaluation mis-bound one row's references in bulk
    * (the word 'window' segmented as 5 pieces in the full query but
    * 1 piece when the same CTE was probed with any filter — a pure
    * engine-side lambda bug, confirmed by a Python replay agreeing
    * with Spark). The replay is now LAMBDA-FREE where it matters:
    * `pm` precomputes the longest start/continuation match per
    * (word, position) as a plain join + MAX, and a recursive CTE
    * walks the greedy positions — same semantics, no nested-lambda
    * evaluation anywhere near a join. */
  /** The shared word stream + distinct-token frame every per-word
    * tokenizer replay walks — emitted ONCE per query, referenced by
    * any number of [[subwordVocabCtes]] size blocks. */
  private[queries] val wordsCtes =
    """words AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS tok FROM documents
      |),
      |dwords AS (SELECT DISTINCT tok FROM words)""".stripMargin

  /** One WordPiece vocab size as oracle CTEs, every size-dependent
    * name suffixed `$p` (q221 sweeps four sizes in one query): top-`n`
    * vocab → piece sets → longest-match table → greedy recursive walk
    * → `perword$p(tok, np, unk)`. References the shared
    * [[wordsCtes]]. */
  private[queries] def subwordVocabCtes(p: String, n: Int): String =
    s"""vocab$p AS (
       |  SELECT token FROM (
       |    SELECT tok AS token, COUNT(*) AS cnt
       |    FROM (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS tok FROM documents)
       |    GROUP BY tok
       |    ORDER BY cnt DESC, token
       |    LIMIT $n
       |  )
       |),
       |chars$p AS (
       |  SELECT DISTINCT unnest(list_transform(range(1, length(token)+1),
       |    i -> substr(token, CAST(i AS INT), 1))) AS piece FROM vocab$p
       |),
       |sufs$p AS (
       |  SELECT DISTINCT unnest(list_transform(range(2, length(token)+1),
       |    i -> substr(token, CAST(i AS INT)))) AS piece FROM vocab$p WHERE length(token) >= 2
       |),
       |pieces$p AS (
       |  SELECT piece, 1 AS s FROM (SELECT token AS piece FROM vocab$p UNION SELECT piece FROM chars$p)
       |  UNION ALL
       |  SELECT piece, 0 AS s FROM (SELECT piece FROM sufs$p UNION SELECT piece FROM chars$p)
       |),
       |pm$p AS (
       |  SELECT d.tok, CAST(u.i AS BIGINT) AS pos,
       |    MAX(CASE WHEN p.s = 1 AND substr(d.tok, CAST(u.i AS INT)+1, length(p.piece)) = p.piece THEN length(p.piece) END) AS ms,
       |    MAX(CASE WHEN p.s = 0 AND substr(d.tok, CAST(u.i AS INT)+1, length(p.piece)) = p.piece THEN length(p.piece) END) AS mc
       |  FROM dwords d, UNNEST(range(length(d.tok))) AS u(i), pieces$p p
       |  GROUP BY d.tok, u.i
       |),
       |walk$p AS (
       |  SELECT tok, CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS np, 0 AS unk FROM dwords
       |  UNION ALL
       |  SELECT w.tok,
       |    CASE WHEN m.mlen IS NULL THEN CAST(length(w.tok) AS BIGINT) ELSE w.pos + m.mlen END,
       |    CASE WHEN m.mlen IS NULL THEN CAST(1 AS BIGINT) ELSE w.np + 1 END,
       |    CASE WHEN m.mlen IS NULL THEN 1 ELSE 0 END
       |  FROM walk$p w
       |  JOIN (SELECT tok, pos, CASE WHEN pos = 0 THEN ms ELSE mc END AS mlen FROM pm$p) m
       |    ON m.tok = w.tok AND m.pos = w.pos
       |  WHERE w.pos < length(w.tok) AND w.unk = 0
       |),
       |perword$p AS (
       |  SELECT tok, np, unk FROM walk$p
       |  WHERE unk = 1 OR pos >= length(tok)
       |)""".stripMargin

  private[queries] val subwordPerwordCtes =
    s"$wordsCtes,\n${subwordVocabCtes("", 10)}"

  private val q104Sql =
    s"""WITH RECURSIVE
       |$subwordPerwordCtes
       |SELECT w.doc_id,
       |  COUNT(*) AS n_words,
       |  CAST(SUM(p.np) AS BIGINT) AS n_pieces,
       |  CAST(SUM(p.unk) AS BIGINT) AS n_unk_words
       |FROM words w JOIN perword p USING (tok)
       |GROUP BY w.doc_id
       |ORDER BY w.doc_id""".stripMargin

  // ---------------------------------------------------------------- q105
  /** Hashed-linear-classifier quality gate ([[graft.ops.Classifier]]):
    * integer polynomial-hash features, Knuth-derived integer weights,
    * BIGINT score, keep iff score ≥ 0 — the C4/fastText-style model
    * gate with every arithmetic step replayable in DuckDB. */
  private def q105(s: SparkSession, dir: String): DataFrame =
    graft.ops.Classifier.scoreDocs(Tables.documents(s, dir))
      .orderBy("doc_id")

  private val q105Sql =
    """WITH t AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> length(x) > 0) AS tk
      |  FROM documents
      |)
      |SELECT doc_id,
      |  CAST(len(tk) AS BIGINT) AS n_tok,
      |  CAST(list_sum(list_transform(tk, tok ->
      |    ((list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(range(1, length(tok)+1), i -> CAST(unicode(substr(tok, CAST(i AS INT), 1)) AS BIGINT))),
      |      (acc, c) -> (acc * 131 + c) % 1000000007) % 64) * 2654435761) % 4294967296 % 1001 - 500
      |  )) AS BIGINT) AS score,
      |  CAST(list_sum(list_transform(tk, tok ->
      |    ((list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(range(1, length(tok)+1), i -> CAST(unicode(substr(tok, CAST(i AS INT), 1)) AS BIGINT))),
      |      (acc, c) -> (acc * 131 + c) % 1000000007) % 64) * 2654435761) % 4294967296 % 1001 - 500
      |  )) AS BIGINT) >= 0 AS kept
      |FROM t
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q106
  /** Per-domain admission cap ([[graft.ops.Splits.capPerGroup]]):
    * at most 10 documents per source, admitted in deterministic hash
    * order — binds on every source of the uniform synthetic layout.
    * The oracle replays the q85 Knuth-multiply rank with a window;
    * the engine side exists because that window re-shuffles the
    * corpus at 100 TB where the bounded-heap TopKAgg ships
    * groups × k entries. */
  private def q106(s: SparkSession, dir: String): DataFrame =
    graft.ops.Splits.capPerGroup(Tables.documents(s, dir), "source", "doc_id", k = 10)
      .select("source", "rk", "doc_id", "hv", "lang")
      .orderBy("source", "rk")

  private val q106Sql =
    """WITH h AS (
      |  SELECT source, lang, doc_id,
      |    CAST((CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
      |         % 4294967296 AS BIGINT) AS hv
      |  FROM documents
      |)
      |SELECT source, rk, doc_id, hv, lang FROM (
      |  SELECT source, lang, doc_id, hv,
      |    CAST(row_number() OVER (PARTITION BY source ORDER BY hv, doc_id) AS INTEGER) AS rk
      |  FROM h)
      |WHERE rk <= 10
      |ORDER BY source, rk""".stripMargin

  // ---------------------------------------------------------------- q107
  /** Sequence packing in SUBWORD units ([[graft.ops.Packing
    * .packSequences]] with the q104 piece count plugged in as
    * `countExpr`): real training budgets are model tokens, not
    * whitespace words, and this composes the two oracle-green halves
    * end-to-end — the subword expression runs inside packing's
    * phase-1 count projection, so the whole count+pack pipeline stays
    * one map pass plus the two-phase prefix sum. Budget 128 (vs
    * q82's 256) exercises a different cut cadence. */
  private def q107(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val vocabTokens = graft.ops.TextStats.vocabTopN(docs, 10)
      .orderBy("rank").collect().map(_.getString(1)).toIndexedSeq
    val v = graft.text.SubwordVocab.build(vocabTokens)
    val pieces = element_at(
      graft.text.Subword.statsCol(col("text"), v), 2)
    graft.ops.Packing.packSequences(docs, budget = 128L,
        countExpr = Some(pieces))
      .orderBy("seq_id", "doc_id")
  }

  /** q104's per-word greedy replay (the round-13 lambda-free
    * recursive-walk form — see [[subwordPerwordCtes]]) feeding q82's
    * packing replay — per-doc piece totals (UNK words count 1)
    * become the n_tok stream the LATERAL range cut consumes. */
  private val q107Sql =
    s"""WITH RECURSIVE
       |$subwordPerwordCtes,
       |counted AS (
       |  SELECT w.doc_id, CAST(SUM(p.np) AS BIGINT) AS n_tok
       |  FROM words w JOIN perword p USING (tok)
       |  GROUP BY w.doc_id
       |),
       |placed AS (
       |  SELECT doc_id, n_tok,
       |    CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
       |  FROM counted
       |)
       |SELECT s.seq_id, doc_id,
       |  GREATEST(start, s.seq_id * 128) - start AS doc_off,
       |  GREATEST(start, s.seq_id * 128) - s.seq_id * 128 AS seq_off,
       |  LEAST(start + n_tok, (s.seq_id + 1) * 128)
       |    - GREATEST(start, s.seq_id * 128) AS len
       |FROM placed, LATERAL (
       |  SELECT unnest(range(start // 128, (start + n_tok - 1) // 128 + 1)) AS seq_id) s
       |WHERE n_tok > 0
       |ORDER BY seq_id, doc_id""".stripMargin

  // ---------------------------------------------------------------- q108
  /** Vocabulary coverage curve ([[graft.ops.TextStats.vocabCoverage]]):
    * cumulative corpus coverage of the top-r vocab for r = 1..20 —
    * the vocab-sizing curve. The window runs over 20 rows; the only
    * corpus-sized work is the shared token count. Coverage divides
    * two exact BIGINTs once per row, so the doubles agree bit-for-bit
    * across engines. */
  private def q108(s: SparkSession, dir: String): DataFrame =
    graft.ops.TextStats.vocabCoverage(Tables.documents(s, dir), n = 20)
      .orderBy("rank")

  private val q108Sql =
    """WITH c AS (
      |  SELECT tok AS token, COUNT(*) AS cnt
      |  FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS tok
      |        FROM documents)
      |  GROUP BY tok
      |),
      |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_cnt FROM c),
      |top AS (
      |  SELECT token, cnt,
      |    ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rank,
      |    CAST(SUM(cnt) OVER (ORDER BY cnt DESC, token
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cnt
      |  FROM c
      |  ORDER BY cnt DESC, token
      |  LIMIT 20
      |)
      |SELECT rank, token, cnt, cum_cnt, total_cnt,
      |  CAST(cum_cnt AS DOUBLE) / CAST(total_cnt AS DOUBLE) AS coverage
      |FROM top, tot
      |ORDER BY rank""".stripMargin

  // ---------------------------------------------------------------- q109
  /** Per-source calibrated quality percentile ([[graft.ops.Ranks
    * .exactGroupRank]] over `source`): a global quality threshold
    * over-prunes sources whose score DISTRIBUTION sits low (different
    * boilerplate, different length mix), so real gates calibrate
    * per source — keep each source's top X%. rnk is the radix rank
    * (value desc, id tie-break — row_number semantics, bit-exact);
    * pct = (rnk−1)/(n−1) is the familiar PERCENT_RANK form, with the
    * per-source n from a #sources-bounded broadcast join. No
    * corpus-sized window partition anywhere — the q88 scale story
    * applied per source. */
  private def q109(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val ranked = graft.ops.Ranks.exactGroupRank(docs, "source", "doc_id",
      graft.ops.TextStats.qualityScore(col("text")))
    val counts = docs.groupBy("source").agg(count(lit(1)).as("__n"))
    ranked.join(broadcast(counts), "source")
      .select(col("source"), col("doc_id"), col("value"), col("rnk"),
        when(col("__n") > 1,
          (col("rnk") - 1).cast("double") / (col("__n") - 1).cast("double"))
          .otherwise(lit(0.0)).as("pct"))
      .orderBy("source", "rnk")
  }

  private val q109Sql = {
    val stops = graft.ops.TextStats.miniStopWords
      .map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH t AS (SELECT doc_id, source, text, regexp_split_to_array(text, '\\s+') AS tk FROM documents),
       |q AS (
       |  SELECT doc_id, source,
       |    (least(CAST(len(tk) AS DOUBLE) / 50.0, 1.0) * 0.4
       |     + least(CAST(len(list_filter(tk, x -> list_contains($stops, x))) AS DOUBLE) / CAST(len(tk) AS DOUBLE) * 5.0, 1.0) * 0.3
       |     + (1.0 - least(CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) * 5.0, 1.0)) * 0.2
       |     + (1.0 - least(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) * 5.0, 1.0)) * 0.1) AS value
       |  FROM t
       |),
       |r AS (
       |  SELECT source, doc_id, value,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY value DESC, doc_id) AS BIGINT) AS rnk,
       |    CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
       |  FROM q
       |)
       |SELECT source, doc_id, value, rnk,
       |  CASE WHEN n > 1 THEN CAST(rnk - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE) ELSE 0.0 END AS pct
       |FROM r
       |ORDER BY source, rnk""".stripMargin
  }

  // ---------------------------------------------------------------- q110
  /** Multi-n repetition profile ([[graft.ops.TextStats
    * .repetitionProfile]]): duplicate-gram fractions at n = 1, 2, 3
    * in one map-only projection — the combined Gopher repetition
    * battery, one scan for all sizes. */
  private def q110(s: SparkSession, dir: String): DataFrame =
    graft.ops.TextStats.repetitionProfile(Tables.documents(s, dir))
      .orderBy("doc_id")

  private val q110Sql =
    """WITH t AS (
      |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS tk FROM documents
      |),
      |g AS (
      |  SELECT doc_id, tk,
      |    tk AS g1,
      |    list_transform(range(len(tk) - 1), i -> tk[i+1] || ' ' || tk[i+2]) AS g2,
      |    list_transform(range(len(tk) - 2), i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]) AS g3
      |  FROM t
      |)
      |SELECT doc_id,
      |  CAST(len(tk) AS BIGINT) AS n_tok,
      |  CASE WHEN len(tk) >= 1 THEN
      |    CAST(len(g1) - len(list_distinct(g1)) AS DOUBLE) / CAST(len(g1) AS DOUBLE) END AS dup_frac_1,
      |  CASE WHEN len(tk) >= 2 THEN
      |    CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / CAST(len(g2) AS DOUBLE) END AS dup_frac_2,
      |  CASE WHEN len(tk) >= 3 THEN
      |    CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / CAST(len(g3) AS DOUBLE) END AS dup_frac_3
      |FROM g
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q111
  /** Train/test split-leakage audit: near-dup pairs whose members land
    * in DIFFERENT splits under the stable hash split — the eval-
    * hygiene check a pipeline runs after splitting (distinct from
    * q62/q89's decontamination against an EXTERNAL benchmark: this
    * catches leakage the corpus's own duplication creates). Pairs
    * come from the banded MinHash candidate stage; splits are a pure
    * function of each id ([[graft.ops.Splits.assignSplit]]), so the
    * audit adds one map-only projection + filter over the pairs —
    * no joins, no extra shuffle. Oracle: exact all-pairs Jaccard +
    * the same Knuth-bucket split arithmetic; agreement holds in the
    * banding's recall-1 regime (the q31/q100 stance). */
  private def q111(s: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.minhashPairs(Tables.documents(s, dir), shingleSize = 3,
        bands = 10, rowsPerBand = 5, maxJaccardDist = 0.4)
      .withColumn("split_a", graft.ops.Splits.assignSplit(col("doc_a")))
      .withColumn("split_b", graft.ops.Splits.assignSplit(col("doc_b")))
      .filter(col("split_a") =!= col("split_b"))
      .orderBy("doc_a", "doc_b")

  private val q111Sql =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM documents
      |),
      |grams AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(len(t) - 2),
      |      i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
      |  FROM toks WHERE len(t) >= 3
      |),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    1.0 - (CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
      |      / (CAST(len(a.g) + len(b.g) AS DOUBLE) - CAST(len(list_intersect(a.g, b.g)) AS DOUBLE))) AS jaccard_dist
      |  FROM grams a JOIN grams b ON a.doc_id < b.doc_id
      |  WHERE 1.0 - (CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
      |      / (CAST(len(a.g) + len(b.g) AS DOUBLE) - CAST(len(list_intersect(a.g, b.g)) AS DOUBLE))) <= 0.4
      |),
      |sp AS (
      |  -- HUGEINT-guarded Knuth multiply (the q106 oracle's form): a
      |  -- plain BIGINT (id * 2654435761) overflows for ids ≥ ~3.5e9
      |  -- and would silently diverge from the engine's overflow-safe
      |  -- Splits.hashBucketN on large ids (round-12 advice)
      |  SELECT doc_a, doc_b, jaccard_dist,
      |    CASE WHEN CAST((CAST(doc_a % 4294967296 AS HUGEINT) * 2654435761)
      |              % 4294967296 AS BIGINT) % 100 < 80 THEN 'train'
      |         WHEN CAST((CAST(doc_a % 4294967296 AS HUGEINT) * 2654435761)
      |              % 4294967296 AS BIGINT) % 100 < 90 THEN 'val'
      |         ELSE 'test' END AS split_a,
      |    CASE WHEN CAST((CAST(doc_b % 4294967296 AS HUGEINT) * 2654435761)
      |              % 4294967296 AS BIGINT) % 100 < 80 THEN 'train'
      |         WHEN CAST((CAST(doc_b % 4294967296 AS HUGEINT) * 2654435761)
      |              % 4294967296 AS BIGINT) % 100 < 90 THEN 'val'
      |         ELSE 'test' END AS split_b
      |  FROM pairs
      |)
      |SELECT doc_a, doc_b, jaccard_dist, split_a, split_b
      |FROM sp
      |WHERE split_a <> split_b
      |ORDER BY doc_a, doc_b""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q104_subword_stats", q104, Some(q104Sql)),
    QueryDef("q105_classifier_gate", q105, Some(q105Sql)),
    QueryDef("q106_domain_cap", q106, Some(q106Sql)),
    QueryDef("q107_subword_packing", q107, Some(q107Sql)),
    QueryDef("q108_vocab_coverage", q108, Some(q108Sql)),
    QueryDef("q109_source_quality_pct", q109, Some(q109Sql)),
    QueryDef("q110_repetition_profile", q110, Some(q110Sql)),
    QueryDef("q111_split_leakage", q111, Some(q111Sql)))
}
