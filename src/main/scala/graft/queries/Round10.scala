package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.ops.{Dedup, Ranks, Splits, TextStats}

/** Round-10 battery additions. */
object Round10 {

  // ---------------------------------------------------------------- q84
  /** Incremental near-dup detection: the documents with doc_id % 10 = 0
    * play the "new batch", the rest the existing corpus — the
    * daily-increment shape where production dedup must NOT re-run
    * all-pairs over the whole corpus ([[graft.ops.Dedup
    * .incrementalMinhashPairs]]). Oracle: DuckDB recomputes ALL
    * batch×corpus exact trigram Jaccard pairs — matching it checks the
    * verify arithmetic AND that the cross-set banding missed nothing
    * (same recall-1 argument as q31: this corpus's near-dup pairs are
    * ≥ 0.6 similar, where the 10×5 banding's P(candidate) ≈ 1). */
  private def q84(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    Dedup.incrementalMinhashPairs(batch, corpus,
        shingleSize = 3, bands = 10, rowsPerBand = 5, maxJaccardDist = 0.4)
      .orderBy("new_id", "corpus_id")
  }

  private val q84Sql =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM documents
      |),
      |grams AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(len(t) - 2),
      |      i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
      |  FROM toks WHERE len(t) >= 3
      |)
      |SELECT a.doc_id AS new_id, b.doc_id AS corpus_id,
      |  1.0 - (CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
      |    / (CAST(len(a.g) + len(b.g) AS DOUBLE) - CAST(len(list_intersect(a.g, b.g)) AS DOUBLE))) AS jaccard_dist
      |FROM grams a JOIN grams b ON a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
      |WHERE 1.0 - (CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
      |    / (CAST(len(a.g) + len(b.g) AS DOUBLE) - CAST(len(list_intersect(a.g, b.g)) AS DOUBLE))) <= 0.4
      |ORDER BY new_id, corpus_id""".stripMargin

  // ---------------------------------------------------------------- q85
  /** Deterministic 5-per-language eval sample
    * ([[graft.ops.Splits.sampleKPerGroup]]): smallest-hash-wins
    * selection via the bounded-heap TopKAgg, so the draw is a pure
    * function of the id set (stable across clusters/reruns/appends)
    * and the shuffle carries groups × k entries, never the corpus.
    * DuckDB replays the same 32-bit Knuth multiply in HUGEINT (the
    * BIGINT product would overflow) and ranks with a window — at
    * oracle scale the window is fine; the engine side exists because
    * that window re-shuffles the corpus at 100 TB. */
  private def q85(s: SparkSession, dir: String): DataFrame =
    Splits.sampleKPerGroup(Tables.documents(s, dir), "lang", "doc_id", k = 5)
      .orderBy("lang", "rk")

  private val q85Sql =
    """WITH h AS (
      |  SELECT lang, doc_id,
      |    CAST((CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
      |         % 4294967296 AS BIGINT) AS hv
      |  FROM documents
      |)
      |SELECT lang, rk, doc_id, hv FROM (
      |  SELECT lang, doc_id, hv,
      |    CAST(row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS INTEGER) AS rk
      |  FROM h)
      |WHERE rk <= 5
      |ORDER BY lang, rk""".stripMargin

  // ---------------------------------------------------------------- q86
  /** Token-budget mixture sampling
    * ([[graft.ops.Splits.tokenBudgetSample]]): admit each language's
    * docs in deterministic hash order until 2000 tokens — mixtures
    * specced in TOKENS, not row fractions. The per-group cumsum runs
    * as the two-phase bucketed prefix sum with past-budget buckets
    * pruned before any doc-level window; DuckDB replays the whole
    * selection with one window cumsum over the same Knuth hash
    * order. */
  private def q86(s: SparkSession, dir: String): DataFrame =
    Splits.tokenBudgetSample(Tables.documents(s, dir), budget = 2000L)
      .orderBy("lang", "start")

  private val q86Sql =
    """WITH h AS (
      |  SELECT lang, doc_id,
      |    CAST((CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
      |         % 4294967296 AS BIGINT) AS hv,
      |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tok
      |  FROM documents
      |),
      |placed AS (
      |  SELECT lang, doc_id, hv, n_tok,
      |    CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY lang
      |      ORDER BY hv, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
      |  FROM h
      |)
      |SELECT lang, doc_id, hv, n_tok, start FROM placed
      |WHERE start < 2000
      |ORDER BY lang, start""".stripMargin

  // ---------------------------------------------------------------- q87
  /** Incremental dedup funnel ([[graft.ops.Dedup
    * .incrementalDeduplicate]]): the batch docs actually ADMITTED
    * against the corpus — exact layer, cross near-dup layer, then
    * within-batch clustering with min-id survivors. Oracle: DuckDB
    * replays all three layers exactly (exact anti-join, all
    * batch×corpus pairs, all within-batch pairs + recursive-CTE
    * connected components — the q55 pattern on the increment). Same
    * recall-1 banding argument as q31/q84. */
  private def q87(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    Dedup.incrementalDeduplicate(batch, corpus, maxJaccardDist = 0.4)
      .select("doc_id", "lang").orderBy("doc_id")
  }

  /** Shared with q90 (stored-index variant): the storage round-trip
    * must be semantically invisible, so both compare to one replay. */
  private[queries] def q87SqlForStoredIndex: String = q87Sql

  private val q87Sql =
    """WITH RECURSIVE batch AS (
      |  SELECT * FROM documents WHERE doc_id % 10 = 0
      |),
      |corpus AS (SELECT * FROM documents WHERE doc_id % 10 <> 0),
      |ex AS (
      |  SELECT MIN(doc_id) AS doc_id FROM batch
      |  WHERE text NOT IN (SELECT text FROM corpus)
      |  GROUP BY text
      |),
      |kept1 AS (SELECT b.doc_id, b.lang, b.text FROM batch b JOIN ex ON b.doc_id = ex.doc_id),
      |bgrams AS (
      |  SELECT doc_id, list_distinct(list_transform(range(len(t) - 2),
      |    i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
      |  FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM kept1)
      |  WHERE len(t) >= 3
      |),
      |cgrams AS (
      |  SELECT doc_id, list_distinct(list_transform(range(len(t) - 2),
      |    i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
      |  FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM corpus)
      |  WHERE len(t) >= 3
      |),
      |crossdrop AS (
      |  SELECT DISTINCT a.doc_id
      |  FROM bgrams a, cgrams b
      |  WHERE 1.0 - (CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
      |      / (CAST(len(a.g) + len(b.g) AS DOUBLE) - CAST(len(list_intersect(a.g, b.g)) AS DOUBLE))) <= 0.4
      |),
      |kept2 AS (
      |  SELECT doc_id, lang FROM kept1
      |  WHERE doc_id NOT IN (SELECT doc_id FROM crossdrop)
      |),
      |k2g AS (SELECT g.doc_id, g.g FROM bgrams g JOIN kept2 k ON g.doc_id = k.doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM k2g a JOIN k2g b ON a.doc_id < b.doc_id
      |  WHERE 1.0 - (CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
      |      / (CAST(len(a.g) + len(b.g) AS DOUBLE) - CAST(len(list_intersect(a.g, b.g)) AS DOUBLE))) <= 0.4
      |),
      |edges AS (
      |  SELECT doc_a AS s, doc_b AS d FROM pairs
      |  UNION ALL SELECT doc_b, doc_a FROM pairs
      |),
      |reach AS (
      |  SELECT DISTINCT s AS id, s AS lab FROM edges
      |  UNION
      |  SELECT e.d AS id, r.lab FROM reach r JOIN edges e ON e.s = r.id
      |),
      |comp AS (SELECT id, MIN(lab) AS cluster FROM reach GROUP BY id)
      |SELECT doc_id, lang FROM kept2
      |WHERE doc_id NOT IN (SELECT id FROM comp WHERE cluster < id)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q88
  /** Exact per-language quality deciles ([[graft.ops.Ranks]]): every
    * document's exact rank by (quality desc, doc_id) and its decile —
    * the exact-percentile curation gate ("top 30% per language").
    * The engine computes the rank by two-level radix counting on the
    * bounded score (no corpus-sized window partition, unlike the
    * oracle's spelling); DuckDB's plain window row_number is the
    * independent ground truth, so the two formulations cross-check —
    * exact agreement REQUIRES the quality doubles to be
    * bit-identical on both sides, which q17's hash-match already
    * establishes. */
  private def q88(s: SparkSession, dir: String): DataFrame = {
    val ranked = Ranks.exactGroupRank(
      Tables.documents(s, dir), "lang", "doc_id",
      TextStats.qualityScore(col("text")))
    Ranks.withQuantileBucket(ranked, "lang", buckets = 10)
      .select(col("lang"), col("doc_id"), col("rnk"),
        col("bucket").as("decile"))
      .orderBy("lang", "rnk")
  }

  private val q88Sql = {
    val stops = TextStats.miniStopWords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH scored AS (
       |  SELECT lang, doc_id,
       |    (least(CAST(len(regexp_split_to_array(text,'\\s+')) AS DOUBLE) / 50.0, 1.0) * 0.4
       |     + least(CAST(len(list_filter(regexp_split_to_array(text,'\\s+'), t -> list_contains($stops, t))) AS DOUBLE) / CAST(len(regexp_split_to_array(text,'\\s+')) AS DOUBLE) * 5.0, 1.0) * 0.3
       |     + (1.0 - least(CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) * 5.0, 1.0)) * 0.2
       |     + (1.0 - least(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) * 5.0, 1.0)) * 0.1) AS q
       |  FROM documents
       |),
       |n AS (SELECT lang, COUNT(*) AS ng FROM scored GROUP BY lang),
       |r AS (
       |  SELECT lang, doc_id,
       |    CAST(row_number() OVER (PARTITION BY lang ORDER BY q DESC, doc_id) AS BIGINT) AS rnk
       |  FROM scored
       |)
       |SELECT r.lang, r.doc_id, r.rnk,
       |  CAST((10 * (r.rnk - 1)) // n.ng AS BIGINT) AS decile
       |FROM r JOIN n ON r.lang = n.lang
       |ORDER BY r.lang, r.rnk""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q84_incremental_neardup", q84, Some(q84Sql)),
    QueryDef("q85_eval_sample", q85, Some(q85Sql)),
    QueryDef("q86_token_budget_sample", q86, Some(q86Sql)),
    QueryDef("q87_incremental_dedup", q87, Some(q87Sql)),
    QueryDef("q88_quality_deciles", q88, Some(q88Sql)))
}
