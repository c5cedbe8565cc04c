package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.ops.Similarity

/** Round-20 battery additions: the two dials the round-19
  * measurements said the residual production tier should spend on
  * next — an EXACT RE-RANK window over the ADC candidates (q228,
  * IVFADC+R: q227 measured the tier quantization-bound, so widening
  * probes buys nothing and re-ranking is the standard production
  * fix), and the Lloyd ROUNDS→recall frontier (q229: q218 measured
  * round 0→1 worth +200 000 ppm; where does refinement saturate?).
  * Both reference-scope-none LLM-pipeline extensions (SURVEY §8).
  */
object Round20 {

  // ---------------------------------------------------------------- q228
  /** IVFADC+R re-rank rung ([[graft.ops.Similarity
    * .ivfAdcResidualRerankRecall]], Jégou '11 §V): retrieve top-C by
    * ADC from the residual tier, fetch those C raw vectors (bounded
    * |queries|·C point fetch), re-rank by exact integer distance,
    * audit recall@{1,5,10} per C ∈ {10, 20, 40}. ONE index build, one
    * ADC pass at maxC, one exact ranking — each narrower C is a rank
    * prefix, never a re-retrieval. The oracle replays BOTH rankings
    * plus the re-rank window: the shared radc sums, the ADC rank
    * prefix per C, the exact re-rank inside each window, and the
    * recall algebra with the (C × query × k) grid filled. */
  private def q228(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val probes = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    Similarity.ivfAdcResidualRerankRecall(emb, probes,
      ks = Seq(1, 5, 10), cs = Seq(10, 20, 40), nCents = 16, nProbe = 4,
      m = 8, nCodes = 16, rounds = 1)
  }

  private val q228Sql =
    s"""WITH
       |${Round19.residualTierCtes()},
       |cs AS (SELECT CAST(u.c AS BIGINT) AS c FROM UNNEST([10, 20, 40]) AS u(c)),
       |adcr AS (
       |  SELECT qid, vec_id,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY adc_d2, vec_id) AS BIGINT) AS ar
       |  FROM radc
       |),
       |rrk AS (
       |  SELECT c, qid, vec_id, rr FROM (
       |    SELECT cs.c, a.qid, a.vec_id,
       |      CAST(ROW_NUMBER() OVER (PARTITION BY cs.c, a.qid
       |        ORDER BY ${Round16.d2Sql("x.qv", "p.pqv")}, a.vec_id)
       |        AS BIGINT) AS rr
       |    FROM adcr a
       |    JOIN q x ON x.vec_id = a.vec_id
       |    JOIN probes p ON p.qid = a.qid
       |    CROSS JOIN cs
       |    WHERE a.ar <= cs.c) WHERE rr <= 10
       |),
       |exr AS (
       |  SELECT p.qid, a.vec_id,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY p.qid
       |      ORDER BY ${Round16.d2Sql("a.qv", "p.pqv")}, a.vec_id) AS BIGINT)
       |      AS er
       |  FROM q a CROSS JOIN probes p
       |),
       |ks AS (SELECT CAST(u.k AS BIGINT) AS k FROM UNNEST([1, 5, 10]) AS u(k)),
       |hit AS (
       |  SELECT r.c, r.qid, k.k, CAST(COUNT(*) AS BIGINT) AS hc
       |  FROM exr e JOIN rrk r ON e.qid = r.qid AND e.vec_id = r.vec_id
       |  CROSS JOIN ks k
       |  WHERE e.er <= k.k AND r.rr <= k.k
       |  GROUP BY r.c, r.qid, k.k
       |)
       |SELECT c.c AS rerank_c, p.qid AS query_id, k.k AS k,
       |  CAST(COALESCE(h.hc, 0) AS BIGINT) AS n_overlap,
       |  CAST(COALESCE(h.hc, 0) * 1000000 // k.k AS BIGINT) AS recall_ppm
       |FROM probes p CROSS JOIN cs c CROSS JOIN ks k
       |LEFT JOIN hit h ON h.c = c.c AND h.qid = p.qid AND h.k = k.k
       |ORDER BY rerank_c, query_id, k""".stripMargin

  // ---------------------------------------------------------------- q229
  /** Lloyd ROUNDS → recall frontier for the residual tier
    * ([[graft.ops.Similarity.ivfAdcResidualLloydRoundsSweep]]):
    * rounds ∈ {0, 1, 2, 4} at the production geometry, ONE Lloyd run
    * read at its prefixes (round r+1 is a pure function of round r's
    * book — the q221 BPE-prefix argument applied to k-means), one
    * routing pass, one exact ranking; encode/LUT/ADC re-run per round
    * count because the codes themselves change with the book. The
    * oracle chains the q218 round block to depth 4 over the residual
    * slices (each book pinned AS MATERIALIZED — four encode blocks
    * reference each spine stage, the q221 DuckDB inlining trap) and
    * stamps one encode+LUT+ADC block per snapshot. */
  private def q229(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val probes = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    Similarity.ivfAdcResidualLloydRoundsSweep(emb, probes,
      ks = Seq(1, 5, 10), nCents = 16, nProbe = 4, m = 8, nCodes = 16,
      roundsList = Seq(0, 1, 2, 4))
  }

  private val q229Rounds = Seq(0, 1, 2, 4)

  private def q229Book(r: Int): String = if (r == 0) "rb0" else s"rrb$r"

  private val q229Sql =
    s"""WITH
       |${Round19.residualFitPrefixCtes()},
       |${(1 to q229Rounds.max).map(i =>
           Round18.lloydRoundCtes("rr", i, q229Book(i - 1)))
         .mkString(",\n")},
       |${Round19.residualQueryCtes()},
       |${q229Rounds.map(r =>
           Round19.residualAdcCtes(s"l$r", q229Book(r))).mkString(",\n")},
       |rds AS (SELECT CAST(u.r AS BIGINT) AS lloyd_rounds
       |        FROM UNNEST([${q229Rounds.mkString(", ")}]) AS u(r)),
       |apx AS (
       |${q229Rounds.map(r =>
        s"""  SELECT CAST($r AS BIGINT) AS lloyd_rounds, qid, vec_id, ar FROM (
           |    SELECT qid, vec_id,
           |      CAST(ROW_NUMBER() OVER (PARTITION BY qid
           |        ORDER BY adc_d2, vec_id) AS BIGINT) AS ar
           |    FROM l${r}radc) WHERE ar <= 10""".stripMargin)
         .mkString("\n  UNION ALL\n")}
       |),
       |exr AS (
       |  SELECT p.qid, a.vec_id,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY p.qid
       |      ORDER BY ${Round16.d2Sql("a.qv", "p.pqv")}, a.vec_id) AS BIGINT)
       |      AS er
       |  FROM q a CROSS JOIN probes p
       |),
       |ks AS (SELECT CAST(u.k AS BIGINT) AS k FROM UNNEST([1, 5, 10]) AS u(k)),
       |hit AS (
       |  SELECT x.lloyd_rounds, x.qid, k.k, CAST(COUNT(*) AS BIGINT) AS hc
       |  FROM exr e JOIN apx x ON e.qid = x.qid AND e.vec_id = x.vec_id
       |  CROSS JOIN ks k
       |  WHERE e.er <= k.k AND x.ar <= k.k
       |  GROUP BY x.lloyd_rounds, x.qid, k.k
       |)
       |SELECT r.lloyd_rounds, p.qid AS query_id, k.k AS k,
       |  CAST(COALESCE(h.hc, 0) AS BIGINT) AS n_overlap,
       |  CAST(COALESCE(h.hc, 0) * 1000000 // k.k AS BIGINT) AS recall_ppm
       |FROM probes p CROSS JOIN rds r CROSS JOIN ks k
       |LEFT JOIN hit h ON h.lloyd_rounds = r.lloyd_rounds
       |  AND h.qid = p.qid AND h.k = k.k
       |ORDER BY r.lloyd_rounds, query_id, k""".stripMargin

  // ---------------------------------------------------------------- q230
  /** The COMPLETE production read path, stored end to end
    * ([[graft.ops.Similarity.serveResidualIndexRerank]]): freeze the
    * whole residual index (q225's layout), serve the batch through
    * the static partition filter, re-rank the top-C ADC candidates by
    * exact integer distance against the raw vector store (a bounded
    * |queries|·C point fetch — q228 measured what the window buys;
    * this query pins the OPERATOR a deployment calls). Full hash
    * oracle on the served rows: the shared residual-tier replay
    * through the radc sums, the ADC top-C window, and the exact
    * re-rank — a drift in routing, storage, pruning, ADC arithmetic,
    * the re-rank window, OR the raw-store fetch all change rows. */
  private def q230(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val probes = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val idxDir = Round11.freshScratchDirShared("graft_q230_residx")
    Similarity.saveResidualIndex(emb, idxDir, nCents = 16, m = 8,
      nCodes = 16, rounds = 1)
    Similarity.serveResidualIndexRerank(s, idxDir, probes, emb, k = 10,
      rerankC = 40, nProbe = 4)
  }

  private val q230Sql =
    s"""WITH
       |${Round19.residualTierCtes()},
       |adcr AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id,
       |      CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |        ORDER BY adc_d2, vec_id) AS BIGINT) AS ar
       |    FROM radc) WHERE ar <= 40
       |)
       |SELECT query_id, rank, vec_id, exact_d2 FROM (
       |  SELECT a.qid AS query_id,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY a.qid
       |      ORDER BY ${Round16.d2Sql("x.qv", "p.pqv")}, a.vec_id)
       |      AS BIGINT) AS rank,
       |    a.vec_id,
       |    CAST(${Round16.d2Sql("x.qv", "p.pqv")} AS BIGINT) AS exact_d2
       |  FROM adcr a
       |  JOIN q x ON x.vec_id = a.vec_id
       |  JOIN probes p ON p.qid = a.qid) WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q228_residual_rerank_frontier", q228, Some(q228Sql)),
    QueryDef("q229_lloyd_rounds_frontier", q229, Some(q229Sql)),
    QueryDef("q230_stored_serve_rerank", q230, Some(q230Sql)))
}
