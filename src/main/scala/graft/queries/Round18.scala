package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.ops.Similarity

/** Round-18 battery additions: the END-TO-END IVFADC recall audit
  * (q209 — the composed route→encode→rank system's recall, which
  * neither per-rung audit q182/q185 measures), the batched multi-query
  * ADC retrieval (q212 — the production spelling of the q205 query
  * path). All reference-scope-none LLM-pipeline extensions
  * (SURVEY §8).
  */
object Round18 {

  /** Shared IVFADC CTE block (q209): the full q206 assembly — seeded
    * medoid cells, query routing, candidate restriction, PQ codebooks,
    * candidate assignment, query LUT, ADC sums — ending in
    * `adc(vec_id, adc_d2)` over the probed cells' members, plus the
    * `q(vec_id, qv)` quantized frame and `pq(pqv)` probe vector for
    * the exact side. Parameters fixed at the battery's nCents=16,
    * nProbe=4, m=8, nCodes=16, queryId=0. */
  private val slice8 = (v: String) =>
    s"$v[CAST(ss.s * 8 + 1 AS INT):CAST(ss.s * 8 + 8 AS INT)]"

  /** Shared geometry prefix (q209/q213): quantized vectors, seeded
    * coarse centroids + per-vector cell ranks, the PQ codebook, and
    * the probe's quantized vector — everything downstream of which
    * the two audits diverge (q209 fixes nProbe=4 and encodes only
    * candidates; q213 ranks every vector once and sweeps nProbe). */
  private def ivfPrefixCtes: String =
    s"""q AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)) AS qv
       |  FROM embeddings
       |),
       |cent AS (
       |  SELECT qv AS cqv,
       |    ROW_NUMBER() OVER (ORDER BY
       |      ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id)
       |      AS cent_id
       |  FROM q
       |  ORDER BY ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id
       |  LIMIT 16
       |),
       |rk_ad AS (
       |  SELECT a.vec_id AS vid, a.qv, c.cent_id,
       |    ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |      ORDER BY ${Round16.d2Sql("a.qv", "c.cqv")}, c.cent_id) AS rk
       |  FROM q a CROSS JOIN cent c
       |),
       |cells AS (SELECT vid, cent_id FROM rk_ad WHERE rk = 1),
       |ss AS (SELECT CAST(u.s AS BIGINT) AS s FROM UNNEST(range(0, 8)) AS u(s)),
       |med AS (
       |  SELECT qv, ROW_NUMBER() OVER (ORDER BY
       |      ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id)
       |    AS code
       |  FROM q
       |  ORDER BY ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id
       |  LIMIT 16
       |),
       |books AS (
       |  SELECT ss.s, m.code, ${slice8("m.qv")} AS cv FROM med m, ss),
       |pq AS (SELECT qv AS pqv FROM q WHERE vec_id = 0),
       |lut AS (
       |  SELECT b.s AS s, b.code,
       |    ${Round16.d2Sql("pq.pqv[CAST(b.s * 8 + 1 AS INT):CAST(b.s * 8 + 8 AS INT)]", "b.cv")} AS qd2
       |  FROM books b, pq
       |)""".stripMargin

  private def ivfAdcCtes: String =
    s"""$ivfPrefixCtes,
       |pcells AS (SELECT cent_id FROM rk_ad WHERE vid = 0 AND rk <= 4),
       |cand AS (
       |  SELECT c.vid FROM cells c JOIN pcells p ON c.cent_id = p.cent_id),
       |sub AS (
       |  SELECT a.vec_id, ss.s, ${slice8("a.qv")} AS sv
       |  FROM q a JOIN cand ON cand.vid = a.vec_id, ss),
       |asgn AS (
       |  SELECT vec_id, s, code FROM (
       |    SELECT sub.vec_id, sub.s, b.code,
       |      ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.s
       |        ORDER BY ${Round16.d2Sql("sub.sv", "b.cv")}, b.code) AS rk
       |    FROM sub JOIN books b ON b.s = sub.s) WHERE rk = 1
       |),
       |adc AS (
       |  SELECT a.vec_id, CAST(SUM(l.qd2) AS BIGINT) AS adc_d2
       |  FROM asgn a JOIN lut l ON l.s = a.s AND l.code = a.code
       |  GROUP BY a.vec_id
       |)""".stripMargin

  // ---------------------------------------------------------------- q209
  /** END-TO-END IVFADC recall audit ([[graft.ops.Similarity
    * .ivfAdcRecall]]): recall@{1,5,10} of the COMPOSED q206 system —
    * route to nProbe=4 of 16 cells, PQ-encode only probed members,
    * ADC-rank — against the exact integer quantized distance over the
    * FULL corpus. q185 prices quantization loss alone and q182 prices
    * cell-miss alone; the composed system loses recall through both
    * channels at once (a true neighbor in an unprobed cell OR
    * out-ranked by a coarse code), and that composed number — the one
    * a production index is judged by — is what this audit measures.
    * The oracle replays every stage of both rankings and the exact
    * ppm recall algebra (the q135/q185 audit family). */
  private def q209(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfAdcRecall(Tables.embeddings(s, dir), queryId = 0L,
      ks = Seq(1, 5, 10), nCents = 16, nProbe = 4, m = 8, nCodes = 16)

  private val q209Sql =
    s"""WITH
       |$ivfAdcCtes,
       |apxr AS (
       |  SELECT vec_id,
       |    CAST(ROW_NUMBER() OVER (ORDER BY adc_d2, vec_id) AS BIGINT) AS ar
       |  FROM adc
       |),
       |exr AS (
       |  SELECT a.vec_id,
       |    CAST(ROW_NUMBER() OVER (
       |      ORDER BY ${Round16.d2Sql("a.qv", "pq.pqv")}, a.vec_id) AS BIGINT)
       |      AS er
       |  FROM q a, pq
       |),
       |ks AS (SELECT CAST(u.k AS BIGINT) AS k FROM UNNEST([1, 5, 10]) AS u(k)),
       |hit AS (
       |  SELECT k.k, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM exr e JOIN apxr x USING (vec_id) CROSS JOIN ks k
       |  WHERE e.er <= k.k AND x.ar <= k.k
       |  GROUP BY k.k
       |)
       |SELECT k.k AS k,
       |  CAST(COALESCE(h.c, 0) AS BIGINT) AS n_overlap,
       |  CAST(COALESCE(h.c, 0) * 1000000 // k.k AS BIGINT) AS recall_ppm
       |FROM ks k LEFT JOIN hit h ON h.k = k.k
       |ORDER BY k""".stripMargin

  // ---------------------------------------------------------------- q212
  /** BATCHED multi-query ADC retrieval ([[graft.ops.Similarity
    * .adcTopKBatch]]): every 50th vector plays a probe batch and the
    * whole batch is served in ONE job — per-query LUTs as a single
    * broadcast (query × subspace × code) frame, codes shuffled once,
    * map-side-combined per-(query, id) sums, per-query bounded-heap
    * top-10. The production spelling of the q205 path (one job per
    * query is a scheduler DoS at 10⁶ queries/day). The oracle replays
    * codebook, assignment, ALL per-query LUTs and the partitioned
    * ranking. */
  private def q212(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val books = Similarity.fitPqBooks(emb, m = 8, nCodes = 16)
    val codes = Similarity.encodePq(emb, books)
    val probes = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    Similarity.adcTopKBatch(codes, books, probes, k = 10)
  }

  private val q212Sql =
    s"""WITH q AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)) AS qv
       |  FROM embeddings
       |),
       |ss AS (SELECT CAST(u.s AS BIGINT) AS s FROM UNNEST(range(0, 8)) AS u(s)),
       |med AS (
       |  SELECT qv, ROW_NUMBER() OVER (ORDER BY
       |      ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id)
       |    AS code
       |  FROM q
       |  ORDER BY ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id
       |  LIMIT 16
       |),
       |books AS (
       |  SELECT ss.s, m.code, ${slice8("m.qv")} AS cv FROM med m, ss),
       |sub AS (
       |  SELECT a.vec_id, ss.s, ${slice8("a.qv")} AS sv FROM q a, ss),
       |asgn AS (
       |  SELECT vec_id, s, code FROM (
       |    SELECT sub.vec_id, sub.s, b.code,
       |      ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.s
       |        ORDER BY ${Round16.d2Sql("sub.sv", "b.cv")}, b.code) AS rk
       |    FROM sub JOIN books b ON b.s = sub.s) WHERE rk = 1
       |),
       |probes AS (SELECT vec_id AS qid, qv AS pqv FROM q WHERE vec_id % 50 = 0),
       |lut AS (
       |  SELECT p.qid, b.s AS s, b.code,
       |    ${Round16.d2Sql("p.pqv[CAST(b.s * 8 + 1 AS INT):CAST(b.s * 8 + 8 AS INT)]", "b.cv")} AS qd2
       |  FROM books b, probes p
       |),
       |adc AS (
       |  SELECT l.qid, a.vec_id, CAST(SUM(l.qd2) AS BIGINT) AS adc_d2
       |  FROM asgn a JOIN lut l ON l.s = a.s AND l.code = a.code
       |  GROUP BY l.qid, a.vec_id
       |)
       |SELECT query_id, rank, vec_id, adc_d2 FROM (
       |  SELECT qid AS query_id,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY adc_d2, vec_id) AS BIGINT) AS rank,
       |    vec_id, adc_d2
       |  FROM adc) WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------------- q210
  /** Unigram-LM VITERBI-HARD EM round ([[graft.text.UnigramLm
    * .emRound]] / `unigramStatsEm`): q200 fixes piece costs from raw
    * counts once; real SentencePiece training interleaves E
    * (segment-and-count) and M (re-estimate costs). One hard-EM
    * round — re-count pieces under the current Viterbi segmentation,
    * keep used multi-char pieces + the char fallbacks, re-cost by the
    * same integer surprisal rule, re-segment — every quantity an
    * integer (the q148 bounded-round stance). The oracle replays the
    * ENTIRE round: the q200 DP, then the min-j BACKTRACK as a second
    * recursive CTE walking each word's best[] vector from the end
    * (emitting one piece per step), the weighted piece counts, the
    * retention/re-cost algebra, and the round-2 DP over the new cost
    * table. */
  private def q210(s: SparkSession, dir: String): DataFrame =
    graft.text.UnigramLm.unigramStatsEm(Tables.documents(s, dir),
      vocabN = 10, emRounds = 1).orderBy("doc_id")

  /** One Viterbi-hard EM round as oracle SQL, name-parameterized so
    * rounds CHAIN (q210 runs one, q217 two — same block, different
    * suffixes): backtrack the round-`i` DP via min-j walks over
    * `uwalk$i`/`upm$i`, re-count pieces weighted by word counts,
    * retain used multi-char pieces + the char fallbacks from
    * `ucost$i` (floor 1), re-cost by the integer surprisal rule,
    * rebuild the piece matrix, re-run the DP → `uwalk$o`/`upm$o`/
    * `uperword$o`. The round-0 names (empty `i`) are
    * [[Round17.unigramPerwordCtes]]'s. */
  private def emRoundCtes(i: String, o: String): String =
    s"""useg$o AS (
       |  SELECT tok, best FROM uwalk$i
       |  WHERE i = length(tok)
       |    AND best[CAST(length(tok) AS INT) + 1] IS NOT NULL
       |),
       |uback$o AS (
       |  SELECT tok, best, CAST(length(tok) AS BIGINT) AS i,
       |    CAST(NULL AS VARCHAR) AS piece
       |  FROM useg$o
       |  UNION ALL
       |  SELECT u.tok, u.best,
       |    (SELECT MIN(p.jpos) FROM upm$i p
       |      WHERE p.tok = u.tok AND p.ipos = u.i
       |        AND u.best[CAST(p.jpos AS INT) + 1] + p.addp
       |          = u.best[CAST(u.i AS INT) + 1]),
       |    (SELECT substr(u.tok, CAST(MIN(p.jpos) AS INT) + 1,
       |                   CAST(u.i - MIN(p.jpos) AS INT))
       |       FROM upm$i p
       |      WHERE p.tok = u.tok AND p.ipos = u.i
       |        AND u.best[CAST(p.jpos AS INT) + 1] + p.addp
       |          = u.best[CAST(u.i AS INT) + 1])
       |  FROM uback$o u WHERE u.i > 0
       |),
       |upcnt$o AS (
       |  SELECT b.piece, CAST(SUM(c.cnt) AS BIGINT) AS cnt
       |  FROM uback$o b JOIN ucounts c ON c.tok = b.tok
       |  WHERE b.piece IS NOT NULL
       |  GROUP BY b.piece
       |),
       |uret$o AS (
       |  SELECT piece, cnt FROM upcnt$o WHERE length(piece) > 1
       |  UNION ALL
       |  SELECT c.piece, GREATEST(COALESCE(u.cnt, 0), 1) AS cnt
       |  FROM (SELECT piece FROM ucost$i WHERE length(piece) = 1) c
       |  LEFT JOIN upcnt$o u ON u.piece = c.piece
       |),
       |utot$o AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM uret$o),
       |ucost$o AS (
       |  SELECT r.piece, CAST(length(bin(t.n // r.cnt)) AS BIGINT) AS surp
       |  FROM uret$o r CROSS JOIN utot$o t
       |),
       |upm$o AS (
       |  SELECT d.tok, CAST(u.j AS BIGINT) AS jpos,
       |    CAST(u.j AS BIGINT) + length(p.piece) AS ipos,
       |    p.surp * 1048576 + 1 AS addp
       |  FROM udwords d, UNNEST(range(length(d.tok))) AS u(j), ucost$o p
       |  WHERE length(p.piece) <= length(d.tok) - CAST(u.j AS BIGINT)
       |    AND substr(d.tok, CAST(u.j AS INT) + 1, length(p.piece)) = p.piece
       |),
       |uwalk$o AS (
       |  SELECT tok, CAST(0 AS BIGINT) AS i, [CAST(0 AS BIGINT)] AS best
       |  FROM udwords
       |  UNION ALL
       |  SELECT w.tok, w.i + 1,
       |    list_append(w.best,
       |      (SELECT MIN(w.best[CAST(p.jpos AS INT) + 1] + p.addp)
       |       FROM upm$o p WHERE p.tok = w.tok AND p.ipos = w.i + 1))
       |  FROM uwalk$o w WHERE w.i < length(w.tok)
       |),
       |uperword$o AS (
       |  SELECT tok, best[CAST(length(tok) AS INT) + 1] AS packed
       |  FROM uwalk$o WHERE i = length(tok)
       |)""".stripMargin

  /** Final per-doc rollup over `uperword$n` — q200's stats algebra. */
  private def emFinalSelect(n: String): String =
    s"""SELECT w.doc_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(CASE WHEN p.packed IS NULL THEN 1
       |                ELSE p.packed % 1048576 END) AS BIGINT) AS n_pieces,
       |  CAST(SUM(CASE WHEN p.packed IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_unk_words,
       |  CAST(SUM(CASE WHEN p.packed IS NULL THEN 0
       |                ELSE p.packed // 1048576 END) AS BIGINT) AS cost_bits
       |FROM uwords w JOIN uperword$n p USING (tok)
       |GROUP BY w.doc_id
       |ORDER BY w.doc_id""".stripMargin

  private val q210Sql =
    s"""WITH RECURSIVE
       |${Round17.unigramPerwordCtes},
       |${emRoundCtes("", "2")}
       |${emFinalSelect("2")}""".stripMargin

  // ---------------------------------------------------------------- q217
  /** TWO Viterbi-hard EM rounds ([[graft.text.UnigramLm
    * .unigramStatsEm]] at emRounds = 2): q210 runs one E/M
    * interleave; SentencePiece training runs several, and the
    * bounded-round stance (q148) makes EVERY round replayable — the
    * oracle chains the SAME generated round block twice (backtrack →
    * re-count → re-cost → re-DP, each level a recursive CTE), so the
    * round count is a parameter of the replay, not a new proof
    * obligation. The spec pins the convergence story: round 1 changes
    * the hand corpus's costs, round 2 is its fixed point. */
  private def q217(s: SparkSession, dir: String): DataFrame =
    graft.text.UnigramLm.unigramStatsEm(Tables.documents(s, dir),
      vocabN = 10, emRounds = 2).orderBy("doc_id")

  private val q217Sql =
    s"""WITH RECURSIVE
       |${Round17.unigramPerwordCtes},
       |${emRoundCtes("", "2")},
       |${emRoundCtes("2", "3")}
       |${emFinalSelect("3")}""".stripMargin

  // ---------------------------------------------------------------- q211
  /** T-CLOSENESS audit ([[graft.ops.Privacy.tCloseness]]): per
    * (source, len-bucket) cohort, the exact integer-ppm total-
    * variation distance between the cohort's sensitive-value (lang)
    * distribution and the corpus-wide one, verdict `TVD ≤ t`. The
    * top rung of the privacy ladder — q187's k-anonymity counts
    * cohort SIZE, q208's l-diversity counts distinct VALUES; neither
    * sees a cohort whose value MIX diverges from the corpus (95 %
    * one language in a 50/50 corpus passes both yet leaks). The sum
    * runs over the CORPUS value set so absent values contribute
    * their full corpus mass. Oracle: the same grid replay in
    * HUGEINT. */
  private def q211(s: SparkSession, dir: String): DataFrame =
    graft.ops.Privacy.tCloseness(Tables.documents(s, dir), tPpm = 300000L)

  private val q211Sql =
    """WITH b AS (
      |  SELECT source, n_chars // 100 AS len_bucket, lang AS sv
      |  FROM documents
      |),
      |bysv AS (
      |  SELECT source, len_bucket, sv, CAST(COUNT(*) AS HUGEINT) AS c
      |  FROM b GROUP BY 1, 2, 3
      |),
      |coh AS (
      |  SELECT source, len_bucket, CAST(SUM(c) AS HUGEINT) AS n
      |  FROM bysv GROUP BY 1, 2
      |),
      |corp AS (SELECT sv, CAST(COUNT(*) AS HUGEINT) AS cv FROM b GROUP BY 1),
      |tot AS (SELECT CAST(COUNT(*) AS HUGEINT) AS nn FROM b),
      |grid AS (
      |  SELECT k.source, k.len_bucket, k.n, t.nn, v.cv,
      |    COALESCE(s.c, 0) AS c
      |  FROM coh k CROSS JOIN corp v CROSS JOIN tot t
      |  LEFT JOIN bysv s ON s.source IS NOT DISTINCT FROM k.source
      |    AND s.len_bucket IS NOT DISTINCT FROM k.len_bucket
      |    AND s.sv IS NOT DISTINCT FROM v.sv
      |),
      |agg AS (
      |  SELECT source, len_bucket,
      |    CAST(MAX(n) AS BIGINT) AS n_docs,
      |    CAST(SUM(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_sensitive,
      |    CAST(SUM(ABS(c * nn - cv * n)) * 1000000
      |      // (2 * MAX(n) * MAX(nn)) AS BIGINT) AS tvd_ppm
      |  FROM grid GROUP BY 1, 2
      |)
      |SELECT source, len_bucket, n_docs, n_sensitive, tvd_ppm,
      |  CAST(CASE WHEN tvd_ppm <= 300000 THEN 1 ELSE 0 END AS BIGINT)
      |    AS t_close
      |FROM agg ORDER BY source, len_bucket""".stripMargin

  // ---------------------------------------------------------------- q213
  /** nProbe → recall FRONTIER: q209's composed IVFADC recall swept
    * over nProbe ∈ {1, 2, 4, 8, 16} at fixed geometry — the operating
    * curve a production index tuner actually reads (each probed cell
    * buys recall with scan volume; the knee of this curve IS the
    * nProbe decision). q209 prices one operating point; this prices
    * the whole dial, ending at nProbe = nCents where routing loss is
    * zero and only quantization loss remains (the spec pins that row
    * to the full-scan [[graft.ops.Similarity.pqAdcRecall]]). The
    * oracle ranks every vector's ADC distance ONCE and re-restricts
    * the ranking per nProbe — sound because per-vector codes do not
    * depend on the candidate set — then fills the (nProbe, k) grid
    * with a LEFT JOIN so zero-overlap cells surface as 0, not as
    * missing rows. */
  private def q213(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Seq(1, 2, 4, 8, 16).map { np =>
      Similarity.ivfAdcRecall(emb, queryId = 0L, ks = Seq(1, 5, 10),
          nCents = 16, nProbe = np, m = 8, nCodes = 16)
        .withColumn("nprobe", lit(np.toLong))
    }.reduce(_ unionAll _)
      .select("nprobe", "k", "n_overlap", "recall_ppm")
      .orderBy("nprobe", "k")
  }

  private val q213Sql =
    s"""WITH
       |$ivfPrefixCtes,
       |pcellsr AS (SELECT cent_id, rk FROM rk_ad WHERE vid = 0),
       |sub AS (SELECT a.vec_id, ss.s, ${slice8("a.qv")} AS sv FROM q a, ss),
       |asgn AS (
       |  SELECT vec_id, s, code FROM (
       |    SELECT sub.vec_id, sub.s, b.code,
       |      ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.s
       |        ORDER BY ${Round16.d2Sql("sub.sv", "b.cv")}, b.code) AS rk
       |    FROM sub JOIN books b ON b.s = sub.s) WHERE rk = 1
       |),
       |adc AS (
       |  SELECT a.vec_id, CAST(SUM(l.qd2) AS BIGINT) AS adc_d2
       |  FROM asgn a JOIN lut l ON l.s = a.s AND l.code = a.code
       |  GROUP BY a.vec_id
       |),
       |nps AS (SELECT CAST(u.np AS BIGINT) AS np
       |        FROM UNNEST([1, 2, 4, 8, 16]) AS u(np)),
       |candn AS (
       |  SELECT n.np, c.vid FROM nps n
       |  JOIN pcellsr p ON p.rk <= n.np
       |  JOIN cells c ON c.cent_id = p.cent_id
       |),
       |apxr AS (
       |  SELECT cn.np, a.vec_id,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY cn.np
       |      ORDER BY a.adc_d2, a.vec_id) AS BIGINT) AS ar
       |  FROM adc a JOIN candn cn ON cn.vid = a.vec_id
       |),
       |exr AS (
       |  SELECT a.vec_id,
       |    CAST(ROW_NUMBER() OVER (
       |      ORDER BY ${Round16.d2Sql("a.qv", "pq.pqv")}, a.vec_id) AS BIGINT)
       |      AS er
       |  FROM q a, pq
       |),
       |ks AS (SELECT CAST(u.k AS BIGINT) AS k FROM UNNEST([1, 5, 10]) AS u(k)),
       |hit AS (
       |  SELECT x.np, k.k, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM exr e JOIN apxr x USING (vec_id) CROSS JOIN ks k
       |  WHERE e.er <= k.k AND x.ar <= k.k
       |  GROUP BY x.np, k.k
       |)
       |SELECT n.np AS nprobe, k.k AS k,
       |  CAST(COALESCE(h.c, 0) AS BIGINT) AS n_overlap,
       |  CAST(COALESCE(h.c, 0) * 1000000 // k.k AS BIGINT) AS recall_ppm
       |FROM nps n CROSS JOIN ks k
       |LEFT JOIN hit h ON h.np = n.np AND h.k = k.k
       |ORDER BY nprobe, k""".stripMargin

  // ---------------------------------------------------------------- q214
  /** RESIDUAL vs RAW IVFADC — the Jégou '11 A/B
    * ([[graft.ops.Similarity.ivfAdcResidualRecall]] beside
    * [[graft.ops.Similarity.ivfAdcRecall]] at identical geometry):
    * production IVFADC codes the residual x − c(x) so the codebook
    * spends its resolution on the within-cell offset instead of
    * re-describing the cell, at the price of one LUT per probed
    * cell. This query puts both systems' recall@{1,5,10} in one
    * frame — the A/B a production index migration is decided on.
    * All integer end to end (vectors quantize BEFORE the residual
    * subtraction), so the oracle replays the residual pipeline —
    * per-cell residuals, residual codebook, per-cell query LUTs —
    * stage by stage beside the raw q209 replay, sharing the routing
    * prefix. */
  private def q214(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.ivfAdcRecall(emb, queryId = 0L, ks = Seq(1, 5, 10),
        nCents = 16, nProbe = 4, m = 8, nCodes = 16)
      .withColumn("variant", lit("raw"))
      .unionAll(Similarity.ivfAdcResidualRecall(emb, queryId = 0L,
          ks = Seq(1, 5, 10), nCents = 16, nProbe = 4, m = 8, nCodes = 16)
        .withColumn("variant", lit("residual")))
      .select("variant", "k", "n_overlap", "recall_ppm")
      .orderBy("variant", "k")
  }

  private val q214Sql =
    s"""WITH
       |$ivfAdcCtes,
       |resid AS (
       |  SELECT a.vec_id, c.cent_id AS cell,
       |    list_transform(range(len(a.qv)), i ->
       |      a.qv[CAST(i + 1 AS INT)] - ct.cqv[CAST(i + 1 AS INT)]) AS rv
       |  FROM q a JOIN cells c ON c.vid = a.vec_id
       |  JOIN cent ct ON ct.cent_id = c.cent_id
       |),
       |rmed AS (
       |  SELECT rv, ROW_NUMBER() OVER (ORDER BY
       |      ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id)
       |    AS code
       |  FROM resid
       |  ORDER BY ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id
       |  LIMIT 16
       |),
       |rbooks AS (
       |  SELECT ss.s, m.code, ${slice8("m.rv")} AS cv FROM rmed m, ss),
       |qres AS (
       |  SELECT p.cent_id AS cell,
       |    list_transform(range(len(pq.pqv)), i ->
       |      pq.pqv[CAST(i + 1 AS INT)] - ct.cqv[CAST(i + 1 AS INT)]) AS qr
       |  FROM pcells p JOIN cent ct ON ct.cent_id = p.cent_id, pq
       |),
       |rsub AS (
       |  SELECT r.vec_id, r.cell, ss.s, ${slice8("r.rv")} AS sv
       |  FROM resid r JOIN cand ON cand.vid = r.vec_id, ss
       |),
       |rasgn AS (
       |  SELECT vec_id, cell, s, code FROM (
       |    SELECT rsub.vec_id, rsub.cell, rsub.s, b.code,
       |      ROW_NUMBER() OVER (PARTITION BY rsub.vec_id, rsub.s
       |        ORDER BY ${Round16.d2Sql("rsub.sv", "b.cv")}, b.code) AS rk
       |    FROM rsub JOIN rbooks b ON b.s = rsub.s) WHERE rk = 1
       |),
       |rlut AS (
       |  SELECT qres.cell, b.s AS s, b.code,
       |    ${Round16.d2Sql("qres.qr[CAST(b.s * 8 + 1 AS INT):CAST(b.s * 8 + 8 AS INT)]", "b.cv")} AS qd2
       |  FROM rbooks b, qres
       |),
       |radc AS (
       |  SELECT a.vec_id, CAST(SUM(l.qd2) AS BIGINT) AS adc_d2
       |  FROM rasgn a JOIN rlut l
       |    ON l.cell = a.cell AND l.s = a.s AND l.code = a.code
       |  GROUP BY a.vec_id
       |),
       |apxr AS (
       |  SELECT vec_id,
       |    CAST(ROW_NUMBER() OVER (ORDER BY adc_d2, vec_id) AS BIGINT) AS ar
       |  FROM adc
       |),
       |rapxr AS (
       |  SELECT vec_id,
       |    CAST(ROW_NUMBER() OVER (ORDER BY adc_d2, vec_id) AS BIGINT) AS ar
       |  FROM radc
       |),
       |exr AS (
       |  SELECT a.vec_id,
       |    CAST(ROW_NUMBER() OVER (
       |      ORDER BY ${Round16.d2Sql("a.qv", "pq.pqv")}, a.vec_id) AS BIGINT)
       |      AS er
       |  FROM q a, pq
       |),
       |ks AS (SELECT CAST(u.k AS BIGINT) AS k FROM UNNEST([1, 5, 10]) AS u(k)),
       |hit AS (
       |  SELECT k.k, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM exr e JOIN apxr x USING (vec_id) CROSS JOIN ks k
       |  WHERE e.er <= k.k AND x.ar <= k.k GROUP BY k.k
       |),
       |rhit AS (
       |  SELECT k.k, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM exr e JOIN rapxr x USING (vec_id) CROSS JOIN ks k
       |  WHERE e.er <= k.k AND x.ar <= k.k GROUP BY k.k
       |)
       |SELECT 'raw' AS variant, k.k AS k,
       |  CAST(COALESCE(h.c, 0) AS BIGINT) AS n_overlap,
       |  CAST(COALESCE(h.c, 0) * 1000000 // k.k AS BIGINT) AS recall_ppm
       |FROM ks k LEFT JOIN hit h ON h.k = k.k
       |UNION ALL
       |SELECT 'residual' AS variant, k.k AS k,
       |  CAST(COALESCE(h.c, 0) AS BIGINT) AS n_overlap,
       |  CAST(COALESCE(h.c, 0) * 1000000 // k.k AS BIGINT) AS recall_ppm
       |FROM ks k LEFT JOIN rhit h ON h.k = k.k
       |ORDER BY variant, k""".stripMargin

  // ---------------------------------------------------------------- q215
  /** IVF-ROUTED batched retrieval ([[graft.ops.Similarity
    * .ivfAdcTopKBatch]]): the full production query tier — q212's
    * batch ADC still scans every stored code per query (O(n·m)
    * lookups each); this routes each probe to its nProbe=4 of 16
    * cells first and streams only those cells' codes, so the
    * per-query scan is n·nProbe/nCents. One cell-keyed join fans
    * each code row out only to the queries probing its cell;
    * per-query LUTs broadcast; bounded-heap top-10 per query. The
    * oracle replays routing (the shared rank CTE restricted to probe
    * ids), per-query LUTs, and the partitioned ranking. */
  private def q215(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val probes = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    Similarity.ivfAdcTopKBatch(emb, probes, k = 10,
      nCents = 16, nProbe = 4, m = 8, nCodes = 16)
  }

  private val q215Sql =
    s"""WITH
       |$ivfPrefixCtes,
       |probes AS (SELECT vec_id AS qid, qv AS pqv FROM q WHERE vec_id % 50 = 0),
       |qpc AS (SELECT vid AS qid, cent_id FROM rk_ad
       |        WHERE vid % 50 = 0 AND rk <= 4),
       |candq AS (
       |  SELECT qp.qid, cl.vid FROM qpc qp
       |  JOIN cells cl ON cl.cent_id = qp.cent_id),
       |sub AS (SELECT a.vec_id, ss.s, ${slice8("a.qv")} AS sv FROM q a, ss),
       |asgn AS (
       |  SELECT vec_id, s, code FROM (
       |    SELECT sub.vec_id, sub.s, b.code,
       |      ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.s
       |        ORDER BY ${Round16.d2Sql("sub.sv", "b.cv")}, b.code) AS rk
       |    FROM sub JOIN books b ON b.s = sub.s) WHERE rk = 1
       |),
       |blut AS (
       |  SELECT p.qid, b.s AS s, b.code,
       |    ${Round16.d2Sql("p.pqv[CAST(b.s * 8 + 1 AS INT):CAST(b.s * 8 + 8 AS INT)]", "b.cv")} AS qd2
       |  FROM books b, probes p
       |),
       |adcq AS (
       |  SELECT cq.qid, a.vec_id, CAST(SUM(l.qd2) AS BIGINT) AS adc_d2
       |  FROM asgn a JOIN candq cq ON cq.vid = a.vec_id
       |  JOIN blut l ON l.qid = cq.qid AND l.s = a.s AND l.code = a.code
       |  GROUP BY cq.qid, a.vec_id
       |)
       |SELECT query_id, rank, vec_id, adc_d2 FROM (
       |  SELECT qid AS query_id,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY adc_d2, vec_id) AS BIGINT) AS rank,
       |    vec_id, adc_d2
       |  FROM adcq) WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------------- q216
  /** ORDERED t-closeness ([[graft.ops.Privacy.tClosenessOrdered]]):
    * per (source, lang) cohort, the exact integer-ppm EMD between
    * the cohort's document-LENGTH-BUCKET distribution and the
    * corpus-wide one — Li '07's instance for an ORDINAL sensitive
    * attribute, where TVD (q211) is blind to HOW FAR the mass moved:
    * an extreme-loaded cohort leaks more than a middle-loaded one at
    * identical TVD. Closed form: mean |cumulative shortfall| over
    * the value order, every quantity integer. Oracle: the q211 grid
    * plus one cohort-bounded cumulative-sum window. */
  private def q216(s: SparkSession, dir: String): DataFrame =
    graft.ops.Privacy.tClosenessOrdered(Tables.documents(s, dir),
      tPpm = 300000L)

  private val q216Sql =
    """WITH b AS (
      |  SELECT source, lang, n_chars // 100 AS sv FROM documents
      |  WHERE n_chars // 100 IS NOT NULL
      |),
      |bysv AS (
      |  SELECT source, lang, sv, CAST(COUNT(*) AS HUGEINT) AS c
      |  FROM b GROUP BY 1, 2, 3
      |),
      |coh AS (
      |  SELECT source, lang, CAST(SUM(c) AS HUGEINT) AS n
      |  FROM bysv GROUP BY 1, 2
      |),
      |corp AS (SELECT sv, CAST(COUNT(*) AS HUGEINT) AS cv FROM b GROUP BY 1),
      |tot AS (SELECT CAST(COUNT(*) AS HUGEINT) AS nn,
      |               CAST(COUNT(DISTINCT sv) AS HUGEINT) AS v FROM b),
      |grid AS (
      |  SELECT k.source, k.lang, w.sv, k.n, t.nn, t.v, w.cv,
      |    COALESCE(s.c, 0) AS c
      |  FROM coh k CROSS JOIN corp w CROSS JOIN tot t
      |  LEFT JOIN bysv s ON s.source IS NOT DISTINCT FROM k.source
      |    AND s.lang IS NOT DISTINCT FROM k.lang
      |    AND s.sv IS NOT DISTINCT FROM w.sv
      |),
      |cum AS (
      |  SELECT source, lang, n, nn, v, c,
      |    SUM(c * nn - cv * n) OVER (PARTITION BY source, lang
      |      ORDER BY sv ROWS UNBOUNDED PRECEDING) AS s_i
      |  FROM grid
      |),
      |agg AS (
      |  SELECT source, lang,
      |    CAST(MAX(n) AS BIGINT) AS n_docs,
      |    CAST(SUM(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_sensitive,
      |    CASE WHEN MAX(v) <= 1 THEN CAST(0 AS BIGINT)
      |      ELSE CAST(SUM(ABS(s_i)) * 1000000
      |        // ((MAX(v) - 1) * MAX(n) * MAX(nn)) AS BIGINT)
      |    END AS emd_ppm
      |  FROM cum GROUP BY 1, 2
      |)
      |SELECT source, lang, n_docs, n_sensitive, emd_ppm,
      |  CAST(CASE WHEN emd_ppm <= 300000 THEN 1 ELSE 0 END AS BIGINT)
      |    AS t_close
      |FROM agg ORDER BY source, lang""".stripMargin

  // ---------------------------------------------------------------- q218
  /** LLOYD-vs-MEDOID PQ codebook A/B ([[graft.ops.Similarity
    * .pqLloydRecall]] at rounds ∈ {0, 1, 2}): q214 measured that the
    * seeded-medoid codebook gives residual coding no edge and noted
    * the literature's result assumes k-means-fit codebooks — this
    * query runs that experiment. Same init (rounds = 0 IS the medoid
    * book, spec-pinned to `pqAdcRecall`), bounded integer Lloyd
    * rounds per subspace (the q148 arithmetic: DECIMAL floor-means,
    * lowest-code ties, empty-code carry), recall@{1,5,10} per round
    * count in one frame. The oracle replays every round as generated
    * CTE blocks — assignment, per-(subspace, code, dim) floor-mean
    * update, carry — then the encode/LUT/rank tail per variant. */
  private def q218(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Seq(0, 1, 2).map { r =>
      Similarity.pqLloydRecall(emb, queryId = 0L, ks = Seq(1, 5, 10),
          m = 8, nCodes = 16, rounds = r)
        .withColumn("lloyd_rounds", lit(r.toLong))
    }.reduce(_ unionAll _)
      .select("lloyd_rounds", "k", "n_overlap", "recall_ppm")
      .orderBy("lloyd_rounds", "k")
  }

  /** One Lloyd round over every subspace jointly, as oracle CTEs:
    * assignment under `$prev`, HUGEINT floor-mean update, empty-code
    * carry → `${p}b$i`. Reads the sliced rows from a CTE named `sub`
    * (vec_id, s, sv) — the caller supplies it, which is what lets
    * q220 replay the SAME round program over RESIDUAL slices. */
  private[queries] def lloydRoundCtes(p: String, i: Int,
      prev: String): String =
    s"""${p}a$i AS (
       |  SELECT vec_id, s, code, sv FROM (
       |    SELECT sub.vec_id, sub.s, b.code, sub.sv,
       |      ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.s
       |        ORDER BY ${Round16.d2Sql("sub.sv", "b.cv")}, b.code) AS rk
       |    FROM sub JOIN $prev b ON b.s = sub.s) WHERE rk = 1
       |),
       |${p}u$i AS (
       |  SELECT s, code, list(m ORDER BY pos) AS cv FROM (
       |    SELECT s, code, pos,
       |      CAST((t - ((t % n) + n) % n) // n AS BIGINT) AS m
       |    FROM (
       |      SELECT a.s, a.code, r.pos AS pos,
       |        CAST(SUM(a.sv[r.pos]) AS HUGEINT) AS t,
       |        CAST(COUNT(*) AS HUGEINT) AS n
       |      FROM ${p}a$i a,
       |        LATERAL (SELECT unnest(range(1, len(a.sv) + 1)) AS pos) r
       |      GROUP BY a.s, a.code, r.pos))
       |  GROUP BY s, code
       |),
       |${p}b$i AS MATERIALIZED (
       |  SELECT p0.s, p0.code, COALESCE(u.cv, p0.cv) AS cv
       |  FROM $prev p0 LEFT JOIN ${p}u$i u
       |    ON u.s = p0.s AND u.code = p0.code
       |)""".stripMargin

  /** Encode + LUT + ADC + ranking under the final book `$bk`. */
  private def lloydTailCtes(p: String, bk: String): String =
    s"""${p}enc AS (
       |  SELECT vec_id, s, code FROM (
       |    SELECT sub.vec_id, sub.s, b.code,
       |      ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.s
       |        ORDER BY ${Round16.d2Sql("sub.sv", "b.cv")}, b.code) AS rk
       |    FROM sub JOIN $bk b ON b.s = sub.s) WHERE rk = 1
       |),
       |${p}lut AS (
       |  SELECT b.s AS s, b.code,
       |    ${Round16.d2Sql("pq.pqv[CAST(b.s * 8 + 1 AS INT):CAST(b.s * 8 + 8 AS INT)]", "b.cv")} AS qd2
       |  FROM $bk b, pq
       |),
       |${p}adc AS (
       |  SELECT a.vec_id, CAST(SUM(l.qd2) AS BIGINT) AS adc_d2
       |  FROM ${p}enc a JOIN ${p}lut l ON l.s = a.s AND l.code = a.code
       |  GROUP BY a.vec_id
       |),
       |${p}x AS (
       |  SELECT vec_id,
       |    CAST(ROW_NUMBER() OVER (ORDER BY adc_d2, vec_id) AS BIGINT) AS ar
       |  FROM ${p}adc
       |)""".stripMargin

  private def lloydRecallSelect(p: String, r: Int): String =
    s"""SELECT CAST($r AS BIGINT) AS lloyd_rounds, k.k AS k,
       |  CAST(COALESCE(h.c, 0) AS BIGINT) AS n_overlap,
       |  CAST(COALESCE(h.c, 0) * 1000000 // k.k AS BIGINT) AS recall_ppm
       |FROM ks k LEFT JOIN (
       |  SELECT k2.k, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM exr e JOIN ${p}x x USING (vec_id) CROSS JOIN ks k2
       |  WHERE e.er <= k2.k AND x.ar <= k2.k GROUP BY k2.k) h
       |  ON h.k = k.k""".stripMargin

  private val q218Sql =
    s"""WITH q AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)) AS qv
       |  FROM embeddings
       |),
       |ss AS (SELECT CAST(u.s AS BIGINT) AS s FROM UNNEST(range(0, 8)) AS u(s)),
       |sub AS (SELECT a.vec_id, ss.s, ${slice8("a.qv")} AS sv FROM q a, ss),
       |med AS (
       |  SELECT qv, ROW_NUMBER() OVER (ORDER BY
       |      ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id)
       |    AS code
       |  FROM q
       |  ORDER BY ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id
       |  LIMIT 16
       |),
       |b0 AS (
       |  SELECT ss.s, m.code, ${slice8("m.qv")} AS cv FROM med m, ss),
       |pq AS (SELECT qv AS pqv FROM q WHERE vec_id = 0),
       |exr AS (
       |  SELECT a.vec_id,
       |    CAST(ROW_NUMBER() OVER (
       |      ORDER BY ${Round16.d2Sql("a.qv", "pq.pqv")}, a.vec_id) AS BIGINT)
       |      AS er
       |  FROM q a, pq
       |),
       |ks AS (SELECT CAST(u.k AS BIGINT) AS k FROM UNNEST([1, 5, 10]) AS u(k)),
       |${lloydTailCtes("r0", "b0")},
       |${lloydRoundCtes("r1", 1, "b0")},
       |${lloydTailCtes("r1", "r1b1")},
       |${lloydRoundCtes("r2", 1, "b0")},
       |${lloydRoundCtes("r2", 2, "r2b1")},
       |${lloydTailCtes("r2", "r2b2")}
       |SELECT lloyd_rounds, k, n_overlap, recall_ppm FROM (
       |${lloydRecallSelect("r0", 0)}
       |UNION ALL
       |${lloydRecallSelect("r1", 1)}
       |UNION ALL
       |${lloydRecallSelect("r2", 2)})
       |ORDER BY lloyd_rounds, k""".stripMargin

  // ---------------------------------------------------------------- q219
  /** PQ COMPRESSION → recall frontier ([[graft.ops.Similarity
    * .pqAdcRecall]] swept over m ∈ {2, 4, 8, 16} at nCodes = 16):
    * each subspace stores one 4-bit code, so m IS the bytes-per-vector
    * dial (1/2/4/8 B against the raw 256 B float vector — 256× down
    * to 32× compression), and this is the sizing curve beside q213's
    * nProbe dial: how much recall each stored byte buys. One shared
    * exact ranking; per-m codebook/assignment/LUT blocks generated so
    * the oracle's m list can never drift from the query's. */
  private def q219(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Seq(2, 4, 8, 16).map { mm =>
      Similarity.pqAdcRecall(emb, queryId = 0L, ks = Seq(1, 5, 10),
          m = mm, nCodes = 16)
        .withColumn("m", lit(mm.toLong))
    }.reduce(_ unionAll _)
      .select("m", "k", "n_overlap", "recall_ppm")
      .orderBy("m", "k")
  }

  /** One PQ geometry's codebook → assignment → LUT → ADC ranking,
    * name-prefixed per m (subLen = 64/m on the 64-dim corpus). */
  private def pqGeomCtes(m: Int): String = {
    val w = 64 / m
    val p = s"m$m"
    val sl = (v: String) =>
      s"$v[CAST(ss$p.s * $w + 1 AS INT):CAST(ss$p.s * $w + $w AS INT)]"
    s"""ss$p AS (SELECT CAST(u.s AS BIGINT) AS s
       |         FROM UNNEST(range(0, $m)) AS u(s)),
       |books$p AS (
       |  SELECT ss$p.s, m.code, ${sl("m.qv")} AS cv FROM med m, ss$p),
       |sub$p AS (
       |  SELECT a.vec_id, ss$p.s, ${sl("a.qv")} AS sv FROM q a, ss$p),
       |asgn$p AS (
       |  SELECT vec_id, s, code FROM (
       |    SELECT sub$p.vec_id, sub$p.s, b.code,
       |      ROW_NUMBER() OVER (PARTITION BY sub$p.vec_id, sub$p.s
       |        ORDER BY ${Round16.d2Sql(s"sub$p.sv", "b.cv")}, b.code) AS rk
       |    FROM sub$p JOIN books$p b ON b.s = sub$p.s) WHERE rk = 1
       |),
       |qsub$p AS (SELECT ss$p.s, ${sl("pq.pqv")} AS qsv FROM pq, ss$p),
       |lut$p AS (
       |  SELECT b.s, b.code, ${Round16.d2Sql("qs.qsv", "b.cv")} AS qd2
       |  FROM books$p b JOIN qsub$p qs ON qs.s = b.s),
       |adc$p AS (
       |  SELECT a.vec_id, CAST(SUM(l.qd2) AS BIGINT) AS adc_d2
       |  FROM asgn$p a JOIN lut$p l ON l.s = a.s AND l.code = a.code
       |  GROUP BY a.vec_id),
       |x$p AS (
       |  SELECT vec_id,
       |    CAST(ROW_NUMBER() OVER (ORDER BY adc_d2, vec_id) AS BIGINT) AS ar
       |  FROM adc$p
       |)""".stripMargin
  }

  private def pqGeomSelect(m: Int): String =
    s"""SELECT CAST($m AS BIGINT) AS m, k.k AS k,
       |  CAST(COALESCE(h.c, 0) AS BIGINT) AS n_overlap,
       |  CAST(COALESCE(h.c, 0) * 1000000 // k.k AS BIGINT) AS recall_ppm
       |FROM ks k LEFT JOIN (
       |  SELECT k2.k, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM exr e JOIN xm$m x USING (vec_id) CROSS JOIN ks k2
       |  WHERE e.er <= k2.k AND x.ar <= k2.k GROUP BY k2.k) h
       |  ON h.k = k.k""".stripMargin

  private val q219Sql =
    s"""WITH q AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)) AS qv
       |  FROM embeddings
       |),
       |med AS (
       |  SELECT qv, ROW_NUMBER() OVER (ORDER BY
       |      ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id)
       |    AS code
       |  FROM q
       |  ORDER BY ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id
       |  LIMIT 16
       |),
       |pq AS (SELECT qv AS pqv FROM q WHERE vec_id = 0),
       |exr AS (
       |  SELECT a.vec_id,
       |    CAST(ROW_NUMBER() OVER (
       |      ORDER BY ${Round16.d2Sql("a.qv", "pq.pqv")}, a.vec_id) AS BIGINT)
       |      AS er
       |  FROM q a, pq
       |),
       |ks AS (SELECT CAST(u.k AS BIGINT) AS k FROM UNNEST([1, 5, 10]) AS u(k)),
       |${Seq(2, 4, 8, 16).map(pqGeomCtes).mkString(",\n")}
       |SELECT m, k, n_overlap, recall_ppm FROM (
       |${Seq(2, 4, 8, 16).map(pqGeomSelect).mkString("\nUNION ALL\n")})
       |ORDER BY m, k""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q209_ivfadc_recall", q209, Some(q209Sql)),
    QueryDef("q210_unigram_em", q210, Some(q210Sql)),
    QueryDef("q211_t_closeness", q211, Some(q211Sql)),
    QueryDef("q212_adc_batch_knn", q212, Some(q212Sql)),
    QueryDef("q213_nprobe_frontier", q213, Some(q213Sql)),
    QueryDef("q214_residual_ivfadc", q214, Some(q214Sql)),
    QueryDef("q215_ivf_adc_batch", q215, Some(q215Sql)),
    QueryDef("q216_t_closeness_ordered", q216, Some(q216Sql)),
    QueryDef("q217_unigram_em2", q217, Some(q217Sql)),
    QueryDef("q218_pq_lloyd_recall", q218, Some(q218Sql)),
    QueryDef("q219_pq_compression_frontier", q219, Some(q219Sql)))
}
