package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.ops.{Chunking, Similarity}

/** Round-16 battery additions (q182–q184): the approximate
  * hard-negative path with its recall@k audit (the operator the q167
  * scaladoc promised for 100 TB), chunk-level dedup over the
  * content-defined chunk fingerprints (the LBFS re-crawl use case
  * q181's keys exist for), and clamped FastCDC-style chunking with
  * min/max length bounds replayed through a DuckDB struct-accumulator
  * fold. All reference-scope-none LLM-pipeline extensions (SURVEY §8).
  */
object Round16 {

  /** DuckDB twin of [[graft.ops.Similarity.QuantSqDistExpr]] at
    * scale 1e4 over two quantized BIGINT[] identifiers in scope —
    * the q167 oracle's distance spelling, shared by every stage of
    * the q182 replay. */
  private def d2Sql(a: String, b: String): String =
    s"""CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(len($a)), i ->
       |        ($a[CAST(i + 1 AS INT)] - $b[CAST(i + 1 AS INT)])
       |        * ($a[CAST(i + 1 AS INT)] - $b[CAST(i + 1 AS INT)]))),
       |      (acc, x) -> acc + x) AS BIGINT)""".stripMargin

  // ---------------------------------------------------------------- q182
  /** APPROXIMATE hard-negative RECALL audit
    * ([[graft.ops.Similarity.ivfHardNegatives]] vs the exact
    * [[graft.ops.Similarity.hardNegatives]]): recall@k for
    * k ∈ {1, 5} of the IVF-probed, exactly-re-ranked cross-label kNN
    * against the exact quadratic ground truth — the production gate
    * run before swapping the n² miner for the nProbe/nCents scan
    * fraction at scale (the q135 int8-vs-exact pattern). Every stage
    * of BOTH rankings — seeded-medoid centroid pick, integer
    * assignment, probe set, re-rank — is replayed by the oracle, so
    * the overlap counts are a full hash oracle, and recall is exact
    * ppm integer division. */
  private def q182(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val ex = Similarity.hardNegatives(emb, k = 5)
    val ap = Similarity.ivfHardNegatives(emb, k = 5, nCents = 16, nProbe = 4)
    val j = ex.select(col("vec_id"), col("neg_id"), col("rank").as("__exr"))
      .join(ap.select(col("vec_id"), col("neg_id"), col("rank").as("__apr")),
        Seq("vec_id", "neg_id"), "full_outer")
    val ks = s.range(0, 2).select(
      element_at(typedLit(Seq(1L, 5L)), col("id").cast("int") + 1).as("k"))
    j.crossJoin(broadcast(ks))
      .groupBy("k")
      .agg(
        sum(when(col("__exr") <= col("k"), 1L).otherwise(0L)).as("n_exact"),
        sum(when(col("__apr") <= col("k"), 1L).otherwise(0L)).as("n_approx"),
        sum(when(col("__exr") <= col("k") && col("__apr") <= col("k"), 1L)
          .otherwise(0L)).as("n_overlap"))
      .withColumn("recall_ppm", expr("(n_overlap * 1000000) div n_exact"))
      .orderBy("k")
  }

  private val q182Sql =
    s"""WITH q AS (
       |  SELECT vec_id, label, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)) AS qv
       |  FROM embeddings
       |),
       |exp_ AS (
       |  SELECT a.vec_id AS qid, b.vec_id AS cand,
       |    ${d2Sql("a.qv", "b.qv")} AS d2
       |  FROM q a JOIN q b ON a.label <> b.label
       |),
       |ex AS (
       |  SELECT qid, cand, rk FROM (
       |    SELECT qid, cand,
       |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, cand) AS rk
       |    FROM exp_) WHERE rk <= 5
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
       |ad AS (
       |  SELECT a.vec_id AS vid, a.label, a.qv, c.cent_id,
       |    ${d2Sql("a.qv", "c.cqv")} AS d2c
       |  FROM q a CROSS JOIN cent c
       |),
       |rk_ad AS (
       |  SELECT vid, label, qv, cent_id,
       |    ROW_NUMBER() OVER (PARTITION BY vid ORDER BY d2c, cent_id) AS rk
       |  FROM ad
       |),
       |asg AS (SELECT vid, label, qv, cent_id FROM rk_ad WHERE rk = 1),
       |pr  AS (SELECT vid, label, qv, cent_id FROM rk_ad WHERE rk <= 4),
       |cp AS (
       |  SELECT p.vid AS qid, a.vid AS cand,
       |    ${d2Sql("p.qv", "a.qv")} AS d2
       |  FROM pr p JOIN asg a
       |    ON p.cent_id = a.cent_id AND p.label <> a.label
       |),
       |ap AS (
       |  SELECT qid, cand, rk FROM (
       |    SELECT qid, cand,
       |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, cand) AS rk
       |    FROM cp) WHERE rk <= 5
       |),
       |j AS (
       |  SELECT ex.rk AS exr, ap.rk AS apr
       |  FROM ex FULL OUTER JOIN ap
       |    ON ex.qid = ap.qid AND ex.cand = ap.cand
       |),
       |ks AS (SELECT unnest([1, 5]) AS k)
       |SELECT CAST(k AS BIGINT) AS k,
       |  CAST(SUM(CASE WHEN exr <= k THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
       |  CAST(SUM(CASE WHEN apr <= k THEN 1 ELSE 0 END) AS BIGINT) AS n_approx,
       |  CAST(SUM(CASE WHEN exr <= k AND apr <= k THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_overlap,
       |  CAST(CAST(SUM(CASE WHEN exr <= k AND apr <= k THEN 1 ELSE 0 END)
       |      AS HUGEINT) * 1000000
       |    // CAST(SUM(CASE WHEN exr <= k THEN 1 ELSE 0 END) AS HUGEINT)
       |    AS BIGINT) AS recall_ppm
       |FROM ks, j
       |GROUP BY k
       |ORDER BY k""".stripMargin

  // ---------------------------------------------------------------- q183
  /** CDC CHUNK-LEVEL DEDUP ([[graft.ops.Chunking.chunkDedupPairs]]):
    * pairs of documents sharing ≥ 2 identical content-defined chunks
    * by (hash_sum, n_tokens) fingerprint, df-capped at 64 docs per
    * key (the winnowing boilerplate guard), with containment ppm vs
    * the smaller chunk-key set — the LBFS/re-crawl join the q181
    * fingerprints exist for. Oracle replays the full q181 chunking
    * then the distinct/cap/pair algebra. */
  private def q183(s: SparkSession, dir: String): DataFrame =
    Chunking.chunkDedupPairs(Tables.documents(s, dir),
      maskBits = 5, maxDf = 64L, minShared = 2L)

  private val q183Sql =
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'),
       |    x -> length(x) > 0) AS tk
       |  FROM documents
       |),
       |p AS (
       |  SELECT doc_id, CAST(i AS BIGINT) AS pos, tk[CAST(i + 1 AS INT)] AS tok
       |  FROM t, UNNEST(range(0, len(tk))) AS u(i)
       |  WHERE len(tk) >= 1),
       |h AS (
       |  SELECT doc_id, pos,
       |    ${Round15.tokHashSql("tok")} AS hv
       |  FROM p),
       |c AS (
       |  SELECT doc_id, pos, hv,
       |    COALESCE(SUM(CASE WHEN hv % 32 = 0 THEN 1 ELSE 0 END) OVER (
       |      PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_idx
       |  FROM h),
       |ch AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |    CAST(SUM(hv) AS BIGINT) AS hash_sum
       |  FROM c GROUP BY doc_id, chunk_idx),
       |f AS (SELECT DISTINCT doc_id, n_tokens, hash_sum FROM ch),
       |cn AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_keys
       |       FROM f GROUP BY doc_id),
       |rare AS (SELECT n_tokens, hash_sum FROM f
       |         GROUP BY n_tokens, hash_sum HAVING COUNT(*) <= 64),
       |jf AS (SELECT f.doc_id, f.n_tokens, f.hash_sum
       |       FROM f JOIN rare USING (n_tokens, hash_sum)),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(COUNT(*) AS BIGINT) AS n_shared
       |  FROM jf a JOIN jf b
       |    ON a.n_tokens = b.n_tokens AND a.hash_sum = b.hash_sum
       |   AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
       |SELECT p.doc_a, p.doc_b, p.n_shared,
       |  ca.n_keys AS n_a, cb.n_keys AS n_b,
       |  CAST((p.n_shared * 1000000) // least(ca.n_keys, cb.n_keys) AS BIGINT)
       |    AS containment_ppm
       |FROM pairs p JOIN cn ca ON ca.doc_id = p.doc_a
       |             JOIN cn cb ON cb.doc_id = p.doc_b
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------- q184
  /** CLAMPED CDC ([[graft.ops.Chunking.contentDefinedChunksClamped]]):
    * FastCDC-style min/max chunk-length bounds (8/64 tokens, mask
    * 2⁵) over the replayable token-hash stream. The oracle replays
    * the sequential cut scan as a RECURSIVE CTE stepping cut-to-cut:
    * from the previous cut `last`, the next cut is
    * `least(min boundary ≥ last+minLen, last+maxLen if a token
    * exists there)` — exactly the first position the per-token scan
    * would cut at (an honored boundary farther than last+maxLen is
    * preempted by the forced cut, which `least` encodes; DuckDB's
    * least ignores the NULL side). A struct-accumulator
    * `list_reduce` spelling was rejected: DuckDB 1.0 mis-threads the
    * accumulator on grouped multi-row input (verified against a
    * per-token reference simulation — 1 of 500 docs came back with
    * non-boundary cuts), while this CTE matches the simulation on
    * all 500. */
  private def q184(s: SparkSession, dir: String): DataFrame =
    Chunking.contentDefinedChunksClamped(Tables.documents(s, dir),
      maskBits = 5, minLen = 8, maxLen = 64)
      .orderBy("doc_id", "chunk_idx")

  private val q184Sql =
    s"""WITH RECURSIVE t AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'),
       |    x -> length(x) > 0) AS tk
       |  FROM documents
       |),
       |p AS (
       |  SELECT doc_id, CAST(i AS BIGINT) AS pos, tk[CAST(i + 1 AS INT)] AS tok
       |  FROM t, UNNEST(range(0, len(tk))) AS u(i)
       |  WHERE len(tk) >= 1),
       |h AS (
       |  SELECT doc_id, pos,
       |    ${Round15.tokHashSql("tok")} AS hv
       |  FROM p),
       |bd AS (SELECT doc_id, pos FROM h WHERE hv % 32 = 0),
       |nn AS (SELECT doc_id, MAX(pos) AS maxp FROM h GROUP BY doc_id),
       |cuts AS (
       |  SELECT doc_id, CAST(-1 AS BIGINT) AS cut FROM nn
       |  UNION ALL
       |  SELECT doc_id, next FROM (
       |    SELECT c.doc_id, least(
       |      (SELECT MIN(b.pos) FROM bd b
       |       WHERE b.doc_id = c.doc_id AND b.pos - c.cut >= 8),
       |      CASE WHEN c.cut + 64 <= n2.maxp THEN c.cut + 64 END) AS next
       |    FROM cuts c JOIN nn n2 ON n2.doc_id = c.doc_id
       |  ) WHERE next IS NOT NULL
       |),
       |cl AS (
       |  SELECT doc_id, list(cut ORDER BY cut) AS cutl
       |  FROM cuts WHERE cut >= 0 GROUP BY doc_id),
       |c AS (
       |  SELECT h.doc_id, h.pos, h.hv,
       |    CAST(len(list_filter(COALESCE(cl.cutl, CAST([] AS BIGINT[])),
       |      cc -> cc < h.pos)) AS BIGINT) AS chunk_idx
       |  FROM h LEFT JOIN cl USING (doc_id)
       |)
       |SELECT doc_id, chunk_idx,
       |  CAST(MIN(pos) AS BIGINT) AS start_pos,
       |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  CAST(SUM(hv) AS BIGINT) AS hash_sum
       |FROM c GROUP BY doc_id, chunk_idx
       |ORDER BY doc_id, chunk_idx""".stripMargin

  // ---------------------------------------------------------------- q185
  /** PRODUCT-QUANTIZATION ADC recall audit
    * ([[graft.ops.Similarity.pqAdcRecall]] over
    * [[graft.ops.Similarity.pqCodes]]): 64-dim vectors → 8 one-byte
    * codes (seeded-medoid codebooks per subspace, exact integer
    * assignment), then recall@{1,5,10} of the asymmetric-distance
    * ranking (m LUT lookups per candidate) against the exact integer
    * quantized distance for probe query 0 — the 32×-compression
    * retrieval cost, q135's audit pattern one compression rung
    * further. Codebooks, assignment, LUT sums, and both rankings all
    * replay in SQL. */
  private def q185(s: SparkSession, dir: String): DataFrame =
    Similarity.pqAdcRecall(Tables.embeddings(s, dir), queryId = 0L,
      ks = Seq(1, 5, 10), m = 8, nCodes = 16)

  private val q185Sql = {
    val slice8 = (v: String) =>
      s"$v[CAST(ss.s * 8 + 1 AS INT):CAST(ss.s * 8 + 8 AS INT)]"
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
       |        ORDER BY ${d2Sql("sub.sv", "b.cv")}, b.code) AS rk
       |    FROM sub JOIN books b ON b.s = sub.s) WHERE rk = 1
       |),
       |qq AS (SELECT qv AS qv0 FROM q WHERE vec_id = 0),
       |qsub AS (SELECT ss.s, ${slice8("qq.qv0")} AS qsv FROM qq, ss),
       |lut AS (
       |  SELECT b.s, b.code, ${d2Sql("qs.qsv", "b.cv")} AS qd2
       |  FROM books b JOIN qsub qs ON qs.s = b.s),
       |adc AS (
       |  SELECT a.vec_id, CAST(SUM(l.qd2) AS BIGINT) AS adcd
       |  FROM asgn a JOIN lut l ON l.s = a.s AND l.code = a.code
       |  GROUP BY a.vec_id),
       |ar AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY adcd, vec_id) AS ark
       |       FROM adc),
       |er AS (SELECT a.vec_id,
       |         ROW_NUMBER() OVER (ORDER BY ${d2Sql("a.qv", "qq.qv0")}, a.vec_id)
       |           AS erk
       |       FROM q a, qq),
       |j AS (SELECT er.erk, ar.ark FROM er JOIN ar USING (vec_id)
       |      WHERE er.erk <= 10 AND ar.ark <= 10),
       |ks AS (SELECT unnest([1, 5, 10]) AS k)
       |SELECT CAST(k AS BIGINT) AS k,
       |  CAST(SUM(CASE WHEN erk <= k AND ark <= k THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_overlap,
       |  CAST(CAST(SUM(CASE WHEN erk <= k AND ark <= k THEN 1 ELSE 0 END)
       |      AS HUGEINT) * 1000000 // k AS BIGINT) AS recall_ppm
       |FROM ks, j
       |GROUP BY k
       |ORDER BY k""".stripMargin
  }

  // ---------------------------------------------------------------- q186
  /** TRAINING-ORDER MIXING audit
    * ([[graft.ops.Splits.orderMixingAudit]]): per source, the
    * same-source adjacency rate of the engine's standing
    * pseudo-shuffle order (the permutation q114's packing consumes)
    * vs the independence expectation, both in exact ppm — the
    * shuffle-quality health check before packed batches are trusted
    * as iid. */
  private def q186(s: SparkSession, dir: String): DataFrame =
    graft.ops.Splits.orderMixingAudit(Tables.documents(s, dir))

  private val q186Sql =
    """WITH h AS (
      |  SELECT source, doc_id,
      |    CAST((CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
      |         % 4294967296 AS BIGINT) AS hv
      |  FROM documents),
      |r AS (SELECT source, ROW_NUMBER() OVER (ORDER BY hv, doc_id) AS r
      |      FROM h),
      |adj AS (SELECT a.source AS ga, b.source AS gb
      |        FROM r a JOIN r b ON b.r = a.r - 1),
      |ps AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      |       FROM h GROUP BY source),
      |sa AS (SELECT ga AS source, CAST(COUNT(*) AS BIGINT) AS adj_same
      |       FROM adj WHERE ga = gb GROUP BY ga),
      |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM h)
      |SELECT ps.source, ps.n_docs,
      |  COALESCE(sa.adj_same, 0) AS adj_same,
      |  CAST((COALESCE(sa.adj_same, 0) * 1000000) // (nt.n - 1) AS BIGINT)
      |    AS adj_same_ppm,
      |  CAST((CAST(ps.n_docs AS HUGEINT) * (ps.n_docs - 1) * 1000000)
      |       // (CAST(nt.n AS HUGEINT) * (nt.n - 1)) AS BIGINT)
      |    AS expected_ppm
      |FROM ps LEFT JOIN sa USING (source), nt
      |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q187
  /** K-ANONYMITY generalization audit
    * ([[graft.ops.Privacy.kAnonymityLevels]]): per document, the
    * first level of the (lang, source, length-bucket) → (lang,
    * source) → (lang) → corpus generalization ladder whose cohort
    * reaches k=3, with that cohort's exact size — the metadata
    * re-identification gate run before a corpus release. */
  private def q187(s: SparkSession, dir: String): DataFrame =
    graft.ops.Privacy.kAnonymityLevels(Tables.documents(s, dir), k = 3L)

  private val q187Sql =
    """WITH b AS (
      |  SELECT doc_id, lang, source, n_chars // 100 AS lb FROM documents),
      |c0 AS (SELECT lang, source, lb, CAST(COUNT(*) AS BIGINT) AS n0
      |       FROM b GROUP BY 1, 2, 3),
      |c1 AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n1
      |       FROM b GROUP BY 1, 2),
      |c2 AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n2 FROM b GROUP BY 1),
      |c3 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n3 FROM b)
      |SELECT b.doc_id,
      |  CAST(CASE WHEN n0 >= 3 THEN 0 WHEN n1 >= 3 THEN 1
      |            WHEN n2 >= 3 THEN 2 ELSE 3 END AS BIGINT) AS anon_level,
      |  CASE WHEN n0 >= 3 THEN n0 WHEN n1 >= 3 THEN n1
      |       WHEN n2 >= 3 THEN n2 ELSE n3 END AS cohort_size
      |FROM b JOIN c0 USING (lang, source, lb)
      |       JOIN c1 USING (lang, source)
      |       JOIN c2 USING (lang), c3
      |ORDER BY doc_id""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q182_approx_negatives_recall", q182, Some(q182Sql)),
    QueryDef("q183_chunk_dedup", q183, Some(q183Sql)),
    QueryDef("q184_clamped_cdc", q184, Some(q184Sql)),
    QueryDef("q185_pq_adc_recall", q185, Some(q185Sql)),
    QueryDef("q186_shuffle_mixing", q186, Some(q186Sql)),
    QueryDef("q187_k_anonymity", q187, Some(q187Sql)))
}
