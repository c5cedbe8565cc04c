package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.ops.{Chunking, Similarity}

/** Round-16 battery additions (q182–q197): the approximate
  * hard-negative path with its recall@k audit, CDC chunk-level dedup
  * and clamped FastCDC, PQ/ADC recall, shuffle-mixing and
  * k-anonymity audits (q182–q187, wave 1); then the MEASUREMENT
  * ARC — LSH parameter audit, bloom FPR audit, code-switch profile,
  * batch padding waste, calibration, Heaps vocabulary growth,
  * stored-IVF append, detector agreement (κ), self-retrieval MRR,
  * and the dataset card (q188–q197, waves 2–5): the instruments a
  * 100 TB pipeline runs to grade its OWN operators before trusting
  * them. All reference-scope-none LLM-pipeline extensions
  * (SURVEY §8).
  */
object Round16 {

  /** DuckDB twin of [[graft.ops.Similarity.QuantSqDistExpr]] at
    * scale 1e4 over two quantized BIGINT[] identifiers in scope —
    * the q167 oracle's distance spelling, shared by every stage of
    * the q182 replay. */
  private[queries] def d2Sql(a: String, b: String): String =
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

  /** The IVF hard-negative miner's replay — quantized labeled corpus,
    * seeded centroids, assignment, probes, cross-label candidate
    * distances `cp(qid, cand, d2)` — shared by the q182 recall audit
    * and the q223 SALTED miner (the salted plan changes packing, not
    * answers, so it answers to the SAME replay; a copy here is the
    * drift mode the seededRank refactor exists to prevent). */
  private[queries] val ivfMinerCtes: String =
    s"""q AS (
       |  SELECT vec_id, label, list_transform(embedding,
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
       |)""".stripMargin

  private val q182Sql =
    s"""WITH
       |$ivfMinerCtes,
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
       |ks AS (SELECT CAST(unnest([1, 5, 10]) AS BIGINT) AS k),
       |hit AS (
       |  SELECT ks.k, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM ks, j WHERE j.erk <= ks.k AND j.ark <= ks.k
       |  GROUP BY ks.k)
       |SELECT ks.k AS k,
       |  CAST(COALESCE(h.c, 0) AS BIGINT) AS n_overlap,
       |  CAST(CAST(COALESCE(h.c, 0) AS HUGEINT) * 1000000 // ks.k
       |    AS BIGINT) AS recall_ppm
       |FROM ks LEFT JOIN hit h ON h.k = ks.k
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

  /** Shared oracle fragment: the [[graft.ops.Splits.hashBucketN]]
    * Knuth hash of doc_id at full 2³² range, in HUGEINT (BIGINT would
    * overflow at 2³²·2654435761). */
  private def knuthSql(id: String): String =
    s"CAST((CAST($id % 4294967296 AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT)"

  /** Shared oracle fragment: filtered token array. */
  private val toksSql =
    """list_filter(regexp_split_to_array(text, '\s+'), x -> length(x) > 0)"""

  /** Shared oracle fragment: the 3-gram polynomial hash over
    * [[Round15.tokHashSql]] token hashes — the Winnowing/LshAudit
    * gram spelling. `tk` is the token array, `i` the 0-based gram
    * start. */
  private def gramHashSql(tk: String, i: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |        list_transform(range(3), j ->
       |          ${Round15.tokHashSql(s"$tk[CAST($i + j + 1 AS INT)]")})),
       |        (acc, h) -> (acc * 10007 + h) % 1000000007)""".stripMargin

  // ---------------------------------------------------------------- q188
  /** MinHash-LSH PARAMETER audit
    * ([[graft.ops.LshAudit.minhashParamAudit]]): measured recall and
    * precision of banded-MinHash candidate generation vs exact n-gram
    * Jaccard ground truth at τ = 0.5, for the (bands, rows) grid
    * {(12,2), (8,3), (4,6)} over one shared 24-minimum signature —
    * the S-curve measured on the corpus's own similarity distribution
    * before a band layout is committed to a 100 TB dedup pass
    * (q135/q182/q185's audit pattern, applied to the near-dup rung).
    * Closed-form coefficients and replayable gram hashes mean the
    * oracle re-derives signatures, band keys, candidates, AND the
    * exact side bit-for-bit. Ground truth is (deterministic 1/8 query
    * sample) × full corpus — exact-side cost linear in the corpus,
    * and the truth set keeps pairs with ONE sampled endpoint (an
    * in-sample-pairs design was measured degenerate: 0 of the 25
    * planted near-dup pairs survive p² endpoint sampling). */
  private def q188(s: SparkSession, dir: String): DataFrame =
    graft.ops.LshAudit.minhashParamAudit(Tables.documents(s, dir))

  private val q188Sql = {
    // per-config band-key CTE arms: key = Σ sig·10007^(r−1−(ci mod r))
    // mod p — the same value as the engine's per-step-mod fold
    val configs = Seq((0, 12, 2), (1, 8, 3), (2, 4, 6))
    val pows = Array.iterate(1L, 6)(p => p * 10007L % 1000000007L)
    val arms = configs.map { case (cfg, _, r) =>
      val caseArm = (0 until r).map(t =>
        s"WHEN ${t} THEN ${pows(r - 1 - t)}").mkString(" ")
      s"""  SELECT doc_id, $cfg AS cfg, ci // $r AS band,
         |    SUM(sg.s * CASE ci % $r $caseArm END) % 1000000007 AS key
         |  FROM sg GROUP BY doc_id, band""".stripMargin
    }.mkString("\n  UNION ALL\n")
    val vals = configs.map { case (c, b, r) => s"($c, $b, $r)" }.mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, $toksSql AS tk FROM documents
       |),
       |g AS (
       |  SELECT doc_id, ${knuthSql("doc_id")} % 8 = 0 AS q,
       |    list_distinct(list_transform(range(len(tk) - 2),
       |      i -> ${gramHashSql("tk", "i")})) AS gh
       |  FROM t WHERE len(tk) >= 3
       |),
       |exj AS (
       |  SELECT a.doc_id AS ida, b.doc_id AS idb,
       |    (CAST(len(list_intersect(a.gh, b.gh)) AS BIGINT) * 1000000)
       |      // (CAST(len(a.gh) + len(b.gh) AS BIGINT)
       |         - CAST(len(list_intersect(a.gh, b.gh)) AS BIGINT)) AS jppm
       |  FROM g a JOIN g b ON a.q AND a.doc_id <> b.doc_id
       |),
       |cf AS (
       |  SELECT CAST(i AS BIGINT) AS ci,
       |    (1 + (i + 1) * 2654435761) % 1000000007 AS a,
       |    ((i + 1) * 40503) % 1000000007 AS b
       |  FROM range(24) r(i)
       |),
       |gu AS (SELECT doc_id, unnest(gh) AS h FROM g),
       |sg AS (
       |  SELECT doc_id, ci, MIN((cf.a * gu.h + cf.b) % 1000000007) AS s
       |  FROM gu CROSS JOIN cf GROUP BY doc_id, ci
       |),
       |bk AS (
       |$arms
       |),
       |cand AS (
       |  SELECT DISTINCT x.cfg, x.doc_id AS ida, y.doc_id AS idb
       |  FROM bk x JOIN bk y ON x.cfg = y.cfg AND x.band = y.band
       |    AND x.key = y.key AND x.doc_id <> y.doc_id
       |  WHERE ${knuthSql("x.doc_id")} % 8 = 0
       |),
       |cfgs AS (SELECT * FROM (VALUES $vals) c(cfg, bands, rows_per_band)),
       |ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sample FROM g WHERE q),
       |tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_true FROM exj
       |       WHERE jppm >= 500000),
       |pc AS (
       |  SELECT cfg, CAST(COUNT(*) AS BIGINT) AS n_cand,
       |    CAST(SUM(CASE WHEN jppm >= 500000 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_hit
       |  FROM cand JOIN exj USING (ida, idb) GROUP BY cfg
       |)
       |SELECT CAST(bands AS BIGINT) AS bands,
       |  CAST(rows_per_band AS BIGINT) AS rows_per_band,
       |  ns.n_sample, tt.n_true,
       |  COALESCE(pc.n_cand, 0) AS n_cand, COALESCE(pc.n_hit, 0) AS n_hit,
       |  CASE WHEN tt.n_true > 0
       |    THEN (COALESCE(pc.n_hit, 0) * 1000000) // tt.n_true END AS recall_ppm,
       |  CASE WHEN COALESCE(pc.n_cand, 0) > 0
       |    THEN (pc.n_hit * 1000000) // pc.n_cand END AS precision_ppm
       |FROM cfgs LEFT JOIN pc USING (cfg), ns, tt
       |ORDER BY bands DESC""".stripMargin
  }

  // ---------------------------------------------------------------- q189
  /** Bloom-filter FPR audit ([[graft.ops.BloomAudit.fprAudit]]):
    * the production [[graft.ops.BloomFns]] filter built over the
    * deterministic 1/10 member slice's distinct 3-gram hashes
    * (FNV-1a-avalanched — the audit measured and rejected two
    * non-avalanched feeds, see the op scaladoc), probed with
    * exactly-known non-members; measured false-positive ppm vs the
    * iid-bits fill-ratio prediction ones³·10⁶ div m³. The oracle
    * re-derives every probe position — u = fnv64(gh),
    * h2 = oddify((u div 2³³)·0xff51afd7ed558ccd mod 2⁶⁴),
    * posᵢ = ((u + i·h2) mod 2⁶⁴) mod 2⁶³ mod m — in HUGEINT (the q32
    * 64-bit-modular precedent), so the committed bitset aggregate and
    * probe expression are hash-checked bit-for-bit. */
  private def q189(s: SparkSession, dir: String): DataFrame =
    graft.ops.BloomAudit.fprAudit(Tables.documents(s, dir))

  private val q189Sql = {
    // FNV-1a over the gram hash's 8 little-endian bytes, mod 2⁶⁴ —
    // the [[graft.ops.Fnv64Expr]] replay (q32's xor-low-bits spelling,
    // byte-wide here)
    val fnvSql =
      """list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |    list_transform(range(8), b ->
        |      (h // (CAST(1 AS BIGINT) << CAST(8 * b AS INT))) % 256)),
        |    (acc, c) -> ((acc - acc % 256
        |       + xor(CAST(acc % 256 AS BIGINT), CAST(c AS BIGINT)))
        |      * 1099511628211) % 18446744073709551616)""".stripMargin
    val posSql =
      """CAST(((fu + u.i * (h2m - h2m % 2 + 1)) % 18446744073709551616)
        |  % 9223372036854775808 % 65536 AS BIGINT)""".stripMargin
    s"""WITH t AS (
       |  SELECT doc_id, $toksSql AS tk,
       |    ${knuthSql("doc_id")} % 10 = 0 AS member
       |  FROM documents
       |),
       |g AS (
       |  SELECT doc_id, member,
       |    list_distinct(list_transform(range(len(tk) - 2),
       |      i -> ${gramHashSql("tk", "i")})) AS gh
       |  FROM t WHERE len(tk) >= 3
       |),
       |mg AS (SELECT DISTINCT unnest(gh) AS h FROM g WHERE member),
       |pg AS (
       |  SELECT h FROM (
       |    SELECT DISTINCT unnest(gh) AS h FROM g WHERE NOT member)
       |  WHERE h NOT IN (SELECT h FROM mg)
       |),
       |mh AS (SELECT fu,
       |  ((fu // 8589934592) * 18397679294719823053)
       |    % 18446744073709551616 AS h2m
       |  FROM (SELECT $fnvSql AS fu FROM mg)),
       |mp AS (
       |  SELECT DISTINCT $posSql AS pos
       |  FROM mh, UNNEST(range(3)) u(i)
       |),
       |ph AS (SELECT h, fu,
       |  ((fu // 8589934592) * 18397679294719823053)
       |    % 18446744073709551616 AS h2m
       |  FROM (SELECT h, $fnvSql AS fu FROM pg)),
       |pp AS (
       |  SELECT h, $posSql AS pos
       |  FROM ph, UNNEST(range(3)) u(i)
       |),
       |fp AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_false_pos FROM (
       |    SELECT pp.h FROM pp JOIN mp USING (pos)
       |    GROUP BY pp.h HAVING COUNT(*) = 3)
       |),
       |ones AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_ones FROM mp),
       |nm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_members FROM mg),
       |np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_probes FROM pg)
       |SELECT nm.n_members, np.n_probes,
       |  CAST(65536 AS BIGINT) AS n_bits, CAST(3 AS BIGINT) AS n_hashes,
       |  ones.n_ones,
       |  (ones.n_ones * 1000000) // 65536 AS fill_ppm,
       |  fp.n_false_pos,
       |  CASE WHEN np.n_probes > 0
       |    THEN (fp.n_false_pos * 1000000) // np.n_probes
       |  END AS fpr_measured_ppm,
       |  CAST((CAST(ones.n_ones AS HUGEINT) * ones.n_ones * ones.n_ones
       |    * 1000000) // (CAST(65536 AS HUGEINT) * 65536 * 65536)
       |    AS BIGINT) AS fpr_predicted_ppm
       |FROM nm, np, ones, fp""".stripMargin
  }

  // ---------------------------------------------------------------- q190
  /** CODE-SWITCHING profile
    * ([[graft.ops.TextStats.codeSwitchProfile]]): 20-token windows,
    * marker-count argmax per window ('und' on zero markers), per-doc
    * dominant language + exact ppm share + adjacent-window switch
    * count + distinct non-'und' language count — the mixed-language
    * gate a document-level langid can't provide. Entirely map-only
    * HOFs; the oracle replays every window slice, count, and CASE
    * ladder. */
  private def q190(s: SparkSession, dir: String): DataFrame =
    graft.ops.TextStats.codeSwitchProfile(Tables.documents(s, dir))
      .orderBy("doc_id")

  private val q190Sql = {
    val markers = graft.ops.TextStats.langMarkers
    def winCount(m: Seq[String]): String =
      s"""len(list_filter(tk[CAST(wi * 20 + 1 AS INT):CAST(wi * 20 + 20 AS INT)],
         |            x -> list_contains(${m.map(w => s"'$w'").mkString("[", ", ", "]")}, x)))""".stripMargin
    val winMax = s"greatest(${markers.map(m => winCount(m._2)).mkString(", ")})"
    val winCase = markers.map { case (l, m) =>
      s"WHEN ${winCount(m)} = $winMax THEN '$l'"
    }.mkString("\n           ")
    def domCount(l: String): String =
      s"CAST(len(list_filter(langs, x -> x = '$l')) AS BIGINT)"
    val langs = markers.map(_._1) :+ "und"
    val domMax = s"greatest(${langs.map(domCount).mkString(", ")})"
    val domCase = langs.map(l =>
      s"WHEN ${domCount(l)} = $domMax THEN '$l'").mkString("\n    ")
    s"""WITH t AS (
       |  SELECT doc_id, $toksSql AS tk FROM documents
       |),
       |w AS (
       |  SELECT doc_id, CAST((len(tk) + 19) // 20 AS BIGINT) AS nw, tk FROM t
       |),
       |la AS (
       |  SELECT doc_id, nw,
       |    CASE WHEN nw = 0 THEN CAST([] AS VARCHAR[])
       |    ELSE list_transform(range(nw), wi ->
       |      CASE WHEN $winMax = 0 THEN 'und'
       |           $winCase
       |           ELSE 'und' END)
       |    END AS langs
       |  FROM w
       |)
       |SELECT doc_id, nw AS n_windows,
       |  CASE WHEN nw = 0 THEN 'und'
       |    $domCase
       |    ELSE 'und' END AS dominant_lang,
       |  CASE WHEN nw > 0 THEN ($domMax * 1000000) // nw END AS dominant_ppm,
       |  CAST(len(list_filter(range(nw - 1), i ->
       |    langs[CAST(i + 1 AS INT)] <> langs[CAST(i + 2 AS INT)]))
       |    AS BIGINT) AS n_switches,
       |  CAST(len(list_distinct(list_filter(langs, x -> x <> 'und')))
       |    AS BIGINT) AS n_langs
       |FROM la
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q191
  /** INFERENCE-BATCH padding-waste audit
    * ([[graft.ops.Packing.batchWasteAudit]]): exact padded-token
    * share of the batch compute rectangle at batch size 8 under the
    * pseudo-shuffle order vs length-descending sorting — the
    * measurement that justifies a sort stage before an
    * embedding/scoring backfill. Engine ranks are the two-phase radix
    * decomposition; the oracle replays them as plain window
    * ROW_NUMBERs (equal by the packShuffled order argument). */
  private def q191(s: SparkSession, dir: String): DataFrame =
    graft.ops.Packing.batchWasteAudit(Tables.documents(s, dir), batchSize = 8)

  private val q191Sql = {
    s"""WITH c AS (
       |  SELECT doc_id, ${knuthSql("doc_id")} AS hv,
       |    CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n
       |  FROM documents
       |  WHERE len(regexp_split_to_array(text, '\\s+')) > 0
       |),
       |bh AS (
       |  SELECT (ROW_NUMBER() OVER (ORDER BY hv, doc_id) - 1) // 8 AS b, n
       |  FROM c
       |),
       |bs AS (
       |  SELECT (ROW_NUMBER() OVER (ORDER BY n DESC, doc_id) - 1) // 8 AS b, n
       |  FROM c
       |),
       |gh AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS rows_,
       |         MAX(n) AS mx, SUM(n) AS tok FROM bh GROUP BY b),
       |gs AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS rows_,
       |         MAX(n) AS mx, SUM(n) AS tok FROM bs GROUP BY b)
       |SELECT 'hash' AS policy,
       |  CAST(SUM(rows_) AS BIGINT) AS n_seqs,
       |  CAST(COUNT(*) AS BIGINT) AS n_batches,
       |  CAST(SUM(tok) AS BIGINT) AS total_tokens,
       |  CAST(SUM(rows_ * mx - tok) AS BIGINT) AS padded_tokens,
       |  CAST((SUM(rows_ * mx - tok) * 1000000)
       |    // (SUM(rows_ * mx - tok) + SUM(tok)) AS BIGINT) AS waste_ppm
       |FROM gh
       |UNION ALL
       |SELECT 'sorted_desc',
       |  CAST(SUM(rows_) AS BIGINT), CAST(COUNT(*) AS BIGINT),
       |  CAST(SUM(tok) AS BIGINT), CAST(SUM(rows_ * mx - tok) AS BIGINT),
       |  CAST((SUM(rows_ * mx - tok) * 1000000)
       |    // (SUM(rows_ * mx - tok) + SUM(tok)) AS BIGINT)
       |FROM gs
       |ORDER BY policy""".stripMargin
  }

  // ---------------------------------------------------------------- q192
  /** CALIBRATION audit ([[graft.ops.Classifier.calibrationAudit]]):
    * reliability diagram of the stopword-rate heuristic (score =
    * n_stopwords·10⁶ div n_tokens, the cheap fluency gate) against
    * the composite q17 quality verdict (quality ≥ 0.5) in 10
    * equal-count score deciles — per-decile exact observed positive
    * ppm, the table that decides where a threshold actually sits on
    * THIS corpus. Exact two-phase radix rank engine-side; plain
    * ROW_NUMBER oracle-side. */
  private def q192(s: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    val base = Tables.documents(s, dir).select(
      col("doc_id"),
      graft.ops.TextStats.stopwordCount(t).as("__nstop"),
      graft.ops.TextStats.tokenCount(t).as("__ntok"),
      graft.ops.TextStats.qualityScore(t).as("__q"))
    graft.ops.Classifier.calibrationAudit(base,
      // split("") is [""], so __ntok >= 1 — no zero divisor
      score = expr("(__nstop * 1000000) div __ntok"),
      label = col("__q") >= 0.5)
  }

  private val q192Sql = {
    val stops = graft.ops.TextStats.miniStopWords
      .map(w => s"'$w'").mkString("[", ", ", "]")
    val nstop = s"CAST(len(list_filter(regexp_split_to_array(text,'\\s+'), t -> list_contains($stops, t))) AS BIGINT)"
    val ntok = s"CAST(len(regexp_split_to_array(text,'\\s+')) AS BIGINT)"
    val quality =
      s"""(least(CAST(len(regexp_split_to_array(text,'\\s+')) AS DOUBLE) / 50.0, 1.0) * 0.4
         | + least($nstop / CAST($ntok AS DOUBLE) * 5.0, 1.0) * 0.3
         | + (1.0 - least(CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) * 5.0, 1.0)) * 0.2
         | + (1.0 - least(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) * 5.0, 1.0)) * 0.1)""".stripMargin
    s"""WITH s AS (
       |  SELECT doc_id, ($nstop * 1000000) // $ntok AS sc,
       |    CASE WHEN $quality >= 0.5 THEN 1 ELSE 0 END AS pos
       |  FROM documents
       |),
       |r AS (
       |  SELECT sc, pos,
       |    ROW_NUMBER() OVER (ORDER BY sc DESC, doc_id) AS rk
       |  FROM s
       |),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM s)
       |SELECT CAST(((rk - 1) * 10) // n.nn AS BIGINT) AS bucket,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(MIN(sc) AS BIGINT) AS score_min,
       |  CAST(MAX(sc) AS BIGINT) AS score_max,
       |  CAST(SUM(pos) AS BIGINT) AS n_pos,
       |  (CAST(SUM(pos) AS BIGINT) * 1000000) // COUNT(*) AS pos_ppm
       |FROM r, n
       |GROUP BY bucket
       |ORDER BY bucket""".stripMargin
  }

  // ---------------------------------------------------------------- q193
  /** VOCABULARY-GROWTH (Heaps) audit
    * ([[graft.ops.TextStats.vocabGrowth]]): distinct types + token
    * occurrences seen in the first s docs of the deterministic
    * pseudo-shuffle order at s ∈ {16, 64, 256, 1024, 4096} — the
    * V(n) curve that says whether 10× more of this source still buys
    * vocabulary or just repetition (the sizing complement to q179's
    * fixed-vocabulary coverage). Min-first-seen-rank per type, never
    * a per-level rescan; oracle replays the knuth-order ROW_NUMBER
    * and both rollups. */
  private def q193(s: SparkSession, dir: String): DataFrame =
    graft.ops.TextStats.vocabGrowth(Tables.documents(s, dir))

  private val q193Sql =
    s"""WITH h AS (
       |  SELECT doc_id, ${knuthSql("doc_id")} AS hv, $toksSql AS tk
       |  FROM documents
       |),
       |rk AS (
       |  SELECT doc_id, tk, ROW_NUMBER() OVER (ORDER BY hv, doc_id) AS r
       |  FROM h
       |),
       |fs AS (
       |  SELECT tok, MIN(r) AS fs
       |  FROM (SELECT r, unnest(tk) AS tok FROM rk) GROUP BY tok
       |),
       |lv AS (SELECT CAST(unnest([16, 64, 256, 1024, 4096]) AS BIGINT)
       |       AS prefix_docs),
       |ty AS (
       |  SELECT prefix_docs,
       |    CAST(SUM(CASE WHEN fs <= prefix_docs THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_types
       |  FROM fs, lv GROUP BY prefix_docs
       |),
       |tk2 AS (
       |  SELECT prefix_docs,
       |    CAST(SUM(CASE WHEN r <= prefix_docs THEN len(tk) ELSE 0 END)
       |      AS BIGINT) AS n_tokens,
       |    CAST(SUM(CASE WHEN r <= prefix_docs THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_docs
       |  FROM rk, lv GROUP BY prefix_docs
       |)
       |SELECT prefix_docs, n_docs, n_tokens, n_types
       |FROM tk2 JOIN ty USING (prefix_docs)
       |ORDER BY prefix_docs""".stripMargin

  // ---------------------------------------------------------------- q194
  /** STORED-IVF APPEND without refit
    * ([[graft.ops.Similarity.appendIvf]]): fit + store the index on
    * the vec_id % 5 ≠ 0 slice, append the remaining 20 % as an
    * increment (map-only assignment against the FROZEN centroids,
    * radii merged cell-wise by max — growth-only, so the triangle
    * pruning bound stays an upper bound), reload, probe. The oracle
    * is brute-force cosine over the FULL corpus (q42's adaptive-exact
    * equivalence): an under-merged radius would prune a list holding
    * a true neighbor and hash-mismatch immediately — the maintenance
    * operation a live ANN index runs daily, correctness-gated. */
  private def q194(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val qvec = Similarity.probeVector(emb, 0L)
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val inc = emb.filter(col("vec_id") % 5 === 0)
    val (indexed, model) = Similarity.fitIvf(base, nLists = 16)
    val idxDir = Round11.freshScratchDirShared("graft_q194_ivf")
    Similarity.saveIvf(indexed, model, idxDir)
    Similarity.appendIvf(s, inc, idxDir)
    val (stored, m2) = Similarity.loadIvf(s, idxDir)
    Similarity.exactIvfKnn(stored, m2, qvec, k = 20, nProbe0 = 4)
      .select(col("rank").as("rk"), col("vec_id"))
  }

  // ---------------------------------------------------------------- q195
  /** DETECTOR-AGREEMENT audit
    * ([[graft.ops.LshAudit.detectorAgreement]]): Cohen's κ between
    * banded MinHash (resemblance over gram sets, (8,3) over the
    * shared 24-min signature) and banded SimHash (angular proximity
    * over token-frequency vectors, ≤ 12/64 Hamming) on the q188
    * query-sampled directed universe — the method-comparison row
    * read before OR-ing detectors (q146 style) at 100 TB. κ, not raw
    * agreement, because positives are ≪ 1 % of the universe: any two
    * conservative detectors "agree" on almost everything by chance.
    * The oracle replays BOTH detectors end-to-end (the q188 minhash
    * fragments + the q32 FNV/vote/band/Hamming chain) plus the exact
    * marginal-product chance term in HUGEINT. */
  private def q195(s: SparkSession, dir: String): DataFrame =
    graft.ops.LshAudit.detectorAgreement(Tables.documents(s, dir))

  private val q195Sql = {
    // 10007^2 = 100140049 < p, so the r=3 band key needs no extra mod
    s"""WITH t AS (
       |  SELECT doc_id, $toksSql AS tk FROM documents
       |),
       |g AS (
       |  SELECT doc_id, ${knuthSql("doc_id")} % 8 = 0 AS q,
       |    list_distinct(list_transform(range(len(tk) - 2),
       |      i -> ${gramHashSql("tk", "i")})) AS gh
       |  FROM t WHERE len(tk) >= 3
       |),
       |cf AS (
       |  SELECT CAST(i AS BIGINT) AS ci,
       |    (1 + (i + 1) * 2654435761) % 1000000007 AS a,
       |    ((i + 1) * 40503) % 1000000007 AS b
       |  FROM range(24) r(i)
       |),
       |gu AS (SELECT doc_id, unnest(gh) AS h FROM g),
       |sg AS (
       |  SELECT doc_id, ci, MIN((cf.a * gu.h + cf.b) % 1000000007) AS s
       |  FROM gu CROSS JOIN cf GROUP BY doc_id, ci
       |),
       |bk8 AS (
       |  SELECT doc_id, ci // 3 AS band,
       |    SUM(s * CASE ci % 3 WHEN 0 THEN 100140049 WHEN 1 THEN 10007
       |             ELSE 1 END) % 1000000007 AS key
       |  FROM sg GROUP BY doc_id, band
       |),
       |mh AS (
       |  SELECT DISTINCT x.doc_id AS qd, y.doc_id AS cd
       |  FROM bk8 x JOIN bk8 y ON x.band = y.band AND x.key = y.key
       |    AND x.doc_id <> y.doc_id
       |  WHERE ${knuthSql("x.doc_id")} % 8 = 0
       |),
       |stoks AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS tok
       |  FROM documents
       |),
       |sth AS (
       |  SELECT doc_id,
       |    bin(list_reduce(
       |      list_prepend(CAST(14695981039346656037 AS HUGEINT),
       |        list_transform(range(length(tok)), i ->
       |          CAST(unicode(substr(tok, CAST(i+1 AS INTEGER), 1)) AS HUGEINT))),
       |      (h, c) -> ((h - (h % 65536) + xor(CAST(h % 65536 AS BIGINT), CAST(c AS BIGINT)))
       |                 * 1099511628211) % 18446744073709551616)) AS bn
       |  FROM stoks
       |),
       |sbits AS (
       |  SELECT doc_id, bb.b,
       |    SUM(CASE WHEN length(bn) > bb.b
       |         AND substr(bn, CAST(length(bn) - bb.b AS INTEGER), 1) = '1'
       |        THEN 1 ELSE -1 END) AS vote
       |  FROM sth, (SELECT unnest(range(64)) AS b) bb
       |  GROUP BY doc_id, bb.b
       |),
       |ssigs AS (
       |  SELECT doc_id,
       |    string_agg(CASE WHEN vote > 0 THEN '1' ELSE '0' END, '' ORDER BY b DESC) AS s
       |  FROM sbits GROUP BY doc_id
       |),
       |sbanded AS (
       |  SELECT doc_id, s, bb.band,
       |    substr(s, CAST(49 - 16*bb.band AS INTEGER), 16) AS key
       |  FROM ssigs, (SELECT unnest(range(4)) AS band) bb
       |),
       |scand AS (
       |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db, a.s AS sa, b.s AS sb
       |  FROM sbanded a JOIN sbanded b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |),
       |sham AS (
       |  SELECT da, db FROM scand
       |  WHERE len(list_filter(range(64), i ->
       |    substr(sa, CAST(i+1 AS INTEGER), 1) <> substr(sb, CAST(i+1 AS INTEGER), 1))) <= 12
       |),
       |shu AS (
       |  SELECT da, db FROM sham
       |  JOIN (SELECT doc_id AS da FROM g) ga USING (da)
       |  JOIN (SELECT doc_id AS db FROM g) gb USING (db)
       |),
       |shq AS (
       |  SELECT qd, cd FROM (
       |    SELECT da AS qd, db AS cd FROM shu
       |    UNION ALL SELECT db AS qd, da AS cd FROM shu)
       |  WHERE ${knuthSql("qd")} % 8 = 0
       |),
       |nq AS (SELECT CAST(COUNT(*) AS BIGINT) AS nq FROM g WHERE q),
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM g),
       |cn AS (
       |  SELECT
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM mh) AS n_minhash,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM shq) AS n_simhash,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM
       |      (SELECT * FROM mh INTERSECT SELECT * FROM shq)) AS n_both
       |),
       |base AS (
       |  SELECT nq.nq * (nn.n - 1) AS n_universe,
       |    cn.n_minhash, cn.n_simhash, cn.n_both
       |  FROM nq, nn, cn
       |),
       |pp AS (
       |  SELECT *,
       |    ((n_universe - n_minhash - n_simhash + 2 * n_both) * 1000000)
       |      // n_universe AS po_ppm,
       |    CAST((CAST(n_minhash AS HUGEINT) * n_simhash
       |        + CAST(n_universe - n_minhash AS HUGEINT)
       |          * (n_universe - n_simhash)) * 1000000
       |      // (CAST(n_universe AS HUGEINT) * n_universe) AS BIGINT) AS pe_ppm
       |  FROM base
       |)
       |SELECT n_universe, n_minhash, n_simhash, n_both, po_ppm, pe_ppm,
       |  CASE WHEN pe_ppm < 1000000
       |    THEN ((po_ppm - pe_ppm) * 1000000) // (1000000 - pe_ppm)
       |  END AS kappa_ppm,
       |  CASE WHEN n_minhash + n_simhash - n_both > 0
       |    THEN (n_both * 1000000) // (n_minhash + n_simhash - n_both)
       |  END AS pair_jaccard_ppm
       |FROM pp""".stripMargin
  }

  // ---------------------------------------------------------------- q196
  /** SELF-RETRIEVAL eval ([[graft.ops.SparseSim.selfRetrievalAudit]]):
    * first-16-token prefixes of the 1/8 query sample retrieve from
    * the full corpus under the q171 integer TF-IDF program; per query
    * the rank of its own source document plus the exact reciprocal
    * ppm an MRR sums — the index-sanity eval run before trusting any
    * retrieval stage. The self rank is a candidate-bounded
    * count-of-better, never a per-query sort. */
  private def q196(s: SparkSession, dir: String): DataFrame =
    graft.ops.SparseSim.selfRetrievalAudit(Tables.documents(s, dir),
      qTokens = 16, sampleMod = 8L)

  private val q196Sql =
    s"""WITH td AS (
       |  SELECT doc_id, $toksSql AS tk FROM documents
       |),
       |tf AS (
       |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, unnest(list_transform(range(len(tk) - 2),
       |          i -> ${gramHashSql("tk", "i")})) AS tok
       |        FROM td WHERE len(tk) >= 3)
       |  GROUP BY 1, 2
       |),
       |df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |nn AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM tf),
       |idf AS (
       |  SELECT tok, length(bin(nn.n // df.df)) - 1 AS idf
       |  FROM df CROSS JOIN nn
       |  WHERE df.df <= 1000000 AND length(bin(nn.n // df.df)) - 1 > 0
       |),
       |post AS (
       |  SELECT tf.doc_id, tf.tok, tf.tf * idf.idf AS w
       |  FROM tf JOIN idf USING (tok)
       |),
       |dn AS (SELECT doc_id, CAST(SUM(w * w) AS BIGINT) AS dn2
       |       FROM post GROUP BY 1),
       |samp AS (
       |  SELECT doc_id AS qid, tk[1:16] AS p
       |  FROM td
       |  WHERE ${knuthSql("doc_id")} % 8 = 0 AND len(tk[1:16]) >= 3
       |),
       |qtf AS (
       |  SELECT qid, tok, CAST(COUNT(*) AS BIGINT) AS qtf
       |  FROM (SELECT qid, unnest(list_transform(range(len(p) - 2),
       |          i -> ${gramHashSql("p", "i")})) AS tok
       |        FROM samp)
       |  GROUP BY 1, 2
       |),
       |qpost AS (
       |  SELECT qtf.qid, qtf.tok, qtf.qtf * idf.idf AS qw
       |  FROM qtf JOIN idf USING (tok)
       |),
       |qn AS (SELECT qid, CAST(SUM(qw * qw) AS BIGINT) AS qn2
       |       FROM qpost GROUP BY 1),
       |sc AS (
       |  SELECT d.qid, d.doc_id,
       |    CAST((CAST(d.dot AS HUGEINT) * d.dot * 1000000000000)
       |         // (CAST(qn.qn2 AS HUGEINT) * dn.dn2) AS BIGINT) AS score
       |  FROM (
       |    SELECT q.qid, p.doc_id, CAST(SUM(q.qw * p.w) AS BIGINT) AS dot
       |    FROM qpost q JOIN post p USING (tok)
       |    GROUP BY 1, 2) d
       |  JOIN qn ON qn.qid = d.qid
       |  JOIN dn ON dn.doc_id = d.doc_id
       |),
       |selfs AS (SELECT qid, score AS self FROM sc WHERE qid = doc_id),
       |rk AS (
       |  SELECT sc.qid, CAST(COUNT(*) AS BIGINT) AS n_candidates,
       |    CAST(SUM(CASE WHEN sc.score > s.self
       |          OR (sc.score = s.self AND sc.doc_id < sc.qid)
       |        THEN 1 ELSE 0 END) + 1 AS BIGINT) AS self_rank
       |  FROM sc JOIN selfs s USING (qid)
       |  GROUP BY 1
       |)
       |SELECT samp.qid AS query_id,
       |  COALESCE(rk.n_candidates, 0) AS n_candidates,
       |  rk.self_rank,
       |  COALESCE(1000000 // rk.self_rank, 0) AS reciprocal_ppm
       |FROM samp LEFT JOIN rk ON rk.qid = samp.qid
       |ORDER BY query_id""".stripMargin

  // ---------------------------------------------------------------- q197
  /** DATASET CARD ([[graft.ops.DatasetCard.card]]): the one-call
    * corpus datasheet — volume, type counts, exact-dup mass,
    * language/source composition ppm, exact value-domain length
    * percentiles, stopword mass, quality-gate pass rate — ~20
    * (stat, value) rows however large the corpus, every one an exact
    * integer two engines agree on (the compliance-artifact
    * property). */
  private def q197(s: SparkSession, dir: String): DataFrame =
    graft.ops.DatasetCard.card(Tables.documents(s, dir))

  /** q197's full card SQL parameterized over the source relation
    * (no final ORDER BY) so q203 can replay one card per snapshot
    * half. */
  private[queries] def cardSql(src: String): String = {
    val stops = graft.ops.TextStats.miniStopWords
      .map(w => s"'$w'").mkString("[", ", ", "]")
    val ntok = s"CAST(len(regexp_split_to_array(text,'\\s+')) AS BIGINT)"
    val nstop = s"CAST(len(list_filter(regexp_split_to_array(text,'\\s+'), t -> list_contains($stops, t))) AS BIGINT)"
    val quality =
      s"""(least(CAST(len(regexp_split_to_array(text,'\\s+')) AS DOUBLE) / 50.0, 1.0) * 0.4
         | + least($nstop / CAST($ntok AS DOUBLE) * 5.0, 1.0) * 0.3
         | + (1.0 - least(CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) * 5.0, 1.0)) * 0.2
         | + (1.0 - least(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) * 5.0, 1.0)) * 0.1)""".stripMargin
    def pct(k: Int) =
      s"""SELECT 'len_p$k' AS stat, CAST(MIN(len) AS BIGINT) AS value FROM (
         |  SELECT len, SUM(c) OVER (ORDER BY len
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM (SELECT $ntok AS len, COUNT(*) AS c FROM $src GROUP BY 1)
         |), (SELECT COUNT(*) AS n FROM $src)
         |WHERE cum * 100 >= $k * n""".stripMargin
    s"""SELECT stat, value FROM (
       |SELECT 'n_docs' AS stat, CAST(COUNT(*) AS BIGINT) AS value FROM $src
       |UNION ALL
       |SELECT 'n_tokens', CAST(SUM($ntok) AS BIGINT) FROM $src
       |UNION ALL
       |SELECT 'n_chars', CAST(SUM(length(text)) AS BIGINT) FROM $src
       |UNION ALL
       |SELECT 'n_stopwords', CAST(SUM($nstop) AS BIGINT) FROM $src
       |UNION ALL
       |SELECT 'quality_pass_ppm',
       |  CAST((SUM(CASE WHEN $quality >= 0.5 THEN 1 ELSE 0 END) * 1000000)
       |    // COUNT(*) AS BIGINT) FROM $src
       |UNION ALL
       |SELECT 'n_types', CAST(COUNT(DISTINCT tok) AS BIGINT) FROM
       |  (SELECT unnest(list_filter(regexp_split_to_array(text,'\\s+'),
       |     x -> length(x) > 0)) AS tok FROM $src)
       |UNION ALL
       |SELECT 'n_exact_dup_docs',
       |  CAST(COUNT(*) - COUNT(DISTINCT text) AS BIGINT) FROM $src
       |UNION ALL
       |SELECT 'lang_' || lang || '_ppm',
       |  CAST((COUNT(*) * 1000000) // (SELECT COUNT(*) FROM $src)
       |    AS BIGINT)
       |FROM $src GROUP BY lang
       |UNION ALL
       |SELECT 'source_' || source || '_ppm',
       |  CAST((COUNT(*) * 1000000) // (SELECT COUNT(*) FROM $src)
       |    AS BIGINT)
       |FROM $src GROUP BY source
       |UNION ALL
       |${pct(50)}
       |UNION ALL
       |${pct(90)}
       |UNION ALL
       |${pct(99)}
       |)""".stripMargin
  }

  private val q197Sql = s"""${cardSql("documents")}
       |ORDER BY stat""".stripMargin

  // ---------------------------------------------------------------- q198
  /** INCREMENTAL winnowing overlap vs a STORED fingerprint index
    * ([[graft.ops.Winnowing.incrementalOverlapPairs]]): corpus
    * (doc_id % 5 ≠ 0) fingerprinted ONCE, round-tripped through
    * parquet (the stored-index stance), then the 20 % increment
    * matches against it — combined-df boilerplate cap, overlap ppm
    * vs the smaller sketch. The oracle re-derives both sketches from
    * text (the q166 window-min replay), the combined df cap, and the
    * match join — proving the stored index is exactly what a fresh
    * fingerprint pass would produce. */
  private def q198(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val inc = docs.filter(col("doc_id") % 5 === 0)
    val idxDir = Round11.freshScratchDirShared("graft_q198_winnow")
    graft.ops.Winnowing.fingerprints(corpus, k = 3, w = 4)
      .write.mode("overwrite").parquet(idxDir)
    val stored = s.read.parquet(idxDir)
    graft.ops.Winnowing.incrementalOverlapPairs(inc, stored,
      k = 3, w = 4, minShared = 2L, maxDf = 64L)
  }

  private val q198Sql = {
    // the q166 fingerprint replay, parameterized by the doc slice
    def fps(name: String, pred: String) =
      s"""${name}_g AS (
         |  SELECT doc_id, CAST(len(tk) - 3 AS BIGINT) AS maxpos,
         |    CAST(u.i AS BIGINT) AS pos,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(3), j ->
         |        ${Round15.tokHashSql("tk[CAST(u.i + j + 1 AS INT)]")})),
         |      (acc, h) -> (acc * 10007 + h) % 1000000007) AS gh
         |  FROM (SELECT doc_id, $toksSql AS tk FROM documents WHERE $pred)
         |    t, UNNEST(range(0, len(tk) - 2)) AS u(i)
         |  WHERE len(tk) >= 3
         |),
         |${name}_sel AS (
         |  SELECT doc_id,
         |    MIN(gh * 16777216 + (16777215 - pos)) OVER (
         |      PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS selkey,
         |    pos, maxpos
         |  FROM ${name}_g
         |),
         |${name} AS (
         |  SELECT DISTINCT doc_id, selkey // 16777216 AS fp
         |  FROM ${name}_sel
         |  WHERE pos <= greatest(maxpos - 3, 0)
         |)""".stripMargin
    s"""WITH ${fps("cfp", "doc_id % 5 <> 0")},
       |${fps("ifp", "doc_id % 5 = 0")},
       |cn AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_corpus
       |       FROM cfp GROUP BY doc_id),
       |inn AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_new
       |        FROM ifp GROUP BY doc_id),
       |dfu AS (
       |  SELECT fp FROM (
       |    SELECT fp, CAST(COUNT(*) AS BIGINT) AS df FROM (
       |      SELECT fp, doc_id FROM cfp UNION ALL SELECT fp, doc_id FROM ifp)
       |    GROUP BY fp)
       |  WHERE df <= 64
       |),
       |m AS (
       |  SELECT i.doc_id AS new_id, c.doc_id AS corpus_id,
       |    CAST(COUNT(*) AS BIGINT) AS n_shared
       |  FROM (SELECT doc_id, fp FROM ifp JOIN dfu USING (fp)) i
       |  JOIN (SELECT doc_id, fp FROM cfp JOIN dfu USING (fp)) c USING (fp)
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 2
       |)
       |SELECT m.new_id, m.corpus_id, m.n_shared, inn.n_new, cn.n_corpus,
       |  (m.n_shared * 1000000) // least(inn.n_new, cn.n_corpus)
       |    AS overlap_ppm
       |FROM m JOIN inn ON inn.doc_id = m.new_id
       |       JOIN cn ON cn.doc_id = m.corpus_id
       |ORDER BY new_id, corpus_id""".stripMargin
  }

  // ---------------------------------------------------------------- q199
  /** TEMPLATE-PREFIX families
    * ([[graft.ops.TextStats.templatePrefixFamilies]]): documents
    * grouped by the exact hash of their first 8 tokens — the
    * boilerplate-opening detector whole-document dedup misses
    * (template pages share openings, not tails). Family rows only
    * cross the exchange; the oracle replays the prefix fold and the
    * family algebra. */
  private def q199(s: SparkSession, dir: String): DataFrame =
    graft.ops.TextStats.templatePrefixFamilies(Tables.documents(s, dir),
      prefixTokens = 8, minFamily = 2L)

  private val q199Sql =
    s"""WITH h AS (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(8), i ->
       |        ${Round15.tokHashSql("tk[CAST(i + 1 AS INT)]")})),
       |      (acc, th) -> (acc * 10007 + th) % 1000000007) AS prefix_hash
       |  FROM (SELECT doc_id, $toksSql AS tk FROM documents)
       |  WHERE len(tk) >= 8
       |),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM h)
       |SELECT prefix_hash, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(MIN(doc_id) AS BIGINT) AS exemplar_id,
       |  CAST((COUNT(*) * 1000000) // n.n AS BIGINT) AS share_ppm
       |FROM h, n
       |GROUP BY prefix_hash, n.n
       |HAVING COUNT(*) >= 2
       |ORDER BY n_docs DESC, prefix_hash""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q182_approx_negatives_recall", q182, Some(q182Sql)),
    QueryDef("q183_chunk_dedup", q183, Some(q183Sql)),
    QueryDef("q184_clamped_cdc", q184, Some(q184Sql)),
    QueryDef("q185_pq_adc_recall", q185, Some(q185Sql)),
    QueryDef("q186_shuffle_mixing", q186, Some(q186Sql)),
    QueryDef("q187_k_anonymity", q187, Some(q187Sql)),
    QueryDef("q188_lsh_param_audit", q188, Some(q188Sql)),
    QueryDef("q189_bloom_fpr_audit", q189, Some(q189Sql)),
    QueryDef("q190_code_switch", q190, Some(q190Sql)),
    QueryDef("q191_batch_waste", q191, Some(q191Sql)),
    QueryDef("q192_calibration", q192, Some(q192Sql)),
    QueryDef("q193_vocab_growth", q193, Some(q193Sql)),
    QueryDef("q194_ivf_append", q194, Some(Pipelines.q42Sql)),
    QueryDef("q195_detector_agreement", q195, Some(q195Sql)),
    QueryDef("q196_self_retrieval", q196, Some(q196Sql)),
    QueryDef("q197_dataset_card", q197, Some(q197Sql)),
    QueryDef("q198_incremental_winnow", q198, Some(q198Sql)),
    QueryDef("q199_template_prefixes", q199, Some(q199Sql)))
}
