package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.ops.{Dedup, Lineage, Similarity, SkewJoin, Splits, TextStats}

/** Round-14 battery additions: exact weighted systematic sampling,
  * normalized ("fuzzy-exact") dedup, the per-document funnel-lineage
  * audit, tokenizer fertility, the quantization recall audit, and the
  * join-skew key audit. All reference-scope-none LLM-pipeline
  * extensions (SURVEY §8).
  */
object Round14 {

  // ---------------------------------------------------------------- q131
  /** EXACT weighted systematic sample ([[graft.ops.Splits
    * .systematicWeightedSample]]): k = 50 picks proportional to token
    * count, laid out on the deterministic (knuth-hash, id) line with
    * integer midpoint targets — the particle-filter resampling scheme
    * a mixture loader uses to draw a token-weighted subcorpus, with
    * `n_picks` multiplicity for rows heavier than W∕k. Every verdict
    * is integer ceil-division arithmetic, so the oracle replays the
    * whole sample bit-for-bit (an Efraimidis–Spirakis `u^(1∕w)` key
    * would hang on ln∕pow ulps). Oracle: the same exclusive prefix
    * sum as a window, HUGEINT bounds arithmetic. */
  private def q131(s: SparkSession, dir: String): DataFrame =
    Splits.systematicWeightedSample(Tables.documents(s, dir), k = 50,
        weight = TextStats.tokenCount(col("text")))
      .orderBy("doc_id")

  private val q131Sql =
    """WITH h AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS w,
      |    CAST((CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
      |         % 4294967296 AS BIGINT) AS hv
      |  FROM documents
      |),
      |c AS (
      |  SELECT doc_id, w,
      |    COALESCE(SUM(w) OVER (ORDER BY hv, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      |  FROM h
      |),
      |t AS (SELECT CAST(SUM(w) AS HUGEINT) AS tw FROM h),
      |p AS (
      |  SELECT doc_id, w,
      |    (CAST(100 AS HUGEINT) * cum + tw - 1) // tw AS lo,
      |    (CAST(100 AS HUGEINT) * (cum + w) + tw - 1) // tw - 1 AS hi
      |  FROM c, t
      |)
      |SELECT doc_id, w AS weight,
      |  CAST((hi + 1) // 2 - lo // 2 AS BIGINT) AS n_picks
      |FROM p
      |WHERE hi >= lo AND (hi + 1) // 2 - lo // 2 > 0
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q132
  /** Normalized "fuzzy-exact" dedup ([[graft.ops.Dedup
    * .normalizedExactDedup]]): casefold + punctuation-strip +
    * whitespace-collapse canonical form, then exact dedup with
    * multiplicity — the C4/Gopher cleaning pass that catches
    * re-hosted copies differing only in case∕punctuation∕spacing,
    * which byte-exact dedup misses and MinHash wastes a full funnel
    * on. Survivor = min id per canonical class. Oracle: the identical
    * regex chain (RE2 ∕ Java class parity is ASCII-exact; the corpus
    * is ASCII). */
  private def q132(s: SparkSession, dir: String): DataFrame =
    Dedup.normalizedExactDedup(Tables.documents(s, dir))
      .select(col("doc_id"), col("lang"), col("source"), col("n_copies"))
      .orderBy("doc_id")

  private val q132Sql =
    """WITH canon AS (
      |  SELECT doc_id, lang, source,
      |    trim(regexp_replace(regexp_replace(lower(text),
      |      '[^\p{L}\p{N}\s]+', ' ', 'g'), '\s+', ' ', 'g')) AS c
      |  FROM documents
      |),
      |g AS (
      |  SELECT c, MIN(doc_id) AS keep, CAST(COUNT(*) AS BIGINT) AS n_copies
      |  FROM canon GROUP BY c
      |)
      |SELECT d.doc_id, d.lang, d.source, g.n_copies
      |FROM canon d JOIN g ON d.doc_id = g.keep
      |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------- q133
  /** Per-document funnel LINEAGE ([[graft.ops.Lineage.funnelLineage]]):
    * one disposition row per input doc — capped ∕ exact_dup ∕
    * near_dup ∕ low_quality ∕ kept, in pipeline precedence — the
    * audit table production corpus builds keep so "why is doc X not
    * in the training set?" is a lookup, not an investigation. Oracle:
    * the q106 cap rank, q16-style exact min-id, the q119 all-pairs
    * Jaccard + recursive-CTE components (true pairs — the banded
    * engine path is recall-1 here, the q31/q55/q119 argument), and
    * the q105 score fold, stitched with left joins into one CASE. */
  private def q133(s: SparkSession, dir: String): DataFrame =
    Lineage.funnelLineage(Tables.documents(s, dir), capK = 20)
      .orderBy("doc_id")

  /** Shared q133/q144 lineage CTE block, ending in a `stages`
    * (doc_id, source, stage) frame. */
  private val lineageCtes =
    s"""h AS (
       |  SELECT doc_id, text, source,
       |    CAST((CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
       |         % 4294967296 AS BIGINT) AS hv
       |  FROM documents
       |),
       |adm AS (
       |  SELECT doc_id, text FROM (
       |    SELECT doc_id, text,
       |      row_number() OVER (PARTITION BY source ORDER BY hv, doc_id) AS rk
       |    FROM h)
       |  WHERE rk <= 20
       |),
       |exact AS (SELECT MIN(doc_id) AS doc_id FROM adm GROUP BY text),
       |kept_exact AS (
       |  SELECT a.doc_id, a.text FROM adm a JOIN exact e USING (doc_id)
       |),
       |toks AS (
       |  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t FROM kept_exact
       |),
       |grams AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(range(len(t) - 2),
       |      i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
       |  FROM toks WHERE len(t) >= 3
       |),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM grams a JOIN grams b ON a.doc_id < b.doc_id
       |  WHERE 1.0 - (CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
       |      / (CAST(len(a.g) + len(b.g) AS DOUBLE)
       |         - CAST(len(list_intersect(a.g, b.g)) AS DOUBLE))) <= 0.4
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
       |comp AS (SELECT id, MIN(lab) AS cluster FROM reach GROUP BY id),
       |losers AS (SELECT id FROM comp WHERE id <> cluster),
       |sc AS (
       |  SELECT doc_id, ${Round13.scoreFold} AS score
       |  FROM kept_exact
       |  WHERE doc_id NOT IN (SELECT id FROM losers)
       |),
       |stages AS (
       |  SELECT d.doc_id, d.source,
       |    CASE WHEN a.doc_id IS NULL THEN 'capped'
       |         WHEN ke.doc_id IS NULL THEN 'exact_dup'
       |         WHEN l.id IS NOT NULL THEN 'near_dup'
       |         WHEN s.score < 0 THEN 'low_quality'
       |         ELSE 'kept' END AS stage
       |  FROM documents d
       |  LEFT JOIN adm a ON a.doc_id = d.doc_id
       |  LEFT JOIN kept_exact ke ON ke.doc_id = d.doc_id
       |  LEFT JOIN losers l ON l.id = d.doc_id
       |  LEFT JOIN sc s ON s.doc_id = d.doc_id
       |)""".stripMargin

  private val q133Sql =
    s"""WITH RECURSIVE
       |$lineageCtes
       |SELECT doc_id, stage FROM stages
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q134
  /** Tokenizer FERTILITY by language: subword pieces per whitespace
    * word, per `lang` — the per-language tokenizer-efficiency table
    * every multilingual data plan consults (a high-fertility language
    * pays more compute per word, so token budgets must be specced in
    * pieces, not words). Composes the q104 WordPiece stats (exact
    * integer triple per doc) with one map-side-combinable rollup;
    * the ratio is exact ppm integer division. Oracle: the q104
    * per-word greedy replay rolled up per lang. */
  private def q134(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    graft.text.Subword.subwordStats(docs, vocabN = 10)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy("lang")
      .agg(sum("n_words").as("n_words"), sum("n_pieces").as("n_pieces"),
        sum("n_unk_words").as("n_unk_words"))
      .withColumn("fertility_ppm",
        expr("(CAST(n_pieces AS decimal(38,0)) * 1000000) div n_words"))
      .orderBy("lang")
  }

  private val q134Sql =
    s"""WITH RECURSIVE
       |${Round12.subwordPerwordCtes},
       |perdoc AS (
       |  SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS nw,
       |    CAST(SUM(p.np) AS BIGINT) AS np_, CAST(SUM(p.unk) AS BIGINT) AS nu
       |  FROM words w JOIN perword p USING (tok)
       |  GROUP BY w.doc_id
       |)
       |SELECT d.lang,
       |  CAST(SUM(nw) AS BIGINT) AS n_words,
       |  CAST(SUM(np_) AS BIGINT) AS n_pieces,
       |  CAST(SUM(nu) AS BIGINT) AS n_unk_words,
       |  CAST(CAST(SUM(np_) AS HUGEINT) * 1000000
       |       // CAST(SUM(nw) AS HUGEINT) AS BIGINT) AS fertility_ppm
       |FROM perdoc p JOIN documents d USING (doc_id)
       |GROUP BY d.lang
       |ORDER BY d.lang""".stripMargin

  // ---------------------------------------------------------------- q135
  /** Quantization RECALL audit: recall@k of the int8-quantized kNN
    * (q69 path) against exact float cosine (q21 path), k ∈
    * {1, 5, 10, 20} — the production gate run before shipping a
    * quantized index ("how much retrieval does 4× compression
    * cost?"). Both rankings are already oracle-replayable, so the
    * overlap counts are a FULL hash oracle — rare for an ANN quality
    * metric; recall is exact ppm integer division, no float ratio to
    * round. */
  private def q135(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val qvec = Similarity.probeVector(emb, 0L)
    val ex = Similarity.bruteForceKnn(emb, qvec, 20)
      .select(col("rank"), col("vec_id"))
    val qu = Similarity.quantizedKnn(emb, queryId = 0L, k = 20)
    val j = ex.join(qu, "vec_id")
    val ks = s.range(0, 4).select(
      element_at(typedLit(Seq(1, 5, 10, 20)), col("id").cast("int") + 1)
        .as("k"))
    ks.crossJoin(broadcast(j))
      .groupBy("k")
      .agg(sum(when(col("rank") <= col("k") && col("rk") <= col("k"), 1L)
        .otherwise(0L)).as("n_overlap"))
      .withColumn("recall_ppm", expr("(n_overlap * 1000000) div k"))
      .orderBy("k")
  }

  private val q135Sql =
    s"""WITH ${Documents.quantScoreCtes},
       |ex AS (
       |  SELECT vec_id, ROW_NUMBER() OVER (
       |    ORDER BY list_cosine_similarity(embedding,
       |      (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC, vec_id) AS rank
       |  FROM embeddings
       |),
       |qu AS (
       |  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY score DESC, vec_id) AS rk
       |  FROM scored
       |),
       |j AS (
       |  SELECT ex.rank, qu.rk FROM ex JOIN qu USING (vec_id)
       |  WHERE ex.rank <= 20 AND qu.rk <= 20
       |),
       |ks AS (SELECT unnest([1, 5, 10, 20]) AS k)
       |SELECT k,
       |  CAST(SUM(CASE WHEN j.rank <= k AND j.rk <= k THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_overlap,
       |  CAST(CAST(SUM(CASE WHEN j.rank <= k AND j.rk <= k THEN 1 ELSE 0 END)
       |    AS BIGINT) * 1000000 // k AS BIGINT) AS recall_ppm
       |FROM ks, j
       |GROUP BY k
       |ORDER BY k""".stripMargin

  // ---------------------------------------------------------------- q136
  /** Join-skew KEY audit ([[graft.ops.SkewJoin.skewKeyAudit]]): which
    * `user_id`s carry > 1.2× the mean per-key row count, their exact
    * ppm share, and the salt count that would level each — the
    * measurement pass that decides whether the q81 salted join (or
    * AQE skew handling) is needed, run before the 100 TB shuffle
    * instead of diagnosed from its stragglers. All integer
    * cross-multiplied verdicts through DECIMAL(38,0) ∕ HUGEINT. */
  private def q136(s: SparkSession, dir: String): DataFrame =
    SkewJoin.skewKeyAudit(Tables.events(s, dir), "user_id")
      .orderBy(col("n_rows").desc, col("user_id"))

  private val q136Sql =
    """WITH c AS (
      |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows
      |  FROM events GROUP BY user_id
      |),
      |t AS (
      |  SELECT CAST(SUM(n_rows) AS HUGEINT) AS total,
      |    CAST(COUNT(*) AS HUGEINT) AS nkeys
      |  FROM c
      |)
      |SELECT user_id, n_rows,
      |  CAST(CAST(n_rows AS HUGEINT) * 1000000 // total AS BIGINT) AS share_ppm,
      |  CAST((CAST(n_rows AS HUGEINT) * nkeys + total - 1) // total AS BIGINT) AS salts
      |FROM c, t
      |WHERE CAST(n_rows AS HUGEINT) * nkeys * 10 > 12 * total
      |ORDER BY n_rows DESC, user_id""".stripMargin

  // ---------------------------------------------------------------- q137
  /** Per-group weighted systematic sample ([[graft.ops.Splits
    * .systematicWeightedSamplePerGroup]]): k = 5 token-proportional
    * picks within EVERY source independently — the stratified mixture
    * draw that builds a balanced subcorpus in one pass, where the
    * global q131 sampler would let a giant source swallow every slot.
    * Same exact integer arithmetic, Σ n_picks = k per source. Oracle:
    * the q131 replay with PARTITION BY source windows and per-source
    * totals. */
  private def q137(s: SparkSession, dir: String): DataFrame =
    Splits.systematicWeightedSamplePerGroup(Tables.documents(s, dir),
        k = 5, weight = TextStats.tokenCount(col("text")),
        groupCol = "source")
      .orderBy("source", "doc_id")

  private val q137Sql =
    """WITH h AS (
      |  SELECT doc_id, source,
      |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS w,
      |    CAST((CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
      |         % 4294967296 AS BIGINT) AS hv
      |  FROM documents
      |),
      |c AS (
      |  SELECT doc_id, source, w,
      |    COALESCE(SUM(w) OVER (PARTITION BY source ORDER BY hv, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      |  FROM h
      |),
      |t AS (SELECT source, CAST(SUM(w) AS HUGEINT) AS tw FROM h GROUP BY source),
      |p AS (
      |  SELECT c.source, c.doc_id, c.w,
      |    (CAST(10 AS HUGEINT) * cum + tw - 1) // tw AS lo,
      |    (CAST(10 AS HUGEINT) * (cum + w) + tw - 1) // tw - 1 AS hi
      |  FROM c JOIN t USING (source)
      |)
      |SELECT source, doc_id, w AS weight,
      |  CAST((hi + 1) // 2 - lo // 2 AS BIGINT) AS n_picks
      |FROM p
      |WHERE hi >= lo AND (hi + 1) // 2 - lo // 2 > 0
      |ORDER BY source, doc_id""".stripMargin

  // ---------------------------------------------------------------- q138
  /** Exact-percentile length truncation ([[graft.ops.TextStats
    * .truncateAtLengthPercentile]]): cap every document at the
    * corpus's exact P99 token count — the Gopher-style outlier-length
    * rule with a replayable cap (the radix-ranked order statistic)
    * instead of an approx-percentile guess. Oracle: a row_number
    * window picks the ⌈0.99·n⌉-th smallest count (value-identical to
    * the engine's desc radix rank at the mirrored position), then the
    * same slice + single-space reassembly. */
  private def q138(s: SparkSession, dir: String): DataFrame =
    TextStats.truncateAtLengthPercentile(Tables.documents(s, dir))
      .orderBy("doc_id")

  private val q138Sql =
    """WITH c AS (
      |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS t,
      |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tok
      |  FROM documents
      |),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c),
      |r AS (
      |  SELECT n_tok, row_number() OVER (ORDER BY n_tok, doc_id) AS rn FROM c
      |),
      |cap AS (
      |  SELECT r.n_tok AS cap_tok FROM r, n
      |  WHERE rn = (99 * n.n + 99) // 100
      |)
      |SELECT c.doc_id, c.n_tok,
      |  LEAST(c.n_tok, cap_tok) AS kept_tokens,
      |  c.n_tok > cap_tok AS truncated,
      |  array_to_string(t[1:CAST(LEAST(c.n_tok, cap_tok) AS INT)], ' ')
      |    AS trunc_text
      |FROM c, cap
      |ORDER BY c.doc_id""".stripMargin

  // ---------------------------------------------------------------- q139
  /** Interleaved VISION-LANGUAGE sequence packing: each document
    * carries a stub image asset ([[graft.ops.Multimodal
    * .packAsAssets]] — typed width∕height metadata), its sequence
    * cost is text tokens + ViT-style patch count
    * (⌈w∕16⌉·⌈h∕16⌉ — the image's share of the context window), and
    * the combined stream packs through the q82 two-phase prefix sum.
    * This is the packing arithmetic every multimodal training loader
    * runs: images consume context budget as patches, so text-only
    * counts under-fill or overflow sequences. The asset join models
    * the real shape (metadata lives in a separate asset store).
    * Oracle: the stub metadata formulas + the q82 LATERAL cut at
    * budget 512. */
  private def q139(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val assets = graft.ops.Multimodal.packAsAssets(docs)
      .select(col("asset_id").as("doc_id"), col("width"), col("height"))
    val joined = docs.join(assets, "doc_id")
    val patches =
      expr("((width + 15) div 16) * ((height + 15) div 16)").cast("long")
    graft.ops.Packing.packSequences(joined, budget = 512L,
        countExpr = Some(TextStats.tokenCount(col("text")) + patches))
      .orderBy("seq_id", "doc_id")
  }

  private val q139Sql =
    """WITH meta AS (
      |  SELECT doc_id,
      |    CAST(length(text) % 640 + 32 AS BIGINT) AS w,
      |    CAST(length(text) % 480 + 32 AS BIGINT) AS h,
      |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS ntext
      |  FROM documents
      |),
      |counted AS (
      |  SELECT doc_id,
      |    ntext + ((w + 15) // 16) * ((h + 15) // 16) AS n_tok
      |  FROM meta
      |),
      |placed AS (
      |  SELECT doc_id, n_tok,
      |    CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
      |  FROM counted
      |)
      |SELECT s.seq_id, doc_id,
      |  GREATEST(start, s.seq_id * 512) - start AS doc_off,
      |  GREATEST(start, s.seq_id * 512) - s.seq_id * 512 AS seq_off,
      |  LEAST(start + n_tok, (s.seq_id + 1) * 512)
      |    - GREATEST(start, s.seq_id * 512) AS len
      |FROM placed, LATERAL (
      |  SELECT unnest(range(start // 512, (start + n_tok - 1) // 512 + 1)) AS seq_id) s
      |WHERE n_tok > 0
      |ORDER BY seq_id, doc_id""".stripMargin

  // ---------------------------------------------------------------- q140
  /** Dedup PROVENANCE map ([[graft.ops.Dedup.dupProvenance]]): every
    * dropped document names its survivor and the evidence — exact
    * twin (dist 0), a directly verified MinHash pair (its exact
    * Jaccard), or transitive chain membership (dist NULL — the cases
    * a human reviews first). The audit table that makes "where did
    * doc X go?" a lookup. Oracle: the q119 exact∕pairs∕CC replay
    * keeping the pair DISTANCE, left-joined on the (survivor, loser)
    * canonical orientation. */
  private def q140(s: SparkSession, dir: String): DataFrame =
    Dedup.dupProvenance(Tables.documents(s, dir), maxJaccardDist = 0.4)
      .orderBy("dropped_id")

  private val q140Sql =
    """WITH RECURSIVE
      |exact0 AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
      |rep AS (
      |  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY text) AS rep
      |  FROM documents
      |),
      |kept_exact AS (
      |  SELECT d.doc_id, d.text FROM documents d JOIN exact0 e USING (doc_id)
      |),
      |toks AS (
      |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM kept_exact
      |),
      |grams AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(len(t) - 2),
      |      i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
      |  FROM toks WHERE len(t) >= 3
      |),
      |pairs AS (
      |  SELECT doc_a, doc_b, jd FROM (
      |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |      1.0 - (CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
      |        / (CAST(len(a.g) + len(b.g) AS DOUBLE)
      |           - CAST(len(list_intersect(a.g, b.g)) AS DOUBLE))) AS jd
      |    FROM grams a JOIN grams b ON a.doc_id < b.doc_id)
      |  WHERE jd <= 0.4
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
      |comp AS (SELECT id, MIN(lab) AS cluster FROM reach GROUP BY id),
      |losers AS (SELECT id, cluster FROM comp WHERE id <> cluster)
      |SELECT doc_id AS dropped_id, rep AS kept_id,
      |  CAST(0.0 AS DOUBLE) AS jaccard_dist, 'exact' AS via
      |FROM rep WHERE doc_id <> rep
      |UNION ALL
      |SELECT l.id, l.cluster, p.jd,
      |  CASE WHEN p.jd IS NULL THEN 'transitive' ELSE 'direct' END
      |FROM losers l
      |LEFT JOIN pairs p ON p.doc_a = l.cluster AND p.doc_b = l.id
      |ORDER BY dropped_id""".stripMargin

  // ---------------------------------------------------------------- q141
  /** Contamination mapped through packing to TRAINING SEQUENCES:
    * which packed sequences contain a benchmark-contaminated document
    * — the loader-side verdict ("drop the tainted sequences") that
    * doc-level q89 can't give once documents are cut across sequence
    * boundaries. Composes the q89 span-contamination verdict with the
    * q82 span map (budget 256) and one seq-keyed rollup. Oracle: the
    * q89 matched-gram CTEs + the q82 LATERAL cut + a left-join count.
    */
  private def q141(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val ref = docs.filter(col("doc_id") % 5 === 0)
    val contaminated = Dedup.spanContaminationScores(corpus, ref,
        shingleSize = 13)
      .select(col("doc_id"), lit(true).as("__c"))
    graft.ops.Packing.packSequences(corpus, budget = 256L)
      .join(contaminated, Seq("doc_id"), "left")
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__c"), 1L).otherwise(0L)).as("n_contaminated"))
      .withColumn("tainted", col("n_contaminated") > 0)
      .orderBy("seq_id")
  }

  private val q141Sql =
    """WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0),
      |ref AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
      |ct AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM corpus),
      |rt AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM ref),
      |cg AS (
      |  SELECT ct.doc_id, i AS pos, array_to_string(t[i+1:i+13], ' ') AS g
      |  FROM ct, UNNEST(range(greatest(len(t) - 12, 0))) AS u(i)
      |),
      |rg AS (
      |  SELECT DISTINCT array_to_string(t[i+1:i+13], ' ') AS g
      |  FROM rt, UNNEST(range(greatest(len(t) - 12, 0))) AS u(i)
      |),
      |cdocs AS (SELECT DISTINCT cg.doc_id FROM cg JOIN rg USING (g)),
      |counted AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tok
      |  FROM corpus
      |),
      |placed AS (
      |  SELECT doc_id, n_tok,
      |    CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
      |  FROM counted
      |),
      |spans AS (
      |  SELECT s.seq_id, doc_id
      |  FROM placed, LATERAL (
      |    SELECT unnest(range(start // 256, (start + n_tok - 1) // 256 + 1)) AS seq_id) s
      |  WHERE n_tok > 0
      |)
      |SELECT seq_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_contaminated,
      |  SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) > 0 AS tainted
      |FROM spans LEFT JOIN cdocs c ON c.doc_id = spans.doc_id
      |GROUP BY seq_id
      |ORDER BY seq_id""".stripMargin

  // ---------------------------------------------------------------- q142
  /** Ordered FUNNEL conversion over the event stream: users who
    * viewed, then clicked after their first view, then purchased
    * after that click — greedy first-occurrence chain matching, the
    * classic product-analytics funnel the relational battery lacked.
    * Each stage is one filtered min-aggregate joined forward on
    * `user_id` (three shuffles on the same key — co-partitioned), no
    * per-user event-sequence sort anywhere. Oracle: the same three
    * chained min-filters. */
  private def q142(s: SparkSession, dir: String): DataFrame =
    graft.ops.TimeSeries.funnelCounts(Tables.events(s, dir),
        Seq("view", "click", "purchase"))
      .orderBy("stage")

  private val q142Sql =
    """WITH t1 AS (
      |  SELECT user_id, MIN(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY user_id
      |),
      |t2 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t2
      |  FROM events e JOIN t1 ON t1.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND e.ts > t1.t1
      |  GROUP BY e.user_id
      |),
      |t3 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t3
      |  FROM events e JOIN t2 ON t2.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > t2.t2
      |  GROUP BY e.user_id
      |)
      |SELECT '1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM t1
      |UNION ALL
      |SELECT '2_click', CAST(COUNT(*) AS BIGINT) FROM t2
      |UNION ALL
      |SELECT '3_purchase', CAST(COUNT(*) AS BIGINT) FROM t3
      |ORDER BY stage""".stripMargin

  // ---------------------------------------------------------------- q143
  /** COHORT retention over the event stream: users grouped by their
    * first-activity week, distinct actives per (cohort, week offset)
    * — the other classic product-analytics table. Cohorts are one
    * min-aggregate; activity is a distinct projection; the offset is
    * exact integer day arithmetic (`datediff div 7` on Monday-
    * truncated weeks — ISO in both dialects). */
  private def q143(s: SparkSession, dir: String): DataFrame =
    graft.ops.TimeSeries.cohortRetention(Tables.events(s, dir))
      .orderBy("cohort_week", "week_offset")

  private val q143Sql =
    """WITH cohorts AS (
      |  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      |  FROM events GROUP BY user_id
      |),
      |active AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
      |  FROM events
      |)
      |SELECT c.cohort_week,
      |  CAST(date_diff('day', c.cohort_week, a.week) // 7 AS BIGINT) AS week_offset,
      |  CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
      |FROM active a JOIN cohorts c ON c.user_id = a.user_id
      |GROUP BY c.cohort_week, date_diff('day', c.cohort_week, a.week) // 7
      |ORDER BY cohort_week, week_offset""".stripMargin

  // ---------------------------------------------------------------- q144
  /** Per-source funnel REPORT ([[graft.ops.Lineage.funnelReport]]):
    * the q133 lineage rolled up to (source, stage, n_docs) — the
    * corpus-build summary table ("how much did each stage remove,
    * per feed?") that closes funnelReport's spec-only gap with a
    * battery row. Oracle: the shared lineage CTEs + one GROUP BY. */
  private def q144(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Lineage.funnelReport(docs, Lineage.funnelLineage(docs, capK = 20))
      .orderBy("source", "stage")
  }

  private val q144Sql =
    s"""WITH RECURSIVE
       |$lineageCtes
       |SELECT source, stage, CAST(COUNT(*) AS BIGINT) AS n_docs
       |FROM stages
       |GROUP BY source, stage
       |ORDER BY source, stage""".stripMargin

  // ---------------------------------------------------------------- q145
  /** CURRICULUM packing: documents bucketed into quality terciles by
    * the exact radix rank (phase 0 = cleanest third), each phase
    * packed into its own sequence space — the curriculum-learning
    * data order ("train on clean text first") expressed as a pure
    * function of the corpus, with phase boundaries at exact order
    * statistics instead of approximate score thresholds. Composes
    * q109's rank machinery (no corpus-sized sort partition) with the
    * q82 prefix-sum cut per phase. Oracle: the q17 quality fold, a
    * global rank window, the q68-style bucket arithmetic, and a
    * PARTITION BY phase prefix sum + LATERAL cut. */
  /** The q145 span map, exposed for q176's fill-efficiency rollup
    * (same frame, same 256-token budget). */
  private[queries] def curriculumSpans(s: SparkSession, dir: String): DataFrame =
    q145(s, dir)

  /** q145's oracle SQL, exposed so q176 can wrap it as a CTE. */
  private[queries] def curriculumSpansSql: String = q145Sql

  private def q145(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val ranked = graft.ops.Ranks.exactGroupRank(
      docs.withColumn("__g", lit(1)), "__g", "doc_id",
      TextStats.qualityScore(col("text")))
    val phased = graft.ops.Ranks.withQuantileBucket(ranked, "__g", 3)
      .select(col("doc_id"), col("bucket").as("phase"))
    val withPhase = docs.join(phased, "doc_id")
    (0L until 3L).map { p =>
      graft.ops.Packing.packSequences(
          withPhase.filter(col("phase") === p), budget = 256L)
        .withColumn("phase", lit(p))
    }.reduce(_ unionByName _)
      .select("phase", "seq_id", "doc_id", "doc_off", "seq_off", "len")
      .orderBy("phase", "seq_id", "doc_id")
  }

  private val q145Sql = {
    val stops = graft.ops.TextStats.miniStopWords
      .map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH t AS (
       |  SELECT doc_id, text, regexp_split_to_array(text, '\\s+') AS tk
       |  FROM documents
       |),
       |q AS (
       |  SELECT doc_id,
       |    (least(CAST(len(tk) AS DOUBLE) / 50.0, 1.0) * 0.4
       |     + least(CAST(len(list_filter(tk, x -> list_contains($stops, x))) AS DOUBLE) / CAST(len(tk) AS DOUBLE) * 5.0, 1.0) * 0.3
       |     + (1.0 - least(CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) * 5.0, 1.0)) * 0.2
       |     + (1.0 - least(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) * 5.0, 1.0)) * 0.1)
       |    AS value
       |  FROM t
       |),
       |r AS (
       |  SELECT doc_id,
       |    CAST(ROW_NUMBER() OVER (ORDER BY value DESC, doc_id) AS BIGINT) AS rnk,
       |    CAST(COUNT(*) OVER () AS BIGINT) AS n
       |  FROM q
       |),
       |phased AS (SELECT doc_id, (3 * (rnk - 1)) // n AS phase FROM r),
       |counted AS (
       |  SELECT p.phase, c.doc_id,
       |    CAST(len(regexp_split_to_array(c.text, '\\s+')) AS BIGINT) AS n_tok
       |  FROM documents c JOIN phased p ON p.doc_id = c.doc_id
       |),
       |placed AS (
       |  SELECT phase, doc_id, n_tok,
       |    CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY phase ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
       |  FROM counted
       |)
       |SELECT phase, s.seq_id, doc_id,
       |  GREATEST(start, s.seq_id * 256) - start AS doc_off,
       |  GREATEST(start, s.seq_id * 256) - s.seq_id * 256 AS seq_off,
       |  LEAST(start + n_tok, (s.seq_id + 1) * 256)
       |    - GREATEST(start, s.seq_id * 256) AS len
       |FROM placed, LATERAL (
       |  SELECT unnest(range(start // 256, (start + n_tok - 1) // 256 + 1)) AS seq_id) s
       |WHERE n_tok > 0
       |ORDER BY phase, seq_id, doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q146
  /** CROSS-SIGNAL dedup ([[graft.ops.Multimodal
    * .deduplicateCrossModal]]): text MinHash edges ∪ perceptual-hash
    * edges, ONE connected-components pass over the merged graph —
    * "duplicates if text OR imagery matches", which single-signal
    * dedup misses when one modality was re-encoded. Oracle: the exact
    * layer + true text pairs (≤ 0.4) + the q125 phash replay over the
    * exact survivors, unioned into one recursive-CTE component
    * search. */
  private def q146(s: SparkSession, dir: String): DataFrame =
    graft.ops.Multimodal.deduplicateCrossModal(s, Tables.documents(s, dir))
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")

  private val q146Sql =
    s"""WITH RECURSIVE
       |exact0 AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
       |kept_exact AS (
       |  SELECT d.doc_id, d.lang, d.text FROM documents d JOIN exact0 e USING (doc_id)
       |),
       |toks AS (
       |  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t FROM kept_exact
       |),
       |grams AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(range(len(t) - 2),
       |      i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
       |  FROM toks WHERE len(t) >= 3
       |),
       |tpairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM grams a JOIN grams b ON a.doc_id < b.doc_id
       |  WHERE 1.0 - (CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
       |      / (CAST(len(a.g) + len(b.g) AS DOUBLE)
       |         - CAST(len(list_intersect(a.g, b.g)) AS DOUBLE))) <= 0.4
       |),
       |${Round13.phashPairCtes("kept_exact")},
       |allp AS (
       |  SELECT doc_a, doc_b FROM tpairs
       |  UNION
       |  SELECT asset_a, asset_b FROM hp WHERE hamming <= 1
       |),
       |edges AS (
       |  SELECT doc_a AS s, doc_b AS d FROM allp
       |  UNION ALL SELECT doc_b, doc_a FROM allp
       |),
       |reach AS (
       |  SELECT DISTINCT s AS id, s AS lab FROM edges
       |  UNION
       |  SELECT e.d AS id, r.lab FROM reach r JOIN edges e ON e.s = r.id
       |),
       |comp AS (SELECT id, MIN(lab) AS cluster FROM reach GROUP BY id),
       |losers AS (SELECT id FROM comp WHERE id <> cluster)
       |SELECT doc_id, lang FROM kept_exact
       |WHERE doc_id NOT IN (SELECT id FROM losers)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q147
  /** Top event PATHS ([[graft.ops.TimeSeries.topEventPaths]]): the 10
    * most frequent consecutive 3-step event-type sequences — the
    * path-analysis ("what precedes a purchase?") companion to q142's
    * funnel. Deterministic tiebreaks end to end: the per-user walk
    * orders by (ts, event_id), the top-k by (count desc, path).
    * Oracle: two window leads + a count + LIMIT under the same total
    * order. */
  private def q147(s: SparkSession, dir: String): DataFrame =
    graft.ops.TimeSeries.topEventPaths(Tables.events(s, dir), k = 10)

  private val q147Sql =
    """WITH s AS (
      |  SELECT event_type AS e1,
      |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
      |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
      |  FROM events
      |)
      |SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n_paths
      |FROM s WHERE e3 IS NOT NULL
      |GROUP BY e1, e2, e3
      |ORDER BY n_paths DESC, e1, e2, e3
      |LIMIT 10""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q131_systematic_sample", q131, Some(q131Sql)),
    QueryDef("q132_normalized_dedup", q132, Some(q132Sql)),
    QueryDef("q133_funnel_lineage", q133, Some(q133Sql)),
    QueryDef("q134_subword_fertility", q134, Some(q134Sql)),
    QueryDef("q135_quant_recall", q135, Some(q135Sql)),
    QueryDef("q136_skew_keys", q136, Some(q136Sql)),
    QueryDef("q137_group_systematic_sample", q137, Some(q137Sql)),
    QueryDef("q138_length_truncation", q138, Some(q138Sql)),
    QueryDef("q139_multimodal_packing", q139, Some(q139Sql)),
    QueryDef("q140_dedup_provenance", q140, Some(q140Sql)),
    QueryDef("q141_tainted_sequences", q141, Some(q141Sql)),
    QueryDef("q142_event_funnel", q142, Some(q142Sql)),
    QueryDef("q143_cohort_retention", q143, Some(q143Sql)),
    QueryDef("q144_funnel_report", q144, Some(q144Sql)),
    QueryDef("q145_curriculum_packing", q145, Some(q145Sql)),
    QueryDef("q146_crossmodal_dedup", q146, Some(q146Sql)),
    QueryDef("q147_event_paths", q147, Some(q147Sql)))
}
