package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.ops.{Dedup, Similarity, TextStats}

/** Training-data operators over `documents` / `embeddings`, each with
  * a DuckDB oracle. Parity rules (beyond QueryDef's): token splitting
  * relies on verified single-space hygiene of the corpus; all counts
  * are exact longs; quality/jaccard doubles are computed with the
  * same literal expression shape in both dialects so IEEE evaluation
  * is bit-identical; cosine queries emit RANKS only, because DuckDB's
  * `list_cosine_similarity` works in float32 and can never hash-match
  * a double-precision value.
  */
object Documents {

  // ---------------------------------------------------------------- q15
  /** Per-document token statistics (map-only, codegen'd). */
  private def q15(s: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    Tables.documents(s, dir).select(
      col("doc_id"),
      TextStats.tokenCount(t).as("n_tokens"),
      TextStats.charCount(t).as("n_chars_measured"),
      TextStats.tokenCharSum(t).as("token_char_sum"),
      TextStats.avgTokenLen(t).as("avg_token_len"))
      .orderBy("doc_id")
  }

  private val q15Sql =
    """SELECT doc_id,
      |  CAST(len(regexp_split_to_array(text,'\s+')) AS BIGINT) AS n_tokens,
      |  CAST(length(text) AS BIGINT) AS n_chars_measured,
      |  CAST(list_sum(list_transform(regexp_split_to_array(text,'\s+'), t -> CAST(length(t) AS BIGINT))) AS BIGINT) AS token_char_sum,
      |  CAST(list_sum(list_transform(regexp_split_to_array(text,'\s+'), t -> CAST(length(t) AS BIGINT))) AS DOUBLE) / CAST(len(regexp_split_to_array(text,'\s+')) AS DOUBLE) AS avg_token_len
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q16
  /** Exact dedup groups: survivor id + multiplicity per distinct text.
    * At 100 TB: group on a 64-bit fingerprint instead of raw text so
    * the exchange carries 8-byte keys. */
  private def q16(s: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(Tables.documents(s, dir), "text", "doc_id")
      .orderBy("keep_id")

  private val q16Sql =
    """SELECT min(doc_id) AS keep_id, COUNT(*) AS n_copies
      |FROM documents
      |GROUP BY text
      |ORDER BY keep_id""".stripMargin

  // ---------------------------------------------------------------- q17
  /** Quality scoring from exact integer counts. */
  private def q17(s: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    Tables.documents(s, dir).select(
      col("doc_id"),
      TextStats.stopwordCount(t).as("n_stopwords"),
      TextStats.punctCount(t).as("n_punct"),
      TextStats.digitCount(t).as("n_digits"),
      TextStats.qualityScore(t).as("quality"))
      .orderBy("doc_id")
  }

  private val q17Sql = {
    val stops = TextStats.miniStopWords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""SELECT doc_id,
       |  CAST(len(list_filter(regexp_split_to_array(text,'\\s+'), t -> list_contains($stops, t))) AS BIGINT) AS n_stopwords,
       |  CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS BIGINT) AS n_punct,
       |  CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digits,
       |  (least(CAST(len(regexp_split_to_array(text,'\\s+')) AS DOUBLE) / 50.0, 1.0) * 0.4
       |   + least(CAST(len(list_filter(regexp_split_to_array(text,'\\s+'), t -> list_contains($stops, t))) AS DOUBLE) / CAST(len(regexp_split_to_array(text,'\\s+')) AS DOUBLE) * 5.0, 1.0) * 0.3
       |   + (1.0 - least(CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) * 5.0, 1.0)) * 0.2
       |   + (1.0 - least(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) * 5.0, 1.0)) * 0.1) AS quality
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q68
  /** Per-group top-k via the bounded-heap [[graft.ops.TopKAgg]]
    * aggregate: the 3 best documents per language by quality score.
    * Unlike the window-function spelling (which shuffles every row and
    * sorts whole groups), the heap aggregate reduces each task's slice
    * to k entries BEFORE the exchange — shuffle volume is groups × k,
    * not the corpus. The oracle is the window-function spelling in
    * DuckDB, so the two formulations cross-check each other. */
  private def q68(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"), col("doc_id"),
        TextStats.qualityScore(col("text")).as("q"))
      .groupBy("lang")
      .agg(graft.ops.TopKAgg.topK(col("q"), col("doc_id"), 3).as("tk"))
      .select(col("lang"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("lang"), (col("pos") + 1).cast("int").as("rk"),
        col("e.id").as("doc_id"), col("e.ord").as("quality"))
      .orderBy("lang", "rk")

  private val q68Sql = {
    val stops = TextStats.miniStopWords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH scored AS (
       |  SELECT lang, doc_id,
       |    (least(CAST(len(regexp_split_to_array(text,'\\s+')) AS DOUBLE) / 50.0, 1.0) * 0.4
       |     + least(CAST(len(list_filter(regexp_split_to_array(text,'\\s+'), t -> list_contains($stops, t))) AS DOUBLE) / CAST(len(regexp_split_to_array(text,'\\s+')) AS DOUBLE) * 5.0, 1.0) * 0.3
       |     + (1.0 - least(CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) * 5.0, 1.0)) * 0.2
       |     + (1.0 - least(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) * 5.0, 1.0)) * 0.1) AS quality
       |  FROM documents
       |),
       |ranked AS (
       |  SELECT lang, doc_id, quality,
       |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY quality DESC, doc_id) AS rk
       |  FROM scored
       |)
       |SELECT lang, CAST(rk AS INTEGER) AS rk, doc_id, quality
       |FROM ranked WHERE rk <= 3
       |ORDER BY lang, rk""".stripMargin
  }

  // ---------------------------------------------------------------- q18
  /** Language-ID heuristic: marker-word scores + CJK check, argmax. */
  private def q18(s: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    val scoreCols = TextStats.langMarkers.map { case (l, m) =>
      TextStats.langScore(t, m).as(s"s_$l")
    }
    Tables.documents(s, dir)
      .select((col("doc_id") +: scoreCols :+
        TextStats.predictedLang(t).as("lang_pred")): _*)
      .orderBy("doc_id")
  }

  private val q18Sql = {
    def lst(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("[", ", ", "]")
    val scores = TextStats.langMarkers.map { case (l, m) =>
      s"CAST(len(list_filter(regexp_split_to_array(text,'\\s+'), t -> list_contains(${lst(m)}, t))) AS BIGINT) AS s_$l"
    }
    val names = TextStats.langMarkers.map { case (l, _) => s"s_$l" }
    val whens = TextStats.langMarkers.map { case (l, _) =>
      s"WHEN s_$l = m AND m > 0 THEN '$l'"
    }
    s"""SELECT doc_id, ${names.mkString(", ")},
       |  CASE WHEN cjk > 0 THEN 'zh' ${whens.mkString(" ")} ELSE 'und' END AS lang_pred
       |FROM (
       |  SELECT doc_id, ${names.mkString(", ")}, cjk,
       |    greatest(${names.mkString(", ")}) AS m
       |  FROM (
       |    SELECT doc_id, ${scores.mkString(", ")},
       |      length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS cjk
       |    FROM documents) base
       |) scored
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q19
  /** Bag + rolling fingerprints (exact long arithmetic both sides). */
  private def q19(s: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    Tables.documents(s, dir).select(
      col("doc_id"),
      TextStats.bagFingerprint(t).as("bag_fp"),
      TextStats.rollingFingerprint(t).as("rolling_fp"))
      .orderBy("doc_id")
  }

  private val q19Sql =
    """SELECT doc_id,
      |  CAST((1000003 * len(regexp_split_to_array(text,'\s+'))
      |    + list_sum(list_transform(regexp_split_to_array(text,'\s+'),
      |        t -> CAST(ascii(t) AS BIGINT)*31 + CAST(length(t) AS BIGINT)*7)))
      |   % 1000000007 AS BIGINT) AS bag_fp,
      |  CAST(list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(regexp_split_to_array(text,'\s+'),
      |        t -> CAST(ascii(t) AS BIGINT)*131 + CAST(length(t) AS BIGINT))),
      |    (acc, c) -> (acc * 31 + c) % 1000000007) AS BIGINT) AS rolling_fp
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q20
  /** Exact bigram-Jaccard near-dup pairs inside a blocking window
    * (the verify stage of the dedup funnel; candidate generation at
    * scale is MinHash/SimHash — see Pipelines). */
  private def q20(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(Tables.documents(s, dir),
      n = 2, window = 25, minJaccard = 0.2)
      .orderBy("doc_a", "doc_b")

  private val q20Sql =
    """WITH grams AS (
      |  SELECT doc_id, lang,
      |    list_distinct(list_transform(range(len(regexp_split_to_array(text,'\s+'))-1),
      |      i -> regexp_split_to_array(text,'\s+')[i+1] || ' ' || regexp_split_to_array(text,'\s+')[i+2])) AS g
      |  FROM documents
      |)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
      |    / (CAST(len(a.g) + len(b.g) AS DOUBLE) - CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)) AS jaccard
      |FROM grams a JOIN grams b
      |  ON a.lang = b.lang AND a.doc_id < b.doc_id AND b.doc_id <= a.doc_id + 25
      |WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
      |    / (CAST(len(a.g) + len(b.g) AS DOUBLE) - CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)) >= 0.2
      |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------- q21
  /** Brute-force cosine top-20 vs the vec_id=0 embedding — ranks only
    * (float32-vs-double across engines; ranks are stable because
    * neighbor gaps dwarf the precision difference). */
  private def q21(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val qvec = Similarity.probeVector(emb, 0L)
    Similarity.bruteForceKnn(emb, qvec, 20)
      .select(col("rank").as("rk"), col("vec_id"))
  }

  private val q21Sql =
    """SELECT rk, vec_id FROM (
      |  SELECT vec_id, ROW_NUMBER() OVER (
      |    ORDER BY list_cosine_similarity(embedding,
      |      (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC, vec_id) AS rk
      |  FROM embeddings) t
      |WHERE rk <= 20
      |ORDER BY rk""".stripMargin

  // ---------------------------------------------------------------- q22
  /** Embedding near-dup: nearest same-label neighbor per vector
    * (ids only — same float32 rationale as q21). Runs the exact-IVF
    * plan (triangle-pruned probes, no structural all-pairs join);
    * [[graft.ops.Dedup.nearestSameLabel]] remains the brute-force
    * twin the spec suite cross-checks against. */
  private def q22(s: SparkSession, dir: String): DataFrame =
    graft.ops.Similarity.nearestSameLabelIvf(Tables.embeddings(s, dir))
      .orderBy("vec_id")

  private val q22Sql =
    """SELECT vec_id, nn_id FROM (
      |  SELECT a.vec_id, b.vec_id AS nn_id, ROW_NUMBER() OVER (
      |    PARTITION BY a.vec_id
      |    ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id) AS rn
      |  FROM embeddings a JOIN embeddings b
      |    ON a.label = b.label AND a.vec_id <> b.vec_id) t
      |WHERE rn = 1
      |ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- q69
  /** int8-quantized cosine top-k vs the vec_id=0 query: the 4×-smaller
    * scan path for ANN at corpus scale ([[Similarity.quantizeInt8]]).
    * The inner dot is EXACT integer arithmetic on the codes, so DuckDB
    * replays the whole pipeline bit-for-bit (floor(x+0.5) quantization,
    * integer dot, one fixed double rescale chain) — a full hash oracle
    * for a similarity operator, which the float32-vs-double cosine
    * paths (q21/q42) can't have; ranks+ids output keeps the contract
    * uniform with them anyway. */
  private def q69(s: SparkSession, dir: String): DataFrame =
    // round 14: lifted into Similarity.quantizedKnn (shared with the
    // q135 recall audit) and switched from a global rank window to
    // orderBy().limit(k) — TakeOrderedAndProject's bounded heaps
    graft.ops.Similarity.quantizedKnn(Tables.embeddings(s, dir),
        queryId = 0L, k = 20)
      .orderBy("rk")

  /** Shared int8-quantize → integer-dot scoring CTEs (s, q, probe,
    * scored) — q69's replay, reused by the q135 recall audit. */
  private[queries] val quantScoreCtes =
    """s AS (
      |  SELECT vec_id,
      |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS rawscale
      |  FROM embeddings
      |),
      |q AS (
      |  SELECT e.vec_id, s.rawscale AS scale,
      |    list_transform(e.embedding, x -> CAST(floor(CAST(x AS DOUBLE) /
      |      (CASE WHEN s.rawscale = 0 THEN 1.0 ELSE s.rawscale END) + 0.5) AS INTEGER)) AS qv
      |  FROM embeddings e JOIN s ON e.vec_id = s.vec_id
      |),
      |probe AS (SELECT scale AS qscale, qv AS qqv FROM q WHERE vec_id = 0),
      |scored AS (
      |  SELECT q.vec_id,
      |    (CAST(CAST(list_sum(list_transform(range(1, 65),
      |        i -> CAST(q.qv[i] AS BIGINT) * CAST(probe.qqv[i] AS BIGINT))) AS BIGINT)
      |      AS DOUBLE) * q.scale) * probe.qscale AS score
      |  FROM q, probe
      |)""".stripMargin

  private val q69Sql =
    s"""WITH $quantScoreCtes
      |SELECT rk, vec_id FROM (
      |  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY score DESC, vec_id) AS rk
      |  FROM scored) t
      |WHERE rk <= 20
      |ORDER BY rk""".stripMargin

  // ---------------------------------------------------------------- q71
  /** Batched kNN: top-5 neighbors for EVERY query in a 20-vector probe
    * set, in ONE corpus scan. The probe set broadcasts, scoring is the
    * exact-integer quantized dot (q69's machinery, so DuckDB replays
    * it bit-for-bit), and [[graft.ops.TopKAgg]] reduces each task's
    * slice to k entries per query BEFORE the exchange — the shuffle
    * carries |queries| × k rows regardless of corpus size. This is the
    * production "score the corpus against a probe set" shape
    * (retrieval eval, hard-negative mining, decontamination probes). */
  private def q71(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Similarity
    val q = Tables.embeddings(s, dir)
      .select(col("vec_id"), Similarity.quantizeInt8(col("embedding")).as("z"))
      .select(col("vec_id"), col("z.scale").as("sc"), col("z.q").as("qv"))
    val probes = q.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("sc").as("qs"), col("qv").as("qq"))
    q.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        Similarity.quantizedDot(col("qv"), col("sc"), col("qq"), col("qs")).as("score"))
      .groupBy("qid")
      .agg(graft.ops.TopKAgg.topK(col("score"), col("vec_id"), 5).as("tk"))
      .select(col("qid"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rk"),
        col("e.id").as("vec_id"))
      .orderBy("qid", "rk")
  }

  private val q71Sql =
    """WITH s AS (
      |  SELECT vec_id,
      |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS rawscale
      |  FROM embeddings
      |),
      |q AS (
      |  SELECT e.vec_id, s.rawscale AS scale,
      |    list_transform(e.embedding, x -> CAST(floor(CAST(x AS DOUBLE) /
      |      (CASE WHEN s.rawscale = 0 THEN 1.0 ELSE s.rawscale END) + 0.5) AS INTEGER)) AS qv
      |  FROM embeddings e JOIN s ON e.vec_id = s.vec_id
      |),
      |probes AS (SELECT vec_id AS qid, scale AS qscale, qv AS qqv FROM q WHERE vec_id < 20),
      |scored AS (
      |  SELECT probes.qid, q.vec_id,
      |    (CAST(CAST(list_sum(list_transform(range(1, 65),
      |        i -> CAST(q.qv[i] AS BIGINT) * CAST(probes.qqv[i] AS BIGINT))) AS BIGINT)
      |      AS DOUBLE) * q.scale) * probes.qscale AS score
      |  FROM q, probes
      |  WHERE q.vec_id <> probes.qid
      |)
      |SELECT qid, CAST(rk AS INTEGER) AS rk, vec_id FROM (
      |  SELECT qid, vec_id, ROW_NUMBER() OVER (
      |    PARTITION BY qid ORDER BY score DESC, vec_id) AS rk
      |  FROM scored) t
      |WHERE rk <= 5
      |ORDER BY qid, rk""".stripMargin

  // ---------------------------------------------------------------- q48
  /** Sliding-window token chunking (50-token chunks, 10 overlap). */
  private def q48(s: SparkSession, dir: String): DataFrame =
    graft.ops.Chunking.chunkByTokens(Tables.documents(s, dir),
      chunkSize = 50, overlap = 10)
      .orderBy("doc_id", "chunk_idx")

  private val q48Sql =
    """SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
      |  array_to_string(toks[i*40+1 : i*40+50], ' ') AS chunk_text,
      |  CAST(len(toks[i*40+1 : i*40+50]) AS BIGINT) AS n_chunk_tokens
      |FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks FROM documents) t,
      |  UNNEST(range(CAST(ceil(len(toks) / 40.0) AS BIGINT))) AS u(i)
      |ORDER BY doc_id, chunk_idx""".stripMargin

  // ---------------------------------------------------------------- q49
  /** Deterministic masking: scrub digit runs from the JSON props of
    * events and count redactions (the PII-redaction shape). */
  private def q49(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Chunking
    Tables.events(s, dir)
      .select(
        col("event_id"),
        Chunking.maskPattern(col("props"), Chunking.digitRunPattern, "#").as("props_masked"),
        Chunking.countPattern(col("props"), Chunking.digitRunPattern).as("n_redactions"))
      .orderBy("event_id")
  }

  private val q49Sql =
    """SELECT event_id,
      |  regexp_replace(props, '[0-9]+', '#', 'g') AS props_masked,
      |  CAST(len(regexp_extract_all(props, '[0-9]+', 0)) AS BIGINT) AS n_redactions
      |FROM events
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q50
  /** Deterministic train/val/test split: stable arithmetic hash bucket
    * per doc — identical assignment on any partitioning (audited by
    * the cross-partitioning determinism check). */
  private def q50(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        graft.ops.Splits.assignSplit(col("doc_id")).as("split"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "split")

  private val q50Sql =
    """SELECT lang,
      |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
      |  COUNT(*) AS n_docs
      |FROM (SELECT lang, ((doc_id * 2654435761) % 4294967296) % 100 AS b FROM documents) t
      |GROUP BY 1, 2
      |ORDER BY lang, split""".stripMargin

  // ---------------------------------------------------------------- q51
  /** Cross-modal join: text rows to their embedding rows (shared id
    * space), aggregated by language × cluster label — the join shape
    * of multimodal training-data assembly. */
  private def q51(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val e = Tables.embeddings(s, dir)
    d.join(e, d("doc_id") === e("vec_id"))
      .groupBy("lang", "label")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy("lang", "label")
  }

  private val q51Sql =
    """SELECT lang, label, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents JOIN embeddings ON doc_id = vec_id
      |GROUP BY lang, label
      |ORDER BY lang, label""".stripMargin

  // ---------------------------------------------------------------- q62
  /** Benchmark decontamination: corpus docs (doc_id % 50 ≠ 0) sharing
    * ≥ 5 distinct trigrams with the held-out "benchmark" slice
    * (doc_id % 50 = 0). Oracle recomputes the overlap with string
    * grams — hash-invariant set sizes, q31's argument. */
  private def q62(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    graft.ops.Dedup.contaminationScores(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0))
      .filter(col("n_shared_grams") >= 5)
      .orderBy("doc_id")
  }

  private val q62Sql =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM documents
      |),
      |grams AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(len(t) - 2),
      |      i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
      |  FROM toks WHERE len(t) >= 3
      |),
      |ref AS (
      |  SELECT DISTINCT unnest(g) AS gram FROM grams WHERE doc_id % 50 = 0
      |),
      |hits AS (
      |  SELECT c.doc_id, COUNT(*) AS n_shared_grams
      |  FROM (SELECT doc_id, unnest(g) AS gram FROM grams WHERE doc_id % 50 <> 0) c
      |  JOIN ref USING (gram)
      |  GROUP BY c.doc_id
      |)
      |SELECT doc_id, n_shared_grams FROM hits
      |WHERE n_shared_grams >= 5
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q63
  /** Gopher-style repetition signals (bigram totals, top-bigram and
    * duplicate-bigram fractions) — doc-local HOFs, map-only. */
  private def q63(s: SparkSession, dir: String): DataFrame =
    graft.ops.TextStats.repetitionStats(Tables.documents(s, dir))
      .orderBy("doc_id")

  private val q63Sql =
    """WITH t AS (
      |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS tk FROM documents
      |),
      |g AS (
      |  SELECT doc_id,
      |    list_transform(range(len(tk) - 1), i -> tk[i+1] || ' ' || tk[i+2]) AS gr
      |  FROM t WHERE len(tk) >= 2
      |),
      |s AS (
      |  SELECT doc_id,
      |    len(gr) AS n_total,
      |    len(list_distinct(gr)) AS n_distinct,
      |    list_max(list_transform(list_distinct(gr),
      |      d -> len(list_filter(gr, x -> x = d)))) AS max_count
      |  FROM g
      |)
      |SELECT doc_id,
      |  CAST(n_total AS BIGINT) AS n_grams,
      |  CAST(max_count AS DOUBLE) / CAST(n_total AS DOUBLE) AS top_gram_frac,
      |  CAST(n_total - n_distinct AS DOUBLE) / CAST(n_total AS DOUBLE) AS dup_gram_frac
      |FROM s
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q64
  /** Token budgeting: whitespace vs BPE-ish (pre-tokenizer regex)
    * counts per document — the cost model for training-token
    * estimation. */
  private def q64(s: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    Tables.documents(s, dir).select(
      col("doc_id"),
      TextStats.tokenCount(t).as("n_ws_tokens"),
      TextStats.bpeishTokenCount(t).as("n_bpeish_tokens"),
      (TextStats.bpeishTokenCount(t).cast("double") /
        TextStats.tokenCount(t).cast("double")).as("subword_ratio"))
      .orderBy("doc_id")
  }

  private val q64Sql =
    """SELECT doc_id,
      |  CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_ws_tokens,
      |  CAST(len(regexp_extract_all(text, '''(?:[sdmt]|ll|ve|re)|\p{L}+|\p{N}+|[^\s\p{L}\p{N}]+')) AS BIGINT) AS n_bpeish_tokens,
      |  CAST(len(regexp_extract_all(text, '''(?:[sdmt]|ll|ve|re)|\p{L}+|\p{N}+|[^\s\p{L}\p{N}]+')) AS DOUBLE)
      |    / CAST(len(regexp_split_to_array(text, '\s+')) AS DOUBLE) AS subword_ratio
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q66
  /** Deterministic training-mixture sampling: per-lang hash-cell keep
    * fractions (en 100%, zh 75%, de 50%, fr 25%, es 10%) — membership
    * is a pure function of doc_id, so the blend reproduces on any
    * cluster, partitioning or rerun. */
  private def q66(s: SparkSession, dir: String): DataFrame = {
    val weights = Map("en" -> 1.0, "zh" -> 0.75, "de" -> 0.5,
      "fr" -> 0.25, "es" -> 0.1)
    graft.ops.Splits.mixtureSample(Tables.documents(s, dir), weights)
      .groupBy("lang").agg(count(lit(1)).as("n_kept"))
      .orderBy("lang")
  }

  private val q66Sql =
    """SELECT lang, COUNT(*) AS n_kept
      |FROM (
      |  SELECT lang,
      |    ((doc_id * 2654435761) % 4294967296) % 10000 AS cell
      |  FROM documents) t
      |WHERE (lang = 'en' AND cell < 10000)
      |   OR (lang = 'zh' AND cell < 7500)
      |   OR (lang = 'de' AND cell < 5000)
      |   OR (lang = 'fr' AND cell < 2500)
      |   OR (lang = 'es' AND cell < 1000)
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q66_mixture_sample", q66, Some(q66Sql)),
    QueryDef("q64_token_budget", q64, Some(q64Sql)),
    QueryDef("q62_decontaminate", q62, Some(q62Sql)),
    QueryDef("q63_repetition", q63, Some(q63Sql)),
    QueryDef("q48_chunking", q48, Some(q48Sql)),
    QueryDef("q49_masking", q49, Some(q49Sql)),
    QueryDef("q50_dataset_split", q50, Some(q50Sql)),
    QueryDef("q51_crossmodal_join", q51, Some(q51Sql)),
    QueryDef("q15_token_stats", q15, Some(q15Sql)),
    QueryDef("q16_exact_dedup", q16, Some(q16Sql)),
    QueryDef("q17_quality_score", q17, Some(q17Sql)),
    QueryDef("q18_langid", q18, Some(q18Sql)),
    QueryDef("q19_fingerprints", q19, Some(q19Sql)),
    QueryDef("q20_ngram_jaccard", q20, Some(q20Sql)),
    QueryDef("q21_cosine_knn", q21, Some(q21Sql)),
    QueryDef("q22_embedding_neardup", q22, Some(q22Sql)),
    QueryDef("q68_topk_per_group", q68, Some(q68Sql)),
    QueryDef("q69_quantized_knn", q69, Some(q69Sql)),
    QueryDef("q71_batch_knn", q71, Some(q71Sql)))
}
